ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nerllmspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++
  sys.env.get("SPARK_GRAFT_GCLOG").map(p => s"-Xlog:gc:$p").toSeq ++
  sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq ++
  // free-form JVM flag escape hatch for measurement sessions (e.g.
  // "-Xms8g -XX:+AlwaysPreTouch" to A/B heap pre-touch against the
  // host's degraded fresh-page fault path — see BASELINE.md round 5)
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty) ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
// Bench/Verify JVMs pre-touch a fixed heap floor: this host's fresh-page
// fault path degrades episodically (measured ~70 ms/2MB madvise-THP
// faults, 5.7x-slower 4k first-touch writes mid-window — BASELINE.md
// round 5), which inflated alloc-heavy shuffle stages 2-4x while leaving
// codec-bound queries almost untouched. Touching the heap once at JVM
// start (a bounded ~10-20 s cost) moves all steady-state allocation onto
// warm pages; measured q53 21.2 s -> 6.9 s inside a degraded window.
// Tests keep lazy heap (they are many small JVM-bound suites).
run / javaOptions ++= {
  val floor = sys.env.getOrElse("SPARK_GRAFT_XMS", "16g")
  if (floor == "0") Seq.empty else Seq(s"-Xms$floor", "-XX:+AlwaysPreTouch")
}
