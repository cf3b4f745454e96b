package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shared-cache populate helper: per-pid staging + atomic rename means
  * concurrent cold-starting JVMs can never expose a torn directory. */
class TmpFsSpec extends AnyFunSuite {

  private def fresh(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-tmpfs-").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def writeOk(dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data"), "payload".getBytes)
    new java.io.File(dir, "_SUCCESS").createNewFile()
  }

  test("populates once, reuses thereafter, never leaves staging behind") {
    val target = fresh()
    var writes = 0
    graft.core.TmpFs.ensureShared(target) { st => writes += 1; writeOk(st) }
    graft.core.TmpFs.ensureShared(target) { st => writes += 1; writeOk(st) }
    assert(writes == 1)
    assert(new java.io.File(target, "_SUCCESS").exists())
    assert(stagingOf(target).isEmpty)
  }

  /** Staging remnants of THIS target (the parent is the shared tmp dir —
    * other suites' and past runs' files must not fail the assertion). */
  private def stagingOf(target: String): Seq[java.io.File] = {
    val t = new java.io.File(target)
    Option(t.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(t.getName + ".staging-")).toSeq
  }

  test("losing the populate race discards the staging copy and uses the winner's") {
    val target = fresh()
    // interleave: while our writer is mid-write, 'another process' lands a
    // complete copy at the target — our rename must lose gracefully
    graft.core.TmpFs.ensureShared(target) { st =>
      writeOk(target) // the other process wins first
      writeOk(st)
    }
    assert(new java.io.File(target, "_SUCCESS").exists())
    assert(stagingOf(target).isEmpty)
  }

  test("a torn pre-existing target (no _SUCCESS) is self-healed, not a permanent failure") {
    val target = fresh()
    // the torn state: directory present, _SUCCESS missing
    new java.io.File(target).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(target, "half-written"), "junk".getBytes)
    var writes = 0
    graft.core.TmpFs.ensureShared(target) { st => writes += 1; writeOk(st) }
    assert(writes == 1)
    assert(new java.io.File(target, "_SUCCESS").exists())
    assert(!new java.io.File(target, "half-written").exists())
  }

  test("orphan staging dirs of dead processes are swept; live ones are left alone") {
    val target = fresh()
    val base = new java.io.File(target).getName
    val parent = new java.io.File(target).getParentFile
    // a staging dir from a pid that no longer exists (SIGKILL mid-populate)
    val deadStaging = new java.io.File(parent, s"$base.staging-999999999")
    deadStaging.mkdirs()
    // and one from a LIVE process — pid 1 (init) is always alive here,
    // standing in for a concurrent populate in flight
    val livePidStaging = new java.io.File(parent, s"$base.staging-1")
    livePidStaging.mkdirs()
    graft.core.TmpFs.ensureShared(target)(writeOk)
    assert(!deadStaging.exists(), "dead-pid orphan must be swept")
    assert(livePidStaging.exists(), "live-pid staging must be left alone")
    org.apache.commons.io.FileUtils.deleteQuietly(livePidStaging)
  }

  test("a writer that leaves no _SUCCESS is rejected; target untouched, staging cleaned") {
    val target = fresh()
    intercept[IllegalArgumentException] {
      graft.core.TmpFs.ensureShared(target) { st => new java.io.File(st).mkdirs() }
    }
    assert(!new java.io.File(target).exists())
    assert(stagingOf(target).isEmpty)
  }
}
