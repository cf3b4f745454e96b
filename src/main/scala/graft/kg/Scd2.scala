package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 history build: collapse a per-entity change log
  * `(entity, value, ts)` into validity intervals — one row per RUN of
  * consecutive identical values, carrying `[valid_from, valid_to)` and
  * an `is_current` flag on the open interval. This is the dimension-
  * table shape every warehouse keeps for entity attributes that drift
  * (a KG's entity→label, page→language, customer→status), and the
  * batch twin of q85's temporal fact scoping: q85 stamps each FACT
  * with its observation window, SCD2 stamps each VALUE with its
  * validity run so point-in-time joins (`AS OF`) are one range lookup.
  *
  * Gaps-and-islands, windowed per entity: a change flag
  * (`value IS DISTINCT FROM lag(value)`), a running sum of flags
  * numbering the runs (`version`), a per-run min-ts aggregate, and a
  * `lead` over versions closing each interval with the next run's
  * start. The open interval carries the warehouse-idiomatic high-date
  * sentinel `9999-12-31` rather than NULL, so point-in-time lookups
  * are a single `BETWEEN` with no null branch (and the cross-engine
  * compare never meets a nullable date). Scale shape: every window
  * PARTITIONS BY entity — per-entity
  * history is bounded (orders per customer, revisions per page), so no
  * single-task global window exists anywhere; the run collapse is a
  * map-side-combinable aggregate on (entity, version). Ties at the
  * same timestamp break on the caller's `tie` column (a stable event
  * id), making every interval byte-reproducible across engines.
  */
object Scd2 {

  /** The open-interval high date. */
  val OpenEnd: java.sql.Date = java.sql.Date.valueOf("9999-12-31")

  /** `(entity, value, version, valid_from, valid_to, n_rows,
    * is_current)`: version numbers runs 1-based in time order;
    * `valid_to` is [[OpenEnd]] on the current run; `n_rows` counts the
    * log rows the run collapsed. */
  def history(log: DataFrame, entity: Column, value: Column, ts: Column,
      tie: Column): DataFrame = {
    val rows = log.select(entity.as("entity"), value.as("value"),
      ts.as("ts"), tie.as("tie"))
    val byTime = Window.partitionBy("entity").orderBy("ts", "tie")
    val flagged = rows.withColumn("chg",
      when(col("value") <=> lag("value", 1).over(byTime), 0L).otherwise(1L))
    val versioned = flagged.withColumn("version",
      sum("chg").over(byTime.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val runs = versioned.groupBy("entity", "version")
      // one value per run by construction; min() is the cheapest witness
      .agg(min("value").as("value"), min("ts").as("valid_from"),
        count(lit(1)).as("n_rows"))
    val byVersion = Window.partitionBy("entity").orderBy("version")
    runs.select(col("entity"), col("value"), col("version"),
        col("valid_from"),
        coalesce(lead("valid_from", 1).over(byVersion),
          lit(OpenEnd).cast("date")).as("valid_to"),
        col("n_rows"))
      .withColumn("is_current", col("valid_to") === lit(OpenEnd).cast("date"))
  }
}
