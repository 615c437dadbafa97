package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling — the missing-bucket gap-fill every event stream
  * needs before it can feed window features or charts: project each key's
  * events onto a regular time grid and forward-fill the last observation
  * (LOCF) across empty buckets.
  *
  * Scale shape: the per-(key, bucket) observation pick and the forward
  * fill are both windows PARTITIONED BY KEY (many small spillable
  * partitions, never a global sort); the grid explode is per-key column
  * algebra (`sequence` + `explode`, codegen'd, no shuffle); the grid↔obs
  * join is an equi-join on (key, bucket). Grid size is bounded by
  * span/step per key, independent of event count.
  */
object Resample {

  /** One row per (key, bucket) from the key's first to last observed
    * bucket; `value` = last observation at or before the bucket (LOCF),
    * `observed` = whether the bucket had its own event. Within a bucket
    * the LAST event wins, ordered by (ts, tieBreak) — pass a unique
    * tieBreak so replays pick the same row.
    *
    * @param step e.g. "interval 1 day" / "interval 1 hour"
    * @param unit matching date_trunc unit: "DAY" / "HOUR" / "MINUTE" */
  def locf(df: DataFrame, key: Column, ts: Column, value: Column,
           tieBreak: Column, unit: String, step: String): DataFrame = {
    val wPick = Window.partitionBy(col("k"), col("bucket"))
      .orderBy(col("t").desc, col("tb").desc)
    val obs = df
      .select(key.as("k"), date_trunc(unit, ts).as("bucket"), ts.as("t"),
        tieBreak.as("tb"), value.as("v"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("k"), col("bucket"), col("v"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("bucket")).as("d0"), max(col("bucket")).as("d1"))
      .select(col("k"),
        explode(expr(s"sequence(d0, d1, $step)")).as("bucket"))
    val wFill = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        last(col("v"), ignoreNulls = true).over(wFill).as("filled_v"),
        col("v").isNotNull.as("observed"))
  }
}
