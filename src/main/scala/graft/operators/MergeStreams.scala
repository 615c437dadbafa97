package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aware stream merge — the reference's flagship semantic
  * (integration/MergerTest.java:136-190, README.md:22): two record streams
  * are merged into one output ordered by timestamp; a record from stream A
  * is only emitted once stream B's high-watermark has passed its timestamp.
  *
  * Batch form: the watermark condition is vacuous once both inputs are
  * complete, so the merge is exactly UNION ALL + global timestamp order.
  * The scalable implementation avoids a single-reducer global sort by
  * range-partitioning on the timestamp (orderBy does this via range
  * exchange + per-partition sort — no driver bottleneck at 100 TB).
  *
  * The streaming form (graft.streaming.StreamingMerge) keeps the gating
  * semantic live: union + event-time watermark + per-key ordered emission
  * from flatMapGroupsWithState.
  */
object MergeStreams {

  /** UNION ALL two homogeneous frames and order by event time. Emits a
    * global emission index so downstream (and the correctness oracle) can
    * verify the total order as data, independent of physical row order.
    *
    * NOT a global window: `row_number over (ORDER BY ts)` collapses to a
    * single partition — the classic 100 TB bottleneck. Instead the union is
    * range-partitioned + sorted on (ts, tieBreak) — parallel sort, same as
    * orderBy — and the global sequence comes from zipWithIndex: one extra
    * count job over the sorted partitions, no single-reducer stage. */
  def merged(a: DataFrame, b: DataFrame, ts: Column,
             tieBreak: Column): DataFrame =
    mergedN(Seq(a, b), ts, tieBreak)

  /** N-way form of [[merged]] — the reference merges an arbitrary set of
    * input partitions/streams into one time-ordered output, not just two
    * (MergerTest.java drives three inputs). Same scale shape: one UNION
    * ALL, one range exchange, per-partition sort, zipWithIndex. */
  def mergedN(inputs: Seq[DataFrame], ts: Column,
              tieBreak: Column): DataFrame = {
    require(inputs.nonEmpty, "mergedN needs at least one input")
    val u = inputs.reduce(_ unionByName _)
    val sorted = u.repartitionByRange(ts, tieBreak)
      .sortWithinPartitions(ts, tieBreak)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("emit_seq",
          org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** The merge gate as data: per-record high-watermark of the *other*
    * stream at this record's position (MergerTest pairing condition).
    * A record is emittable when otherWatermark >= its own timestamp.
    *
    * TEST/DIAGNOSTIC ONLY — the unpartitioned running-max window funnels
    * every row through one partition, which is exactly the single-reducer
    * shape the production paths avoid (see [[merged]] for the parallel
    * form of the total order). Use it to validate small golden sequences
    * (OperatorsSpec / the reference MergerTest replay), never in a
    * pipeline; partition the window by a key for any real dataset. */
  def withPairedWatermark(merged: DataFrame, source: Column,
                          ts: Column): DataFrame = {
    val w = Window.orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("wm_a", max(when(source === "a", ts)).over(w))
      .withColumn("wm_b", max(when(source === "b", ts)).over(w))
  }
}
