package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offset-progress semantics of the reference's DefaultOffsetsState
  * (impl/offsets/DefaultOffsetsState.java:258-302): records complete out of
  * order; the committable offset per partition is the end of the maximal
  * contiguous processed prefix ("floor of first unprocessed consumed offset").
  *
  * Batch-relational form: given (partition, offset, processed) rows where
  * offsets are dense per partition, the committable count equals
  * min(offset where !processed), or max(offset)+1 when everything processed.
  * One partial-aggregable groupBy — a single shuffle, map-side combined,
  * scales linearly; no windows or sorts needed.
  */
object OffsetsCommit {

  /** Committable offset (= number of contiguous processed records from the
    * start) per partition. `offset` must be dense 0..k within partition. */
  def committable(df: DataFrame, partition: Column, offset: Column,
                  processed: Column): DataFrame =
    df.groupBy(partition.as("part"))
      .agg(
        coalesce(min(when(!processed, offset)), max(offset) + 1)
          .as("committable"),
        count(lit(1)).as("consumed"),
        sum(when(processed, 1L).otherwise(0L)).as("processed_total"))
}
