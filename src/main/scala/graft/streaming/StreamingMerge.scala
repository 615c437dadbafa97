package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Time-aware stream merge — the reference's flagship semantic
  * (integration/MergerTest.java:136-190): a record from stream A is
  * emittable only once stream B's event-time high-watermark has passed its
  * timestamp, and emission is timestamp-ordered per key.
  *
  * Spark-first translation:
  *  - apply `withWatermark` to EACH input before `unionByName`: Spark's
  *    query watermark is the MIN over watermark nodes, which is exactly the
  *    reference's "the other stream has reached t" pairing condition
  *    generalized to n streams;
  *  - buffer + ordered release happens in `flatMapGroupsWithState` keyed by
  *    subpartition, with event-time timeouts so a key flushes when the
  *    watermark passes even if it receives no further records.
  *
  * State is bounded by the watermark delay (rows above the watermark only),
  * the engine-side fix for the unbounded-buffer failure mode the reference
  * handles with byte-weighted queue pause (README.md:231-245).
  */
object StreamingMerge {

  /** Union n streams with per-input watermarks (the pairing gate). */
  def gatedUnion(delay: String, streams: Dataset[SubRecord]*): Dataset[SubRecord] =
    streams.map(_.withWatermark("ts", delay)).reduce(_ unionByName _)

  /** Timestamp-ordered, watermark-gated emission per subKey. */
  def orderedEmit(merged: Dataset[SubRecord]): Dataset[SubRecord] = {
    implicit val outEnc = Encoders.product[SubRecord]
    implicit val stateEnc = Encoders.product[MergeState]
    implicit val keyEnc = Encoders.STRING
    merged.groupByKey(_.subKey)
      .flatMapGroupsWithState[MergeState, SubRecord](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(emitReady _)
  }

  case class MergeState(buf: Seq[BufRow])

  private def emitReady(key: String, rows: Iterator[SubRecord],
                        state: GroupState[MergeState]): Iterator[SubRecord] = {
    val buffered = state.getOption.map(_.buf).getOrElse(Seq.empty) ++
      rows.map(r => BufRow(r.ts.getTime, r.src, r.value))
    val wm = state.getCurrentWatermarkMs()
    val (ready, rest) = buffered.partition(_.ms <= wm)
    if (rest.isEmpty) state.remove()
    else {
      state.update(MergeState(rest))
      // wake this key when the watermark passes its oldest buffered row
      state.setTimeoutTimestamp(rest.map(_.ms).min)
    }
    ready.sortBy(b => (b.ms, b.src, b.value)).iterator
      .map(b => SubRecord(key, new Timestamp(b.ms), b.src, b.value))
  }
}
