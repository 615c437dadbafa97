package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.OffsetsState

/** One offset-bookkeeping event: `kind` ∈ consumed (range [lo, hi] at
  * `atMillis`) | processed (single offset in `lo`) | committed (next
  * committed offset in `lo`). `seq` totally orders events within a
  * micro-batch — Kafka delivers per-partition events in order; a shuffled
  * micro-batch iterator must be re-sequenced before replay. */
case class OffsetEvent(partition: String, seq: Long, kind: String,
                       lo: Long, hi: Long, atMillis: Long)

/** Per-partition progress after a micro-batch: the committable offset (the
  * reference's getOffsetsToCommit value minus the +1 Kafka convention),
  * plus state-size observability. */
case class OffsetsProgress(partition: String, committable: Option[Long],
                           consumedRanges: Int, processedRanges: Int,
                           processedUncommitted: Long)

/** STREAMING deployment of [[graft.operators.OffsetsState]] — the
  * reference's record-level out-of-order acknowledgment running as a
  * Structured Streaming state machine (DefaultOffsetsState's maps of
  * per-partition structures → `flatMapGroupsWithState` keyed by
  * partition; the state store replaces the in-heap ConcurrentHashMap and
  * survives restarts with exactly the checkpoint guarantees the rest of
  * the pipeline already relies on).
  *
  * Scale shape: state per key is the snapshot of merged ranges — bounded
  * by instantaneous out-of-orderness, not stream length (holes fill,
  * ranges coalesce, commits prune) — and keys are Kafka partitions, so a
  * deployment tracking a million partitions spreads per-key state across
  * the cluster with no global structure anywhere. Emission is one
  * progress row per touched partition per micro-batch: the stream of
  * committable offsets a committer consumes. */
object OffsetsTracker {

  def track(events: Dataset[OffsetEvent]): Dataset[OffsetsProgress] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[
        (Seq[(Long, Long, Long)], Seq[(Long, Long)]), OffsetsProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part, rows, state) =>
          val st = state.getOption
            .map { case (c, p) => OffsetsState.restore(part, c, p) }
            .getOrElse(new OffsetsState(part))
          // re-sequence: micro-batch iterators carry no order guarantee
          rows.toSeq.sortBy(e => (e.seq, e.kind, e.lo)).foreach { e =>
            e.kind match {
              case "consumed"  => st.addConsumed(e.lo, e.hi, e.atMillis)
              case "processed" => st.updateProcessed(e.lo)
              case "committed" => st.removeCommitted(e.lo)
              case other =>
                throw new IllegalArgumentException(s"bad kind: $other")
            }
          }
          val out = {
            val committable = st.offsetToCommit()
            // snapshot AFTER offsetToCommit: its head-strip is part of
            // the state (the reference strips inside getOffsetToCommit)
            val (c, p) = st.snapshot()
            state.update((c, p))
            OffsetsProgress(part, committable, c.size, p.size,
              st.processedUncommitted())
          }
          Iterator(out)
      }
  }
}
