package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.BadSubpartitionException

/** A [[SubRecord]] with its assigned subpartition. */
case class AssignedRecord(subKey: String, ts: Timestamp, src: String,
                          value: String, subpartition: Int)

/** Streaming round-robin subpartitioner — the stateful twin of
  * `Subpartitions.roundRobin` with the reference's exact counter
  * semantics (api/partitioner/RoundRobinPartitioner.java:15-44): ONE
  * monotonically increasing counter per source partition, living for the
  * whole consumer lifetime, `subpartition = counter++ % n`.
  *
  * The batch form restarts numbering per micro-batch; this form keeps the
  * counter in `mapGroupsWithState` state keyed by source partition, so the
  * assignment sequence continues seamlessly across micro-batches exactly
  * like the reference's long-lived HashMap counter. State is one Long per
  * source partition — bounded by partition count, not data volume, so it
  * holds at any scale. Within a batch, records are ordered by (ts, value)
  * before numbering to make assignment deterministic under retries
  * (Kafka's per-partition order is by offset; an event-time total order is
  * the replayable analog).
  */
object StreamingRoundRobin {

  def assign(ds: Dataset[SubRecord], n: Int): Dataset[AssignedRecord] = {
    if (n <= 0) throw new BadSubpartitionException(
      s"subpartition count must be positive, got $n")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.src)
      .flatMapGroupsWithState[Long, AssignedRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var counter = state.getOption.getOrElse(0L)
          // (ts, value, subKey) is a total order over distinct records —
          // (ts, value) alone lets equal-payload records on different
          // subKeys swap assignments across micro-batch replays
          val out = rows.toSeq
            .sortBy(r => (r.ts.getTime, r.value, r.subKey)).map { r =>
            val sp = (counter % n).toInt
            counter += 1
            AssignedRecord(r.subKey, r.ts, r.src, r.value, sp)
          }
          state.update(counter)
          out.iterator
      }
  }
}
