package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Wall-clock punctuation per key — the reference's punctuate(long) timer
  * (api/task/WorkerTask.java:59-60, impl/punctuator/PunctuatorThread.java:34-41):
  * once a key has been seen, it emits a [[Punctuation]] every `intervalMs`
  * of processing time, even when no new records arrive for it.
  *
  * Spark mapping: `flatMapGroupsWithState` with ProcessingTimeTimeout — the
  * timeout fires on the next micro-batch after expiry (SURVEY.md §7.3 hard
  * part 3: a Trigger.ProcessingTime floor on the query guarantees batches
  * keep running, standing in for the reference's dedicated punctuator
  * thread).
  */
object Punctuator {

  case class PunctState(seen: Long, lastPunctuateMs: Long)

  def punctuate(ds: Dataset[SubRecord], intervalMs: Long): Dataset[Punctuation] = {
    implicit val outEnc = Encoders.product[Punctuation]
    implicit val stateEnc = Encoders.product[PunctState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.subKey)
      .flatMapGroupsWithState[PunctState, Punctuation](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[SubRecord], state: GroupState[PunctState]) =>
          val now = System.currentTimeMillis()
          val prev = state.getOption.getOrElse(PunctState(0L, now))
          val seen = prev.seen + rows.size
          if (state.hasTimedOut) {
            state.update(PunctState(seen, now))
            state.setTimeoutDuration(intervalMs)
            Iterator.single(Punctuation(key, now, seen))
          } else {
            state.update(PunctState(seen, prev.lastPunctuateMs))
            state.setTimeoutDuration(intervalMs)
            Iterator.empty
          }
      }
  }
}
