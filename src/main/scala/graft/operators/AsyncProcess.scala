package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder}

/** Asynchronous per-record processing — the reference's async process()
  * contract (api/task/WorkerTask.java:43-50: "might be done asynchronously",
  * completion signalled via RecordStatusObserver on any thread, with
  * in-flight records bounded by the queue and offsets committed only up to
  * the contiguous processed prefix).
  *
  * Spark form: `mapPartitions` with a bounded in-flight window of Futures
  * per partition. Emission order is SUBMISSION order (the per-subpartition
  * ordering guarantee holds — a slow record back-pressures its partition,
  * exactly like the reference's peek==poll invariant), while up to
  * `maxInFlight` records overlap in the user function. At-least-once is
  * preserved: a failed Future fails the task → Spark retries the partition.
  */
object AsyncProcess {

  def mapAsync[T, U: Encoder](ds: Dataset[T], maxInFlight: Int)
                             (fn: T => U): Dataset[U] = {
    require(maxInFlight > 0)
    ds.mapPartitions { rows =>
      // one executor per partition-task, bounded queue of in-flight work
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxInFlight, 16))
      implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
      val window = new scala.collection.mutable.Queue[Future[U]]()
      val out = new Iterator[U] {
        private def fill(): Unit =
          while (window.size < maxInFlight && rows.hasNext) {
            val r = rows.next()
            window.enqueue(Future(fn(r)))
          }
        override def hasNext: Boolean = {
          fill()
          if (window.isEmpty) { pool.shutdown(); false } else true
        }
        override def next(): U = {
          fill()
          Await.result(window.dequeue(), Duration.Inf)
        }
      }
      out
    }
  }
}
