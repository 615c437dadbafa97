package graft.operators

import java.util.concurrent.TimeoutException

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

import graft.ProcessingTimeoutException

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

  /** @param timeout max wait for any single record's completion — the
    *   reference's processing-timeout semantic (ConsumerThread.java:133-136
    *   shuts the worker down when a record exceeds it). Exceeding it throws
    *   [[ProcessingTimeoutException]], failing the task. Duration.Inf opts
    *   out.
    *
    * The worker pool is registered on the task completion listener, so it
    * is torn down on EVERY task exit — normal drain, downstream
    * limit/take that abandons the iterator, a failed Future, or a task
    * kill — never leaking non-daemon threads into the executor JVM. */
  def mapAsync[T, U: Encoder](ds: Dataset[T], maxInFlight: Int,
                              timeout: Duration = Duration.Inf)
                             (fn: T => U): Dataset[U] = {
    require(maxInFlight > 0)
    ds.mapPartitions { rows =>
      // one executor per partition-task, bounded queue of in-flight work
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxInFlight, 16))
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
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
          try Await.result(window.dequeue(), timeout)
          catch {
            case _: TimeoutException =>
              pool.shutdownNow()
              throw new ProcessingTimeoutException(
                s"async record exceeded processing timeout of $timeout")
            case e: Throwable =>
              pool.shutdownNow()
              throw e
          }
        }
      }
      out
    }
  }
}
