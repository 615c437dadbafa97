package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.GraftException

/** Pipeline lifecycle — the engine form of the reference's KafkaWorkers
  * status machine (api/KafkaWorkers.java:55-78, impl/KafkaWorkersImpl.java:
  * 101-228), carried over status-for-status:
  *
  * CREATED → STARTING → STARTED → SHUTDOWN → CLOSING → one of
  * {CLOSED_GRACEFULLY, CLOSED_NOT_GRACEFULLY, CANNOT_STOP_THREADS,
  * CLOSING_INTERRUPTED}, with the same transition legality rules and the
  * same two-phase close: a graceful stop bounded by the shutdown timeout
  * (worker.shutdown.timeout.ms), then a forced phase (job-group cancel, the
  * analog of executor.shutdownNow(), KafkaWorkersImpl.java:166-206), and
  * CANNOT_STOP_THREADS when even that cannot end the query.
  *
  * Spark's StreamingQuery is the underlying machine; this wrapper pins the
  * reference's statuses/semantics to it and wires the ShutdownCallback hook
  * (api/ShutdownCallback.java:6-19) through `awaitShutdown`.
  */
final class GraftPipeline private (query: StreamingQuery,
                                   onShutdown: Option[Throwable] => Unit,
                                   shutdownTimeoutMs: Long) {
  import GraftPipeline._

  @volatile private var _status: Status = Created
  @volatile private var externalCause: Option[Throwable] = None
  private val closeLock = new Object

  private[streaming] def setStatus(to: Status): Unit = closeLock.synchronized {
    if (!isTransitionAllowed(_status, to))
      throw new IllegalStateException(
        s"illegal pipeline status transition ${_status} -> $to")
    _status = to
  }

  private def tryToSetStatus(to: Status): Boolean = closeLock.synchronized {
    if (isTransitionAllowed(_status, to)) { _status = to; true } else false
  }

  def status: Status = _status

  /** Block until the pipeline terminates; fire the shutdown callback with
    * the failure cause (None = graceful), mirroring
    * KafkaWorkersImpl.close():213-215. Idempotent — the callback fires
    * exactly once. */
  def awaitShutdown(): Status = {
    try query.awaitTermination()
    catch {
      case e: InterruptedException =>
        // keep the interrupt status (ADVICE: don't swallow it) and report
        // the reference's CLOSING_INTERRUPTED terminal
        Thread.currentThread().interrupt()
        return finalizeClose(Some(ClosingInterrupted), Some(e))
      case scala.util.control.NonFatal(_) =>
        () // query.exception carries the recorded failure cause
    }
    finalizeClose()
  }

  /** Two-phase stop (KafkaWorkersImpl.close():148-228): request a graceful
    * stop and wait `shutdownTimeoutMs`; if the query is still alive, force
    * it (cancel its job group — the shutdownNow() analog) and wait the same
    * timeout again. Graceful phase → CLOSED_GRACEFULLY (or NOT_GRACEFULLY
    * when a failure cause exists); forced phase → CLOSED_NOT_GRACEFULLY;
    * still alive after both → CANNOT_STOP_THREADS. */
  def shutdown(): Status = shutdown(None)

  /** Shutdown with an externally-supplied cause — the reference's
    * `shutdown(WorkersException)` (KafkaWorkersImpl.java:140-146); the
    * watchdog uses this to surface ProcessingTimeoutException. */
  def shutdown(cause: Option[Throwable]): Status = {
    closeLock.synchronized {
      externalCause = externalCause.orElse(cause)
    }
    if (!query.isActive) return awaitShutdown()
    tryToSetStatus(Shutdown)
    tryToSetStatus(Closing)
    // query.stop() can block indefinitely on a hung batch — run it aside so
    // the two-phase timeout stays in control
    val stopper = new Thread(
      () => try query.stop() catch { case scala.util.control.NonFatal(_) => () },
      "graft-pipeline-stopper")
    stopper.setDaemon(true)
    stopper.start()
    try {
      if (!awaitInactive(shutdownTimeoutMs)) {
        // forced phase: cancel the query's jobs (StreamExecution runs its
        // batches under the runId job group)
        query.sparkSession.sparkContext.cancelJobGroup(query.runId.toString)
        if (!awaitInactive(shutdownTimeoutMs))
          return finalizeClose(Some(CannotStopThreads))
        return finalizeClose(terminal = None, forced = true)
      }
    } catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        return finalizeClose(Some(ClosingInterrupted), Some(e))
    }
    finalizeClose()
  }

  /** Truly stopped = not active AND the execution thread is dead.
    * isActive alone flips false the moment stop() is requested, even while
    * a hung batch keeps the thread running — the exact condition the
    * reference's CANNOT_STOP_THREADS reports. */
  private def fullyStopped: Boolean =
    !query.isActive &&
      !org.apache.spark.sql.graft.GraftShims.executionThreadAlive(query)

  private def awaitInactive(timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!fullyStopped && System.currentTimeMillis() < deadline)
      Thread.sleep(25)
    fullyStopped
  }

  private val callbackFired = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Teardown hook run exactly once when the pipeline reaches a terminal
    * status (after the ShutdownCallback). [[GraftPipeline.startWatched]]
    * registers the watchdog stop + listener removal here so the
    * observability loop can never leak a thread past the pipeline.
    *
    * Registration after the terminal callback has already fired (a query
    * that fails faster than the caller can register) runs the hook
    * immediately instead of composing it into a function nobody will call
    * again; composition and the finalizeClose snapshot share one lock, so
    * a hook is run exactly once whichever side wins the race. */
  private val cleanupLock = new Object
  private var cleanup: () => Unit = () => ()
  private[streaming] def registerCleanup(f: () => Unit): Unit = {
    val runNow = cleanupLock.synchronized {
      if (callbackFired.get()) true
      else { val prev = cleanup; cleanup = () => { prev(); f() }; false }
    }
    if (runNow) f()
  }

  /** Walk the remaining transitions to a terminal status and fire the
    * callback exactly once (re-entry returns the terminal already set).
    * The terminal status is decided under the lock, but the user callback
    * runs AFTER the lock is released — a slow/blocking ShutdownCallback
    * must not stall concurrent shutdown()/awaitShutdown()/status callers.
    * CannotStopThreads always hands the callback a cause (synthesized if
    * none was recorded) so it can never read as a graceful close. */
  private def finalizeClose(terminal: Option[Status] = None,
                            interrupt: Option[Throwable] = None,
                            forced: Boolean = false): Status = {
    val (t, cause, fire) = closeLock.synchronized {
      if (_status.isTerminal) (_status, None, false)
      else {
        tryToSetStatus(Shutdown)
        tryToSetStatus(Closing)
        val recorded: Option[Throwable] = externalCause
          .orElse(Option(query.exception.orNull))
          .orElse(interrupt)
          .orElse(if (forced) Some(new GraftException(
            s"query did not stop gracefully within ${shutdownTimeoutMs} ms; " +
              "stopped by forced job cancellation")) else None)
        val t = terminal.getOrElse(
          recorded.map(ClosedNotGracefully).getOrElse(ClosedGracefully))
        val cause = t match {
          case CannotStopThreads if recorded.isEmpty =>
            Some(new GraftException(
              s"query threads still alive after two shutdown phases of " +
                s"$shutdownTimeoutMs ms each (CANNOT_STOP_THREADS)"))
          case _ => recorded
        }
        setStatus(t)
        (t, cause, callbackFired.compareAndSet(false, true))
      }
    }
    if (fire) {
      // snapshot under cleanupLock: a registerCleanup racing with this
      // fire either lands in the snapshot or observes callbackFired and
      // self-runs — never both, never neither
      val toRun = cleanupLock.synchronized(cleanup)
      try onShutdown(cause)
      finally toRun()
    }
    t
  }

  def underlying: StreamingQuery = query
}

object GraftPipeline {

  /** The reference's nine statuses (api/KafkaWorkers.java:55-78). */
  sealed trait Status {
    /** Terminal = not a source of any allowed transition. */
    def isTerminal: Boolean = !allowedTransitions.contains(this)
  }
  case object Created extends Status
  case object Starting extends Status
  case object Started extends Status
  case object Shutdown extends Status
  case object Closing extends Status
  case object ClosedGracefully extends Status
  final case class ClosedNotGracefully(cause: Throwable) extends Status
  case object CannotStopThreads extends Status
  case object ClosingInterrupted extends Status

  /** ALLOWED_TRANSITIONS of api/KafkaWorkers.java:60-66; the terminal
    * entries are matched structurally so ClosedNotGracefully(e) is legal
    * from Closing regardless of its cause. */
  private val allowedTransitions: Map[Status, Status => Boolean] = Map(
    Created -> (_ == Starting),
    Starting -> (_ == Started),
    Started -> (_ == Shutdown),
    Shutdown -> (_ == Closing),
    Closing -> {
      case ClosedGracefully | CannotStopThreads | ClosingInterrupted => true
      case ClosedNotGracefully(_) => true
      case _ => false
    })

  def isTransitionAllowed(from: Status, to: Status): Boolean =
    allowedTransitions.get(from).exists(_(to))

  /** Start a pipeline: transformed stream → sink writer, with checkpoint
    * (the at-least-once guarantee, G1) and a processing-time trigger floor
    * (keeps punctuation timers firing, SURVEY.md §7.3).
    *
    * @param shutdownTimeoutMs the reference's worker.shutdown.timeout.ms
    *   (WorkersConfig.java): budget for EACH of the two close phases. */
  def start(writer: DataStreamWriter[Row], checkpointDir: String,
            triggerInterval: String = "1 second",
            onShutdown: Option[Throwable] => Unit = _ => (),
            shutdownTimeoutMs: Long = 10000L): GraftPipeline = {
    val q = writer
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
    val p = new GraftPipeline(q.start(), onShutdown, shutdownTimeoutMs)
    p.setStatus(Starting)
    p.setStatus(Started)
    p
  }

  /** Start from a frame with a foreachBatch body (the user "task"). */
  def foreachBatch(df: DataFrame, checkpointDir: String,
                   triggerInterval: String = "1 second",
                   onShutdown: Option[Throwable] => Unit = _ => (),
                   shutdownTimeoutMs: Long = 10000L)(
                    body: (DataFrame, Long) => Unit): GraftPipeline =
    start(df.writeStream.foreachBatch(body), checkpointDir, triggerInterval,
      onShutdown, shutdownTimeoutMs)

  /** Start with the full observability loop wired: a metrics listener
    * pinned to THIS query's id (no adoption race with other queries on
    * the session) and the processing-timeout watchdog enforcing O5 — the
    * assembled form of the reference's consumer + metrics + timeout
    * machinery. Teardown is wired too: when the pipeline reaches a
    * terminal status, the watchdog thread is stopped and the listener is
    * removed from the session — no leaked observers, no caller-owned
    * cleanup (calling `watchdog.stop()` again is a harmless no-op). */
  def startWatched(writer: DataStreamWriter[Row], checkpointDir: String,
                   spark: org.apache.spark.sql.SparkSession,
                   triggerInterval: String = "1 second",
                   onShutdown: Option[Throwable] => Unit = _ => (),
                   shutdownTimeoutMs: Long = 10000L,
                   processingTimeoutMs: Long = 300000L)
  : (GraftPipeline, WorkersMetricsListener, PipelineWatchdog) = {
    val listener = new WorkersMetricsListener(processingTimeoutMs)
    spark.streams.addListener(listener)
    val p = try start(writer, checkpointDir, triggerInterval, onShutdown,
      shutdownTimeoutMs)
    catch { case e: Throwable =>
      spark.streams.removeListener(listener); throw e
    }
    listener.watch(p.underlying.id)
    val dog = new PipelineWatchdog(p, listener).start()
    p.registerCleanup { () =>
      dog.stop()
      spark.streams.removeListener(listener)
    }
    (p, listener, dog)
  }
}
