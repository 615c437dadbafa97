package graft.streaming

import graft.ProcessingTimeoutException

/** Processing-timeout ENFORCEMENT — the reference's watchdog behavior
  * (impl/consumer/ConsumerThread.java:133-136 calls timeoutRecords() on
  * every commit cycle, and DefaultOffsetsState.timeoutRecordsConsumedBefore
  * throws ProcessingTimeoutException, which shuts the whole workers
  * instance down via shutdown(exception)).
  *
  * [[WorkersMetricsListener.stalled]] only *detects* staleness; this
  * monitor closes the loop: when the pipeline makes no progress for longer
  * than the listener's processing timeout, it forces
  * [[GraftPipeline.shutdown]] with a [[ProcessingTimeoutException]], which
  * terminates the query, lands the status machine in
  * ClosedNotGracefully(ProcessingTimeoutException), and hands the cause to
  * the ShutdownCallback — exactly the reference's observable outcome.
  */
final class PipelineWatchdog(pipeline: GraftPipeline,
                             listener: WorkersMetricsListener,
                             pollIntervalMs: Long = 1000L) {
  @volatile private var stopped = false
  private val thread = new Thread(() => run(), "graft-pipeline-watchdog")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }

  /** Cancel the watchdog (does not touch the pipeline). Idempotent. */
  def stop(): Unit = { stopped = true; thread.interrupt() }

  /** True while the monitor thread runs (test/diagnostic surface). */
  def isAlive: Boolean = thread.isAlive

  private def run(): Unit =
    try {
      while (!stopped && !pipeline.status.isTerminal) {
        if (listener.stalled()) {
          pipeline.shutdown(Some(new ProcessingTimeoutException(
            s"pipeline made no progress for over " +
              s"${listener.processingTimeoutMs} ms")))
          return
        }
        Thread.sleep(pollIntervalMs)
      }
    } catch { case _: InterruptedException => () }
}
