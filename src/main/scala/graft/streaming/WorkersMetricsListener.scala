package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Metrics + watchdog listener mirroring the reference's observability
  * surface (impl/metrics/WorkersMetrics.java:36-71 sensor names, and the
  * processing-timeout watchdog of DefaultOffsetsState.java:222-256 /
  * ConsumerThread.java:228-231).
  *
  * Spark's StreamingQueryProgress already carries the per-operator numbers;
  * this listener re-keys the ones the reference names and tracks progress
  * staleness, since Spark has no per-record hang detection (SURVEY.md §7.3
  * hard part 4 — the semantic delta is documented there).
  */
class WorkersMetricsListener(val processingTimeoutMs: Long = 300000L,
                             watchId: Option[java.util.UUID] = None)
    extends StreamingQueryListener {

  /** metric name → value, reference-style names. */
  val metrics = new ConcurrentHashMap[String, Long]()
  @volatile var lastProgressAtMs: Long = System.currentTimeMillis()
  @volatile var terminated: Option[String] = None

  /** The query this listener watches. Listeners are registered
    * session-wide, so without a filter ANY query's progress would reset
    * the staleness clock and the watchdog could never fire while an
    * unrelated query kept progressing. Fixed via `watchId`, or adopted
    * from the first query that starts after registration. */
  @volatile private var _watchId: Option[java.util.UUID] = watchId

  /** Pin the watched query explicitly (overrides any adopted id) — used
    * by GraftPipeline.startWatched, which only learns the id after
    * start() returns. */
  def watch(id: java.util.UUID): Unit = { _watchId = Some(id) }

  private def watches(id: java.util.UUID): Boolean =
    _watchId.contains(id)

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    if (_watchId.isEmpty) _watchId = Some(e.id)
    if (watches(e.id)) metrics.put("worker-threads.started", 1L)
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    if (!watches(p.id)) return
    lastProgressAtMs = System.currentTimeMillis()
    metrics.put("consumed-offset.batch-id", p.batchId)
    metrics.put("input-records.poll-size", p.numInputRows)
    p.sources.zipWithIndex.foreach { case (s, i) =>
      metrics.put(s"consumer-thread.source-$i.input-rows", s.numInputRows)
    }
    p.stateOperators.zipWithIndex.foreach { case (op, i) =>
      metrics.put(s"queues-manager.state-$i.rows", op.numRowsTotal)
      metrics.put(s"queues-manager.state-$i.memory-bytes", op.memoryUsedBytes)
    }
    Option(p.eventTime.get("watermark")).foreach { wm =>
      metrics.put("offsets-state.watermark-ms",
        java.time.Instant.parse(wm).toEpochMilli)
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    if (!watches(e.id)) return
    terminated = Some(e.exception.getOrElse("graceful"))
    metrics.put("worker-threads.stopped", 1L)
  }

  /** Watchdog: true when no progress for longer than the processing
    * timeout — the query-level analog of ProcessingTimeoutException. */
  def stalled(nowMs: Long = System.currentTimeMillis()): Boolean =
    terminated.isEmpty && nowMs - lastProgressAtMs > processingTimeoutMs
}
