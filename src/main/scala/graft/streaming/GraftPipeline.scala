package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Pipeline lifecycle — the engine form of the reference's KafkaWorkers
  * status machine (api/KafkaWorkers.java:55-78, impl/KafkaWorkersImpl.java:
  * 101-228): start → STARTED, graceful close with a shutdown callback, and
  * a terminal status distinguishing graceful from failed.
  *
  * Spark's StreamingQuery already is that machine; this wrapper pins the
  * reference's API names to it and wires the ShutdownCallback hook
  * (api/ShutdownCallback.java:6-19) through `awaitShutdown`.
  */
final class GraftPipeline private (query: StreamingQuery,
                                   onShutdown: Option[Throwable] => Unit) {

  sealed trait Status
  case object Started extends Status
  case object ClosedGracefully extends Status
  final case class ClosedNotGracefully(cause: Throwable) extends Status

  def status: Status =
    if (query.isActive) Started
    else Option(query.exception.orNull)
      .map(e => ClosedNotGracefully(e)).getOrElse(ClosedGracefully)

  /** Block until the pipeline terminates; fire the shutdown callback with
    * the failure cause (None = graceful), mirroring
    * KafkaWorkersImpl.close():213-215. */
  def awaitShutdown(): Status = {
    try query.awaitTermination()
    catch { case _: Throwable => () }
    val s = status
    onShutdown(s match {
      case ClosedNotGracefully(e) => Some(e)
      case _ => None
    })
    s
  }

  /** Graceful two-phase stop (KafkaWorkersImpl.close():148-228): stop the
    * query, then report through the callback. */
  def shutdown(): Status = {
    query.stop()
    awaitShutdown()
  }

  def underlying: StreamingQuery = query
}

object GraftPipeline {

  /** Start a pipeline: transformed stream → sink writer, with checkpoint
    * (the at-least-once guarantee, G1) and a processing-time trigger floor
    * (keeps punctuation timers firing, SURVEY.md §7.3). */
  def start(writer: DataStreamWriter[Row], checkpointDir: String,
            triggerInterval: String = "1 second",
            onShutdown: Option[Throwable] => Unit = _ => ()): GraftPipeline =
    new GraftPipeline(
      writer
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.ProcessingTime(triggerInterval))
        .start(),
      onShutdown)

  /** Start from a frame with a foreachBatch body (the user "task"). */
  def foreachBatch(df: DataFrame, checkpointDir: String,
                   triggerInterval: String = "1 second",
                   onShutdown: Option[Throwable] => Unit = _ => ())(
                    body: (DataFrame, Long) => Unit): GraftPipeline =
    start(df.writeStream.foreachBatch(body), checkpointDir, triggerInterval,
      onShutdown)
}
