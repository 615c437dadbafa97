package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Punctuation driven by a HEARTBEAT stream — the reference's
    * punctuate-on-idle semantics executed for real
    * (impl/punctuator/PunctuatorThread.java:14-47 fires on wall-clock even
    * when no records flow; integration PunctuateTest.java:70-109 pins 5
    * punctuations in 10 s with zero records mid-window). Spark's
    * ProcessingTimeTimeout only evaluates timers when a micro-batch RUNS,
    * so a truly idle source + a data-driven trigger would starve the
    * timers; unioning a heartbeat topic (one tick row per interval through
    * the kafka-wire source — [[Heartbeat.start]] is the producer) keeps
    * batches flowing whenever the pipeline is idle. Heartbeat rows group
    * under their own reserved key, so data keys' `seen` counts are
    * untouched, and the heartbeat's own punctuations are filtered out. */
  def punctuateWithHeartbeat(data: Dataset[SubRecord],
                             heartbeat: Dataset[SubRecord],
                             intervalMs: Long): Dataset[Punctuation] =
    punctuate(data.unionByName(heartbeat), intervalMs)
      .filter(_.subKey != Heartbeat.Key)
}

/** Heartbeat topic plumbing: a producer thread appending one tick per
  * interval to a kafka-wire topic, and the reader shaping those ticks as
  * [[SubRecord]]s under the reserved key. On a real cluster the same two
  * pieces are a 1-partition Kafka topic + any scheduled producer. */
object Heartbeat {

  /** Reserved grouping key for heartbeat rows — excluded from punctuation
    * output and never a legal user subKey. */
  val Key = "__heartbeat__"

  /** Read the heartbeat topic through the wire source as SubRecords. */
  def subRecords(spark: SparkSession, root: String,
                 topic: String): Dataset[SubRecord] = {
    implicit val enc = Encoders.product[SubRecord]
    spark.readStream.format("kafka-wire")
      .option("path", root).option("subscribe", topic).load()
      .select(lit(Key).as("subKey"), col("timestamp").as("ts"),
        lit(topic).as("src"), col("value").cast("string").as("value"))
      .as[SubRecord]
  }

  /** Start a daemon producer appending one tick every `intervalMs` to
    * partition 0 of `topic`. Returns a handle; close() stops the thread. */
  def start(root: String, topic: String, intervalMs: Long): AutoCloseable = {
    require(intervalMs > 0, "need intervalMs > 0")
    graft.sources.KafkaWireLog.createTopics(root, 1, topic)
    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val t = new Thread(() => {
      var i = 0L
      while (running.get()) {
        graft.sources.KafkaWireLog.sendStr(root, topic, 0,
          System.currentTimeMillis(), null, i.toString)
        i += 1
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
      }
    }, s"graft-heartbeat-$topic")
    t.setDaemon(true)
    t.start()
    new AutoCloseable {
      override def close(): Unit = { running.set(false); t.interrupt() }
    }
  }
}
