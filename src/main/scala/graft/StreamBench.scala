package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Subpartitions
import graft.functions.RecordWeigher

/** Streaming throughput benchmark — the missing half of Bench for a
  * streaming reference: sustained records/second through reference-shaped
  * topologies under Structured Streaming's micro-batch engine at
  * local[CPUS].
  *
  * The reference publishes no throughput numbers (BASELINE.md) — its
  * steady state is bounded by a single Kafka consumer thread feeding
  * worker threads (ConsumerThread.java poll loop; worker.threads.num
  * default 1). This artifact records what the Spark engine sustains on one
  * node for the same topology shapes, so the single-node comparison is a
  * measured number against a design bound instead of guess vs guess.
  *
  * Three topologies, in reference terms:
  *  - worker: accept() gate → murmur2 subpartitioner → process() map →
  *    record weigher — the stateless per-record worker loop
  *    (WorkerTask.java accept/process, RecordWeigher). Fully codegen,
  *    zero state, zero shuffle: the sink aggregates the derived columns
  *    so nothing is prunable, without measuring a disk.
  *  - punctuate: watermark + 1 s event-time windows per subpartition —
  *    the punctuate(interval) timer surface as a stateful windowed agg.
  *  - dedup: watermarked dropDuplicates over a key stream with ~50%
  *    repeats — streaming exact dedup, the KV-state shape (training-data
  *    intake's first stage).
  *
  * The source is `rate-micro-batch` (deterministic rowsPerBatch, event
  * time advancing 1 s per batch so windows close and state evicts — the
  * steady state, not an ever-growing store). Throughput counts batches
  * after the first two (codegen + state-store warmup) over their summed
  * triggerExecution time. One compact JSON line on stdout; full JSON to
  * STREAMBENCH.json.
  */
object StreamBench {

  private def syntheticEvents(spark: SparkSession, rowsPerBatch: Long,
                              partitions: Int): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", partitions)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000)
      .load()
      // WorkerRecord-ish fields derived deterministically from `value`
      .select(col("timestamp").as("ts"), col("value"),
        concat(lit("user_"), (col("value") % 100000)).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("cart"),
          lit("purchase")), (col("value") % 4 + 1).cast("int"))
          .as("event_type"),
        concat(lit("payload_"), conv(col("value") % 1000000, 10, 16))
          .as("payload"))

  /** accept → subpartition (bit-exact Kafka murmur2) → process → weigh. */
  private def workerTopology(events: DataFrame, nSub: Int): DataFrame = {
    val accepted = events.filter(col("event_type") =!= "view") // accept()
    val subbed = Subpartitions.byKeyHash(accepted, col("user_id"), nSub,
      kafkaCompatible = true)
    subbed // process(): per-record derivations, all codegen
      .withColumn("key_hash", xxhash64(col("user_id"), col("event_type")))
      .withColumn("is_sale", (col("event_type") === "purchase").cast("int"))
      .withColumn("pay_len", length(col("payload")))
      .withColumn("weight", RecordWeigher.recordWeight(
        col("user_id"), col("payload"), lit("events")))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rowsPerBatch =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "2000000").toLong
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "12").toInt
    val spark = GraftSession.local(cpus, "graft-streambench")
    spark.sparkContext.setLogLevel("WARN")

    def measure(name: String, build: DataFrame => DataFrame,
                sinkAgg: DataFrame => Unit): (String, Double, Long) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"streambench-$name").toString
      val out = build(syntheticEvents(spark, rowsPerBatch, cpus))
      val q: StreamingQuery = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) => sinkAgg(b) }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        while (Option(q.lastProgress).forall(_.batchId < batches) &&
               q.isActive)
          Thread.sleep(100)
      } finally q.stop()
      q.awaitTermination()
      // steady state: drop batches 0-1 (codegen + state warmup)
      val steady = q.recentProgress.toSeq
        .filter(p => p.batchId >= 2 && p.batchId <= batches &&
          p.numInputRows > 0)
      val rows = steady.map(_.numInputRows).sum
      val ms = steady.map(_.durationMs.get("triggerExecution").toLong).sum
      val rps = if (ms > 0) rows * 1000.0 / ms else 0.0
      println(f"[streambench] $name%-9s ${rps / 1e6}%.2f M rec/s " +
        f"($rows rows over ${steady.size} steady batches, $ms ms)")
      (name, rps, rows)
    }

    // sink aggregations touch every derived column so column pruning
    // cannot hollow out the measured work
    val results = Seq(
      measure("worker", workerTopology(_, nSub = 64), b =>
        b.agg(sum("weight"), expr("bit_xor(key_hash)"), sum("is_sale"),
          sum("pay_len"), sum("subpartition")).collect()),
      measure("punctuate", ev => ev
        .withWatermark("ts", "2 seconds")
        .groupBy(window(col("ts"), "1 second"),
          pmod(hash(col("user_id")), lit(64)).as("subpartition"))
        .agg(count(lit(1)).as("seen"), sum(length(col("payload"))).as("bytes")),
        b => b.agg(sum("seen"), sum("bytes")).collect()),
      measure("dedup", ev => ev
        // ~50% duplicate keys: value % (rowsPerBatch/2) repeats within
        // the batch, watermark bounds the state
        .withColumn("dedup_key", col("value") % lit(rowsPerBatch / 2))
        .withWatermark("ts", "2 seconds")
        .dropDuplicatesWithinWatermark("dedup_key"),
        b => b.agg(count(lit(1)), sum(length(col("payload")))).collect()),
    )

    val json = results.map { case (n, rps, rows) =>
      f""""$n":{"rows_per_sec":$rps%.0f,"rows":$rows}"""
    }.mkString(
      s"""{"metric":"stream_throughput","cpus":$cpus,""" +
        s""""rows_per_batch":$rowsPerBatch,"batches":$batches,""",
      ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMBENCH.json"), json)
    println(json)
    spark.stop()
  }
}
