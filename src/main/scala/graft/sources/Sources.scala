package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the engine (SURVEY.md §2.1).
  *
  * The reference consumes exactly one source — Kafka (ConsumerThread.java:
  * 88-137) — and leaves sinks to user tasks. The Spark engine keeps that
  * split: [[kafkaStream]] builds the streaming read against the Kafka
  * connector (the standard `format("kafka")` options surface; the connector
  * jar is deployment-provided), [[kafkaShaped]] normalizes any frame with
  * the Kafka wire schema into the engine's record shape, and the batch
  * readers/writers cover the file formats pipelines dump to (S5).
  */
object Sources {

  /** Columns of Spark's Kafka source wire schema. */
  val KafkaSchemaColumns: Seq[String] = Seq(
    "key", "value", "topic", "partition", "offset",
    "timestamp", "timestampType", "headers")

  /** Streaming Kafka read — subscribe/assign pass through verbatim
    * (consumer.* passthrough mirrors WorkersConfig.java:299-322).
    * Requires the spark-sql-kafka connector on the cluster classpath. */
  def kafkaStream(spark: SparkSession, bootstrap: String,
                  subscribe: String,
                  options: Map[String, String] = Map.empty): DataFrame =
    wireStream(spark, "kafka",
      Map("kafka.bootstrap.servers" -> bootstrap, "subscribe" -> subscribe)
        ++ options)

  /** The same streaming read against any source speaking the Kafka wire
    * schema. In production that's `format("kafka")` (via [[kafkaStream]]);
    * in this jar-less sandbox the file-backed [[KafkaWire]] DSv2 source
    * (`format("kafka-wire")`) executes the identical subscribe/assign +
    * offset-range + rate-limit semantics, so the whole downstream pipeline
    * runs end-to-end either way. */
  def wireStream(spark: SparkSession, format: String,
                 options: Map[String, String]): DataFrame =
    options.foldLeft(spark.readStream.format(format)) {
      case (b, (k, v)) => b.option(k, v)
    }.load()

  /** Normalize a Kafka-wire-schema frame (streaming or batch) into the
    * engine shape: subKey = topic/partition/subpartition, string payload.
    * `subpartitions` mirrors WorkerPartitioner.count (P1): hash of the key
    * fans one Kafka partition out to n ordered sub-streams. */
  def kafkaShaped(df: DataFrame, subpartitions: Int = 1): DataFrame =
    df.withColumn("subpartition",
        pmod(hash(col("key")), lit(subpartitions)))
      .withColumn("subKey",
        concat_ws("/", col("topic"), col("partition"), col("subpartition")))
      .withColumn("ts", col("timestamp"))
      .withColumn("src", col("topic"))
      .withColumn("value_str", col("value").cast("string"))

  /** First value of a named Kafka header (WorkerRecord.headers accessor,
    * api/record/WorkerRecord.java:45-51): null when absent. */
  def headerValue(headers: org.apache.spark.sql.Column,
                  name: String): org.apache.spark.sql.Column =
    try_element_at(filter(headers, h => h.getField("key") === name), lit(1))
      .getField("value")

  /** Batch file readers (S5): parquet/json/csv/orc over a directory. */
  def read(spark: SparkSession, format: String, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv" => withSchema.option("header", "true").load(path)
      case _ => withSchema.load(path)
    }
  }

  /** Batch file writer; partitionBy columns control layout on disk —
    * at 100 TB, partition pruning starts here. */
  def write(df: DataFrame, format: String, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).mode("overwrite")
    val p = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    format match {
      case "csv" => p.option("header", "true").save(path)
      case _ => p.save(path)
    }
  }

  /** Compact a small-files parquet directory into ~`targetFileBytes` files
    * — the maintenance operator every streaming ingest needs: each
    * micro-batch writes a file per trigger per partition, and a year of
    * 1-second triggers is tens of millions of tiny files whose open/footer
    * costs dominate any later scan. Sizing comes from the actual on-disk
    * bytes (not a row-count guess); `sortBy` optionally range-clusters
    * rows while rewriting so min/max row-group stats become selective
    * (poor man's clustering — the rewrite is the cheap moment to buy
    * data-skipping). Returns the compacted file count.
    *
    * The writing stream MUST be stopped (or paused) for the duration: the
    * swap replaces the whole directory. Files that appear in `dir` after
    * the listing snapshot are detected and the compaction aborts rather
    * than silently destroying them. Crash safety: the original directory
    * is renamed aside and deleted only after the compacted directory has
    * taken its place, so no crash point loses data — the worst case leaves
    * the dataset at `dir_compact_old` with the compacted copy at
    * `dir_compact_tmp`, both intact. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024,
                     sortBy: Seq[String] = Nil): Int = {
    require(targetFileBytes > 0)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def snapshot(): Map[String, Long] = {
      val it = fs.listFiles(path, true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val s = it.next(); b += s.getPath.toString -> s.getLen }
      b.result()
    }

    val before = snapshot()
    val bytes = before.valuesIterator.sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir)
    val out =
      if (sortBy.nonEmpty)
        df.repartitionByRange(n, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(n)
    val tmp = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + "_compact_old")
    out.write.mode("overwrite").parquet(tmp.toString)
    if (snapshot() != before) {
      fs.delete(tmp, true)
      throw new graft.GraftException(
        s"$dir changed during compaction (concurrent writer?); aborted — " +
          "stop the ingest stream before compacting")
    }
    // swap: originals aside -> compacted in -> drop originals. Deletion
    // happens only after the compacted copy is live at the original path.
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new graft.GraftException(s"could not move $dir aside to $old")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore; best effort
      throw new graft.GraftException(s"could not move compacted $tmp into $dir")
    }
    fs.delete(old, true)
    n
  }
}
