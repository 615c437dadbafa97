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
                  options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", subscribe)
    options.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

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
}
