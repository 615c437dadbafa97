package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet from
  * it; the same code path would read a 100 TB partitioned table on a real
  * cluster (spark.read.parquet over a directory tree), so nothing here is
  * local-mode specific.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts arrives in two wire formats: parquet TIMESTAMP(NANOS)
      // (earlier driver drops and GenScale's int64-nanos scale dirs) and
      // native TIMESTAMP(MICROS) (current driver drops). With the legacy
      // conf on, a NANOS column reads as long — convert with exact integer
      // division (a double division would lose precision above 2^53 ns) —
      // while a MICROS column reads as a timestamp already and must pass
      // through untouched.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so SQL-form queries work too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
