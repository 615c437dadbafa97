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
    val raw = if (name == "events") {
      // events.ts arrives in several wire formats: parquet TIMESTAMP(NANOS)
      // (earlier driver drops and GenScale's int64-nanos scale dirs) and
      // timestamp[us] (current driver drops). With the legacy conf on, a
      // NANOS column reads as long — convert with exact integer division
      // (a double division would lose precision above 2^53 ns) — while a
      // MICROS column reads as a timestamp already.
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
    // Timezone-NAIVE parquet timestamps (isAdjustedToUTC=false, what the
    // current driver drop writes for events.ts / o_orderdate / l_shipdate)
    // read as TIMESTAMP_NTZ under Spark 4's NTZ inference, which rejects
    // unix_micros(), numeric casts, and mixed comparisons the engine and
    // its DuckDB oracles rely on. The session is pinned UTC (GraftSession),
    // so casting NTZ -> TIMESTAMP maps the wall-clock to the identical
    // instant DuckDB sees when it reads the same naive column.
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(f.name, df.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    }
  }

  /** Register every table as a temp view so SQL-form queries work too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
