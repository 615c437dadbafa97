package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins both wire formats of `events.ts` through Tables.load (ADVICE r7):
  *
  *  - int64 nanos (what GenScale writes back for scale dirs, and what the
  *    legacy nanosAsLong conf surfaces for TIMESTAMP(NANOS) drops): the
  *    loader must return TimestampType with EXACT microsecond values via
  *    integer division — a double division would lose precision above
  *    2^53 ns (~104 days of epoch time), so the probe values sit far above
  *    that boundary.
  *  - native timestamp[us] (current driver drops): must pass through
  *    untouched.
  */
class TablesLoadSpec extends SparkSpecBase {
  import spark.implicits._

  // epoch-micros probes: all above 2^53 ns when scaled to nanos, plus an
  // odd-microsecond value whose last digit a lossy conversion would mangle
  private val micros = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1704067200123456L, // sub-second precision preserved
    1893456000999999L) // 2030-01-01 minus 1us: odd tail digit

  private def tmp(): String =
    Files.createTempDirectory("tables-load-spec").toString

  test("int64-nanos events (GenScale wire format) load as exact micros") {
    val dir = tmp()
    micros.map(us => (us * 1000L, us)).toDF("ts", "expected_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType,
      "nanos->micros branch must yield TimestampType")
    val rows = loaded
      .select(unix_micros(col("ts")).as("got_us"), col("expected_us"))
      .as[(Long, Long)].collect()
    rows.foreach { case (got, expect) =>
      assert(got == expect, s"nanos conversion drifted: $got != $expect")
    }
  }

  test("native timestamp[us] events pass through untouched") {
    val dir = tmp()
    micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), col("us").as("expected_us"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    val rows = loaded
      .select(unix_micros(col("ts")).as("got_us"), col("expected_us"))
      .as[(Long, Long)].collect()
    rows.foreach { case (got, expect) =>
      assert(got == expect, s"micros passthrough altered values: $got != $expect")
    }
  }

  test("tz-naive timestamp[us] (current driver drop) normalizes to TIMESTAMP") {
    // the current driver drop writes isAdjustedToUTC=false timestamps,
    // which Spark 4 infers as TIMESTAMP_NTZ; the loader must map them to
    // TimestampType at the SAME instant (session is UTC)
    val dir = tmp()
    micros.toDF("us")
      .select(timestamp_micros(col("us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
        col("us").as("expected_us"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // confirm the fixture really is NTZ on the wire
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)

    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    loaded.select(unix_micros(col("ts")).as("got_us"), col("expected_us"))
      .as[(Long, Long)].collect()
      .foreach { case (got, expect) => assert(got == expect) }
  }

  test("NTZ normalization covers non-events tables (o_orderdate-style)") {
    val dir = tmp()
    micros.toDF("us")
      .select(col("us").as("o_orderkey"), timestamp_micros(col("us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val loaded = Tables.load(spark, dir, "orders")
    assert(loaded.schema("o_orderdate").dataType == TimestampType)
    loaded.select(unix_micros(col("o_orderdate")).as("got"), col("o_orderkey"))
      .as[(Long, Long)].collect()
      .foreach { case (got, expect) => assert(got == expect) }
  }

  test("non-events tables take the plain parquet path (no ts rewrite)") {
    val dir = tmp()
    Seq((1L, 42L)).toDF("doc_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val loaded = Tables.load(spark, dir, "documents")
    assert(loaded.schema("ts").dataType == LongType,
      "only the events loader interprets ts")
  }
}
