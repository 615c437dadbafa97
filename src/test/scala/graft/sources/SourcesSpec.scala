package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("file formats round-trip: parquet, json, csv, orc") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0))
      .toDF("id", "name", "score")
    for (fmt <- Seq("parquet", "json", "csv", "orc")) {
      Sources.write(df, fmt, s"$dir/$fmt")
      val back = Sources.read(spark, fmt, s"$dir/$fmt",
        schema = if (fmt == "csv" || fmt == "json")
          Some(df.schema) else None)
      val got = back.orderBy("id").as[(Long, String, Double)].collect().toSeq
      assert(got == Seq((1L, "alpha", 1.5), (2L, "beta", -2.0)), s"fmt=$fmt")
    }
  }

  test("partitioned write produces prunable layout") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"))
      .toDF("id", "v", "part")
    Sources.write(df, "parquet", s"$dir/t", partitionBy = Seq("part"))
    assert(new java.io.File(s"$dir/t/part=x").exists())
    val pruned = Sources.read(spark, "parquet", s"$dir/t")
      .filter(col("part") === "x")
    assert(pruned.count() == 2)
    // partition filter must show up as a PartitionFilter, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }

  test("kafkaShaped normalizes the wire schema and fans out subpartitions") {
    val df = Seq(
      ("k1".getBytes, "v1".getBytes, "t", 0, 0L,
        new java.sql.Timestamp(1000L), 0),
      ("k2".getBytes, "v2".getBytes, "t", 0, 1L,
        new java.sql.Timestamp(2000L), 0))
      .toDF("key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType")
    val r = Sources.kafkaShaped(df, subpartitions = 4)
    val rows = r.select("subKey", "subpartition", "value_str")
      .as[(String, Int, String)].collect()
    assert(rows.forall(t => t._2 >= 0 && t._2 < 4))
    assert(rows.forall(t => t._1 == s"t/0/${t._2}"))
    assert(rows.map(_._3).sorted.toSeq == Seq("v1", "v2"))
  }
}

class CompactionSpec extends graft.SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("compactParquet merges a small-files directory, content preserved") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate micro-batch dribble: 40 single-row files
    (0 until 40).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("append").parquet(dir)
    }
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 40)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val n = graft.sources.Sources.compactParquet(spark, dir,
      targetFileBytes = 1L << 30, sortBy = Seq("id"))
    assert(n == 1 && parquetFiles() == 1, s"expected 1 file")
    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after == before)
    // sortBy clustered the rewrite: rows come back in id order per file
    val ordered = spark.read.parquet(dir).select("id").as[Long].collect()
    assert(ordered.toSeq == ordered.sorted.toSeq)
    // the swap left no intermediate directories behind
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_compact_")),
      s"leftover swap dirs: ${parent.listFiles().map(_.getName).toSeq}")
    // idempotent: a second compaction of an already-compact dir is safe
    assert(graft.sources.Sources.compactParquet(spark, dir,
      targetFileBytes = 1L << 30) == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == after)
  }
}

class HeadersAndGuardsSpec extends graft.SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("headerValue extracts the first matching Kafka header") {
    val df = Seq(
      (1L, Seq(("trace", "abc".getBytes), ("lang", "en".getBytes))),
      (2L, Seq(("lang", "de".getBytes))),
      (3L, Seq.empty[(String, Array[Byte])]))
      .toDF("id", "headers")
      .select(col("id"), col("headers").cast(
        "array<struct<key:string,value:binary>>"))
    val r = df.select(col("id"),
        Sources.headerValue(col("headers"), "lang").cast("string").as("l"))
      .as[(Long, Option[String])].collect().toMap
    assert(r == Map(1L -> Some("en"), 2L -> Some("de"), 3L -> None))
  }

  test("invalid subpartition count raises BadSubpartitionException") {
    val df = Seq((1L, "k")).toDF("id", "key")
    intercept[graft.BadSubpartitionException] {
      graft.operators.Subpartitions.byKeyHash(df, col("key"), 0)
    }
    intercept[graft.BadSubpartitionException] {
      graft.operators.Subpartitions.roundRobin(df, col("key"), -1, col("id"))
    }
  }

  test("backpressure budget math matches the reference worked example") {
    import graft.streaming.Backpressure
    // README.md:231-245: 8 GiB heap, ratio 0.5 -> 4 GiB queue budget
    assert(Backpressure.maxBytesPerTrigger(8L << 30) == (4L << 30))
    assert(Backpressure.maxOffsetsPerTrigger(8L << 30, 1024) == (4L << 20))
    assert(Backpressure.kafkaRateOptions(8L << 30, 1024)
      ("maxOffsetsPerTrigger") == (4L << 20).toString)
  }
}
