package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.SparkSpecBase
import graft.streaming.{StreamingMerge, SubRecord}

/** The S1-S3 semantics executed end-to-end against the file-backed
  * kafka-wire DSv2 source — the broker-less stand-in for the connector
  * (see KafkaWireSource.scala scaladoc). The golden sequence is the
  * reference's MergerTest (integration/MergerTest.java:88-134), replayed
  * here SOURCE-DRIVEN (subscribe -> offset-range batches -> merge),
  * not via MemoryStream. */
class KafkaWireSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("kafka-wire-spec").toString

  // ---------- codec + offsets units ----------

  test("line codec round-trips nulls, empties, and binary payloads") {
    val cases = Seq(
      (1000L, 0, null, null, null),
      (2000L, 1, Array[Byte](), "v".getBytes, Seq.empty[(String, Array[Byte])]),
      (3000L, 0, "k\tx\n".getBytes, Array[Byte](0, -1, 9, 10, 13),
        Seq("trace" -> Array[Byte](1, 2), "e=t;" -> "x".getBytes)))
    for ((ts, tt, k, v, h) <- cases) {
      val (ts2, tt2, k2, v2, h2) = KafkaWire.decodeLine(
        KafkaWire.encodeLine(ts, tt, k, v, h))
      assert(ts2 == ts && tt2 == tt)
      assert((k2 == null) == (k == null) && (k == null || k2.sameElements(k)))
      assert((v2 == null) == (v == null) && (v == null || v2.sameElements(v)))
      assert((h2 == null) == (h == null))
      if (h != null) {
        assert(h2.map(_._1) == h.map(_._1))
        assert(h2.zip(h).forall { case ((_, a), (_, b)) => a.sameElements(b) })
      }
    }
  }

  test("offsets json round-trips and is deterministically ordered") {
    val m = Map(("tb", 1) -> 7L, ("ta", 0) -> 5L, ("ta", 2) -> 0L)
    val json = KafkaWire.offsetsJson(m)
    assert(json == """{"ta":{"0":5,"2":0},"tb":{"1":7}}""")
    assert(KafkaWire.parseOffsetsJson(json) == m)
  }

  test("maxOffsetsPerTrigger apportions rows proportional to lag") {
    val root = freshRoot()
    for (i <- 0 until 8) KafkaWireLog.sendStr(root, "t", 0, 1000L + i, null, s"a$i")
    for (i <- 0 until 2) KafkaWireLog.sendStr(root, "t", 1, 2000L + i, null, s"b$i")
    val stream = new KafkaWireMicroBatchStream(root,
      new CaseInsensitiveStringMap(java.util.Map.of("path", root)),
      () => Seq("t" -> 0, "t" -> 1))
    val start = new KafkaWireOffset(Map(("t", 0) -> 0L, ("t", 1) -> 0L))
    // proportional: lag 8:2, budget 5 -> 4 + 1
    val o5 = stream.latestOffset(start, ReadLimit.maxRows(5))
      .asInstanceOf[KafkaWireOffset].offsets
    assert(o5 == Map(("t", 0) -> 4L, ("t", 1) -> 1L))
    // budget below partition count: round-robin remainder still progresses
    val o1 = stream.latestOffset(start, ReadLimit.maxRows(1))
      .asInstanceOf[KafkaWireOffset].offsets
    assert(o1.values.sum == 1L)
    // budget >= total lag: take everything
    val oAll = stream.latestOffset(start, ReadLimit.maxRows(100))
      .asInstanceOf[KafkaWireOffset].offsets
    assert(oAll == Map(("t", 0) -> 8L, ("t", 1) -> 2L))
    // startingOffsets=latest snapshots current ends
    val latest = new KafkaWireMicroBatchStream(root,
      new CaseInsensitiveStringMap(
        java.util.Map.of("path", root, "startingOffsets", "latest")),
      () => Seq("t" -> 0, "t" -> 1))
      .initialOffset().asInstanceOf[KafkaWireOffset].offsets
    assert(latest == Map(("t", 0) -> 8L, ("t", 1) -> 2L))
  }

  // ---------- batch read: wire schema, headers, assign ----------

  test("batch read exposes the exact Kafka wire schema and header access") {
    val root = freshRoot()
    KafkaWireLog.send(root, "t", 0, 1234L, "k0".getBytes, "v0".getBytes,
      headers = Seq("et" -> "click".getBytes, "src" -> "web".getBytes))
    KafkaWireLog.send(root, "t", 1, 5678L, null, "v1".getBytes)
    val df = spark.read.format("kafka-wire")
      .option("path", root).option("subscribe", "t").load()
    assert(df.columns.toSeq == Sources.KafkaSchemaColumns)
    assert(df.schema == KafkaWire.schema)
    val rows = df.select(col("topic"), col("partition"), col("offset"),
        unix_millis(col("timestamp")).as("ms"),
        col("key").cast("string"), col("value").cast("string"),
        Sources.headerValue(col("headers"), "et").cast("string").as("et"),
        Sources.headerValue(col("headers"), "absent").as("missing"))
      .collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq("t", 0, 0L, 1234L, "k0", "v0", "click", null),
      Seq("t", 1, 0L, 5678L, null, "v1", null, null)))
    // assign: only the named partition
    val p1 = spark.read.format("kafka-wire")
      .option("path", root).option("assign", "t:1").load()
    assert(p1.select("partition").as[Int].collect().toSeq == Seq(1))
    // kafkaShaped runs verbatim on the wire frame
    val shaped = Sources.kafkaShaped(df, subpartitions = 4)
    assert(shaped.select("subKey").as[String].collect()
      .forall(_.matches("t/[01]/[0-3]")))
  }

  // ---------- the golden sequence, source-driven ----------

  private def shapedStream(root: String, topic: String): Dataset[SubRecord] =
    Sources.wireStream(spark, "kafka-wire",
        Map("path" -> root, "subscribe" -> topic))
      .select(concat(lit("p"), col("partition")).as("subKey"),
        col("timestamp").as("ts"), col("topic").as("src"),
        col("value").cast("string").as("value"))
      .as[SubRecord]

  test("golden merge: MergerTest sequence through the source, not MemoryStream") {
    val root = freshRoot()
    KafkaWireLog.createTopics(root, 2, "topic_one", "topic_two")
    // the exact produce order of MergerTest.java:88-134 (null key/value;
    // explicit timestamps; partition-1 interleavings included)
    def p(t: String, part: Int, ts: Long): Unit =
      KafkaWireLog.sendStr(root, t, part, ts, null, s"v$ts")
    Seq(("topic_one", 0, 10000L), ("topic_one", 0, 50000L),
      ("topic_one", 0, 70000L), ("topic_one", 0, 130000L),
      ("topic_one", 0, 150000L), ("topic_one", 1, 40000L),
      ("topic_one", 1, 90000L), ("topic_two", 0, 30000L),
      ("topic_two", 0, 90000L), ("topic_two", 0, 110000L),
      ("topic_two", 0, 120000L), ("topic_two", 0, 140000L),
      ("topic_one", 1, 20000L), ("topic_one", 1, 200000L))
      .foreach { case (t, part, ts) => p(t, part, ts) }

    val merged = StreamingMerge.orderedEmit(StreamingMerge.gatedUnion(
      "0 seconds", shapedStream(root, "topic_one"),
      shapedStream(root, "topic_two")))
    val q = merged.writeStream.format("memory").queryName("kw_merged")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark ticks: advance topic_two (the gate) past everything,
      // then once more so event-time timeouts flush the held state
      p("topic_two", 0, 210000L); p("topic_one", 0, 210000L)
      q.processAllAvailable()
      p("topic_two", 0, 210001L); p("topic_one", 0, 210001L)
      q.processAllAvailable()

      val got = spark.table("kw_merged").as[SubRecord].collect()
        .filter(_.subKey == "p0").map(_.ts.getTime).toSeq
      val golden = Seq(10000L, 30000L, 50000L, 70000L, 90000L,
        110000L, 120000L, 130000L, 140000L)
      // the reference's expected output for output partition 0
      assert(got.take(golden.length) == golden, s"merged prefix mismatch: $got")
      assert(got == got.sorted, s"emission out of order: $got")
      // 150000 was gated until the OTHER topic advanced past it — it may
      // only ever appear after the golden prefix
      assert(!got.take(golden.length).contains(150000L))
    } finally q.stop()
  }

  // ---------- checkpoint resume ----------

  test("checkpoint-resume: restart continues from committed offsets, exactly once") {
    val root = freshRoot()
    val out = Files.createTempDirectory("kw-out").toString
    val ckpt = Files.createTempDirectory("kw-ckpt").toString
    KafkaWireLog.createTopics(root, 2, "t")
    for (i <- 0 until 5)
      KafkaWireLog.sendStr(root, "t", i % 2, 1000L + i, s"k$i", s"v$i")

    def run(): Unit = {
      val q = spark.readStream.format("kafka-wire")
        .option("path", root).option("subscribe", "t").load()
        .select(col("partition"), col("offset"), col("value").cast("string"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    assert(spark.read.parquet(out).count() == 5)
    // more records arrive while the query is DOWN; restart must pick up
    // from the committed offsets — no replays, no gaps
    for (i <- 5 until 12)
      KafkaWireLog.sendStr(root, "t", i % 2, 1000L + i, s"k$i", s"v$i")
    run()
    val rows = spark.read.parquet(out)
      .select("partition", "offset", "value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows.size == 12, s"expected 12 exactly-once rows, got ${rows.size}")
    assert(rows.distinct.size == 12, "replayed duplicates after restart")
    assert(rows.map(_._3).toSet == (0 until 12).map(i => s"v$i").toSet)
  }

  test("rate limit bounds every micro-batch; subscribe discovers new partitions") {
    val root = freshRoot()
    KafkaWireLog.createTopics(root, 1, "t")
    for (i <- 0 until 10)
      KafkaWireLog.sendStr(root, "t", 0, 1000L + i, null, s"v$i")
    val q = spark.readStream.format("kafka-wire")
      .option("path", root).option("subscribe", "t")
      .option("maxOffsetsPerTrigger", "3").load()
      .writeStream.format("memory").queryName("kw_rate").start()
    try {
      q.processAllAvailable()
      val sizes = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
      assert(sizes.forall(_ <= 3), s"a batch exceeded the limit: $sizes")
      assert(sizes.sum == 10 && sizes.size >= 4,
        s"expected >=4 capped batches totalling 10 rows: $sizes")
      // a partition created AFTER the stream started is picked up by the
      // next batch's discovery, reading from its earliest offset
      KafkaWireLog.createTopics(root, 2, "t")
      KafkaWireLog.sendStr(root, "t", 1, 5000L, null, "late-partition")
      q.processAllAvailable()
      val vals = spark.table("kw_rate").select("value").as[Array[Byte]]
        .collect().map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      assert(vals.contains("late-partition"))
      assert(vals.length == 11)
    } finally q.stop()
  }
}
