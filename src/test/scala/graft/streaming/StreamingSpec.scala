package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

class StreamingMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def rec(ts: Long, src: String) =
    SubRecord("p0", new Timestamp(ts), src, s"v$ts")

  test("golden merge: reference MergerTest sequence, watermark-gated") {
    // MergerTest.java:88-134: topic1 = [10000,50000,90000,130000],
    // topic2 = [30000,70000,110000,120000,140000]; merged output must be
    // ascending by timestamp, each record released only once the OTHER
    // stream's watermark passed it.
    val s1 = MemoryStream[SubRecord](spark)
    val s2 = MemoryStream[SubRecord](spark)
    val merged = StreamingMerge.orderedEmit(
      StreamingMerge.gatedUnion("0 seconds", s1.toDS(), s2.toDS()))
    val q = merged.writeStream.format("memory").queryName("merged_out")
      .outputMode("append").start()
    try {
      // phase 1: stream1 complete, stream2 only up to 70000
      s1.addData(Seq(10000L, 50000L, 90000L, 130000L).map(rec(_, "t1")))
      s2.addData(Seq(30000L, 70000L).map(rec(_, "t2")))
      q.processAllAvailable()
      // phase 2: rest of stream2 arrives; prior watermark min(130000,70000)
      s2.addData(Seq(110000L, 120000L, 140000L).map(rec(_, "t2")))
      q.processAllAvailable()
      // extra ticks so the new watermark propagates + event timeouts fire
      s1.addData(rec(200000L, "t1")); s2.addData(rec(200000L, "t2"))
      q.processAllAvailable()
      s1.addData(rec(200001L, "t1")); s2.addData(rec(200001L, "t2"))
      q.processAllAvailable()

      val got = spark.table("merged_out").as[SubRecord]
        .collect().map(_.ts.getTime).toSeq
      // all of the golden prefix released (140000 needs wm >= 140000 =
      // min of both streams' 200000-base watermarks in the tick phase)
      val golden = Seq(10000L, 30000L, 50000L, 70000L, 90000L,
        110000L, 120000L, 130000L, 140000L)
      assert(got.take(golden.length) == golden,
        s"merged prefix mismatch: $got")
      // emission order ascending throughout
      assert(got == got.sorted)
    } finally q.stop()
  }

  test("three-way merge: the laggiest of n streams gates all emission") {
    // the reference merges exactly two topics; the watermark formulation
    // generalizes to n inputs for free (query watermark = min over all
    // watermark nodes) — prove it with three
    val s1 = MemoryStream[SubRecord](spark)
    val s2 = MemoryStream[SubRecord](spark)
    val s3 = MemoryStream[SubRecord](spark)
    val merged = StreamingMerge.orderedEmit(
      StreamingMerge.gatedUnion("0 seconds", s1.toDS(), s2.toDS(), s3.toDS()))
    val q = merged.writeStream.format("memory").queryName("merge3_out")
      .outputMode("append").start()
    try {
      s1.addData(rec(100000L, "a"), rec(400000L, "a"))
      s2.addData(rec(150000L, "b"), rec(450000L, "b"))
      s3.addData(rec(20000L, "c"))   // laggiest input
      q.processAllAvailable()
      s1.addData(rec(400001L, "a")); s2.addData(rec(450001L, "b"))
      s3.addData(rec(20001L, "c"))
      q.processAllAvailable()
      val got = spark.table("merge3_out").as[SubRecord]
        .collect().map(_.ts.getTime).toSeq
      assert(got.forall(_ <= 20001L), s"gate leaked past stream 3: $got")
      assert(got == got.sorted, s"emission out of order: $got")
      // release: stream 3 catches up past everything -> full ordered merge
      s3.addData(rec(500000L, "c"))
      q.processAllAvailable()
      s1.addData(rec(500001L, "a")); s2.addData(rec(500001L, "b"))
      s3.addData(rec(500001L, "c"))
      q.processAllAvailable()
      val all = spark.table("merge3_out").as[SubRecord]
        .collect().map(_.ts.getTime).toSeq
      assert(all.take(6) == Seq(20000L, 20001L, 100000L, 150000L,
        400000L, 400001L), s"merged prefix wrong: $all")
    } finally q.stop()
  }

  test("lagging stream holds the gate (per-input watermarks)") {
    val s1 = MemoryStream[SubRecord](spark)
    val s2 = MemoryStream[SubRecord](spark)
    val merged = StreamingMerge.orderedEmit(
      StreamingMerge.gatedUnion("0 seconds", s1.toDS(), s2.toDS()))
    val q = merged.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      s1.addData(rec(100000L, "a"), rec(500000L, "a"))
      s2.addData(rec(50000L, "b"))   // lagging stream: wm stays at 50000
      q.processAllAvailable()
      s1.addData(rec(500001L, "a")); s2.addData(rec(50001L, "b"))
      q.processAllAvailable()
      val got = spark.table("gate_out").as[SubRecord].collect().map(_.ts.getTime)
      // nothing above stream2's watermark may be emitted
      assert(got.forall(_ <= 50001L), s"gate leaked: ${got.toSeq}")
    } finally q.stop()
  }
}

class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact dedup within watermark window") {
    val s = MemoryStream[SubRecord](spark)
    val out = StreamingDedup.exact(s.toDF(), $"value", "ts", "1 minute")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      s.addData(
        SubRecord("k", new Timestamp(t0), "a", "same-payload"),
        SubRecord("k", new Timestamp(t0 + 1000), "a", "same-payload"),
        SubRecord("k", new Timestamp(t0 + 2000), "a", "other-payload"))
      q.processAllAvailable()
      val vals = spark.table("dedup_out").as[SubRecord]
        .collect().map(_.value).sorted.toSeq
      assert(vals == Seq("other-payload", "same-payload"))
    } finally q.stop()
  }
}

class StreamingRoundRobinSpec extends SparkSpecBase {
  import spark.implicits._

  test("per-partition counter continues across micro-batches (reference semantics)") {
    val s = MemoryStream[SubRecord](spark)
    val out = StreamingRoundRobin.assign(s.toDS(), n = 4)
    val q = out.writeStream.format("memory").queryName("rr_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def rec(src: String, i: Int) =
        SubRecord("k", new Timestamp(t0 + i * 1000), src, f"v$i%03d")
      // batch 1: three records on partition p0, two on p1
      s.addData(rec("p0", 0), rec("p0", 1), rec("p0", 2),
        rec("p1", 0), rec("p1", 1))
      q.processAllAvailable()
      // batch 2: two more on p0 — counter must RESUME at 3, not restart
      s.addData(rec("p0", 3), rec("p0", 4))
      q.processAllAvailable()
      val got = spark.table("rr_out").as[AssignedRecord].collect()
      val p0 = got.filter(_.src == "p0").sortBy(_.value)
        .map(_.subpartition).toSeq
      val p1 = got.filter(_.src == "p1").sortBy(_.value)
        .map(_.subpartition).toSeq
      assert(p0 == Seq(0, 1, 2, 3, 0), s"p0 got $p0") // 3 % 4 = 3, 4 % 4 = 0
      assert(p1 == Seq(0, 1), s"p1 got $p1")          // independent counter
    } finally q.stop()
  }

  test("rejects non-positive subpartition count") {
    val s = MemoryStream[SubRecord](spark)
    intercept[graft.BadSubpartitionException] {
      StreamingRoundRobin.assign(s.toDS(), n = 0)
    }
  }
}

class PunctuatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("punctuation fires for a key after the interval, without new data") {
    val s = MemoryStream[SubRecord](spark)
    val out = Punctuator.punctuate(s.toDS(), intervalMs = 300)
    // NB: with ProcessingTimeTimeout the engine schedules timer batches
    // forever, so processAllAvailable() would never observe quiescence —
    // poll the sink with a deadline instead.
    val q = out.writeStream.format("memory").queryName("punct_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      s.addData(SubRecord("k1", new Timestamp(1000L), "a", "v"))
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("punct_out").count() == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val keys = spark.table("punct_out").as[Punctuation]
        .collect().map(_.subKey).toSet
      assert(keys.contains("k1"), s"expected punctuation for k1, got $keys")
    } finally q.stop()
  }

  test("punctuation keeps cadence: repeated ticks without input (PunctuateTest)") {
    // the reference's PunctuateTest pins N punctuations inside a window
    // with NO further input; mirror the observable: >= 3 ticks for the
    // key, strictly increasing timestamps, spaced >= half the interval
    // (scheduling jitter tolerated, cadence not)
    val s = MemoryStream[SubRecord](spark)
    val out = Punctuator.punctuate(s.toDS(), intervalMs = 300)
    val q = out.writeStream.format("memory").queryName("punct_cadence")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      s.addData(SubRecord("k1", new Timestamp(1000L), "a", "v"))
      val deadline = System.currentTimeMillis() + 60000
      def ticks() = spark.table("punct_cadence").as[Punctuation]
        .collect().filter(_.subKey == "k1").map(_.punctuateTimeMs).sorted
      while (ticks().length < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val ts = ticks()
      assert(ts.length >= 3, s"only ${ts.length} punctuations in 60s")
      ts.sliding(2).foreach { case Array(a, b) =>
        assert(b > a && b - a >= 150,
          s"cadence broken: ticks at ${ts.mkString(",")}")
      }
    } finally q.stop()
  }

  test("heartbeat topic drives idle-window punctuation (PunctuateTest, " +
      "no trigger clock)") {
    // the reference fires punctuate on wall-clock even when idle
    // (PunctuatorThread.java:14-47); PunctuateTest.java:70-109 pins 5
    // punctuations in 10 s with NO records mid-window. Here the batches
    // that evaluate the timers are driven by REAL rows from a heartbeat
    // topic through the kafka-wire source — the default data-available
    // trigger, no Trigger.ProcessingTime floor standing in for the
    // punctuator thread.
    val root = java.nio.file.Files.createTempDirectory("hb").toString
    val hbWriter = Heartbeat.start(root, "hb", intervalMs = 150)
    val data = MemoryStream[SubRecord](spark)
    val out = Punctuator.punctuateWithHeartbeat(
      data.toDS(), Heartbeat.subRecords(spark, root, "hb"), intervalMs = 300)
    val q = out.writeStream.format("memory").queryName("punct_hb")
      .outputMode("append").start() // default trigger: data-driven batches
    try {
      // ONE data record, then silence — every batch after this is
      // heartbeat-driven
      data.addData(SubRecord("k1", new Timestamp(1000L), "a", "v"))
      val deadline = System.currentTimeMillis() + 60000
      def punct() = spark.table("punct_hb").as[Punctuation]
        .collect().toSeq
      while (punct().count(_.subKey == "k1") < 5 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val all = punct()
      val ticks = all.filter(_.subKey == "k1").map(_.punctuateTimeMs).sorted
      assert(ticks.length >= 5,
        s"PunctuateTest cadence: only ${ticks.length} punctuations in 60s")
      ticks.sliding(2).foreach { case Seq(a, b) =>
        assert(b > a && b - a >= 150,
          s"cadence broken: ticks at ${ticks.mkString(",")}")
      }
      // no data records arrived mid-window: k1's seen count stays 1
      assert(all.filter(_.subKey == "k1").forall(_.seenRecords == 1L),
        s"unexpected data records counted: $all")
      // the heartbeat's own key never reaches the output
      assert(!all.exists(_.subKey == Heartbeat.Key), s"heartbeat leaked: $all")
    } finally { q.stop(); hbWriter.close() }
  }
}

class ListenerSpec extends SparkSpecBase {
  import spark.implicits._

  test("WorkersMetricsListener captures progress + watchdog semantics") {
    val listener = new WorkersMetricsListener(processingTimeoutMs = 60000L)
    spark.streams.addListener(listener)
    val s = MemoryStream[SubRecord](spark)
    val q = s.toDS().writeStream.format("memory").queryName("lst_out")
      .outputMode("append").start()
    try {
      s.addData(SubRecord("k", new Timestamp(1000L), "a", "v"))
      q.processAllAvailable()
      // listener events are async — wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (!listener.metrics.containsKey("input-records.poll-size") &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(listener.metrics.containsKey("input-records.poll-size"))
      assert(!listener.stalled())
      assert(listener.stalled(System.currentTimeMillis() + 120000L))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("listener ignores progress from queries it does not watch") {
    // a listener pinned to an unrelated query id must not have its
    // staleness clock reset by other queries' progress (ADVICE r2):
    // otherwise the watchdog can never fire while ANY query progresses
    val listener = new WorkersMetricsListener(processingTimeoutMs = 60000L,
      watchId = Some(java.util.UUID.randomUUID()))
    spark.streams.addListener(listener)
    val s = MemoryStream[SubRecord](spark)
    val q = s.toDS().writeStream.format("memory").queryName("lst_other")
      .outputMode("append").start()
    try {
      val before = listener.lastProgressAtMs
      s.addData(SubRecord("k", new Timestamp(1000L), "a", "v"))
      q.processAllAvailable()
      Thread.sleep(500) // let async listener events drain
      assert(listener.metrics.isEmpty,
        s"foreign query leaked metrics: ${listener.metrics}")
      assert(listener.lastProgressAtMs == before,
        "foreign query reset the staleness clock")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
