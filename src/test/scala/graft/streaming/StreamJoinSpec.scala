package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Stream-stream equi-join with watermarks and a time-bound condition —
  * the §2.9 streaming-join capability (state bounded on both sides by the
  * watermark + time range).
  */
class StreamJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("clicks join purchases of the same key within 10s, state bounded") {
    val clicks = MemoryStream[SubRecord](spark)
    val buys = MemoryStream[SubRecord](spark)
    val c = clicks.toDF().withWatermark("ts", "5 seconds")
      .select(col("subKey").as("k"), col("ts").as("click_ts"),
        col("value").as("click_v"))
    val b = buys.toDF().withWatermark("ts", "5 seconds")
      .select(col("subKey").as("k"), col("ts").as("buy_ts"),
        col("value").as("buy_v"))
    val j2 = c.join(b, c("k") === b("k") &&
      col("buy_ts") >= col("click_ts") &&
      col("buy_ts") <= col("click_ts") + expr("interval 10 seconds"))
    val q = j2.select(c("k"), col("click_v"), col("buy_v"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      clicks.addData(SubRecord("u1", new Timestamp(t0), "c", "c1"),
        SubRecord("u2", new Timestamp(t0), "c", "c2"))
      buys.addData(
        SubRecord("u1", new Timestamp(t0 + 4000), "b", "b1"),   // in range
        SubRecord("u2", new Timestamp(t0 + 60000), "b", "b2"))  // out of range
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("click_v", "buy_v").as[(String, String)].collect().toSet
      assert(got == Set(("c1", "b1")))
    } finally q.stop()
  }

  test("left-outer stream join emits null-padded rows after watermark expiry") {
    // the subtle semantic: an unmatched left row CANNOT be emitted when
    // seen — only once the watermark proves no future match can arrive
    val clicks = MemoryStream[SubRecord](spark)
    val buys = MemoryStream[SubRecord](spark)
    val c = clicks.toDF().withWatermark("ts", "5 seconds")
      .select(col("subKey").as("k"), col("ts").as("click_ts"),
        col("value").as("click_v"))
    val b = buys.toDF().withWatermark("ts", "5 seconds")
      .select(col("subKey").as("bk"), col("ts").as("buy_ts"),
        col("value").as("buy_v"))
    val j = c.join(b, col("k") === col("bk") &&
      col("buy_ts") >= col("click_ts") &&
      col("buy_ts") <= col("click_ts") + expr("interval 10 seconds"),
      "left_outer")
    val q = j.select(col("k"), col("click_v"), col("buy_v"))
      .writeStream.format("memory").queryName("ssj_left_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      clicks.addData(SubRecord("u1", new Timestamp(t0), "c", "c1"),
        SubRecord("u2", new Timestamp(t0), "c", "c2"))
      buys.addData(SubRecord("u1", new Timestamp(t0 + 4000), "b", "b1"))
      q.processAllAvailable()
      // matched row is out; the unmatched u2 must NOT be emitted yet
      val early = spark.table("ssj_left_out")
        .select("click_v", "buy_v").as[(String, String)].collect().toSet
      assert(early == Set(("c1", "b1")), s"got $early")
      // advance both watermarks far past u2's join window -> null emission
      clicks.addData(SubRecord("u9", new Timestamp(t0 + 120000), "c", "tick"))
      buys.addData(SubRecord("u9", new Timestamp(t0 + 120000), "b", "tick"))
      q.processAllAvailable()
      clicks.addData(SubRecord("u9", new Timestamp(t0 + 121000), "c", "t2"))
      buys.addData(SubRecord("u9", new Timestamp(t0 + 121000), "b", "t2"))
      q.processAllAvailable()
      val got = spark.table("ssj_left_out")
        .select("click_v", "buy_v").as[(String, String)].collect().toSet
      assert(got.contains(("c2", null)),
        s"unmatched left row never null-padded: $got")
    } finally q.stop()
  }

  test("streaming session_window groups events by 10s gaps") {
    val s = MemoryStream[SubRecord](spark)
    val out = s.toDF().withWatermark("ts", "0 seconds")
      .groupBy(col("subKey"), session_window(col("ts"), "10 seconds"))
      .count()
    val q = out.select(col("subKey"), col("count"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      // two sessions for k1: [t0, t0+5s] and [t0+60s]; close with late tick
      s.addData(
        SubRecord("k1", new Timestamp(t0), "a", "v1"),
        SubRecord("k1", new Timestamp(t0 + 5000), "a", "v2"),
        SubRecord("k1", new Timestamp(t0 + 60000), "a", "v3"))
      q.processAllAvailable()
      s.addData(SubRecord("k2", new Timestamp(t0 + 300000), "a", "tick"))
      q.processAllAvailable()
      s.addData(SubRecord("k2", new Timestamp(t0 + 300001), "a", "tick2"))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[(String, Long)]
        .collect().filter(_._1 == "k1").map(_._2).sorted.toSeq
      assert(got == Seq(1L, 2L), s"expected sessions of 1 and 2 events, got $got")
    } finally q.stop()
  }
}
