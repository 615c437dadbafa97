package graft.operators

import graft.{BadOffsetException, ProcessingTimeoutException, SparkSpecBase}

/** Mirrors the reference's OffsetsStateTest/DefaultOffsetsStateTest
  * scenarios (impl/offsets/OffsetsStateTest.java:56-431) against the
  * record-level [[OffsetsState]], including the parameterized
  * commit-floor and timeout tables, plus the streaming deployment
  * ([[graft.streaming.OffsetsTracker]]) across micro-batches. */
class OffsetsStateSpec extends SparkSpecBase {

  private def consumedSingles(st: OffsetsState, lo: Long, hi: Long,
                              at: Long = 10L): Unit =
    (lo to hi).foreach(o => st.addConsumed(o, o, at))

  test("out-of-order singles commit the contiguous prefix (0..5 of 0..10)") {
    val st = new OffsetsState("topic-0")
    consumedSingles(st, 0L, 10L)
    Seq(1L, 3L, 0L, 5L, 2L, 4L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(5L)) // Kafka commit = 6
  }

  test("discontinuous processing commits only below the hole") {
    val st = new OffsetsState("topic-0")
    consumedSingles(st, 0L, 6L)
    Seq(0L, 1L, 2L, 4L, 5L, 6L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(2L)) // commit = 3, hole at 3
  }

  test("partitions track independently") {
    val a = new OffsetsState("topic-0")
    val b = new OffsetsState("topic-1")
    consumedSingles(a, 0L, 2L); consumedSingles(b, 3L, 5L)
    (0L to 2L).foreach(a.updateProcessed)
    (3L to 5L).foreach(b.updateProcessed)
    assert(a.offsetToCommit().contains(2L))
    assert(b.offsetToCommit().contains(5L))
  }

  test("nothing committable while the head is unprocessed") {
    val st = new OffsetsState("topic-0")
    consumedSingles(st, 0L, 3L)
    Seq(1L, 2L, 3L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().isEmpty)
  }

  test("double-consume, process-unconsumed, double-process all raise") {
    val st = new OffsetsState("topic-0")
    consumedSingles(st, 0L, 2L)
    val e1 = intercept[BadOffsetException](st.addConsumed(1L, 1L, 10L))
    assert(e1.getMessage.contains(
      "Offset: 1 for partition: topic-0 was consumed before"))
    // range overlap reports the first existing element it swallows
    val st2 = new OffsetsState("topic-0")
    st2.addConsumed(5L, 9L, 10L)
    val e2 = intercept[BadOffsetException](st2.addConsumed(3L, 6L, 11L))
    assert(e2.getMessage.contains("Offset: 5"))
    (0L to 2L).foreach(st.updateProcessed)
    val e3 = intercept[BadOffsetException](st.updateProcessed(3L))
    assert(e3.getMessage.contains(
      "Offset: 3 for partition: topic-0 was not consumed before"))
    val e4 = intercept[BadOffsetException](st.updateProcessed(2L))
    assert(e4.getMessage.contains(
      "Offset: 2 for partition: topic-0 was processed before"))
  }

  test("commit floor across gapped consumed ranges (reference table)") {
    // (consumed, processed, expectedBefore, committed, expectedAfter) —
    // the reference's parameterized shouldReturnOffsetToCommit rows, with
    // processed fed forward / reversed / deterministically shuffled
    val rows = Seq(
      (Seq((0L, 5L), (10L, 15L)), Seq.empty[(Long, Long)],
        None, None, None),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 3L)),
        Some(3L), None, Some(3L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 3L)),
        Some(3L), Some(0L), Some(3L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 3L)),
        Some(3L), Some(2L), Some(3L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 3L)),
        Some(3L), Some(3L), None),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L)),
        Some(5L), None, Some(5L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L)),
        Some(5L), Some(3L), Some(5L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L)),
        Some(5L), Some(5L), None),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 12L)),
        Some(12L), None, Some(12L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 12L)),
        Some(12L), Some(4L), Some(12L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 12L)),
        Some(12L), Some(11L), Some(12L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 12L)),
        Some(12L), Some(12L), None),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 15L)),
        Some(15L), None, Some(15L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 15L)),
        Some(15L), Some(5L), Some(15L)),
      (Seq((0L, 5L), (10L, 15L)), Seq((0L, 5L), (10L, 15L)),
        Some(15L), Some(15L), None))
    val orders: Seq[Seq[Long] => Seq[Long]] = Seq(
      identity, _.reverse,
      xs => xs.sortBy(o => (o * 2654435761L) % 97))
    for ((consumed, processed, before, committed, after) <- rows;
         order <- orders) {
      val st = new OffsetsState("topic-0")
      consumed.foreach { case (lo, hi) => st.addConsumed(lo, hi, 123L) }
      order(processed.flatMap { case (lo, hi) => lo to hi })
        .foreach(st.updateProcessed)
      assert(st.offsetToCommit() == before,
        s"before: $consumed $processed")
      committed.foreach(c => st.removeCommitted(c + 1))
      assert(st.offsetToCommit() == after,
        s"after commit $committed: $consumed $processed")
    }
  }

  test("timeout names the first unprocessed consumed offset (ref table)") {
    // (consumed ranges with consumedAt, processed, deadline, offset)
    val rows = Seq(
      (Seq((0L, 0L, 10L), (1L, 1L, 15L), (2L, 2L, 20L)),
        Seq(0L), 20L, 1L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(2L, 3L, 5L, 6L, 7L), 7L, 1L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L), 7L, 2L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(2L), 7L, 1L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L), 7L, 3L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L), 8L, 5L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L, 6L), 8L, 5L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L, 6L, 7L), 8L, 5L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L, 5L), 8L, 6L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L, 5L, 7L), 8L, 6L),
      (Seq((1L, 3L, 3L), (5L, 7L, 7L)), Seq(1L, 2L, 3L, 5L, 6L), 8L, 7L))
    for ((consumed, processed, deadline, offset) <- rows) {
      val st = new OffsetsState("topic-0")
      consumed.foreach { case (lo, hi, at) => st.addConsumed(lo, hi, at) }
      processed.foreach(st.updateProcessed)
      val e = intercept[ProcessingTimeoutException](
        st.timeoutConsumedBefore(deadline))
      assert(e.getMessage.contains(
        s"Offset [$offset] for partition [topic-0] exceeded timeout"),
        s"$consumed $processed -> ${e.getMessage}")
    }
    // and the quiet case: everything young enough
    val ok = new OffsetsState("topic-0")
    ok.addConsumed(0L, 5L, 100L)
    ok.timeoutConsumedBefore(50L) // no throw
  }

  test("uncommitted merge keeps the floor conservative (reference quirk)") {
    // process 0..2, take the committable (2), do NOT removeCommitted,
    // process 3..4: the processed ranges merge to [0-4] whose start no
    // longer equals the consumed head's lo (3), so the head cannot strip
    // and the committable stays 2 — monotone, never regressing; after
    // removeCommitted(3) the floor advances to 4
    val st = new OffsetsState("topic-0")
    st.addConsumed(0L, 5L, 10L)
    Seq(0L, 1L, 2L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(2L))
    Seq(3L, 4L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(2L))
    st.removeCommitted(3L)
    assert(st.offsetToCommit().contains(4L))
  }

  test("re-consume after commit is legal; state prunes to ranges") {
    val st = new OffsetsState("topic-0")
    st.addConsumed(0L, 99L, 10L)
    (0L to 99L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(99L))
    assert(st.processedUncommitted() == 100L)
    st.removeCommitted(100L)
    assert(st.processedUncommitted() == 0L)
    assert(st.offsetToCommit().isEmpty)
    // Kafka rewind: the same offsets come around again
    st.addConsumed(50L, 120L, 20L)
    (50L to 120L).foreach(st.updateProcessed)
    assert(st.offsetToCommit().contains(120L))
  }

  test("snapshot/restore round-trips mid-flight state") {
    val st = new OffsetsState("topic-0")
    st.addConsumed(0L, 5L, 10L)
    st.addConsumed(10L, 15L, 11L)
    Seq(0L, 1L, 4L, 10L, 11L, 12L).foreach(st.updateProcessed)
    val (c, p) = st.snapshot()
    val st2 = OffsetsState.restore("topic-0", c, p)
    assert(st2.offsetToCommit() == st.offsetToCommit())
    st.updateProcessed(2L); st2.updateProcessed(2L)
    st.updateProcessed(3L); st2.updateProcessed(3L)
    // the merged [0-4] no longer STARTS at the (already-stripped) head's
    // lo=2, so the conservative quirk holds the floor at 1 until a
    // removeCommitted prunes — identically in original and restored state
    assert(st2.offsetToCommit().contains(1L))
    assert(st.offsetToCommit() == st2.offsetToCommit())
    st.removeCommitted(2L); st2.removeCommitted(2L)
    assert(st2.offsetToCommit().contains(4L))
    assert(st.offsetToCommit() == st2.offsetToCommit())
  }

  test("OffsetsTracker carries record-level state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{OffsetEvent, OffsetsProgress, OffsetsTracker}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[OffsetEvent]
    val latest = new java.util.concurrent.ConcurrentHashMap[
      String, OffsetsProgress]()
    val q = OffsetsTracker.track(ms.toDS()).writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[OffsetsProgress], _: Long) =>
          batch.collect().foreach(p => latest.put(p.partition, p)): Unit
      }.start()
    try {
      // batch 1: p0 consumes [0-10] (singles), processes 0,1,2,4
      ms.addData((0L to 10L).map(o =>
        OffsetEvent("p0", o, "consumed", o, o, 10L)) ++
        Seq(0L, 1L, 2L, 4L).zipWithIndex.map { case (o, i) =>
          OffsetEvent("p0", 100L + i, "processed", o, o, 0L) }: _*)
      q.processAllAvailable()
      assert(latest.get("p0").committable.contains(2L))
      // batch 2: the hole at 3 fills, plus p1 appears independently
      ms.addData(
        OffsetEvent("p0", 200L, "processed", 3L, 3L, 0L),
        OffsetEvent("p0", 201L, "committed", 3L, 0L, 0L),
        OffsetEvent("p1", 1L, "consumed", 5L, 9L, 20L),
        OffsetEvent("p1", 2L, "processed", 5L, 5L, 0L))
      q.processAllAvailable()
      // committed 3 pruned below; 3,4 now processed and strippable
      assert(latest.get("p0").committable.contains(4L))
      assert(latest.get("p1").committable.contains(5L))
      assert(latest.get("p1").processedRanges == 1)
    } finally q.stop()
  }
}
