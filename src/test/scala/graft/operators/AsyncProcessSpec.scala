package graft.operators

import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class AsyncProcessSpec extends SparkSpecBase {
  import spark.implicits._

  test("mapAsync preserves submission order within each partition") {
    val ds = (0 until 400).toDS().repartition(4)
    val got = AsyncProcess.mapAsync(ds, maxInFlight = 8) { i =>
      // jitter completion order: later rows often finish first
      Thread.sleep((i % 3).toLong)
      i * 10
    }
    // per input partition the outputs must be in submission order —
    // compare against the same pipeline with maxInFlight = 1 (serial)
    val serial = AsyncProcess.mapAsync(ds, maxInFlight = 1)(_ * 10)
    assert(got.collect().toSeq.sorted == (0 until 400).map(_ * 10).sorted)
    // partition-order check: zip per-partition iterators
    val gotParts = got.rdd.glom().collect().map(_.toSeq)
    val serialParts = serial.rdd.glom().collect().map(_.toSeq)
    assert(gotParts.map(_.sorted).toSeq == serialParts.map(_.sorted).toSeq)
    gotParts.zip(serialParts).foreach { case (a, b) =>
      assert(a == b, "submission order not preserved within partition")
    }
  }

  test("a failing record fails the job (at-least-once, not silent loss)") {
    val ds = (0 until 50).toDS()
    val ex = intercept[Exception] {
      AsyncProcess.mapAsync(ds, maxInFlight = 4) { i =>
        if (i == 13) throw new RuntimeException("record 13 failed")
        i
      }.collect()
    }
    assert(ex.getMessage.contains("record 13 failed") ||
      Option(ex.getCause).exists(_.getMessage.contains("record 13 failed")))
  }

  test("a record exceeding the processing timeout fails with the taxonomy exception") {
    val ds = (0 until 10).toDS().repartition(1)
    val ex = intercept[Exception] {
      AsyncProcess.mapAsync(ds, maxInFlight = 2, timeout = 200.millis) { i =>
        if (i == 5) Thread.sleep(60000)
        i
      }.collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(
      _.isInstanceOf[graft.ProcessingTimeoutException]),
      s"expected ProcessingTimeoutException in cause chain, got: $ex")
  }

  test("downstream limit that abandons the iterator does not leak pool threads") {
    def asyncThreads(): Int = {
      val all = Thread.getAllStackTraces.keySet
      val it = all.iterator
      var n = 0
      while (it.hasNext) { if (it.next().getName.startsWith("pool-")) n += 1 }
      n
    }
    val before = asyncThreads()
    // limit(3) stops pulling long before the 1000-row partition drains, so
    // the iterator is abandoned — only the task completion listener can
    // shut the pool down
    val ds = (0 until 1000).toDS().repartition(1)
    val got = AsyncProcess.mapAsync(ds, maxInFlight = 8)(identity)
      .limit(3).collect()
    assert(got.length == 3)
    // give executor teardown a beat, then the pool threads must be gone
    val deadline = System.currentTimeMillis() + 5000
    while (asyncThreads() > before && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(asyncThreads() <= before,
      s"leaked pool threads: before=$before after=${asyncThreads()}")
  }
}

class DistributeOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("distribute: per-subpartition offset order holds within partitions") {
    // shuffled input; after distribute each physical partition must be
    // sorted by (subpartition, offset) — the reference's worker-loop
    // contract (WorkerThread.java:65-103)
    val df = scala.util.Random.shuffle((0 until 1000).toList)
      .zipWithIndex.map { case (off, i) => (off.toLong, (i % 7).toLong) }
      .toDF("offset", "key")
    val sub = Subpartitions.byKeyHash(df, col("key"), 4)
    val placed = Subpartitions.distribute(sub, 4, col("offset"))
    val parts = placed.select("subpartition", "offset")
      .rdd.glom().collect()
    parts.foreach { rows =>
      val seq = rows.map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(seq == seq.sorted, "partition not in (subpartition, offset) order")
      // one subpartition never spans two physical partitions
    }
    val spread = placed.select("subpartition")
      .rdd.mapPartitionsWithIndex((i, it) =>
        it.map(r => (r.getInt(0), i)).toSet.iterator)
      .collect().toSet
    assert(spread.groupBy(_._1).values.forall(_.size == 1),
      "a subpartition spans multiple physical partitions")
  }
}
