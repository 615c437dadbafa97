package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Distributed prefix scan + the operators built on it (sequence packing,
  * fold splitting). The scan's correctness contract is equality with the
  * sequential cumsum over the same total order — verified against a local
  * reimplementation — and its SCALE contract is the plan shape: windows
  * partitioned by bucket, never SinglePartition (PlanHygieneSpec enforces
  * that engine-wide; the test here pins it for the operator directly so a
  * refactor can't lose it before a query exists).
  */
class ScanSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = (0L until 500L).map(i =>
    (i, (0 until (i % 37).toInt).map(j => s"w$j").mkString(" ")))
    .toDF("doc_id", "text")
  private val weighted = docs.select(col("doc_id"),
    graft.functions.TextFunctions.tokenCount(col("text")).as("w"))

  /** Sequential reference: inclusive cumsum over (u, id) order. */
  private def localScan(): Map[Long, Long] = {
    val rows = weighted
      .withColumn("u", Corpus.hashUniform(col("doc_id"), "t"))
      .select("doc_id", "w", "u").as[(Long, Int, Double)].collect()
      .sortBy { case (id, _, u) => (u, id) }
    var acc = 0L
    rows.map { case (id, w, _) => acc += w; id -> acc }.toMap
  }

  test("runningTotal equals the sequential cumsum") {
    val got = Corpus.runningTotal(weighted, col("doc_id"), col("w"),
        Corpus.hashUniform(col("doc_id"), "t"), buckets = 16)
      .select("doc_id", "running_total").as[(Long, Long)].collect().toMap
    assert(got == localScan())
  }

  test("runningTotal is invariant to bucket count and input partitioning") {
    val ref = localScan()
    for (b <- Seq(1, 7, 64)) {
      val got = Corpus.runningTotal(weighted.repartition(13), col("doc_id"),
          col("w"), Corpus.hashUniform(col("doc_id"), "t"), buckets = b)
        .select("doc_id", "running_total").as[(Long, Long)].collect().toMap
      assert(got == ref, s"scan diverged at buckets=$b")
    }
  }

  test("runningTotal windows are bucket-partitioned, never SinglePartition") {
    val plan = Corpus.runningTotal(weighted, col("doc_id"), col("w"),
        Corpus.hashUniform(col("doc_id"), "t"), buckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "scan lost its window cumsum")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"scan degenerated to a single-reducer global window:\n$plan")
  }

  test("runningTotal fails fast on a null order draw instead of dropping it") {
    val withNull = weighted.withColumn("u",
      when(col("doc_id") === 7L, lit(null).cast("double"))
        .otherwise(Corpus.hashUniform(col("doc_id"), "t")))
    val e = intercept[Exception] {
      Corpus.runningTotal(withNull, col("doc_id"), col("w"), col("u"))
        .count()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("orderU") ||
        Option(e.getCause).exists(_.getMessage.contains("orderU"))),
      s"expected the runningTotal null-order error, got: ${e.getMessage}")
  }

  test("runningTotal of an empty frame is empty") {
    val got = Corpus.runningTotal(weighted.filter(col("doc_id") < 0),
      col("doc_id"), col("w"), Corpus.hashUniform(col("doc_id"), "t"))
    assert(got.count() == 0)
  }

  test("packSequences: shards are contiguous, bounded, and deterministic") {
    val packed = Corpus.packSequences(weighted, col("doc_id"), col("w"),
        budget = 100L, salt = "t", buckets = 16)
      .withColumn("u", Corpus.hashUniform(col("doc_id"), "t"))
      .select("doc_id", "w", "shard_id", "u")
      .as[(Long, Int, Long, Double)].collect()
      .sortBy { case (id, _, _, u) => (u, id) }
    // shard ids start at 0 and advance by at most 1 along the layout
    // (weights here are < budget, so a start offset can't skip a shard)
    assert(packed.head._3 == 0L)
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 || b._3 == a._3 + 1,
        s"shard ids must step by 0 or 1 along the layout: $a -> $b")
    }
    // every shard's token start-offset honors the budget contract:
    // shard i holds exactly the docs whose start offset is in
    // [i*100, (i+1)*100) — so a shard's token sum overshoots the budget
    // by less than its last doc's weight
    val byShard = packed.groupBy(_._3).view.mapValues(_.map(_._2.toLong).sum)
    val maxW = packed.map(_._2).max
    byShard.foreach { case (s, tot) =>
      assert(tot < 100L + maxW, s"shard $s holds $tot tokens")
    }
    // determinism under repartitioning
    val again = Corpus.packSequences(weighted.repartition(11), col("doc_id"),
        col("w"), budget = 100L, salt = "t", buckets = 4)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(again == packed.map(p => p._1 -> p._3).toMap)
  }

  test("packSequences matches the sequential packing definition") {
    val cum = localScan()
    val w = weighted.select("doc_id", "w").as[(Long, Int)].collect().toMap
    val expect = cum.map { case (id, c) =>
      id -> math.floorDiv(c - w(id), 100L)
    }
    val got = Corpus.packSequences(weighted, col("doc_id"), col("w"),
        budget = 100L, salt = "t", buckets = 16)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("foldSplit covers every row, rates hold, reassignment impossible") {
    val split = Corpus.foldSplit(docs, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "f")
      .select("doc_id", "fold").as[(Long, String)].collect().toMap
    assert(split.size == 500 &&
      split.values.toSet.subsetOf(Set("train", "val", "test")))
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 400) < 60, counts.toString)
    // partitioning must not move a doc between folds (leakage)
    val again = Corpus.foldSplit(docs.repartition(17), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "f")
      .select("doc_id", "fold").as[(Long, String)].collect().toMap
    assert(again == split)
  }

  test("foldSplit rejects rates that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Corpus.foldSplit(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
