package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("histogram buckets correctly, clamps outliers, counts everything") {
    // lo=0, hi=10, 5 bins of width 2; -3 clamps into bucket 0, 42 into 4
    val df = Seq(-3.0, 0.0, 1.9, 2.0, 5.0, 9.99, 10.0, 42.0).toDF("x")
    val h = Profile.histogram(df, col("x"), lo = 0.0, hi = 10.0, bins = 5)
      .orderBy("bucket")
      .select("bucket", "cnt").as[(Int, Long)].collect()
    assert(h.toSeq == Seq((0, 3), (1, 1), (2, 1), (4, 3)))
    assert(h.map(_._2).sum == 8, "histogram must never drop rows")
  }

  test("histogram records observed min/max per bucket") {
    val df = Seq(0.5, 1.5, 8.0).toDF("x")
    val h = Profile.histogram(df, col("x"), 0.0, 10.0, 5)
      .orderBy("bucket")
      .select("bucket", "lo_seen", "hi_seen")
      .as[(Int, Double, Double)].collect()
    assert(h.toSeq == Seq((0, 0.5, 1.5), (4, 8.0, 8.0)))
  }

  test("histogram plan: one exchange of at most `bins` rows, no window") {
    val df = spark.range(100000L).selectExpr("cast(id as double) as x")
    val p = Profile.histogram(df, col("x"), 0.0, 100000.0, 16)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1,
      s"histogram must cost exactly one shuffle:\n$p")
    assert(!p.contains("Window") && !p.contains("collect_list"), p)
    assert(p.contains("partial_count"),
      s"histogram lost its map-side combine:\n$p")
  }

  test("repetitionSignals plan: two-phase aggs, no window/collect state") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = Profile.repetitionSignals(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("collect_list"), p)
    assert(p.contains("partial_count"), p)
  }

  test("repetitionSignals known answers incl. single-word doc") {
    val docs = Seq(
      (1L, "a a b"),        // max word 2/3, distinct 2/3, bigrams: "a a","a b" -> 1/2
      (2L, "x y z"),        // all distinct: 1/3, 1, bigram max 1/2
      (3L, "w"),            // no bigrams -> frac 0.0
      (4L, "q q q q")       // fully repetitive: 1.0, 0.25, bigram "q q" 3/3
    ).toDF("doc_id", "text")
    val r = Profile.repetitionSignals(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect()
    assert(r.toSeq == Seq(
      (1L, 0.6667, 0.6667, 0.5),
      (2L, 0.3333, 1.0, 0.5),
      (3L, 1.0, 1.0, 0.0),
      (4L, 1.0, 0.25, 1.0)))
  }
}
