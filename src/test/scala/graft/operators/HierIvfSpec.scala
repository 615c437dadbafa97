package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Hierarchical IVF assignment (the r8 verdict's item 8) — correctness
  * pins for the two-level kernel and its corpus-size routing. */
class HierIvfSpec extends SparkSpecBase {
  import spark.implicits._

  // seeded corpus: 60 clusters of 8 vectors each in 16 dims, cluster
  // structure strong enough that cell membership is meaningful, plus a
  // deterministic jitter so cosines are distinct (no tie ambiguity)
  private val rnd = new scala.util.Random(7)
  private val centers = Array.fill(60)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
  private val corpus = (0 until 480).map { i =>
    val c = centers(i % 60)
    (i.toLong, c.zipWithIndex.map { case (v, j) =>
      v + 0.05f * ((i * 31 + j * 17) % 13 - 6) / 13f
    }.toSeq)
  }.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  private val stride = 8 // 60 fine centroids

  test("probe-all-cells hierarchical assignment == flat assignment") {
    // with wProbe >= #cells every fine centroid is scanned, so the
    // two-level kernel must reproduce the flat argmax exactly (cosines
    // here are distinct, so tie order can't mask a defect)
    val flat = Similarity.ivfIndex(corpus, stride)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val hier = Similarity.ivfIndexHier(corpus,
        Similarity.strideCentroids(corpus, stride), wProbe = 1000)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(hier == flat)
  }

  test("small wProbe assignment is deterministic and cell-consistent") {
    val a = Similarity.ivfIndexHier(corpus,
        Similarity.strideCentroids(corpus, stride), wProbe = 2)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val b = Similarity.ivfIndexHier(corpus,
        Similarity.strideCentroids(corpus, stride), wProbe = 2)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(a == b, "hierarchical assignment must be deterministic")
    // every assignment is a real centroid id
    val centroidIds = Similarity.strideCentroids(corpus, stride)
      .select("centroid_id").as[Long].collect().toSet
    assert(a.values.toSet.subsetOf(centroidIds))
    // boundary approximation: agreement with flat is MONOTONE in wProbe
    // (the top-w coarse scan is prefix-consistent, so the scanned fine
    // set only grows — if the flat winner was scanned at w it is scanned
    // at w+1), with a floor that catches a broken kernel outright
    val flat = Similarity.ivfIndex(corpus, stride)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val agree2 = a.count { case (k, v) => flat(k) == v }
    val a3 = Similarity.ivfIndexHier(corpus,
        Similarity.strideCentroids(corpus, stride), wProbe = 3)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val agree3 = a3.count { case (k, v) => flat(k) == v }
    assert(agree2 >= (a.size * 0.8).toInt,
      s"only $agree2/${a.size} wProbe=2 assignments agree with flat")
    assert(agree3 >= agree2,
      s"agreement regressed with a wider probe: $agree3 < $agree2")
  }

  test("ivfIndexAuto routes flat below the threshold, hier at it") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.toString
    // 480 vectors < 2^17: flat kernel in the plan
    val auto = Similarity.ivfIndexAuto(corpus, stride)
    assert(planOf(auto).contains("nearestcentroidid") &&
      !planOf(auto).toLowerCase.contains("hier"))
    // force the switch by lowering the threshold via a direct call — the
    // routing expression itself is one count() against hierThreshold, so
    // pin the CONSTANT instead: the largest driver SF (~20k embeddings)
    // must stay under it with margin
    assert(Similarity.hierThreshold > 100000L)
    // and the hier plan carries the hier kernel
    val hier = Similarity.ivfIndexHier(corpus,
      Similarity.strideCentroids(corpus, stride))
    assert(planOf(hier).toLowerCase.contains("hier"))
  }

  test("probing a hier-built index returns k ranked distinct neighbors") {
    val idx = Similarity.ivfIndexHier(corpus,
      Similarity.strideCentroids(corpus, stride), wProbe = 2)
    val got = Similarity.ivfTopKWith(
      corpus.filter(col("vec_id") < 4).select(col("vec_id"), col("embedding")),
      idx, Similarity.strideCentroids(corpus, stride), nProbe = 4, k = 5)
    val rows = got.select("query_id", "cand_id", "rank")
      .as[(Long, Long, Int)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.size))
      assert(rs.map(_._2).distinct.size == rs.size)
      assert(rs.size == 5)
    }
  }
}
