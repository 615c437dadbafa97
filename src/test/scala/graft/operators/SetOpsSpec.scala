package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** SetOps composition forms vs the builtin operators they replace at
  * scale — seeded property equality over multisets with nulls and
  * duplicate multiplicities. */
class SetOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def multiset(n: Int, keyRange: Int, nullFrac: Double) =
    (0 until n).map { _ =>
      if (rnd.nextDouble() < nullFrac) (None: Option[Int], rnd.nextInt(3))
      else (Some(rnd.nextInt(keyRange)), rnd.nextInt(3))
    }.toDF("k", "tag")

  test("intersectAllCounts == intersectAll + groupBy count (seeded, nulls)") {
    for (trial <- 0 until 5) {
      val a = multiset(500, 40, 0.05)
      val b = multiset(400, 40, 0.05)
      val got = SetOps.intersectAllCounts(a, b)
        .as[(Option[Int], Int, Long)].collect().toSet
      val ref = a.intersectAll(b).groupBy("k", "tag")
        .agg(count(lit(1)).as("n"))
        .as[(Option[Int], Int, Long)].collect().toSet
      assert(got == ref, s"trial $trial")
      assert(ref.nonEmpty, "vacuous trial: no intersection")
    }
  }

  test("exceptAllCounts == exceptAll + groupBy count (seeded, nulls)") {
    for (trial <- 0 until 5) {
      val a = multiset(500, 30, 0.05)
      val b = multiset(300, 30, 0.05)
      val got = SetOps.exceptAllCounts(a, b)
        .as[(Option[Int], Int, Long)].collect().toSet
      val ref = a.exceptAll(b).groupBy("k", "tag")
        .agg(count(lit(1)).as("n"))
        .as[(Option[Int], Int, Long)].collect().toSet
      assert(got == ref, s"trial $trial")
      assert(ref.nonEmpty, "vacuous trial: empty difference")
    }
  }

  test("distinctCount == countDistinct per group (nulls excluded)") {
    val df = multiset(2000, 200, 0.1)
      .withColumn("g", coalesce(col("k") % 4, lit(-1)))
    val got = SetOps.distinctCount(df, Seq(col("g")), col("k"), "nd")
      .as[(Int, Long)].collect().toMap
    val ref = df.groupBy("g").agg(countDistinct(col("k")).as("nd"))
      .as[(Int, Long)].collect().toMap
    // countDistinct emits 0 for the all-null group; distinctCount drops
    // null keys before grouping, so the -1 group vanishes — align ref
    assert(got == ref.filter(_._2 > 0))
    assert(got.nonEmpty)
  }

  test("the exchanges carry aggregated multiplicities, not raw rows") {
    val a = multiset(500, 40, 0.0)
    val plan = SetOps.intersectAllCounts(a, multiset(400, 40, 0.0))
      .queryExecution.executedPlan.toString
    // each side partially aggregates BEFORE its exchange: the builtin
    // INTERSECT ALL's generate/replicate machinery must be absent
    assert(!plan.contains("Generate replicaterows"),
      s"builtin replicate-rows plan leaked in:\n$plan")
    assert(plan.contains("partial_count"),
      s"per-side pre-exchange aggregation missing:\n$plan")
  }
}
