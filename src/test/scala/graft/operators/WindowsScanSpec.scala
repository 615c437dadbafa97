package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The rank-family scan forms vs the window forms they replace — equality
  * must be EXACT (doubles compared with ==, not a tolerance): the scan
  * emits the same single IEEE division of the same integers. Adversarial
  * shapes: duplicate order values within a group (tieBreak carries
  * uniqueness), a single-row group, a group smaller than k, and a group
  * whose order value is constant (the normalized draw degenerates to one
  * bucket — correctness must survive losing the balance). */
class WindowsScanSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = (
    (0 until 1000).map(i => ("A", (i % 37).toDouble, i.toLong)) ++
      Seq(("B", 5.0, 5000L)) ++
      (0 until 3).map(i => ("C", i.toDouble, 6000L + i)) ++
      (0 until 50).map(i => ("D", 7.0, 7000L + i))
    ).toDF("g", "v", "id").repartition(7)

  test("rankFunctionsScan == ntile/percent_rank/cume_dist window forms, exactly") {
    val got = Windows.rankFunctionsScan(df, Seq(col("g")), col("v"),
        col("id"), ntileK = 4)
      .select("g", "id", "ntile", "pct_rank", "cume")
      .as[(String, Long, Int, Double, Double)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
    val ref = df.select(col("g"), col("id"),
        ntile(4).over(w).as("ntile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .as[(String, Long, Int, Double, Double)].collect().toSet
    assert(got == ref)
    // the corpus genuinely exercises the edge shapes
    assert(ref.exists(_._1 == "B") && ref.exists(_._1 == "C") &&
      ref.exists(_._1 == "D"))
  }

  test("rowNumberScan == row_number window form on a degenerate order value") {
    // all rows share v inside group D: every row lands in one scan bucket,
    // ordering falls entirely to the tieBreak — still exact
    val d = df.filter(col("g") === "D")
    val got = Windows.rowNumberScan(d, Seq(col("g")), col("v"), col("id"),
        out = "rn")
      .select("id", "rn").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
    val ref = d.select(col("id"),
        row_number().over(w).cast("long").as("rn"))
      .as[(Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("the scan plans no per-group sort funnel (mechanism pin)") {
    val plan = Windows.rankFunctionsScan(df, Seq(col("g")), col("v"),
      col("id"), ntileK = 4).queryExecution.executedPlan.toString
    // the window inside runningTotal partitions by (group, bucket) — the
    // funnel shape `Window [partitionBy g]` alone must not appear
    val funnels = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("windowspecdefinition(g#"))
      .filterNot(_.contains("__rt_b")).toSeq
    assert(funnels.isEmpty, s"per-group window funnel planned:\n$plan")
  }
}
