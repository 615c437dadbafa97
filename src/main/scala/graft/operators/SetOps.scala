package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale forms of the multiset operations and exact-distinct counting —
  * the r8 sf100 sweep named the builtin forms' costs (INTERSECT/EXCEPT
  * ALL plan sort-merge machinery over the RAW rows; multi-column exact
  * COUNT(DISTINCT) plans an Expand whose partial-dedup hash state
  * overflows the per-task execution memory and spills ∝ N) and excluded
  * those queries from decade sweeps. These composition forms compute the
  * same results with map-side-combinable aggregations only:
  *
  *  - multiset intersect/except reduce each side to (key, multiplicity)
  *    FIRST — the exchanges carry one row per distinct key, not one per
  *    input row — then combine multiplicities (`least` / clipped
  *    difference) with a null-safe equi-join;
  *  - exact distinct shuffles raw (group, key) pairs by hash ONCE with NO
  *    partial aggregation (a repartition, which writes sequential shuffle
  *    files instead of thrashing a too-small hash-agg buffer), then
  *    dedups post-shuffle where per-task state is distinct-keys/tasks.
  *
  * Equivalence with the builtin operators is pinned by SetOpsSpec's
  * seeded property tests (nulls and duplicate multiplicities included).
  */
object SetOps {

  private def counted(df: DataFrame, out: String): DataFrame =
    df.groupBy(df.columns.map(col): _*).agg(count(lit(1)).as(out))

  private def nullSafeCond(a: DataFrame, cols: Seq[String]): Column =
    cols.map(c => a(c) <=> col(s"__so_$c")).reduce(_ && _)

  /** (every column of `a`, n) where n = min(multiplicity in a,
    * multiplicity in b) > 0 — exactly `a.intersectAll(b).groupBy(all)
    * .count()`. Schemas must match by position/name. */
  def intersectAllCounts(a: DataFrame, b: DataFrame,
                         out: String = "n"): DataFrame = {
    val ca = counted(a, "__so_ca")
    val cb = counted(b, "__so_cb").toDF(
      b.columns.map(c => s"__so_$c") :+ "__so_cb": _*)
    ca.join(cb, nullSafeCond(ca, a.columns.toSeq))
      .select(a.columns.map(col) :+
        least(col("__so_ca"), col("__so_cb")).as(out): _*)
  }

  /** (every column of `a`, n) where n = multiplicity in a − multiplicity
    * in b, kept only while positive — exactly `a.exceptAll(b)
    * .groupBy(all).count()`. */
  def exceptAllCounts(a: DataFrame, b: DataFrame,
                      out: String = "n"): DataFrame = {
    val ca = counted(a, "__so_ca")
    val cb = counted(b, "__so_cb").toDF(
      b.columns.map(c => s"__so_$c") :+ "__so_cb": _*)
    ca.join(cb, nullSafeCond(ca, a.columns.toSeq), "left")
      .withColumn(out, col("__so_ca") - coalesce(col("__so_cb"), lit(0L)))
      .filter(col(out) > 0)
      .select(a.columns.map(col) :+ col(out): _*)
  }

  /** Exact distinct-count of `key` (nulls excluded, the COUNT(DISTINCT)
    * convention) per `group`, via the raw-shuffle two-phase form: one
    * exchange of (group, key) pairs with no partial hash-agg in front of
    * it, then a post-shuffle dedup whose per-task state is
    * |distinct pairs| / shuffle-partitions. Use when keys are
    * high-cardinality relative to the per-task memory budget — the
    * partial-dedup the optimizer would otherwise plan holds every
    * distinct key a task SCANS (∝ rows/task), which is exactly the state
    * the r8 sweep measured spilling. */
  def distinctCount(df: DataFrame, group: Seq[Column], key: Column,
                    out: String): DataFrame = {
    val names = df.select(group: _*).columns.toSeq
    val gk = group.zipWithIndex.map { case (c, i) => c.as(s"__so_g$i") }
    val sel = df.select(gk :+ key.as("__so_k"): _*)
      .where(col("__so_k").isNotNull)
    val gCols = group.indices.map(i => col(s"__so_g$i"))
    sel.repartition(gCols :+ col("__so_k"): _*)
      .distinct()
      .groupBy(gCols: _*)
      .agg(count(lit(1)).as(out))
      .toDF(names :+ out: _*)
  }
}
