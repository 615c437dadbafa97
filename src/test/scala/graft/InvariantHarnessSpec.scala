package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Falsifiability of the partial-oracle harness: every invariant boolean
  * must actually FIRE on a corrupted operator output — a verification
  * check that cannot fail verifies nothing. Each test corrupts one
  * property and asserts exactly that invariant flips to false.
  */
class InvariantHarnessSpec extends SparkSpecBase {
  import spark.implicits._

  private val items = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"), (2L, "c"),
    (3L, "x"), (3L, "y"), (3L, "z")
  ).toDF("doc_id", "item")

  private def pairRow(a: Long, b: Long, j: Double) = (a, b, j)

  private def pairInv(rows: Seq[(Long, Long, Double)]): Row =
    SparkEntry.setPairInvariants(items,
      rows.toDF("id_a", "id_b", "jaccard"), threshold = 0.9).head()

  test("honest pair output passes every pair invariant") {
    val r = pairInv(Seq(pairRow(1L, 2L, 1.0)))
    assert(r.toSeq == Seq(true, true, true, true, true, true), r.toSeq)
  }

  test("disordered pair fails `ordered` only") {
    val r = pairInv(Seq(pairRow(2L, 1L, 1.0)))
    assert(!r.getBoolean(1) && r.getBoolean(3), r.toSeq)
  }

  test("duplicate pair fails `distinct_pairs`") {
    val r = pairInv(Seq(pairRow(1L, 2L, 1.0), pairRow(1L, 2L, 1.0)))
    assert(!r.getBoolean(2), r.toSeq)
  }

  test("pair with an unknown id fails `ids_resolved` (not silently dropped)") {
    val r = pairInv(Seq(pairRow(1L, 2L, 1.0), pairRow(1L, 99L, 1.0)))
    assert(!r.getBoolean(3), r.toSeq)
  }

  test("inflated score fails `jaccard_honest`") {
    // docs 1 and 3 share nothing — claiming jaccard 0.95 must be caught
    val r = pairInv(Seq(pairRow(1L, 3L, 0.95)))
    assert(!r.getBoolean(4), r.toSeq)
  }

  test("sub-threshold score fails `threshold_ok`") {
    // true jaccard(1,3) = 0 and reported honestly -> only threshold trips
    val r = pairInv(Seq(pairRow(1L, 3L, 0.0)))
    assert(r.getBoolean(4) && !r.getBoolean(5), r.toSeq)
  }

  private val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    .toDF("id_a", "id_b")

  private def clusterInv(rows: Seq[(Long, Long, Long)]): Row =
    SparkEntry.clusterInvariants(edges,
      rows.toDF("doc_id", "component", "cluster_size")).head()

  private val goodClusters = Seq(
    (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
    (10L, 10L, 2L), (11L, 10L, 2L))

  test("correct closure passes every cluster invariant") {
    val r = clusterInv(goodClusters)
    assert(r.toSeq == Seq(true, true, true, true, true, true), r.toSeq)
  }

  test("edge split across components fails `edges_within_cluster`") {
    val r = clusterInv(Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    assert(!r.getBoolean(4), r.toSeq)
  }

  test("doc missing from the cluster frame fails `membership_exact`") {
    // the NULL-skip regression: bool_and must not ignore the absent doc
    val r = clusterInv(goodClusters.filterNot(_._1 == 3L)
      .map { case (d, c, _) => (d, c, if (c == 1L) 2L else 2L) })
    assert(!r.getBoolean(5), r.toSeq)
  }

  test("wrong canonical fails `canonical_is_min_member`") {
    val r = clusterInv(Seq(
      (1L, 2L, 3L), (2L, 2L, 3L), (3L, 2L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    assert(!r.getBoolean(1), r.toSeq)
  }

  test("wrong cluster_size fails `size_consistent`") {
    val r = clusterInv(Seq(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    assert(!r.getBoolean(2), r.toSeq)
  }
}
