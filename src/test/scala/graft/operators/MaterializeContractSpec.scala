package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The materialize-first contract on multi-branch operators is MECHANICAL,
  * not scaladoc: `materialize = true` persists the shared subtree so an
  * expensive upstream chain is evaluated once however many plan branches
  * reference it. Pinned by counting parquet scans vs cached scans in the
  * executed (post-AQE) plan, with result equality both ways.
  */
class MaterializeContractSpec extends SparkSpecBase {
  import spark.implicits._

  private def executedPlan(df: DataFrame): String = {
    df.collect() // finalize THIS QueryExecution's adaptive plan
    df.queryExecution.executedPlan.toString
  }
  private def parquetScans(p: String): Int =
    "Scan parquet".r.findAllIn(p).size
  private def cachedScans(p: String): Int =
    "InMemoryTableScan".r.findAllIn(p).size
  // every InMemoryTableScan prints its InMemoryRelation's BUILD plan
  // (containing the one real FileScan) inline — a parquet-scan mention is
  // "live" only if it isn't that cached-build echo
  private def liveParquetScans(p: String): Int =
    parquetScans(p) - "InMemoryRelation".r.findAllIn(p).size
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("runningTotal: branch scans collapse onto one cached build") {
    try {
      val mk = (m: Boolean) => Corpus.runningTotal(docs, col("doc_id"),
        lit(1L), Corpus.hashUniform(col("doc_id"), ""), buckets = 8,
        materialize = m)
      // plain FIRST: once the persist exists, Spark's CacheManager would
      // substitute the cached subtree into ANY later matching plan
      val plain = mk(false)
      val pPlain = executedPlan(plain)
      assert(parquetScans(pPlain) >= 2 && cachedScans(pPlain) == 0,
        s"expected per-branch parquet re-scans, got:\n$pPlain")
      val mat = mk(true)
      val pMat = executedPlan(mat)
      assert(cachedScans(pMat) >= 2,
        s"branches must read the cache when materialized:\n$pMat")
      assert(liveParquetScans(pMat) <= 0,
        s"materialized plan still re-scans parquet per branch:\n$pMat")
      assert(rows(mat) == rows(plain))
    } finally spark.catalog.clearCache()
  }

  test("bm25TopK: corpus tokenization evaluated once when materialized") {
    try {
      val qk = Seq((0, Seq("the", "of", "a", "data")))
        .toDF("query_id", "kws")
      val mk = (m: Boolean) => Corpus.bm25TopK(docs, col("doc_id"),
        col("text"), qk, k = 5, materialize = m)
      val plain = mk(false)
      val pPlain = executedPlan(plain)
      assert(parquetScans(pPlain) >= 2 && cachedScans(pPlain) == 0,
        s"expected per-branch parquet re-scans, got:\n$pPlain")
      val mat = mk(true)
      val pMat = executedPlan(mat)
      assert(cachedScans(pMat) >= 2,
        s"stats/df/tf branches must read the token cache:\n$pMat")
      assert(liveParquetScans(pMat) <= 0,
        s"materialized plan still re-tokenizes the corpus:\n$pMat")
      assert(rows(mat) == rows(plain))
    } finally spark.catalog.clearCache()
  }

  test("histogramEquiDepth: cuts + assignment share one cached input") {
    try {
      val mk = (m: Boolean) => Profile.histogramEquiDepth(lineitem,
        col("l_extendedprice"), bins = 8, materialize = m)
      val plain = mk(false)
      val pPlain = executedPlan(plain)
      assert(parquetScans(pPlain) >= 2 && cachedScans(pPlain) == 0,
        s"expected per-branch parquet re-scans, got:\n$pPlain")
      val mat = mk(true)
      val pMat = executedPlan(mat)
      assert(cachedScans(pMat) >= 2,
        s"cuts and assignment must both read the cache:\n$pMat")
      assert(liveParquetScans(pMat) <= 0,
        s"materialized plan still re-scans parquet per branch:\n$pMat")
      assert(rows(mat) == rows(plain))
    } finally spark.catalog.clearCache()
  }
}
