package graft

import org.apache.spark.sql.functions._

/** Whole-surface execution-environment independence.
  *
  * Every query in the inventory is DuckDB-oracled, i.e. it claims to be a
  * pure function of table CONTENT. On a real cluster nothing else is
  * stable: physical layout shifts (splits differ by block size,
  * speculative tasks race, compaction rewrites files), AQE re-plans
  * mid-query (coalesced reducers, skew-split joins), and the reducer
  * count is a per-deployment tuning knob (32 here, thousands there). Any
  * hidden dependence on those — a first() without a sort, a collect_list
  * order leaking into output, a window missing its full tiebreak, bucket
  * logic tied to the physical partition count — is a live 100 TB
  * correctness bug that the single-layout, single-config oracle runs can
  * never see.
  *
  * For each of the declared queries this suite pins THREE perturbed
  * executions to the canonical result ([[RowCanon]]: exact except doubles
  * at 9 significant digits, absorbing legal partial-sum IEEE drift):
  *  1. every sf0.001 table rewritten with a different partition count and
  *     whole-row-hash row order;
  *  2. AQE disabled (the plans normally run under AQE — identical results
  *     prove no semantics leaked into its runtime re-planning);
  *  3. spark.sql.shuffle.partitions 4 → 13 (a different reducer count
  *     re-buckets every exchange and reorders every partial-agg merge).
  */
class OrderFuzzSpec extends SparkSpecBase {

  private val canonicalDir = "/root/testdata/sf0.001"
  private lazy val fuzzDir: String = {
    val dir = new java.io.File("target/order-fuzz-sf0.001").getAbsolutePath
    Tables.all.foreach { name =>
      val df = Tables.load(spark, canonicalDir, name)
      // whole-row hash as the shuffle + in-partition sort key: different
      // partition count (5 vs the driver's layout), different row order
      // (hash desc vs insertion), different file boundaries
      val key = hash(lit(name) +: df.columns.map(col).toSeq: _*)
      df.withColumn("__fuzz", key)
        .repartition(5, col("__fuzz"))
        .sortWithinPartitions(col("__fuzz").desc)
        .drop("__fuzz")
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("the fuzz harness is falsifiable: layout really differs") {
    // same content (the per-query passes below would be vacuous otherwise is
    // ruled out by each test's equality itself), but a DIFFERENT physical
    // order and file count — an order-dependent query (limit(1), first()
    // without sort, collect_list leaking into output) cannot pass both
    val a = spark.read.parquet(s"$canonicalDir/documents.parquet")
    val b = spark.read.parquet(s"$fuzzDir/documents.parquet")
    assert(a.inputFiles.length != b.inputFiles.length ||
      !a.head(5).sameElements(b.head(5)),
      "fuzzed layout is indistinguishable from the canonical one")
    assert(!a.select("doc_id").head(5).map(_.get(0)).toSeq
      .equals(b.select("doc_id").head(5).map(_.get(0)).toSeq),
      "fuzzed row order matches the canonical order")
  }

  private def withConf[A](kv: (String, String))(body: => A): A = {
    val old = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try body
    finally old match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
    test(s"layout/AQE/reducer-count invariant: $q") {
      val base = RowCanon.collect(SparkEntry.queries(q)(spark, canonicalDir))
      val fuzz = RowCanon.collect(SparkEntry.queries(q)(spark, fuzzDir))
      assert(base == fuzz,
        s"$q result depends on input layout: ${RowCanon.diff(base, fuzz)}")
      val noAqe = withConf("spark.sql.adaptive.enabled" -> "false") {
        RowCanon.collect(SparkEntry.queries(q)(spark, canonicalDir))
      }
      assert(base == noAqe,
        s"$q result depends on AQE re-planning: ${RowCanon.diff(base, noAqe)}")
      val reducers13 = withConf("spark.sql.shuffle.partitions" -> "13") {
        RowCanon.collect(SparkEntry.queries(q)(spark, canonicalDir))
      }
      assert(base == reducers13,
        s"$q result depends on the reducer count: ${RowCanon.diff(base, reducers13)}")
    }
  }
}
