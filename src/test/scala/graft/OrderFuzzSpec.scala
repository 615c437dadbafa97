package graft

import org.apache.spark.sql.functions._

/** Whole-surface row-order / file-layout independence.
  *
  * Every query in the inventory is DuckDB-oracled, i.e. it claims to be a
  * pure function of table CONTENT. On a real cluster the physical layout
  * is never stable — splits differ by block size, speculative tasks race,
  * compaction rewrites files — so any hidden dependence on row order,
  * partition count, or file boundaries (a first() without a sort, a
  * collect_list order leaking into output, a window missing its full
  * tiebreak) is a live 100 TB correctness bug that the single-layout
  * oracle runs can never see.
  *
  * This suite rewrites every sf0.001 table with a different partition
  * count AND a different row order (shuffled by a whole-row hash), runs
  * each of the declared queries against both layouts, and asserts the
  * canonical results are identical ([[RowCanon]]: exact except doubles at
  * 9 significant digits, absorbing legal partial-sum IEEE drift).
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
    // same content (the 108 passes below would be vacuous otherwise is
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

  SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
    test(s"layout-invariant: $q") {
      val a = RowCanon.collect(SparkEntry.queries(q)(spark, canonicalDir))
      val b = RowCanon.collect(SparkEntry.queries(q)(spark, fuzzDir))
      assert(a == b, s"$q result depends on input layout: ${RowCanon.diff(a, b)}")
    }
  }
}
