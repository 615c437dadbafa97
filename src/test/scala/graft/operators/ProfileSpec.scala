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

  test("histogramEquiDepth balances a skewed distribution, drops nothing") {
    // x^3-skewed values: equi-WIDTH would pile most rows into low buckets;
    // equi-depth must land n/bins (+/- rounding) in every bucket
    val df = spark.range(10000L)
      .selectExpr("cast(id * id * id as double) as x")
    val h = Profile.histogramEquiDepth(df, col("x"), bins = 10)
      .select("bucket", "cnt").as[(Int, Long)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq == (0 until 10), s"bucket ids: ${h.toSeq}")
    assert(h.map(_._2).sum == 10000L, "equi-depth must never drop rows")
    h.foreach { case (b, c) =>
      assert(math.abs(c - 1000L) <= 10, s"bucket $b holds $c of ~1000")
    }
    // buckets are contiguous in value order (edges monotone)
    val edges = Profile.histogramEquiDepth(df, col("x"), bins = 10)
      .select("bucket", "lo_seen", "hi_seen")
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    edges.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"bucket overlap: $a then $b")
    }
  }

  test("histogramEquiDepth invariants hold across distribution shapes (seeded)") {
    val rnd = new scala.util.Random(4040L)
    val shapes: Seq[(String, Double => Double)] = Seq(
      ("uniform", u => u),
      ("exponential", u => -math.log(1.0 - u * 0.999999)),
      ("heavy-tail", u => math.pow(1.0 - u * 0.999999, -2.0)))
    for ((name, f) <- shapes; bins <- Seq(4, 16)) {
      val n = 2000 + rnd.nextInt(2000)
      val xs = (0 until n).map(i => f(rnd.nextDouble()) + i * 1e-9) // distinct
      val h = Profile.histogramEquiDepth(xs.toDF("x"), col("x"), bins)
        .select("bucket", "cnt", "lo_seen", "hi_seen")
        .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
      assert(h.map(_._2).sum == n, s"$name/$bins dropped rows")
      assert(h.map(_._1).forall(b => b >= 0 && b < bins),
        s"$name/$bins bucket out of range: ${h.map(_._1).toSeq}")
      // depth balance within the sketch's rank-error band (+ rounding)
      val band = 2.0 * n / 10000 + 2.0
      h.foreach { case (b, c, _, _) =>
        assert(math.abs(c - n.toDouble / bins) <= band + n % bins,
          s"$name/$bins bucket $b holds $c of ~${n / bins}")
      }
      // buckets partition the value axis in order
      h.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3,
          s"$name/$bins overlap: $a then $b")
        case _ =>
      }
    }
  }

  test("histogramEquiDepth excludes nulls and collapses duplicate cuts") {
    val df = (Seq.fill(95)(Some(1.0)) ++ Seq(Some(2.0)) ++
      Seq.fill(4)(Option.empty[Double])).toDF("x")
    val h = Profile.histogramEquiDepth(df, col("x"), bins = 4)
      .select("bucket", "cnt").as[(Int, Long)].collect().toMap
    // all cuts equal 1.0: the 95 duplicates land above every cut
    // (c <= v counts all 3 cuts), 2.0 joins them; nulls are excluded
    assert(h.values.sum == 96, s"nulls must be excluded, got $h")
  }

  test("columnProfile: one row per column, exact stats, one scan") {
    val df = Seq(("a", Some(1L), Some(1.5)), ("b", Some(2L), None),
      ("a", None, Some(9.25))).toDF("s", "k", "v")
    val r = Profile.columnProfile(df, Seq("s", "k", "v"),
        exactDistinct = true)
      .as[(String, Double, Long, Option[Double], Option[Double], Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(r("s") == ("s", 0.0, 2L, None, None, 2L)) // strings: null min/max
    assert(r("k") == ("k", 0.3333, 2L, Some(1.0), Some(2.0), 2L))
    assert(r("v") == ("v", 0.3333, 2L, Some(1.5), Some(9.25), 2L))
    // the approx-only (100 TB) variant plans no Expand and a single scan
    val p = Profile.columnProfile(df, Seq("s", "k", "v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"),
      s"approx-only profile must not expand the input:\n$p")
    assert("Scan".r.findAllIn(p).size == 1,
      s"profile must read the table exactly once:\n$p")
  }

  test("columnProfile survives hostile column names") {
    // spaces, dots, dashes, quotes, and backticks: the generated aliases
    // are positional and the name only appears as an escaped literal /
    // quoted identifier, so none of these may break parsing or leak into
    // the wrong expression
    val df = Seq(("a", 1.0), ("b", 2.0), (null, 3.0))
      .toDF("weird col-na.me", "q'uo`te")
    val r = Profile.columnProfile(df, Seq("weird col-na.me", "q'uo`te"))
      .orderBy("col_name")
      .as[(String, Double, Long, Option[Double], Option[Double])]
      .collect()
    assert(r.map(_._1).toSeq == Seq("q'uo`te", "weird col-na.me"),
      "the real name must survive as the col_name literal")
    assert(r(0) == ("q'uo`te", 0.0, 3L, Some(1.0), Some(3.0)))
    assert(r(1) == ("weird col-na.me", 0.3333, 2L, None, None))
  }

  test("repetitionSignals plan: map-only, zero shuffle") {
    // every signal is row-local — the plan must be a bare projection over
    // the scan: no Exchange, no Generate (explode), no join, no window
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = Profile.repetitionSignals(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    for (bad <- Seq("Exchange", "Generate", "Join", "Window", "Aggregate"))
      assert(!p.contains(bad), s"repetition signals grew a $bad:\n$p")
  }

  test("robustOutliers: hand-computed median/MAD/outlier counts") {
    // group g1: values 1..9 plus a wild 1000
    //   n=10, disc-median rank floor(9/2)=4 -> 5.0
    //   deviations |x-5|: 4,3,2,1,0,1,2,3,4,995 sorted 0,1,1,2,2,3,3,4,4,995
    //   disc-MAD rank 4 -> 2.0; threshold 3*1.4826*2 = 8.8956
    //   only |1000-5|=995 exceeds -> 1 outlier
    // group g2: constant 7 -> median 7, MAD 0, threshold 0, no outliers
    val rows = (1 to 9).map(v => ("g1", v.toDouble)) ++
      Seq(("g1", 1000.0)) ++ Seq.fill(4)(("g2", 7.0))
    val df = rows.toDF("k", "x")
    val out = Profile.robustOutliers(df, col("k"), col("x"), k = 3.0)
      .orderBy("g").select("g", "n", "median", "mad", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out == Seq(("g1", 10L, 5.0, 2.0, 1L), ("g2", 4L, 7.0, 0.0, 0L)))
  }

  test("robustOutliers: nulls excluded, even-count discrete rank") {
    // n=4 after null drop: disc rank floor(3/2)=1 -> second-smallest
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("a", Some(40.0)), ("a", None)).toDF("k", "x")
    val out = Profile.robustOutliers(df, col("k"), col("x"))
      .select("n", "median").as[(Long, Double)].collect().head
    assert(out == ((4L, 20.0)))
  }

  test("robustOutliers plan: histogram aggregations, value never row-shuffled") {
    // the input reaches its aggregations through histogram groupBys; the
    // final join sides are broadcast (tiny per-group stat frames)
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x")
    val plan = Profile.robustOutliers(df, col("k"), col("x"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-group stats must broadcast back:\n$plan")
  }

  test("heavyHitters equals the exact full groupBy top-N on skewed data") {
    // Zipf-ish corpus: token i appears ~1000/i times; heavy head, long tail
    val docs = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val got = Profile.heavyHitters(docs, col("text"), topN = 10,
        capacity = 256)
      .select("token", "cnt", "rank").as[(String, Long, Int)].collect().toSeq
    val want = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }.toSeq
    assert(got == want)
  }

  test("heavyHitters output is partition-layout invariant (MG set is not)") {
    val docs = (1 to 40).flatMap(i => Seq.fill(500 / i)(s"w$i"))
      .grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val a = Profile.heavyHitters(docs.repartition(1), col("text"), 5, 128)
      .collect().map(_.toSeq).toSeq
    val b = Profile.heavyHitters(
        docs.repartition(16, col("text")), col("text"), 5, 128)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "exact recount must erase the sketch's order-sensitivity")
  }

  test("heavyHitters refuses a flat distribution the CEILING cannot prove") {
    // near-uniform vocabulary, capacity ceiling below the vocabulary size:
    // no capacity ≤ maxCapacity can clear N/(capacity+1), so silence would
    // risk a wrong answer — must throw even after self-sizing retries
    val docs = (1 to 3000).map(i => s"u$i").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val e = intercept[graft.GraftException] {
      Profile.heavyHitters(docs, col("text"), topN = 10, capacity = 16,
        maxCapacity = 64)
    }
    // either guard branch is a legitimate trip: the rank-N count failing
    // the MG bound, or the candidate set coming back too thin to fill topN
    assert(e.getMessage.contains("raise capacity"),
      s"unexpected guard message: ${e.getMessage}")
    assert(e.getMessage.contains("self-sizing exhausted"),
      s"ceiling refusal must say the retries happened: ${e.getMessage}")
  }

  test("heavyHitters self-sizes past a too-small initial capacity") {
    // same flat corpus, default ceiling: doubling 16 → 4096 ≥ vocabulary
    // makes the sketch lossless, the candidates cover the whole stream,
    // and the exact recount's top-10 (all counts 1, token-asc tie-break)
    // is provable — the caller never has to intervene
    val docs = (1 to 3000).map(i => s"u$i").grouped(10)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val got = Profile.heavyHitters(docs, col("text"), topN = 10,
        capacity = 16)
      .select("token", "cnt", "rank").as[(String, Long, Int)].collect().toSeq
    val want = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }.toSeq
    assert(got == want)
  }

  test("heavyHitters computed jump clears a failed bound in ONE retry") {
    // fat head + flat tail, the sf100 shape: attempt 1 fills all topN
    // ranks but kth = 50 ≤ bound = N/(cap+1), so instead of a doubling
    // ladder the retry must jump straight to N/kth + 1 and succeed —
    // each avoided attempt is two full corpus scans at scale
    val docs = ((1 to 20).flatMap(i => Seq.fill(50)(f"h$i%02d")) ++
      (1 to 5000).map(i => s"t$i"))
      .grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val retries = scala.collection.mutable.ArrayBuffer.empty[Profile.HhRetry]
    val got = Profile.heavyHitters(docs, col("text"), topN = 10,
        capacity = 16, onRetry = retries += _)
      .select("token", "cnt", "rank")
      .as[(String, Long, Int)].collect().toSeq
    val want = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }.toSeq
    assert(got == want)
    assert(retries.length == 1,
      s"computed jump must converge in exactly one retry, took " +
        s"${retries.length}: $retries")
    assert(retries.head.mode == "fat-head", s"expected fat-head: $retries")
  }

  test("heavyHitters self-sizes on a thin-candidate corpus (starved topN)") {
    // Genuinely starved candidates: 300 all-distinct tokens through ONE
    // partition at capacity 25 — the MG decrement cycle evicts everything
    // every 26 offers, leaving 300 mod 26 = 14 < topN survivors whose
    // exact counts cover 14 of 300 stream tokens. The retry must jump to
    // the HLL-measured distinct count ×1.15 (~345, where eviction is
    // impossible) and converge in ONE retry, not the doubling ladder's
    // four (25 → 50 → 100 → 200 → 400).
    val docs = (1 to 300).map(i => f"w$i%03d")
      .grouped(13).map(_.mkString(" ")).toSeq.toDF("text").coalesce(1)
    val retries = scala.collection.mutable.ArrayBuffer.empty[Profile.HhRetry]
    val got = Profile.heavyHitters(docs, col("text"), topN = 25,
        capacity = 25, onRetry = retries += _)
      .select("token", "cnt", "rank")
      .as[(String, Long, Int)].collect().toSeq
    assert(retries.length == 1,
      s"thin-candidates computed jump must converge in one retry, took " +
        s"${retries.length}: $retries")
    // and it must be the THIN failure mode that retried (candidate
    // shortfall), not the fat-head bound
    assert(retries.head.mode == "thin-candidates",
      s"expected the thin-candidates mode, got: $retries")
    val want = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(25)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }.toSeq
    assert(got == want)
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
