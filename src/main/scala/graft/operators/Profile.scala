package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus/data profiling operators: distribution histograms and
  * repetition-based quality signals — the "look at your data before you
  * train on it" surface of a large-scale pipeline.
  *
  * Reference scope note: the reference library treats records as opaque
  * bytes and has no profiling surface (kafka-workers README.md:24); these
  * operators belong to the training-data-pipeline extension of the build
  * brief. Both are pure aggregation trees: map-side combinable, shuffle
  * bounded by (#buckets) resp. (#distinct terms), no windows, no arrays
  * in aggregation state — shapes that hold at 100 TB.
  */
object Profile {

  /** Equi-width histogram with clamped edge buckets: bucket i covers
    * `[lo + i*w, lo + (i+1)*w)` for `w = (hi-lo)/bins`; values outside
    * `[lo, hi]` clamp into the first/last bucket (profiling convention:
    * never drop rows silently). One hash aggregation on a derived int key
    * — the shuffle carries at most `bins` rows per map partition.
    */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val bucket = least(greatest(floor((value - lo) / w), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    df.filter(value.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        round(min(value), 2).as("lo_seen"),
        round(max(value), 2).as("hi_seen"))
  }

  /** Equi-depth histogram: bucket boundaries are the approx-percentile
    * sketch cuts at fractions i/bins, so each bucket holds ~N/bins rows
    * regardless of the value distribution (the complement of the
    * fixed-range [[histogram]]: equi-width shows shape, equi-depth shows
    * quantile structure and is what skew-aware partitioning wants).
    *
    * Scale shape: the cuts are ONE map-side-combinable sketch aggregation
    * (bounded state, `accuracy` controls the 1/accuracy rank error)
    * broadcast as a 1-row frame; bucket assignment is a codegen HOF count
    * over the ≤ bins-1 cut array; the final count is a hash agg whose
    * shuffle carries at most `bins` rows per map partition. Rows with a
    * null value are excluded (a null has no quantile).
    *
    * Ties: heavily duplicated values collapse adjacent cuts, so some
    * buckets can be empty and others hold all duplicates — inherent to
    * equi-depth semantics, not a bug.
    *
    * The filtered input feeds two plan branches (the cuts sketch and the
    * bucket assignment) and re-evaluates per branch — fine over a raw
    * scan; for an expensive upstream chain pass `materialize = true` to
    * persist it once (MEMORY_AND_DISK, left cached — see
    * [[graft.operators.Corpus.runningTotal]]'s contract note). */
  def histogramEquiDepth(df: DataFrame, value: Column, bins: Int,
                         accuracy: Int = 10000,
                         materialize: Boolean = false): DataFrame = {
    require(bins > 0, "need bins > 0")
    val fracs = (1 until bins).map(_.toDouble / bins).toArray
    val present0 = df.filter(value.isNotNull)
    val present =
      if (materialize)
        present0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else present0
    val cuts = present.agg(percentile_approx(value,
      lit(fracs), lit(accuracy)).as("__hd_cuts"))
    present
      .crossJoin(broadcast(cuts))
      .select(value.as("__hd_v"), col("__hd_cuts"))
      .withColumn("bucket",
        size(filter(col("__hd_cuts"), c => c <= col("__hd_v"))).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        round(min(col("__hd_v")), 2).as("lo_seen"),
        round(max(col("__hd_v")), 2).as("hi_seen"))
  }

  /** Per-column table profile — one row per column with null fraction,
    * (approximate) distinct count, and numeric min/max: the first frame
    * anyone should look at before training on a table.
    *
    * ONE pass over the table: all measures for all columns aggregate in a
    * single map-side-combinable hash agg (a wide 1-row frame), unpivoted
    * to long form with `stack` — never one scan per column. min/max are
    * `try_cast` to double (non-numeric columns profile as null there;
    * DuckDB mirrors with TRY_CAST). Distinct counts are HLL sketches
    * (`rsd` relative error, bounded state); `exactDistinct = true` adds an
    * exact `n_distinct` column via one raw-shuffle two-phase distinct per
    * column (no Expand, no unbounded partial-dedup state — the r8-named
    * 18.3 GB sf10 spill of the old countDistinct form), at the cost of
    * one extra column-pruned scan per profiled column. */
  def columnProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
                    exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // Hostile-name safety: generated aliases are POSITIONAL (__p_cnt_0,
    // never __p_cnt_<name>), so a column named "a b", "a.b", "a'b" or
    // "a`b" cannot corrupt the stack() expression; the real name rides
    // along only as an escaped string literal, and the source column is
    // always referenced through a backtick-quoted identifier.
    def ident(c: String) = "`" + c.replace("`", "``") + "`"
    def strLit(c: String) =
      "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(expr(ident(c))).as(s"__p_cnt_$i"),
        approx_count_distinct(expr(ident(c)), rsd).as(s"__p_apx_$i"),
        // try_cast INSIDE min/max, not outside: a string-typed min buffer
        // is variable-width and demotes every phase of the whole profile
        // to SortAggregate (observed: explicit sorts over the Expand);
        // a double buffer keeps it hash-aggregated. Also the better
        // semantic — numeric min/max over the parseable values.
        expr(s"round(min(try_cast(${ident(c)} AS DOUBLE)), 2)")
          .as(s"__p_min_$i"),
        expr(s"round(max(try_cast(${ident(c)} AS DOUBLE)), 2)")
          .as(s"__p_max_$i")
      )
    }
    val wide = df.agg(count(lit(1)).as("__p_n"), aggs: _*)
    val stackCols = cols.indices.map { i =>
      s"${strLit(cols(i))}, __p_cnt_$i, __p_apx_$i, __p_min_$i, __p_max_$i"
    }.mkString(", ")
    // output name is col_name, not "column" — reserved word in DuckDB
    val names = "col_name, __p_c, approx_distinct, min_v, max_v"
    val long = wide.select(col("__p_n"),
      expr(s"stack(${cols.size}, $stackCols) AS ($names)"))
    val base = long.select(col("col_name"),
      round(lit(1.0) - col("__p_c") / col("__p_n"), 4).as("null_frac"),
      col("approx_distinct"), col("min_v"), col("max_v"))
    if (!exactDistinct) base
    else {
      // r9: per-column raw-shuffle two-phase distinct (SetOps.distinctCount
      // mechanics) instead of countDistinct inside the wide agg — the old
      // form's Expand (input × columns) and per-task partial-dedup state
      // spilled 18.3 GB at sf10 and was excluded at sf100. One extra
      // column-pruned scan per profiled column; each yields exactly one
      // (col_name, n_distinct) row (0 for an all-null column, matching
      // countDistinct), broadcast-joined onto the long profile.
      val exacts = cols.map { c =>
        df.select(expr(ident(c)).as("__p_v"))
          .where(col("__p_v").isNotNull)
          .repartition(col("__p_v")).distinct()
          .agg(count(lit(1)).as("n_distinct"))
          .select(lit(c).as("col_name"), col("n_distinct"))
      }.reduce(_ unionByName _)
      base.join(broadcast(exacts), Seq("col_name"))
        .select(col("col_name"), col("null_frac"), col("approx_distinct"),
          col("min_v"), col("max_v"), col("n_distinct"))
    }
  }

  /** Word-repetition quality signals per document (the Gopher repetition
    * family, word-granular): fraction of words taken by the most frequent
    * word, distinct-word ratio, and fraction of word bigrams taken by the
    * most frequent bigram. Highly repetitive machine-generated text scores
    * high max fractions / low distinct ratio and gets filtered before
    * training.
    *
    * Shape (round 6): MAP-ONLY. Every signal depends only on the
    * document's own tokens, so the counters come from one codegen kernel
    * pass per row ([[graft.functions.GraftHash.repetitionCounts]]) — no
    * explode, no shuffle, no join. The former explode→groupBy→join chain
    * shuffled O(corpus tokens) of (doc, term) rows for a value a map task
    * produces in place; at sf0.1 that was the heaviest-shuffle text query
    * in the inventory (5.8 MB) and at 100 TB it is corpus-sized. Word
    * identity is a 64-bit hash (the ngramRepetition convention,
    * collision odds ~len²/2^64 per doc). Docs with null text are dropped,
    * matching the explode semantics of the former shape. */
  def repetitionSignals(docs: DataFrame, id: Column, text: Column)
  : DataFrame = {
    val rc = graft.functions.GraftFunctions.repetitionCounts(
      TextFunctions.tokens(text))
    docs.filter(text.isNotNull)
      .select(id.as("doc_id"), rc.as("__rc"))
      .select(col("doc_id"),
        round(col("__rc")(0) / col("__rc")(1), 4).as("max_word_frac"),
        round(col("__rc")(2) / col("__rc")(1), 4).as("distinct_word_ratio"),
        round(when(col("__rc")(4) === 0, lit(0.0))
          .otherwise(col("__rc")(3) / col("__rc")(4)), 4)
          .as("top_bigram_frac"))
  }

  /** Discrete per-group median: the element at 0-based rank
    * floor((n-1)/2) — `quantile_disc(x, 0.5)`'s convention, chosen over
    * the interpolated median deliberately: the result is an EXACT data
    * value, so no engine's a+(b-a)·f vs (a+b)/2 arithmetic can drift the
    * downstream outlier threshold. Built from a VALUE HISTOGRAM: the
    * shuffle and the per-group sort are bounded by |distinct (g, v)|, not
    * by rows — a 10^11-row group with 10^5 distinct prices sorts 10^5
    * histogram entries (exact `percentile`'s collect-everything state is
    * the thing this avoids at 100 TB). */
  private def discMedian(t: DataFrame, vCol: String): DataFrame = {
    val h = t.groupBy(col("g"), col(vCol)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col(vCol))
    val cum = h.withColumn("__cum", sum(col("__c")).over(w))
    val tot = h.groupBy(col("g")).agg(sum(col("__c")).as("__n"))
    val r = ((col("__n") - 1) / 2).cast("long")
    cum.join(tot, "g")
      .filter(col("__cum") - col("__c") <= r && r < col("__cum"))
      .select(col("g"), col(vCol).cast("double").as("med"))
  }

  /** Robust per-group outlier profile — the Hampel rule: a value is an
    * outlier when |x − median| > k · 1.4826 · MAD (1.4826 scales MAD to
    * σ under normality). Mean/stddev-based z-scores are useless for
    * profiling dirty data (the outliers inflate the very σ that is
    * supposed to catch them); median/MAD have a 50% breakdown point.
    *
    * Three scans of the input, each ending in a bounded aggregation
    * (value histogram → median, deviation histogram → MAD, final count);
    * the tiny per-group (median, mad) frames broadcast back, so nothing
    * row-sized ever shuffles. Both medians are [[discMedian]]-discrete —
    * exact data values — so the threshold arithmetic is bit-identical
    * across engines. */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
                     k: Double = 3.0): DataFrame = {
    require(k > 0, "need k > 0")
    val base = df.filter(value.isNotNull)
      .select(group.as("g"), value.cast("double").as("v"))
    val med = discMedian(base, "v")
    val withMed = base.join(broadcast(med), "g")
    val dev = withMed.select(col("g"), abs(col("v") - col("med")).as("d"))
    val mad = discMedian(dev, "d").withColumnRenamed("med", "mad")
    withMed.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("median"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(abs(col("v") - col("med")) >
            lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** EXACT top-`topN` most frequent tokens — without ever shuffling the
    * vocabulary. The naive plan (`explode → groupBy(token) → orderBy →
    * limit`) partially aggregates the full vocabulary on the map side and
    * shuffles one row per distinct token per partition — at 100 TB that is
    * billions of partial states for an answer of 10 rows. Here:
    *
    *  1. Scan 1 (map-only, nothing leaves the executor but ≤ capacity
    *     candidates + one count per partition): each partition folds its
    *     tokens through a [[graft.functions.MisraGries]] summary. The MG
    *     bound makes the union of per-partition candidates a PROVABLE
    *     superset of every token with global count > N/(capacity+1).
    *  2. Scan 2: exact counts for candidate tokens only — the stream is
    *     semi-joined against the broadcast candidate set before the
    *     aggregation, so the shuffle carries ≤ capacity × partitions rows.
    *  3. The driver verifies the guarantee actually closed: the topN-th
    *     exact count must exceed N/(capacity+1) (every non-candidate is
    *     provably below that), else the call fails fast asking for more
    *     capacity — the maxPairsPerBlock philosophy: never silently wrong.
    *
    * The candidate SET depends on partition layout (MG is order-sensitive)
    * but the OUTPUT does not: any superset recounted exactly yields the
    * same top-N (OrderFuzzSpec's layout fuzzing relies on exactly this).
    * `mapPartitions` is the honest tool for the per-partition stream fold —
    * the summary is imperative bounded state with no SQL equivalent.
    *
    * SELF-SIZING: when the bound fails to clear, the operator retries the
    * two-scan pass itself (the autoStride philosophy — the engine sizes
    * its own sketches) up to `maxCapacity`. When the failed attempt filled
    * all topN ranks it computes the EXACTLY sufficient retry capacity from
    * what it measured (N/kth + 1 — the observed rank-N count lower-bounds
    * the true one); in the thin-candidates mode (fewer candidates than
    * topN) it measures the distinct token count with one HLL scan and
    * jumps to D̃ × 1.15, where eviction is provably impossible. Either
    * way a too-small guess costs one extra pass, not a doubling ladder
    * (the loop keeps ×2 as the floor under both jumps). Measured at sf100:
    * 4096 → jump to 29485 in one retry (4 corpus scans total) vs the
    * doubling ladder's 4 attempts (8 scans). A distribution the CEILING can't prove
    * (truly flat vocabulary larger than maxCapacity) still refuses — the
    * guard is the contract; the ceiling is what keeps per-partition sketch
    * state bounded on a 1000-executor cluster (maxCapacity string entries
    * per task). */
  def heavyHitters(docs: DataFrame, text: Column, topN: Int,
                   capacity: Int = 4096,
                   maxCapacity: Int = 1 << 20,
                   onRetry: HhRetry => Unit = logRetry): DataFrame = {
    require(topN > 0 && capacity >= topN, "need topN > 0 and capacity >= topN")
    require(maxCapacity >= capacity, "need maxCapacity >= capacity")
    var cap = capacity
    while (true) {
      heavyHittersOnce(docs, text, topN, cap) match {
        case Right(df) => return df
        case Left(Insufficient(msg, mode, sufficient)) =>
          if (cap < maxCapacity) {
            // A failed attempt that still filled topN rows tells us the
            // EXACT capacity that provably clears: the observed rank-N
            // count k is a lower bound on the true rank-N count (the true
            // top-N dominates any candidate top-N), so cap' = N/k + 1 gives
            // bound = floor(N/(cap'+1)) < k ≤ true k. Jumping there turns
            // the blind-doubling ladder (measured 4 attempts = 8 corpus
            // scans at sf100) into exactly one retry; the thin-candidates
            // mode computes its own jump from an HLL distinct count.
            val next = math.min(maxCapacity.toLong,
              math.max(cap.toLong * 2L,
                sufficient.getOrElse(0L))).toInt
            onRetry(HhRetry(cap, next, mode, msg))
            cap = next
          } else throw new graft.GraftException(
            s"$msg [self-sizing exhausted: capacity grew " +
              s"$capacity → $cap hit maxCapacity=$maxCapacity]")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One self-sizing retry of [[heavyHitters]]: the capacity jump and
    * which failure mode forced it (`"fat-head"` — bound not cleared with
    * all topN ranks filled; `"thin-candidates"` — fewer candidates than
    * topN with uncovered stream mass). A typed hook rather than a log
    * line so callers (and tests) can observe retry behavior without
    * parsing stderr. */
  final case class HhRetry(fromCapacity: Int, toCapacity: Int,
                           mode: String, detail: String)

  /** Default [[heavyHitters]] retry hook: surface the jump on the driver
    * log — every retry is two more full corpus scans, so a silently
    * retrying call that looks "4× slow" should be diagnosable. */
  private def logRetry(r: HhRetry): Unit =
    System.err.println(
      s"heavyHitters: capacity ${r.fromCapacity} insufficient, retrying " +
        s"at ${r.toCapacity} — ${r.detail}")

  /** A failed bounded attempt: the reason, the failure mode (the
    * [[HhRetry]] vocabulary), plus the capacity that provably suffices
    * on retry. */
  private final case class Insufficient(msg: String, mode: String,
                                        sufficient: Option[Long])

  /** One bounded two-scan attempt at `capacity`; Left when the MG
    * bound cannot prove the answer at this capacity. */
  private def heavyHittersOnce(docs: DataFrame, text: Column, topN: Int,
                               capacity: Int): Either[Insufficient, DataFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(TextFunctions.tokens(text)).as("token"))
    val summaries = toks.select(col("token")).as[String]
      .mapPartitions { it =>
        val mg = new graft.functions.MisraGries(capacity)
        var np = 0L
        it.foreach { t => mg.offer(t); np += 1L }
        mg.items.iterator.map(t => (0, t, 0L)) ++ Iterator.single((1, "", np))
      }.toDF("tag", "token", "np")
    summaries.persist()
    try {
      val total = summaries.filter(col("tag") === 1)
        .agg(coalesce(sum(col("np")), lit(0L))).head().getLong(0)
      val candidates = summaries.filter(col("tag") === 0)
        .select(col("token")).distinct()
      val grouped = toks
        .join(broadcast(candidates), Seq("token"), "left_semi")
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      grouped.persist()
      try {
        // ranks are assigned on the driver over the already-sorted ≤ topN
        // collected rows — a row_number window here would be the global
        // single-partition sort the plan-hygiene guard (rightly) bans
        val top = grouped
          .orderBy(col("cnt").desc, col("token").asc)
          .limit(topN)
          .select(col("token"), col("cnt"))
          .collect()
        val rows = top.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), r.getLong(1), i + 1)
        }
        val bound = total / (capacity + 1L)
        if (rows.length == topN) {
          val kth = rows.map(_.getLong(1)).min
          if (kth <= bound)
            return Left(Insufficient(
              s"heavyHitters: rank-$topN count $kth does not clear the " +
                s"Misra-Gries bound N/(capacity+1) = $bound, so a " +
                s"non-candidate token could tie or beat it — raise " +
                s"capacity (= $capacity) until the bound clears (flat " +
                s"distributions have no heavy hitters to find)",
              mode = "fat-head",
              sufficient = Some(total / math.max(1L, kth) + 1L)))
        } else {
          // fewer candidates than topN: only legitimate when the
          // candidates ARE the complete vocabulary (their exact counts
          // must account for every token in the stream) — otherwise some
          // evicted token belongs in the unfilled ranks
          val covered = grouped.agg(coalesce(sum(col("cnt")), lit(0L)))
            .head().getLong(0)
          if (covered != total) {
            // Thin-candidates computed jump: eviction is IMPOSSIBLE once
            // per-partition capacity ≥ the distinct token count D (the
            // sketch then just counts exactly, candidates = vocabulary,
            // covered == total). D is measurable in one extra bounded
            // scan — an HLL sketch, paid only on this failure path — so
            // jump to D̃ × 1.15 (3σ over the 5% rsd) instead of blind
            // doubling; an HLL underestimate still falls back to the
            // retry loop's ×2 floor.
            val estD = toks
              .agg(approx_count_distinct(col("token"), 0.05))
              .head().getLong(0)
            return Left(Insufficient(
              s"heavyHitters: only ${rows.length} candidate tokens for " +
                s"topN=$topN and they cover $covered of $total stream " +
                s"tokens — the vocabulary is flat enough that the sketch " +
                s"evicted real ranks; raise capacity (= $capacity)",
              mode = "thin-candidates",
              sufficient = Some(math.ceil(estD * 1.15).toLong)))
          }
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("token",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType, nullable = false)))
        Right(spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema))
      } finally grouped.unpersist()
    } finally summaries.unpersist()
  }
}
