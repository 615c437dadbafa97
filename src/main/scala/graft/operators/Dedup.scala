package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design notes (the point of each variant at 100 TB):
  *  - exact: one hash-groupBy over a digest — single map-side-combinable
  *    shuffle keyed by md5(text); no text is shuffled, only 32-byte digests.
  *  - minhashLSH: shingles → k-minima signature (one pass, no shuffle) →
  *    band buckets → self-join *within buckets only*. The only shuffle is
  *    by (band, bucketHash); candidate pairs are verified with exact
  *    Jaccard. Classic MinHash-LSH (Broder 1997; Leskovec et al., MMDS ch.3).
  *  - simhash: 64-bit signature, candidates via 4×16-bit band blocking
  *    (any pair within Hamming distance 3 shares ≥1 of 4 bands — pigeonhole).
  *  - tokenJaccard: blocked exact Jaccard for modest candidate sets.
  *  - embedding: cosine near-dup, blocked (label/bucket) to avoid N².
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical digest.
    * Returns (docId → canonicalId) only for rows in a duplicate group.
    *
    * Aggregation state is BOUNDED: the per-digest reduction is
    * `min`/`count` only — both map-side combinable, O(1) state per group —
    * and members are recovered by joining the digest frame back against
    * the (rare) duplicate groups. A collect_list formulation would build
    * the whole member array of a group inside one aggregation buffer, and
    * at 100 TB degenerate digests (empty strings, boilerplate pages) have
    * millions of members — an executor-OOM shape no matter how the groups
    * shuffle. The join-back costs a second scan of (id, digest) — 40-byte
    * rows with the text column pruned.
    *
    * The join-back is SALTED by default (round-6 finding): AQE's skew-join
    * split does NOT cover this shape — OptimizeSkewedJoin only matches a
    * join whose children are bare (sorted) exchanges, and the groups side
    * here is Filter(HashAggregate(exchange)), so a hot digest's reduce
    * partition would stream through ONE task no matter the confs
    * (disproven live by DedupScaleSpec's 90%-hot probe). [[Skew.saltedJoin]]
    * splits a hot digest across `saltBuckets` reducers deterministically:
    * the keyed side salts by row hash, the (tiny, 1-row-per-dup-digest)
    * groups side replicates ×saltBuckets. `saltBuckets <= 1` restores the
    * plain join for corpora known to be skew-free. */
  def exactDuplicates(docs: DataFrame, id: Column, text: Column,
                      saltBuckets: Int = 16): DataFrame = {
    val keyed = docs.select(id.as("doc_id"), md5(text).as("digest"))
    val groups = keyed
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
      .filter(col("group_size") > 1)
    val joined =
      if (saltBuckets > 1)
        // doc_id is the per-row-distinct spread key: (doc_id, digest) rows
        // for a hot digest would all hash identically under the whole-row
        // default only if doc_ids repeated — passing it explicitly keeps
        // the spread guarantee independent of future column changes here
        Skew.saltedJoin(keyed, groups, "digest", saltBuckets,
          rowKey = Some(col("doc_id")))
      else keyed.join(groups, Seq("digest"))
    joined.filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"), col("canonical_id"), col("group_size"))
  }

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    *
    * @param shingleSize word n-gram size for shingles
    * @param numHashes   signature width k
    * @param bands       LSH bands (rows per band = k / bands); pairs with
    *                    signature agreement on ≥1 full band become candidates
    * @param threshold   exact word-shingle Jaccard acceptance threshold
    */
  def minhashLsh(docs: DataFrame, id: Column, text: Column,
                 shingleSize: Int = 3, numHashes: Int = 64,
                 bands: Int = 16, threshold: Double = 0.7,
                 bucketCap: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingles = array_distinct(TextFunctions.wordNGrams(text, shingleSize))

    // Signature path never builds shingle STRINGS: the fused
    // MinHashShingles kernel hashes each word n-gram positionally and
    // maintains the k minima in one codegen'd loop (Spark's higher-order
    // functions evaluate lambdas interpreted — avoiding them here is ~10×).
    // Duplicate shingles can't affect a min, so no distinct is needed.
    // String shingles are only materialized later, for verification, and
    // only for candidate docs.
    val sig = docs.select(
      id.as("doc_id"),
      GraftFunctions.minhashShingles(TextFunctions.tokens(text),
        shingleSize, numHashes).as("sig"))

    // band → one bucket value per band: murmur3-hash the band's slice.
    // bands is a static Int, so the band array unrolls at plan time and the
    // slice offsets are constants (stays in whole-stage codegen). The
    // banded frame carries ONLY (doc_id, band, bucket) — at scale the LSH
    // shuffle moves ~20 bytes/row, never the shingle arrays.
    val bandBuckets = array((0 until bands).map(b =>
      hash(slice(col("sig"), b * rows + 1, rows))): _*)
    val banded = sig.select(
      col("doc_id"), posexplode(bandBuckets).as(Seq("band", "bucket")))

    // Pairs within each (band, bucket) via groupBy + in-bucket pair
    // expansion — ONE pass over the signature subtree. A self-join would
    // evaluate the whole scan+shingle+minhash tree twice (Spark does not
    // reuse non-identical exchange branches). The bucket cap bounds the
    // state and the quadratic pair blowup of an adversarial hot bucket.
    val candidates = bucketPairs(banded, "doc_id", bucketCap)

    // Verify candidates with exact Jaccard — but only ever compute shingle
    // arrays for docs that appear in a candidate pair: semi-join the id set
    // first, then project the (expensive) shingles for those rows alone.
    // At scale this is the difference between re-shingling the whole corpus
    // twice and shingling a few thousand candidates.
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("cand_id"))
      .distinct()
    // semi-join BEFORE projecting shingles, so the shingle expression only
    // evaluates for surviving rows (Catalyst keeps the project above the
    // join; only column pruning is pushed into the branches).
    val candShingles = docs
      .join(candIds, id === col("cand_id"), "left_semi")
      .select(id.as("doc_id"), shingles.as("sh"))
    candidates
      .join(candShingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(candShingles.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard",
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** In-bucket candidate pairs from a banded frame (band, bucket, `idCol`):
    * cap each bucket at its `bucketCap` smallest ids, then groupBy +
    * collect + pair expansion.
    *
    * The cap bounds the quadratic pair blowup of an adversarial hot bucket
    * (≤ cap²/2 pairs) AND the aggregation state (collect_list only ever
    * sees ≤ cap rows per bucket).
    *
    * CAP-FORM CHOICE (r9, measured): this site caps via the row_number
    * WINDOW, not the bounded [[GraftFunctions.collectSmallest]] aggregate.
    * MinHash buckets live in a 2^64 hash space — occupancy ≪ 1, so the
    * group count ≈ the banded row count. In that regime the window wins:
    * its sort is Tungsten radix over 20-byte rows and the following
    * groupBy rides the SAME sort (sorted-run aggregation, already
    * partitioned), while the object aggregate allocates per-group PQ
    * state for millions of one-row groups and falls back to
    * object-SERIALIZED external sort past 128 keys/task. Context-matched
    * sf100 measurements: dedup_simhash 55.0 s (aggregate) → 28.6 s
    * (window) at identical sweep positions; dedup_minhash solo returns to
    * its r8 window-form cost (38 s) with BIT-identical shuffle/spill
    * metrics. (Sweep-position numbers for these queries swing up to ×4
    * with the PREDECESSOR query's spill pressure in a shared bench JVM —
    * see Bench's scaladoc — so only matched-context or solo comparisons
    * are admissible.) The bounded aggregate remains the right form where
    * buckets are genuinely OCCUPIED — the corpus-sized-band hyperplane
    * LSH site keeps it (its in-bucket window sort was the 137 GB
    * memory-equivalent spill the r8 verdict named; the aggregate form
    * measured 178.8 s vs the window's 231.2 s at sf100 solo).
    *
    * SKEW CAVEAT: the occupancy ≪ 1 argument assumes near-distinct
    * signatures. A duplicate-heavy corpus — the adversarial input dedup
    * targets — collapses mass exact-duplicates into ONE identical-signature
    * bucket per band, and the window must sort that entire hot bucket
    * before `rn <= cap` discards it: spillable external sort, not
    * unbounded memory, but it is exactly the state mode the cap was built
    * to avoid. Callers should run EXACT dedup first (the standard pipeline
    * order — exact dedup is cheaper and removes the identical-signature
    * mass), after which the near-distinct assumption holds by
    * construction. */
  private[graft] def bucketPairs(banded: DataFrame, idCol: String,
                                 bucketCap: Int): DataFrame = {
    require(bucketCap > 1, "bucketCap must allow at least one pair")
    val wB = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col(idCol).asc)
    banded
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= bucketCap)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash near-dup: pairs within `maxHamming` of each other, blocked by
    * 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ some band of 4 is identical). */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3, bucketCap: Int = 10000): DataFrame = {
    val sig = docs.select(id.as("doc_id"),
      GraftFunctions.simhash(TextFunctions.tokens(text)).as("sim"))
    simhashPairsFromSig(sig, sigBits = 64, bands = 4,
      maxHamming = maxHamming, bucketCap = bucketCap)
  }

  /** Band-blocked near-dup pairs from a precomputed signature frame
    * (doc_id, sim). Recall is EXACT for maxHamming ≤ bands − 1: a pair
    * differing in ≤ bands−1 bits cannot differ in every one of the `bands`
    * disjoint bit slices (pigeonhole), so it shares ≥ 1 band bucket; the
    * hamming verification then makes precision exact too. Larger maxHamming
    * values are rejected rather than silently losing pairs.
    *
    * Scale limit (same class as the hyperplane-LSH finding the r7 sf1
    * sweep measured, but NOT auto-fixable here): the bucket space is
    * 2^(sigBits/bands), fixed by the pigeonhole guarantee — 4 bands of 16
    * bits for hamming ≤ 3 on 64-bit signatures. Beyond ~10⁸ docs average
    * occupancy exceeds `bucketCap` and recall degrades cap-bounded (the
    * cap keeps cost linear; it cannot keep recall exact). Past that scale,
    * widen the signature (e.g. two 64-bit simhashes over disjoint token
    * halves → 8×16-bit bands) or pre-partition the corpus; at the sf1
    * decade (50k docs over 65k buckets/band) occupancy is ~1 and the
    * sweep measured ratio 1.2.
    *
    * Same shuffle economics as [[minhashLsh]]: the grouped pair expansion
    * evaluates the signature subtree once (no self-join), carries only
    * (doc_id, sim) = 16 bytes/row through the bucket shuffle, and the
    * per-bucket capping window (spillable radix sort over tiny bucket
    * partitions — the measured-right form for hashed band spaces, see
    * [[bucketPairs]]) bounds hot-bucket state and pair blowup.
    */
  def simhashPairsFromSig(sig: DataFrame, sigBits: Int, bands: Int,
                          maxHamming: Int,
                          bucketCap: Int = 10000): DataFrame = {
    require(bands > 0 && sigBits % bands == 0, "bands must divide sigBits")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"band blocking guarantees recall only for maxHamming <= bands-1 " +
        s"(got maxHamming=$maxHamming, bands=$bands)")
    val bitsPerBand = sigBits / bands
    val mask = if (bitsPerBand >= 64) -1L else (1L << bitsPerBand) - 1L
    val bandCols = array((0 until bands).map(b =>
      shiftright(col("sim"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)
    val banded = sig.select(col("doc_id"), col("sim"),
      posexplode(bandCols).as(Seq("band", "bucket")))
    // window cap, not collectSmallest: hashed band spaces put ~1 row in
    // ~every bucket — the tiny-group regime where the object aggregate
    // measured ×2-×7 slower (see bucketPairs scaladoc)
    val wB = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col("doc_id").asc)
    banded
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= bucketCap)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sim"))))
        .as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1),
          |    y -> struct(x.doc_id AS id_a, x.sim AS sim_a,
          |                y.doc_id AS id_b, y.sim AS sim_b))))""".stripMargin))
        .as("p"))
      // hamming BEFORE the pair dedup: it's a pure per-pair function
      // (same value in every band a pair lands in), and one xor+popcount
      // per candidate is map-side — so the dropDuplicates exchange
      // carries only TRUE near-dup pairs at 20 B/row instead of every
      // candidate with both 8-byte signatures aboard. The sf10 sweep
      // measured the difference: 14.6 GB of sort spill at 500k docs came
      // from deduplicating the raw candidate stream.
      .select(col("p.id_a"), col("p.id_b"),
        GraftFunctions.hamming(col("p.sim_a"), col("p.sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Wide-signature SimHash near-dup — the documented path past the narrow
    * form's bucket-space ceiling, made real after the sf100 sweep measured
    * that ceiling (~N²/2^15 map-side hamming work ⇒ ×16.8/decade at 5M
    * docs). TWO independent 60-bit md5 simhashes over disjoint token
    * halves (deterministic split by the token's md5 16th hex digit parity
    * — engine-portable, so the full-row DuckDB oracle reproduces it) form
    * a 120-bit signature banded as 4×30-bit slices: pigeonhole recall is
    * exact for combined hamming ≤ 3, and the band bucket space grows from
    * 2^15 to 2^30 — expected band-bucket occupancy stays ≪ 1 into the
    * 10^8-10^9-doc regime (the 100 TB corpus scale), so candidate pairs
    * come from signature agreement, not birthday collisions, and
    * `bucketCap` never bites on honest corpora.
    *
    * The 120-bit hamming is a FINER similarity than the 60-bit one (a
    * token's vote lands in one half, not both): this is a variant
    * measure, not a drop-in replacement — WideSimhashSpec pins exact
    * recall/precision against an all-pairs reference on an adversarial
    * corpus, and the `dedup_simhash_wide` query carries a full-row
    * DuckDB oracle. Same shuffle economics as [[simhashPairsFromSig]]:
    * 24 B/row through the bucket exchange, hamming map-side before the
    * pair dedup. */
  def simhashPairsWide(docs: DataFrame, id: Column, text: Column,
                       maxHamming: Int = 3,
                       bucketCap: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x30-bit banding guarantees recall only for maxHamming <= 3 " +
        s"(got $maxHamming)")
    val toks = TextFunctions.tokens(text)
    def half(par: Int) = filter(toks, t =>
      conv(substring(md5(t.cast("binary")), 16, 1), 16, 10).cast("int")
        % 2 === lit(par))
    val sig = docs.select(id.as("doc_id"),
      GraftFunctions.simhashMd5(half(0)).as("sim_a"),
      GraftFunctions.simhashMd5(half(1)).as("sim_b"))
    val mask = (1L << 30) - 1L
    val bandCols = array(
      col("sim_a").bitwiseAND(lit(mask)),
      shiftright(col("sim_a"), 30).bitwiseAND(lit(mask)),
      col("sim_b").bitwiseAND(lit(mask)),
      shiftright(col("sim_b"), 30).bitwiseAND(lit(mask)))
    val banded = sig.select(col("doc_id"), col("sim_a"), col("sim_b"),
      posexplode(bandCols).as(Seq("band", "bucket")))
    // window cap: 2^30 buckets per band, occupancy ≪ 1 into 10^8-10^9
    // docs — the tiny-group regime (see bucketPairs scaladoc; the r9
    // sf100 sweep measured the object-aggregate form ×2 here)
    val wB = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col("doc_id").asc)
    banded
      .withColumn("rn", row_number().over(wB))
      .filter(col("rn") <= bucketCap)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sim_a"),
        col("sim_b")))).as("ms"))
      .filter(size(col("ms")) > 1)
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1),
          |    y -> struct(x.doc_id AS id_a, x.sim_a AS saa, x.sim_b AS sab,
          |                y.doc_id AS id_b, y.sim_a AS sba, y.sim_b AS sbb))))"""
          .stripMargin)).as("p"))
      // combined hamming map-side before the pair dedup — the sf10
      // finding-5 shape: only true near-dup pairs reach the exchange
      .select(col("p.id_a"), col("p.id_b"),
        (GraftFunctions.hamming(col("p.saa"), col("p.sba")) +
          GraftFunctions.hamming(col("p.sab"), col("p.sbb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Corpus-size-routed simhash near-dup — the autoStride/autoBandBits
    * pattern applied to SIGNATURE WIDTH, so no caller can ride the narrow
    * form into the regime where its bucket space saturates: the narrow
    * 60-bit md5 signature (4×15-bit bands, 2^15 buckets/band) has expected
    * band occupancy N/2^15, and with it the map-side hamming verification
    * grows ∝ N²/2^15 (measured ×16.8/decade at the sf100 5M-doc sweep).
    * One bounded count() routes the call: below `wideThreshold` docs the
    * narrow form (exact-recall, DuckDB-reproducible) runs; at or above it
    * the 120-bit wide form ([[simhashPairsWide]], 2^30 buckets/band) takes
    * over. The default threshold 2^18 puts the switch at narrow occupancy
    * ~8 — well before the quadratic term is measurable, an order of
    * magnitude before it dominates.
    *
    * NOTE (same caveat as [[simhashPairsWide]]): the 120-bit hamming is a
    * FINER similarity measure than the 60-bit one, so the switch changes
    * the measure by design — exactly the way [[autoBandBits]] changes the
    * LSH geometry with corpus size. Callers needing a fixed measure call
    * the specific form directly. */
  def simhashPairsAuto(docs: DataFrame, id: Column, text: Column,
                       maxHamming: Int = 3, bucketCap: Int = 10000,
                       wideThreshold: Long = 1L << 18,
                       rowCountHint: Option[Long] = None): DataFrame = {
    // hint > exact statistics > parquet footers > count() — the routing
    // count is metadata when the frame allows it (PlanStats scaladoc)
    val n = graft.plans.PlanStats.rowCount(docs.select(id), rowCountHint)
    if (n >= wideThreshold)
      simhashPairsWide(docs, id, text, maxHamming, bucketCap)
    else {
      val sig = docs.select(id.as("doc_id"),
        GraftFunctions.simhashMd5(TextFunctions.tokens(text)).as("sim"))
      simhashPairsFromSig(sig, sigBits = 60, bands = 4,
        maxHamming = maxHamming, bucketCap = bucketCap)
    }
  }

  /** Fail-fast misuse guard for the quadratic-per-block pair operators:
    * ONE bounded scalar aggregation (the same driver-action class as
    * mergedN's min/max) over the light key frame finds the hottest block;
    * if its pair estimate exceeds `maxPairs` the call dies in seconds —
    * at call time, before any O(block²) join is even planned — instead of
    * hours into a 100 TB run. Double arithmetic: block counts can exceed
    * the n(n-1)/2 long range. */
  private def guardBlockPairs(light: DataFrame, blkCols: Seq[String],
                              maxPairs: Long, op: String,
                              lshPath: String): Unit = {
    if (maxPairs < Long.MaxValue) {
      val hot = light.groupBy(blkCols.map(col): _*)
        .agg(count(lit(1)).as("__gb_n")).agg(max(col("__gb_n"))).head()
      val n = if (hot.isNullAt(0)) 0.0 else hot.getLong(0).toDouble
      val pairs = n * (n - 1) / 2
      if (pairs > maxPairs)
        throw new graft.GraftException(
          f"$op: hottest block holds ${n.toLong} rows ≈ $pairs%.3g " +
            s"candidate pairs > maxPairsPerBlock=$maxPairs. The blocked " +
            s"pair join is O(block²) by construction — choose a finer " +
            s"block key, raise maxPairsPerBlock explicitly, or use the " +
            s"keyless LSH path ($lshPath), which absorbs any corpus")
    }
  }

  /** Exact token-set Jaccard over blocked candidate pairs. `block` keys the
    * self-join (e.g. same source + language) so the pair count stays linear
    * per block instead of N² global.
    *
    * A provably lossless size-bound prefilter runs before the set
    * arithmetic: J(A,B) >= t implies |A∩B| >= t|A∪B|, and since
    * |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|), any qualifying pair
    * satisfies min >= t*max. The bound is two ints per row, so the
    * expensive intersect/union runs on ~1/15th of the pairs (the standard
    * length-filter of set-similarity joins, cf. PPJoin, Xiao et al. 2008).
    *
    * `maxPairsPerBlock` is the misuse guard (on by default): the call
    * fails fast — at CALL time, via one bounded scalar count over the
    * light key frame — if any block's pair estimate exceeds it, pointing
    * at [[minhashLsh]] as the keyless path. `Long.MaxValue` disables. */
  def tokenJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        block: Seq[Column], threshold: Double,
                        maxPairsPerBlock: Long = 25000000L): DataFrame = {
    // Phase 1 — candidate pairs over a LIGHT frame: (block, id, set size).
    // The O(pairs-per-block) join shuffles ~20 bytes/row and the length
    // bound prunes before any array ever moves.
    val light = docs.select(
      (block.zipWithIndex.map { case (c, i) => c.as(s"blk_$i") } :+
        id.as("doc_id") :+
        size(GraftFunctions.tokenSetHash(TextFunctions.tokens(text)))
          .as("nt")): _*)
    val blkCols = block.indices.map(i => s"blk_$i")
    guardBlockPairs(light, blkCols, maxPairsPerBlock,
      "tokenJaccardPairs", "Dedup.minhashLsh")
    val l = light.select((blkCols.map(col) :+ col("doc_id").as("id_a") :+
      col("nt").as("nt_a")): _*)
    val r = light.select((blkCols.map(col) :+ col("doc_id").as("id_b") :+
      col("nt").as("nt_b")): _*)
    val candidates = l.join(r, blkCols)
      .filter(col("id_a") < col("id_b") &&
        least(col("nt_a"), col("nt_b")).cast("double") >=
          lit(threshold) * greatest(col("nt_a"), col("nt_b")).cast("double"))
      .select("id_a", "id_b")

    // Phase 2 — attach HASHED token sets (8 bytes/token, sorted) to the
    // surviving pairs only; Jaccard is a linear merge over two long arrays
    // (same value as the string-set formulation up to 64-bit collisions).
    val toksOf = docs.select(id.as("tid"),
      GraftFunctions.tokenSetHash(TextFunctions.tokens(text)).as("t"))
    candidates
      .join(toksOf.select(col("tid").as("id_a"), col("t").as("toks_a")),
        Seq("id_a"))
      .join(toksOf.select(col("tid").as("id_b"), col("t").as("toks_b")),
        Seq("id_b"))
      .withColumn("jaccard",
        round(GraftFunctions.jaccardSorted(col("toks_a"), col("toks_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The auto band width: `2^bits` buckets must track corpus size or
    * occupancy — and with it candidate verification — grows ∝ N (the
    * round-7 sf1 finding). Target ~16 rows/bucket, floor 8 bits (the
    * legacy packed geometry), cap 24 (16M buckets outlasts any corpus a
    * single band shuffle can hold). Exposed for the spec that pins the
    * scaling law. */
  private[graft] def autoBandBits(n: Long): Int =
    math.min(24, math.max(8,
      math.ceil(math.log(math.max(1.0, n.max(1L) / 16.0)) /
        math.log(2)).toInt))

  /** Embedding cosine near-dup with random-hyperplane LSH blocking — the
    * 100 TB path: no external blocking key needed. Each vector gets a
    * `bitsPerBand`-bit hyperplane bucket per band (Charikar 2002); a pair
    * at angular similarity θ agrees on one b-bit band with probability
    * (1 - θ/π)^b, so high-cosine pairs collide in ≥1 of the bands w.h.p.
    * while the bucket join stays linear. Candidates are verified with exact
    * cosine — same shape as [[minhashLsh]]: ids-only shuffle, groupBy
    * bucket pair expansion, semi-join before re-reading vectors.
    *
    * `bitsPerBand = 0` (the default) AUTO-SIZES the band width to the
    * corpus: `max(8, ceil(log2(n / 16)))` from one bounded count() of the
    * input (the same driver-scalar class as mergedN's min/max). This is
    * the parameter 100 TB lives or dies on — the round-7 sf1 sweep
    * measured the fixed 8-bit geometry going SUPER-linear (×18 at 10×
    * data): a b-bit band has only 2^b buckets, so occupancy grows ∝ N and
    * verification pairs ∝ N²/2^b. Auto keeps 2^b ∝ N — candidates stay
    * ∝ N. At ≤4096 vectors auto lands on the legacy 8×8 packed geometry,
    * bit-identical to an explicit `bitsPerBand = 8`.
    *
    * When `bands × bitsPerBand > 64`, each band draws an independent
    * hyperplane signature (seed-offset per band) instead of slicing one
    * packed 64-bit word — band width is then unbounded. Wider bands lower
    * per-band match probability for NON-identical pairs (recall at the
    * threshold is probabilistic, as with any LSH geometry; raise `bands`
    * to buy it back); identical vectors collide on every band at any
    * width, so the recall-of-identical invariant is exact regardless. */
  /** Sorted-run bucket capping: repartition by (band, bucket), radix-sort
    * plain Tungsten rows within each task, then a streaming mapPartitions
    * walks the sorted runs keeping each bucket's `cap` smallest members
    * (O(cap) state, one pass) and emits ONE array row per bucket. This is
    * the third cap mechanism next to the row_number window and the
    * bounded collectSmallest aggregate: it pays the same exchange but
    * sorts NARROW DATA ROWS (radix-sortable, no aggregation buffers)
    * and never plants per-group object state — the ObjectHashAggregate
    * 128-key sort fallback with object-SERIALIZED buffers is exactly what
    * it avoids. Selection is identical to both other forms: ascending
    * vec_id per bucket (unique ids ⇒ struct order ≡ vec_id order). */
  private[graft] def sortedRunMembers(banded: DataFrame,
                                      cap: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    val schema = banded.schema
    val bandIdx = schema.fieldIndex("band")
    val bucketIdx = schema.fieldIndex("bucket")
    val memberIdx =
      schema.fields.indices.filter(i => i != bandIdx && i != bucketIdx)
    val memberStruct = StructType(memberIdx.map(schema.fields(_)).toSeq)
    val outSchema = StructType(Seq(
      schema.fields(bandIdx), schema.fields(bucketIdx),
      StructField("ms", ArrayType(memberStruct, containsNull = false),
        nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    banded
      .repartition(col("band"), col("bucket"))
      .sortWithinPartitions(col("band"), col("bucket"), col("vec_id"))
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[Row] {
          override def hasNext: Boolean = it.hasNext
          override def next(): Row = {
            val h = it.head
            val b = h.get(bandIdx)
            val k = h.get(bucketIdx)
            val members = new scala.collection.mutable.ArrayBuffer[Row](8)
            var n = 0
            while (it.hasNext && it.head.get(bandIdx) == b &&
                it.head.get(bucketIdx) == k) {
              val r = it.next()
              if (n < cap) members += Row.fromSeq(memberIdx.map(r.get))
              n += 1
            }
            Row(b, k, members.toSeq)
          }
        }
      }
  }

  def embeddingLshPairs(vecs: DataFrame, id: Column, vec: Column,
                        threshold: Double, bands: Int = 8,
                        bitsPerBand: Int = 0, seed: Long = 42L,
                        bucketCap: Int = 10000,
                        rowCountHint: Option[Long] = None,
                        sortedRunCap: Boolean = true): DataFrame = {
    require(bands > 0, "need bands > 0")
    val bits =
      if (bitsPerBand > 0) bitsPerBand
      else autoBandBits(
        graft.plans.PlanStats.rowCount(vecs.select(id), rowCountHint))
    require(bits <= 62, s"bitsPerBand=$bits exceeds the 62-bit hash range")
    // quantized sidecars (1 B/dim codes, max-abs scale, exact norm) are
    // computed IN the banding projection — pure map-side, no join — and
    // ride the bucket shuffle at ~dim+16 bytes/row.
    //
    // r9 scale note (three experiments at sf100, 2M vectors): the grouped
    // collect ALWAYS sorts its shuffled input — ObjectHashAggregate
    // falls back to sort-based aggregation past 128 keys/task, and with
    // ~16M banded rows over 32 tasks that external sort under the
    // 150 MB/task budget is the measured "LSH spill" (the r8 hypothesis
    // that the row_number window was the cause is disproven: replacing it
    // with the bounded smallest-cap aggregate kept output identical and
    // cut spill only ~18%, 60.8 → 49.9 GB memory-equivalent, because the
    // fallback sorts either way). Raising the fallback threshold OOMs
    // (the object hash map is memory-untracked — the conservative default
    // IS the safety mechanism); stripping sidecars off the banding
    // exchange and prefiltering after a pair-level dedup+join is ~2×
    // WORSE (the raw ~110M-pair candidate stream then crosses three
    // exchanges and a 110M-key dedup). The in-expansion prefilter below
    // — candidates die map-side before anything pair-shaped reaches an
    // exchange — remains the right shape; the residual spill is healthy
    // bounded external-sort disk churn under a deliberately tiny heap,
    // linear in input, and absent at sf10 and below.
    //
    // r10: the FOURTH mechanism — sortedRunCap, the default — accepts
    // that the external sort is unavoidable and makes it cheap: sort
    // plain narrow Tungsten rows (radix path, no aggregation buffers),
    // then build each bucket's capped member array in a one-pass
    // streaming mapPartitions. Solo sf100 pair stage: 96.8 s (aggregate)
    // → 64.1 s (sorted-run) at bit-identical shuffle (13.7 GB) and the
    // same external-sort spill — the object-serialized agg-buffer
    // machinery was the remaining distinguishing cost, exactly what the
    // sorted-run walk removes. Output identity pinned by
    // EmbeddingLshSpec (hot buckets, both geometries, cap binding).
    val sidecarCols = Seq(
      GraftFunctions.int8Codes(vec).as("c8"),
      GraftFunctions.int8Scale(vec).as("s8"),
      sqrt(aggregate(transform(vec, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as("nrm"))
    val banded =
      if (bands * bits <= 64) {
        // packed geometry: ONE fused signature, band buckets are bit
        // slices — one kernel pass per vector (the round-6 shape)
        val sig = vecs.select(id.as("vec_id") +: sidecarCols :+
          GraftFunctions.hyperplaneSimhash(vec, bands * bits, seed)
            .as("hsig"): _*)
        val mask = (1L << bits) - 1
        val bandCols = array((0 until bands).map(b =>
          shiftright(col("hsig"), b * bits).bitwiseAND(lit(mask))): _*)
        sig.select(col("vec_id"), col("c8"), col("s8"), col("nrm"),
          posexplode(bandCols).as(Seq("band", "bucket")))
      } else {
        // wide geometry: per-band independent signatures — band width no
        // longer capped by one 64-bit word (bands × bits kernel dots per
        // vector, map-side codegen, still linear)
        val bandCols = array((0 until bands).map(b =>
          GraftFunctions.hyperplaneSimhash(vec, bits,
            seed + 0x9E3779B97F4A7CL * (b + 1))): _*)
        vecs.select(id.as("vec_id") +: sidecarCols :+
          posexplode(bandCols).as(Seq("band", "bucket")): _*)
      }
    // The candidate-pair stream is PREFILTERED map-side with a SOUND int8
    // error bound before anything pair-shaped reaches an exchange. The
    // sf10 sweep measured why: verifying candidates by joining the pair
    // frame against f32 vectors shuffled pairs × 256 B intermediates —
    // 2.3 GB at 200k vectors (×179 the sf1 bytes), the heaviest exchange
    // in the engine. Pair payloads never cross the wire: survivors
    // (ids only) are deduped, then exact cosine re-verifies just them, so
    // the emitted pair set is IDENTICAL (the bound only lets through
    // false positives, which exact verification then drops).
    //
    // Soundness: with per-dim quantization error ≤ s/254 (int8Codes),
    // |approxDot − dot| ≤ n·sa·sb·(2/254 + 1/254²) over the n-prefix, so
    // cos ≤ (approxDot + errDot)/(‖a‖·‖b‖) when both lengths equal n
    // (full norm = prefix norm); ragged pairs — where the kernel's
    // prefix norms diverge from the precomputed full norms — skip the
    // prefilter entirely. Zero-norm vectors score 0.0, exactly the
    // kernel's convention. The 1e-4 slack absorbs round(cos, 4).
    val p = col("p")
    val errC = 2.0 / 254.0 + 1.0 / 64516.0
    val approxCos = when(col("nprod") > 0.0,
      (col("dotq") * col("sprod") / lit(16129.0) +
        col("n").cast("double") * col("sprod") * lit(errC)) / col("nprod"))
      .otherwise(lit(0.0))
    // bounded smallest-cap per bucket: either the collectSmallest
    // aggregate (selection identical to the former row_number window:
    // vec_id leads the struct — see the r9 scale note above) or the
    // sorted-run mapPartitions walk ([[sortedRunMembers]]); all three
    // mechanisms select the same members, ScaleDesignSpec pins it
    val memberArrays =
      if (sortedRunCap) sortedRunMembers(banded, bucketCap)
      else banded
        .groupBy(col("band"), col("bucket"))
        .agg(sort_array(GraftFunctions.collectSmallest(struct(
          col("vec_id"), col("c8"), col("s8"), col("nrm")), bucketCap))
          .as("ms"))
    val survivors = memberArrays
      .filter(size(col("ms")) > 1)
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms")) - i - lit(1)),
          y => struct(
            x.getField("vec_id").as("id_a"),
            y.getField("vec_id").as("id_b"),
            GraftFunctions.int8Dot(x.getField("c8"), y.getField("c8"))
              .as("dotq"),
            (x.getField("s8") * y.getField("s8")).as("sprod"),
            (x.getField("nrm") * y.getField("nrm")).as("nprod"),
            least(size(x.getField("c8")), size(y.getField("c8"))).as("n"),
            (size(x.getField("c8")) =!= size(y.getField("c8")))
              .as("ragged")))))).as("p"))
      .select(p.getField("id_a").as("id_a"), p.getField("id_b").as("id_b"),
        p.getField("dotq").as("dotq"), p.getField("sprod").as("sprod"),
        p.getField("nprod").as("nprod"), p.getField("n").as("n"),
        p.getField("ragged").as("ragged"))
      .filter(col("ragged") || approxCos >= lit(threshold) - lit(1e-4))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candIds = survivors
      .select(explode(array(col("id_a"), col("id_b"))).as("cand_id"))
      .distinct()
    val candVecs = vecs
      .join(candIds, id === col("cand_id"), "left_semi")
      .select(id.as("vid"), vec.as("v"))
    survivors
      .join(candVecs.select(col("vid").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(candVecs.select(col("vid").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos",
        round(GraftFunctions.cosineSimilarity(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Connected components over an undirected edge list — the closure step
    * of every near-dup pipeline: pairwise edges (from [[minhashLsh]],
    * [[simhashPairsFromSig]], [[tokenJaccardPairs]], [[embeddingLshPairs]])
    * say "A duplicates B", but keep-one-per-cluster needs the transitive
    * closure (A~B, B~C ⇒ {A,B,C} is ONE cluster with one canonical doc).
    * Returns (id, component) for every node appearing in an edge, where
    * component = smallest node id reachable from `id` — deterministic, so
    * an exact SQL oracle (recursive closure) can verify it.
    *
    * Algorithm: distributed min-label propagation with path halving. Each
    * round does (1) a neighbor-min step — every node adopts the smallest
    * label among itself and its neighbors (join + map-side-combinable min
    * aggregation, both keyed by node id) — and (2) a pointer-jump step —
    * every node re-reads the label of its own label (labels always name
    * nodes, so this is an equi-self-join on the label frame). Neighbor
    * steps alone need O(diameter) rounds; the jump step contracts chains
    * exponentially (the Hash-to-Min shape, Rastogi et al. 2013), so long
    * dup-chains still converge in O(log diameter). Duplicate clusters are
    * near-cliques in practice — 2-3 rounds end it.
    *
    * Scale: per-round state is (id, component) = 16 bytes per node; every
    * step is an equi-join/aggregation on node id (AQE-planned, skew-safe,
    * spillable). Each round's labels are CHECKPOINTED, not merely
    * persisted: the jump step self-joins the label frame, so the logical
    * plan would double every round — 2^rounds plan nodes — and plan
    * analysis itself OOMs long before any data moves. Checkpointing
    * truncates both lineage and plan to constant depth. Nothing is
    * collected to the driver — convergence is detected from the sum of
    * labels, which strictly decreases until fixpoint; the sum rides the
    * checkpoint materialization as an observe() metric (r13), so each
    * round is ONE Spark job, not checkpoint + aggregation.
    *
    * `checkpointDir`: None (default) uses `localCheckpoint` — blocks live
    * on executors, right for a single-JVM run, but an executor loss kills
    * the job since truncated lineage cannot recompute. On a multi-node
    * run pass a reliable (HDFS/S3) directory: each round's labels are
    * written there with `.checkpoint()` and survive any executor death —
    * a 100 TB closure takes long enough that one WILL die. The caller
    * owns the directory's lifecycle (set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or clean it
    * after the run).
    *
    * The checkpoint directory is SparkContext-GLOBAL state. To avoid
    * silently redirecting other `.checkpoint()` users in the same
    * context, `checkpointDir` is only applied when no directory is
    * configured yet; if one already is, it wins and this parameter's
    * value is ignored (reliable checkpointing still happens, into the
    * pre-configured directory). */
  /** Times the observe-folded convergence statistic fell back to its own
    * aggregation job (diagnostics: a spec pins this at 0 — the fold IS
    * the optimization; the fallback only guards against a Spark release
    * changing checkpoint's execution-event behavior). */
  private[graft] val ccObserveFallbacks =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None,
                          prePartitionMinNodes: Long = 1L << 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sc = edges.sparkSession.sparkContext
    // never clobber an application-configured dir (session-global state)
    checkpointDir.foreach(d =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d))
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // No distinct over the symmetrized edges: min-aggregation is
    // duplicate-insensitive, so deduping would buy nothing but a shuffle.
    // Persisted BRIEFLY (dropped after round 1): the distinct-nodes
    // materialization below and symPlus's first caching both consume sym,
    // and without the cache the upstream edge pipeline (an LSH candidate
    // generator at scale) would run end to end twice (r12-ADVICE item).
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = materialize(sym.select(col("u").as("id"))
      .distinct()
      .select(col("id"), col("id").as("comp")))
    // no edges -> no nodes: already the fixpoint (and labelSum of an
    // empty frame is null, which the convergence compare must never see).
    // count(), not isEmpty: the same single action also yields the node
    // count the pre-partitioning route below needs — no extra job.
    val nNodes = labels.count()
    if (nNodes == 0L) { sym.unpersist(); return labels }
    // Edges + one self-loop per node, persisted once (r12 optimization,
    // guide §2.4): the self-loops fold the node's own label into the
    // neighbor-min aggregation, which deletes the old per-round left-join
    // of labels against the neighbor minima (one join + one exchange
    // fewer per round): min(comp(v) : v ∈ N(u) ∪ {u}) ≡
    // least(comp(u), coalesce(nbrMin, comp(u))) row for row.
    //
    // PRE-PARTITIONING on the per-round join key is routed on measured
    // node count (from the emptiness action above; the
    // lmShuffleHashMinDocs device): below ~2^20 nodes the 16 B/node label frame broadcasts
    // every round, the edge frame never shuffles, and an explicit
    // repartition would ADD the only exchange in the loop (measured
    // +2 s / +3 MB shuffle across the five sf0.1 cluster queries).
    // Above it the label side outgrows broadcast, every round's join
    // re-shuffles the 2|E|-row edge frame — the heavy side, which must
    // cross the wire ONCE, at persist time — while each round then
    // shuffles only the labels (16 B/node) into the cached layout.
    val manyNodes = nNodes > prePartitionMinNodes
    val symSelf =
      sym.union(labels.select(col("id").as("u"), col("id").as("v")))
    val symPlus = (if (manyNodes) symSelf.repartition(col("v")) else symSelf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    // prevSum lazily seeded by round 1's result: labels start at comp=id,
    // so the first round can never be the fixpoint unless a later sum
    // repeats — skipping the initial sum saves one job.
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (1) neighbor-min: smallest label among self and all neighbors
      // (self via the persisted self-loops — no separate labels join)
      val stepped = symPlus
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), "v")
        .groupBy("u").agg(min(col("vcomp")).as("comp"))
        .select(col("u").as("id"), col("comp"))
      // (2) pointer jump: comp := comp(comp). comp(x) <= x, so every label
      // is itself a node id and the inner join always matches.
      val jumped = stepped
        .join(stepped.select(col("id").as("jid"), col("comp").as("jcomp")),
          col("comp") === col("jid"))
        .select(col("id"), col("jcomp").as("comp"))
      // Convergence statistic folded INTO the materialization (r13, guide
      // §2.4/§1): CollectMetrics rides the physical plan the eager
      // checkpoint executes, so the labelSum no longer costs its own job
      // per round (was: checkpoint job + cached-read aggregation job —
      // this halves the loop's job count, fixed scheduling overhead that
      // dominates small rounds and is pure waste at any scale). The
      // checkpoint truncates the returned plan as before; the metrics
      // node lives only in the discarded pre-checkpoint plan. The sum is
      // read straight off the executed plan's accumulators
      // (queryExecution.observedMetrics) — no listener, no wait; if a
      // Spark release ever stopped collecting metrics for checkpoint
      // actions, the explicit aggregation is the fallback (correctness
      // identical, one extra job — a spec pins that it never fires).
      val obsDf = jumped.observe("cc_labelsum",
        sum(col("comp").cast("decimal(38,0)")).as("labelsum"))
      val next = materialize(obsDf)
      val s = obsDf.queryExecution.observedMetrics.get("cc_labelsum")
        .map(_.getDecimal(0)).filter(_ != null) match {
        case Some(d) => d
        case None => ccObserveFallbacks.incrementAndGet(); labelSum(next)
      }
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      // symPlus is fully cached once round 1's join consumed it — the
      // brief sym cache has served both of its readers by then
      if (iter == 0) sym.unpersist()
      iter += 1
    }
    symPlus.unpersist()
    if (!converged)
      throw new graft.GraftException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (component diameter exceeds 2^maxIter)")
    labels
  }

  /** Duplicate clusters from near-dup pair edges: every doc that belongs
    * to a multi-doc cluster, its canonical (smallest) member, and the
    * cluster size — the "which docs do I drop" frame of a dedup pass. */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, idA, idB)
    val sizes = cc.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("component"),
        col("cluster_size"))
  }

  /** Embedding cosine near-dup, blocked to keep the pair space linear.
    * `maxPairsPerBlock` fails the call fast when a block's pair estimate
    * goes quadratic-hot (see [[tokenJaccardPairs]]); [[embeddingLshPairs]]
    * is the keyless path. `Long.MaxValue` disables. */
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * deduplication of an embedding corpus: cluster, then compare pairs
    * ONLY within a cluster, and mark every vector that has a
    * lower-id cluster-mate with cosine ≥ `threshold` as a duplicate (the
    * lowest id of each near-dup group survives — the paper keeps one
    * representative per intra-cluster similarity group).
    *
    * Clustering reuses the IVF machinery end to end: deterministic
    * stride-seeded centroids sized by the √N law
    * ([[Similarity.autoStride]]) and the map-only codegen bank assignment
    * ([[Similarity.ivfIndexFrom]]) — no join, no shuffle, bit-reproducible
    * in SQL (the similarity_ivf oracle's `asg` CTE), which is what makes
    * the full output DuckDB-checkable. Within-cluster pairing delegates to
    * [[embeddingNearDup]] with the cluster as the block: its
    * `maxPairsPerBlock` guard fail-fasts if a cluster goes quadratic-hot.
    * Expected cluster size under the √N law is ~2√N, so the pair work is
    * ~N^1.5 ACROSS clusters but each cluster's join is local to its block
    * key — the shape the paper runs at corpus scale (they cluster
    * precisely so the N² pair space never materializes).
    *
    * Output: one row per vector — (vec_id, centroid_id, is_dup). */
  def semanticDedup(vecs: DataFrame, id: Column, vec: Column,
                    threshold: Double,
                    maxPairsPerBlock: Long = 25000000L): DataFrame = {
    val base = vecs.select(id.as("vec_id"), vec.as("embedding"))
    // ivfIndexAuto: flat exact assignment below 2^17 vectors — what the
    // full-SQL oracle replays, i.e. at every driver SF — and the ≈N^1.25
    // hierarchical assignment above it. Clustering is a recall heuristic
    // (SemDeDup compares only within a cluster either way); hier rerouting
    // a boundary vector moves which pairs get COMPARED, never the
    // correctness of a comparison.
    val assigned = Similarity.ivfIndexAuto(base, Similarity.autoStride(base))
    val dups = embeddingNearDup(assigned, col("vec_id"), col("embedding"),
        col("centroid_id"), threshold, maxPairsPerBlock)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("centroid_id"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** Exact repeated-span profile: the substring-level duplication pass of
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al. 2022), re-expressed as linear hash aggregations instead of a
    * corpus-wide suffix array (a monolithic index that does not
    * distribute). Every `stride`-aligned window of `spanChars` characters
    * is a span; a span is DUPLICATED when its exact text occurs in
    * >= `minDocs` distinct documents. Output is one row per document:
    * (doc_id, total_spans, dup_spans).
    *
    * Scale shape (the reason this is not a groupBy over span text):
    *  - the corpus-sized shuffle carries (xxhash64, doc_id) pairs — 16 B
    *    per window, map-side combinable — never the span text;
    *  - candidate hashes (>= minDocs docs) collapse to a long-keyed Bloom
    *    sketch probed MAP-SIDE by the codegen [[graft.functions.BloomMightContainLong]]
    *    fused into the recomputed window scan (decontaminateBloom's
    *    pattern), so only the duplicate sliver re-materializes text;
    *  - the surviving sliver is re-verified by EXACT span equality (a
    *    64-bit collision can nominate a candidate, never confirm one) and
    *    the final semi-join is unhinted — AQE broadcasts whichever side
    *    is small at runtime;
    *  - per-doc totals are pure arithmetic on `length(text)` (zero
    *    shuffle): sequence(0, max(len-span,0), stride) has
    *    floor(max(len-span,0)/stride)+1 elements by construction.
    *
    * Exactness caveat: spans are counted at stride-aligned offsets (the
    * distributable discretization); a duplicated substring straddling two
    * windows is surfaced only if at least one aligned window repeats
    * verbatim — `stride` < `spanChars` tightens recall at linear cost. */
  def repeatedSpans(docs: DataFrame, id: Column, text: Column,
                    spanChars: Int = 40, stride: Int = 40,
                    minDocs: Int = 2, fpp: Double = 0.01,
                    candCountHint: Option[Long] = None): DataFrame = {
    require(spanChars > 0, "need spanChars > 0")
    require(stride > 0, "need stride > 0")
    require(minDocs >= 2, "need minDocs >= 2")
    require(fpp > 0.0 && fpp < 1.0, "need 0 < fpp < 1")
    require(candCountHint.forall(_ > 0L), "candCountHint must be > 0")
    val base = docs.filter(text.isNotNull)
      .select(id.as("doc_id"), text.as("__rs_text"))
    val spanEnd =
      greatest(length(col("__rs_text")).cast("long") - spanChars, lit(0L))
    def windows = base.select(col("doc_id"),
      explode(transform(
        sequence(lit(0L), spanEnd, lit(stride.toLong)),
        o => col("__rs_text").substr(o.cast("int") + lit(1), lit(spanChars))))
        .as("span"))
    val candHash = windows
      .select(col("doc_id"), xxhash64(col("span")).as("h"))
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("__n"))
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h"))
    val totals = base.select(col("doc_id"),
      (floor(spanEnd / stride).cast("long") + 1).as("total_spans"))
    // Sketch sizing: WITHOUT a hint, one bounded count action sizes the
    // filter (autoStride's pattern) and a duplicate-free corpus
    // short-circuits before the build. WITH candCountHint the candidate
    // pipeline executes exactly ONCE — the Bloom aggregate itself — since
    // stat.bloomFilter's separate count() pre-pass is the thing a 100 TB
    // caller shouldn't pay twice. Overestimates are safe (bigger filter,
    // lower fpp; exactness is unconditional — the Bloom only nominates,
    // the exact-text re-verification confirms). The aggregate yields a
    // NULL buffer over zero rows, which IS the duplicate-free signal.
    val bloomOpt = candCountHint match {
      case Some(est) =>
        val row = candHash
          .select(GraftFunctions.bloomFilterAgg(col("h"), est, fpp)).head()
        if (row.isNullAt(0)) None
        else Some(org.apache.spark.util.sketch.BloomFilter
          .readFrom(row.getAs[Array[Byte]](0)))
      case None =>
        val nCand = candHash.count()
        if (nCand == 0L) None
        else Some(candHash.stat.bloomFilter("h", nCand, fpp))
    }
    if (bloomOpt.isEmpty)
      return totals.withColumn("dup_spans", lit(0L))
    val bloom = bloomOpt.get
    val survivors = windows
      .withColumn("h", xxhash64(col("span")))
      .filter(GraftFunctions.bloomMightContainLong(col("h"), bloom))
      .join(candHash, Seq("h"), "left_semi")
      .select(col("doc_id"), col("span"))
    val dupSpans = survivors.distinct()
      .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span"))
    val perDocDup = survivors.join(dupSpans, Seq("span"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_spans"))
    totals.join(perDocDup, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("total_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
  }

  def embeddingNearDup(vecs: DataFrame, id: Column, vec: Column,
                       block: Column, threshold: Double,
                       maxPairsPerBlock: Long = 25000000L): DataFrame = {
    val base = vecs.select(block.as("blk"), id.as("vec_id"), vec.as("v"))
    guardBlockPairs(base.select(col("blk")), Seq("blk"), maxPairsPerBlock,
      "embeddingNearDup", "Dedup.embeddingLshPairs")
    val l = base.select(col("blk"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("blk"), col("vec_id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(GraftFunctions.cosineSimilarity(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
