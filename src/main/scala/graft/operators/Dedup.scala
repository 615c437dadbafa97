package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * Returns (docId → canonicalId) only for rows in a duplicate group. */
  def exactDuplicates(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), md5(text).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .filter(col("group_size") > 1)
      .select(explode(col("members")).as("doc_id"),
        col("canonical_id"), col("group_size"))
      .filter(col("doc_id") =!= col("canonical_id"))

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
                 bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingles = array_distinct(TextFunctions.wordNGrams(text, shingleSize))
    val sig = docs.select(
      id.as("doc_id"),
      shingles.as("shingles"),
      GraftFunctions.minhash(shingles, numHashes).as("sig"))

    // band → one bucket value per band: murmur3-hash the band's slice.
    // bands is a static Int, so the band array unrolls at plan time and the
    // slice offsets are constants (stays in whole-stage codegen).
    val bandBuckets = array((0 until bands).map(b =>
      hash(slice(col("sig"), b * rows + 1, rows))): _*)
    val banded = sig.select(
      col("doc_id"), col("shingles"),
      posexplode(bandBuckets).as(Seq("band", "bucket")))

    // self-join within (band, bucket) — the only shuffle that matters.
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        round(TextFunctions.jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup: pairs within `maxHamming` of each other, blocked by
    * 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ some band of 4 is identical). */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(id.as("doc_id"),
      GraftFunctions.simhash(TextFunctions.tokens(text)).as("sim"))
    val bandCols = array((0 until 4).map(b =>
      shiftright(col("sim"), b * 16).bitwiseAND(lit(0xffffL))): _*)
    val banded = sig.select(col("doc_id"), col("sim"),
      posexplode(bandCols).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        GraftFunctions.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact token-set Jaccard over blocked candidate pairs. `block` keys the
    * self-join (e.g. same source + language) so the pair count stays linear
    * per block instead of N² global. */
  def tokenJaccardPairs(docs: DataFrame, id: Column, text: Column,
                        block: Seq[Column], threshold: Double): DataFrame = {
    val base = docs.select(
      (block.zipWithIndex.map { case (c, i) => c.as(s"blk_$i") } :+
        id.as("doc_id") :+ TextFunctions.tokenSet(text).as("toks")): _*)
    val blkCols = block.indices.map(i => s"blk_$i")
    val l = base.select((blkCols.map(col) :+ col("doc_id").as("id_a") :+
      col("toks").as("toks_a")): _*)
    val r = base.select((blkCols.map(col) :+ col("doc_id").as("id_b") :+
      col("toks").as("toks_b")): _*)
    l.join(r, blkCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        round(TextFunctions.jaccard(col("toks_a"), col("toks_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding cosine near-dup, blocked to keep the pair space linear. */
  def embeddingNearDup(vecs: DataFrame, id: Column, vec: Column,
                       block: Column, threshold: Double): DataFrame = {
    val base = vecs.select(block.as("blk"), id.as("vec_id"), vec.as("v"))
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
