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

  /** Word-repetition quality signals per document (the Gopher repetition
    * family, word-granular): fraction of words taken by the most frequent
    * word, distinct-word ratio, and fraction of word bigrams taken by the
    * most frequent bigram. Highly repetitive machine-generated text scores
    * high max fractions / low distinct ratio and gets filtered before
    * training.
    *
    * Shape: two explode→count aggregation chains keyed by (doc, term) —
    * terms distribute uniformly, aggregation state is one counter per key,
    * and the final per-doc rollup is a second bounded hash agg. No
    * collect_list, no windows.
    */
  def repetitionSignals(docs: DataFrame, id: Column, text: Column)
  : DataFrame = {
    val wordAgg = docs
      .select(id.as("doc_id"), explode(TextFunctions.tokens(text)).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_word"), sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"))
    val gramAgg = docs
      .select(id.as("doc_id"),
        explode(TextFunctions.wordNGrams(text, 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_gram"), sum(col("c")).as("n_grams"))
    // left join: a single-word doc has words but no bigrams -> frac 0
    wordAgg.join(gramAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(col("max_word") / col("n_words"), 4).as("max_word_frac"),
        round(col("n_distinct") / col("n_words"), 4)
          .as("distinct_word_ratio"),
        round(coalesce(col("max_gram") / col("n_grams"), lit(0.0)), 4)
          .as("top_bigram_frac"))
  }
}
