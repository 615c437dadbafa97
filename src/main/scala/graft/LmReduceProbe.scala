package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** r13 probe for VERDICT item 5 (the residual per-doc reduction spill in
  * the LM family at sf100): measures the DECLARED lmPerplexity pipeline
  * against a pre-aggregated variant that collapses the occurrence stream
  * to (doc_id, w1, w2, c) BEFORE the model join (guide §2.3), with
  * wall/spill/shuffle receipts and a full row-identity check.
  *
  * The corpus-shape prior (measured at sf0.1, and GenScale's sf100
  * replicates the same within-doc structure with suffixed tokens):
  * occurrences / distinct (doc_id,w1,w2) = 1.036 — the pre-agg can only
  * remove 3.6 % of rows while ADDING an occurrence-scale exchange of
  * wider rows, so the prediction is a net loss; this probe is the
  * at-scale receipt either way. Not on any driver path.
  */
object LmReduceProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "lm-reduce-probe")
    spark.sparkContext.setLogLevel("WARN")
    val shuffle = new AtomicLong(0)
    val spill = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.memoryBytesSpilled): Unit
        }
      }
    })
    val docs = Tables.load(spark, d, "documents")

    def measure(label: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val s0 = shuffle.get(); val p0 = spill.get()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"PROBE $label%-28s ${secs}%8.2f s  " +
        f"shuffle=${(shuffle.get() - s0) / 1e6}%9.1f MB  " +
        f"spill=${(spill.get() - p0) / 1e6}%9.1f MB")
    }

    // the DECLARED pipeline (what lm_perplexity/ccnet_bucket run)
    measure("lmPerplexity (declared)") {
      Corpus.lmPerplexity(docs, col("doc_id"), col("text"), k = 0.5)
    }

    // pre-aggregated variant: same model, occurrence stream collapsed to
    // (doc_id, w1, w2, c) before the model join; per-doc sums weight by c
    // (sum of exact scale-6 decimals — identical values, sum(c*lp) ≡
    // sum over occurrences of lp)
    def lmPreAgg(k: Double): DataFrame = {
      val base = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      val bi = base.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(toks[i-1] AS w1, toks[i] AS w2))""".stripMargin))
          .as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(col("doc_id").isNotNull && col("w1").isNotNull &&
          col("w2").isNotNull)
      val pre = bi.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c"))
      val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val lc = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cl"))
      val vocab = bc.filter(col("cb") > 0)
        .agg(count_distinct(col("w2")).as("vocab"))
      val lp = bc
        .join(lc, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          round(log((col("cb") + lit(k)) /
            (col("cl") + lit(k) * col("vocab"))), 6)
            .cast("decimal(18,6)").as("lp"))
      val model = lp.hint("SHUFFLE_HASH")
      val scored = pre.join(model, Seq("w1", "w2"))
        .select(col("doc_id"), col("c"), col("lp"))
      val perDoc = scored.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"),
          sum(col("lp") * col("c")).as("slp"))
        .withColumn("slp6", (col("slp") * lit(1000000)).cast("long"))
        .withColumn("avg6", Corpus.halfUpAvg6("slp6", "n_bigrams"))
      val avg = col("avg6").cast("double") / lit(1000000.0)
      base.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          avg.as("avg_logp"),
          round(exp(-avg), 4).as("ppl"))
    }
    measure("lmPerplexity (pre-agg)") { lmPreAgg(0.5) }

    // identity: full symmetric difference must be empty
    val a = Corpus.lmPerplexity(docs, col("doc_id"), col("text"), k = 0.5)
    val b = lmPreAgg(0.5)
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    println(s"PROBE identity exceptAll counts: declared-minus-pre=$d1 " +
      s"pre-minus-declared=$d2")
    spark.stop()
  }
}
