package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Round-12 measurement harness for [[Corpus.bpeTrain]]'s long-run
  * ergonomics (r11 verdict #5): a real tokenizer is ~30k merges = ~30k
  * SEQUENTIAL Spark jobs over the Heaps'-law vocab frame, so the question
  * is where the per-merge floor sits — job-scheduling overhead vs the
  * pair-count aggregation itself — and how the localCheckpoint cadence
  * (every 32 merges) shows up. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BpeLoopExperiment [numMerges...]"
  * Prints one line per run: merges requested/done, wall secs, merges/sec,
  * plus a vocab-size line for context.
  */
object BpeLoopExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1").stripSuffix("/")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 1000)
    val spark = GraftSession.local(cpus, "graft-bpe-exp")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    val nVocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("w"))
      .filter(length(col("w")) > 0).select(col("w")).distinct().count()
    println(s"BPEEXP sf=$sfDir distinct_words=$nVocab")
    runs.foreach { n =>
      val t0 = System.nanoTime()
      val got = Corpus.bpeTrain(docs, col("text"), numMerges = n).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"BPEEXP merges_req=$n done=${got.length} wall=$secs%.1f s " +
        f"rate=${got.length / secs}%.2f merges/s")
    }
    spark.stop()
  }
}
