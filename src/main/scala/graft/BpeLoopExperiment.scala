package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Round-12 measurement harness for [[Corpus.bpeTrain]]'s long-run
  * ergonomics (r11 verdict #5): a real tokenizer is ~30k merges = ~30k
  * SEQUENTIAL Spark jobs over the Heaps'-law vocab frame, so the question
  * is where the per-merge floor sits — job-scheduling overhead vs the
  * pair-count aggregation itself — and how the localCheckpoint cadence
  * (every 32 merges) shows up. The driver corpus has a 31-word vocabulary
  * (merges exhaust at 89), so long runs use a SYNTHETIC wide vocabulary:
  * `synth:N` builds N distinct base-26 8-letter words (freq 1 each) —
  * enough pair diversity for thousands of real merges. `local:VOCAB:N`
  * runs [[Corpus.bpeTrainLocal]] (the driver-side loop bpeTrainAuto
  * routes to) on the same synthetic substrate — the distributed-vs-local
  * rate pair is the routing receipt. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BpeLoopExperiment [N | synth:VOCAB:N | local:VOCAB:N]..."
  * Prints one line per run: merges requested/done, wall secs, merges/sec,
  * plus a vocab-size line per substrate.
  */
object BpeLoopExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1").stripSuffix("/")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args.toSeq else Seq("100", "1000")
    val spark = GraftSession.local(cpus, "graft-bpe-exp")
    spark.sparkContext.setLogLevel("WARN")
    val real = Tables.load(spark, sfDir, "documents")
    def vocabOf(df: org.apache.spark.sql.DataFrame): Long = df
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("w"))
      .filter(length(col("w")) > 0).select(col("w")).distinct().count()
    // base-26 8-letter words (true positional digits of a splitmix-style
    // scramble, NOT a linear map of id — a linear map collapses every
    // position onto id mod 26 and yields 26 distinct words): pairwise
    // distinct, rich adjacent-pair diversity, so every merge run hits
    // real work at vocab scale
    def synth(nWords: Int): org.apache.spark.sql.DataFrame = spark
      .range(nWords.toLong)
      .select(concat((0 until 8).map(i =>
        chr(lit(97) + expr(s"pmod((id * 2654435761 + $i * 40503) div " +
          s"${math.pow(26, i).toLong}, 26)"))): _*).as("text"))
    runs.foreach { spec =>
      val (docs, label) =
        if (spec.startsWith("synth:") || spec.startsWith("local:")) {
          val Array(_, v, n) = spec.split(":")
          (synth(v.toInt), s"${spec.split(":").head}($v words) merges=$n")
        } else (real, s"driver($sfDir) merges=$spec")
      val n = spec.split(":").last.toInt
      println(s"BPEEXP substrate=$label distinct_words=${vocabOf(docs)}")
      val train: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
        Int) => org.apache.spark.sql.DataFrame =
        if (spec.startsWith("local:")) Corpus.bpeTrainLocal
        else Corpus.bpeTrain
      val t0 = System.nanoTime()
      val got = train(docs, col("text"), n).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"BPEEXP $label done=${got.length} wall=$secs%.1f s " +
        f"rate=${got.length / secs}%.2f merges/s")
    }
    spark.stop()
  }
}
