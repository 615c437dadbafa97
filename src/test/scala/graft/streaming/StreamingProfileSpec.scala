package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.Profile

/** Streaming twin of the batch profiling/quality surface: a training-data
  * INTAKE pipeline wants the quality gate and the repetition signals as
  * incremental per-batch aggregates, not a post-hoc batch job. Composes
  * `quality_filter`'s rule bundle with [[Profile.repetitionSignals]]
  * inside a checkpointed foreachBatch (the decontaminate
  * streaming-composition precedent), and proves the incremental result
  * across a restart equals the batch computation over the full corpus.
  */
class StreamingProfileSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // per-doc intake record: (max_word_frac, distinct_word_ratio,
  // top_bigram_frac, quality pass)
  private type Sig = (Double, Double, Double, Boolean)

  private def profileBatch(b: org.apache.spark.sql.DataFrame)
  : Seq[(Long, Sig)] = {
    val sigs = Profile.repetitionSignals(b, col("doc_id"), col("text"))
    val gate = b.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      round(GraftFunctions.ngramRepetition(
        TextFunctions.tokens(col("text")), 2), 4).as("rep2"))
      .select(col("doc_id"),
        (col("n_tok").between(2, 1000) && col("rep2") <= 0.5).as("pass"))
    sigs.join(gate, "doc_id").collect().map { r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Double]("max_word_frac"),
        r.getAs[Double]("distinct_word_ratio"),
        r.getAs[Double]("top_bigram_frac"), r.getAs[Boolean]("pass")))
    }.toSeq
  }

  test("incremental intake profile survives restart and equals the batch run") {
    val in = Files.createTempDirectory("graft-prof-src").toString
    val ckpt = Files.createTempDirectory("graft-prof-ck").toString
    def addFile(n: Int, docs: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$in/f$n.json"),
        docs.map { case (i, t) => s"""{"doc_id": $i, "text": "$t"}""" }
          .mkString("\n"))

    val intake =
      new java.util.concurrent.ConcurrentHashMap[Long, Sig]()
    def runOnce(): Set[Long] = {
      val thisRun = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          profileBatch(b).foreach { case (id, sig) =>
            intake.put(id, sig); thisRun.add(id)
          }
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      thisRun.asScala.toSet
    }

    addFile(1, Seq(1L -> "a a b", 2L -> "x y z", 3L -> "w"))
    addFile(2, Seq(4L -> "q q q q q q", 5L -> "the cat sat on the mat"))
    assert(runOnce() == Set(1L, 2L, 3L, 4L, 5L))

    // new docs land while "down"; the resumed query must profile ONLY the
    // uncommitted file (no recomputation of committed intake) yet leave
    // the accumulated profile complete
    addFile(3, Seq(6L -> "fresh words only here", 7L -> "b b b b a"))
    assert(runOnce() == Set(6L, 7L),
      "restart must resume after committed offsets")

    // the incremental accumulation equals the one-shot batch profile of
    // the full corpus — the streaming twin computes the same surface
    val batch = profileBatch(
      spark.read.schema(schema).json(in)).toMap
    import scala.jdk.CollectionConverters._
    assert(intake.asScala.toMap == batch,
      "incremental profile diverged from the batch computation")
    // and the gate actually gates: the 1-token and fully-repetitive docs
    assert(!intake.get(3L)._4 && !intake.get(4L)._4)
    assert(intake.get(5L)._4 && intake.get(6L)._4)
  }
}
