package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-10 measurement harness for the hyperplane-LSH bucket-cap forms
  * (the one `weak` left at the 100 TB bar): the landed collectSmallest
  * aggregate vs the sorted-run mapPartitions walk
  * ([[Dedup.sortedRunMembers]]), solo, same JVM shape as the decade
  * sweeps. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 \
  *     sbt "runMain graft.LshCapExperiment [aggregate|sorted|both]"
  * Prints one line per run: form, wall secs, shuffle MB, spill MB, peak MB.
  */
object LshCapExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_sf100").stripSuffix("/")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val which = args.headOption.getOrElse("both")
    val spark = GraftSession.local(cpus, "graft-lsh-exp")
    spark.sparkContext.setLogLevel("WARN")

    val shuffle = new AtomicLong(0)
    val spill = new AtomicLong(0)
    val peak = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.memoryBytesSpilled)
          peak.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    def run(label: String, sorted: Boolean): Unit = {
      System.gc()
      val s0 = shuffle.get(); val p0 = spill.get(); peak.set(0)
      val t0 = System.nanoTime()
      // the embedding_cluster_lsh PAIR stage (the measured cost center —
      // the closure/invariant tail is identical either way)
      val pairs = Dedup.embeddingLshPairs(Tables.load(spark, sfDir,
          "embeddings"), col("vec_id"), col("embedding"),
        threshold = 0.3, bands = 8, sortedRunCap = sorted)
      pairs.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[lsh-exp] $label%-9s secs=$secs%.1f " +
        f"shuffleMB=${(shuffle.get - s0) / 1e6}%.0f " +
        f"spillMB=${(spill.get - p0) / 1e6}%.0f " +
        f"peakMB=${peak.get / 1e6}%.0f")
    }
    if (which == "aggregate" || which == "both") run("aggregate", false)
    if (which == "sorted" || which == "both") run("sorted", true)
    spark.stop()
  }
}
