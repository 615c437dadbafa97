package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Falsifiability of the bench's task-metric meters: a workload FORCED
  * to spill must register `memoryBytesSpilled > 0` through the same
  * listener channel Bench attributes per query — a spill gate that can
  * never fire gates nothing.
  */
class BenchMeterSpec extends SparkSpecBase {

  test("a forced window spill registers on the task-metrics spill meter") {
    // Spark 4 renamed these to dotted keys (the camelCase aliases are
    // gone): in.memory.threshold flips the row buffer to
    // UnsafeExternalSorter, spill.threshold makes it spill every N rows.
    // Do NOT shrink spill.size.threshold — it triggers per-insert spills
    // and the read-back allocates a 1 MB buffer per spill file (OOM).
    // Unset unless explicitly set, so save via Try.
    val keys = Seq("spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val saved = keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption.filter(_ != null))
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // hold 100 rows in memory, spill the sorter every 5000: the
      // 25k-row window partitions below spill ~5 files each — enough to
      // register, few enough that read-back buffers stay small
      spark.conf.set(keys(0), "100")
      spark.conf.set(keys(1), "5000")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(expr("id % 4")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spark.range(100000L)
        .withColumn("cum", sum(col("id")).over(w))
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // drain listener events
      assert(spilled.get() > 0,
        s"forced window spill never reached taskMetrics.memoryBytesSpilled " +
          s"(diskBytesSpilled=${diskSpilled.get()}) " +
          "— the bench spill gate would be blind")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
