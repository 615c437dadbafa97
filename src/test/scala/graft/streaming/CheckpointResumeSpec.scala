package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** At-least-once via checkpoint resume — the engine-side proof of the
  * reference's G1 guarantee (RecordProcessingGuarantee.at_least_once +
  * restart replay): a stopped query restarted on the same checkpoint
  * processes exactly the records not yet committed, and the union of all
  * processed batches covers every input record.
  */
class CheckpointResumeSpec extends SparkSpecBase {

  test("restart from checkpoint resumes after committed offsets") {
    val in = Files.createTempDirectory("graft-src").toString
    val ckpt = Files.createTempDirectory("graft-ck").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    def addFile(n: Int, ids: Seq[Long]): Unit =
      Files.writeString(Paths.get(s"$in/f$n.json"),
        ids.map(i => s"""{"id": $i}""").mkString("\n"))

    val firstRun = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    addFile(1, Seq(1L, 2L)); addFile(2, Seq(3L, 4L))
    val q1 = spark.readStream.schema(schema).json(in)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => firstRun.add(r.getLong(0)))
      }.start()
    q1.awaitTermination()
    assert(firstRun.iterator().hasNext)
    val firstIds = { val s = scala.collection.mutable.Set[Long]()
      firstRun.forEach(s.add(_)); s.toSet }
    assert(firstIds == Set(1L, 2L, 3L, 4L))

    // new data lands while "down"; restart on the SAME checkpoint
    val secondRun = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    addFile(3, Seq(5L, 6L))
    val q2 = spark.readStream.schema(schema).json(in)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => secondRun.add(r.getLong(0)))
      }.start()
    q2.awaitTermination()
    val secondIds = { val s = scala.collection.mutable.Set[Long]()
      secondRun.forEach(s.add(_)); s.toSet }
    // committed files 1-2 are NOT replayed; only the new file arrives
    assert(secondIds == Set(5L, 6L),
      s"expected only new records after resume, got $secondIds")
  }
}
