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

  test("mapAsync inside foreachBatch is at-least-once across restart (T2 x G1)") {
    // the reference's async process() (WorkerTask.java:50 — the observer
    // may complete on any thread) composed with the G1 guarantee: a
    // restarted query must neither lose nor re-emit records that the
    // async stage already processed in a COMMITTED batch
    import spark.implicits._
    val in = Files.createTempDirectory("graft-async-src").toString
    val ckpt = Files.createTempDirectory("graft-async-ck").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    def addFile(n: Int, ids: Seq[Long]): Unit =
      Files.writeString(Paths.get(s"$in/f$n.json"),
        ids.map(i => s"""{"id": $i}""").mkString("\n"))

    def runOnce(): Set[Long] = {
      val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // async stage with out-of-order completions: slow down the
          // SMALLEST ids so later records finish first inside the window
          graft.operators.AsyncProcess.mapAsync(b.as[Long], maxInFlight = 4) {
            id => if (id % 2 == 1) Thread.sleep(30); id * 10
          }.collect().foreach(out.add(_))
        }.start()
      q.awaitTermination()
      val s = scala.collection.mutable.Set[Long]()
      out.forEach(s.add(_))
      s.toSet
    }

    addFile(1, Seq(1L, 2L)); addFile(2, Seq(3L, 4L))
    assert(runOnce() == Set(10L, 20L, 30L, 40L))
    // new data while "down": the resumed query re-runs ONLY uncommitted
    // input through the async stage — nothing lost, nothing duplicated
    addFile(3, Seq(5L, 6L))
    val second = runOnce()
    assert(second == Set(50L, 60L),
      s"async stage broke at-least-once resume: $second")
  }

  test("round-robin counter state survives a checkpoint restart (G1 x P3)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("graft-rr-src").toString
    val ckpt = Files.createTempDirectory("graft-rr-ck").toString
    val schema = StructType(Seq(
      StructField("subKey", StringType), StructField("ms", LongType),
      StructField("src", StringType), StructField("value", StringType)))
    def addFile(n: Int, vals: Seq[String]): Unit =
      Files.writeString(Paths.get(s"$in/f$n.json"),
        vals.zipWithIndex.map { case (v, i) =>
          s"""{"subKey":"k","ms":${1700000000000L + i},"src":"p0","value":"$v"}"""
        }.mkString("\n"))

    def runOnce(): Map[String, Int] = {
      val seen =
        new java.util.concurrent.ConcurrentHashMap[String, Int]()
      val ds = spark.readStream.schema(schema).json(in)
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
        .as[SubRecord]
      val q = StreamingRoundRobin.assign(ds, n = 4).toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => seen.put(
            r.getAs[String]("value"), r.getAs[Int]("subpartition")))
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toMap
    }

    addFile(1, Seq("v000", "v001", "v002"))
    val first = runOnce()
    assert(first == Map("v000" -> 0, "v001" -> 1, "v002" -> 2))

    // new data while "down"; the restarted query must RESUME the counter
    // at 3 (reference semantics: one counter for the consumer lifetime),
    // not restart at 0
    addFile(2, Seq("v003", "v004"))
    val second = runOnce()
    assert(second == Map("v003" -> 3, "v004" -> 0),
      s"counter did not resume from checkpointed state: $second")
  }

  test("merge gate buffer survives a checkpoint restart (G1 x M1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("graft-mg-src").toString
    val ckpt = Files.createTempDirectory("graft-mg-ck").toString
    val schema = StructType(Seq(
      StructField("subKey", StringType), StructField("ms", LongType),
      StructField("src", StringType), StructField("value", StringType)))
    def addFile(n: Int, rows: Seq[(Long, String)]): Unit =
      Files.writeString(Paths.get(s"$in/f$n.json"),
        rows.map { case (ms, v) =>
          s"""{"subKey":"k","ms":$ms,"src":"a","value":"$v"}"""
        }.mkString("\n"))

    def runOnce(): Seq[(Long, String)] = {
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val ds = spark.readStream.schema(schema).json(in)
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
        .as[SubRecord]
      val gated = StreamingMerge.orderedEmit(
        StreamingMerge.gatedUnion("5 seconds", ds))
      val q = gated.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out.add(
            (r.getAs[java.sql.Timestamp]("ts").getTime,
              r.getAs[String]("value"))))
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      out.asScala.toSeq
    }

    val t0 = 1700000000000L
    // run 1: the watermark inside the run reaches max(ts) - 5s = t0+15s,
    // so r0/r2 release but r20 stays BUFFERED in flatMapGroupsWithState
    // state when the query stops — exactly the gate's crash surface
    addFile(1, Seq((t0, "r0"), (t0 + 2000, "r2"), (t0 + 20000, "r20")))
    val first = runOnce()
    assert(first.map(_._2) == Seq("r0", "r2"),
      s"run 1 should gate r20 above its watermark: $first")

    // down-time data advances the watermark past r20; the restarted
    // query must release the row run 1 left buffered — exactly once,
    // before the newly-arrived one, in ts order
    addFile(2, Seq((t0 + 30000, "r30")))
    val second = runOnce()
    assert(second.map(_._2).headOption.contains("r20"),
      s"buffered row lost across restart: first=$first second=$second")
    assert(second == second.sortBy(_._1), s"emission not ts-ordered: $second")
    val all = first ++ second
    assert(all.map(_._2).distinct.size == all.size,
      s"replay duplicated gated rows: $all")
  }
}
