package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{ProcessingTimeoutException, SparkSpecBase}

class GraftPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("lifecycle: start -> Started, shutdown -> ClosedGracefully + callback") {
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val seen = new AtomicReference[Option[Option[Throwable]]](None)
    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds",
      ex => seen.set(Some(ex))) { (batch, _) =>
      processed.addAndGet(batch.count())
    }
    assert(p.status == GraftPipeline.Started)
    s.addData(SubRecord("k", new Timestamp(1000L), "a", "v1"),
      SubRecord("k", new Timestamp(2000L), "a", "v2"))
    p.underlying.processAllAvailable()
    assert(processed.get() == 2L)
    val st = p.shutdown()
    assert(st == GraftPipeline.ClosedGracefully)
    assert(p.status.isTerminal)
    assert(seen.get().contains(None))  // callback fired with no exception
  }

  test("failure path: batch exception -> ClosedNotGracefully with cause") {
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    val seen = new AtomicReference[Option[Option[Throwable]]](None)
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds",
      ex => seen.set(Some(ex))) { (batch, _) =>
      if (batch.count() > 0) throw new RuntimeException("task failed")
    }
    s.addData(SubRecord("k", new Timestamp(1000L), "a", "boom"))
    val st = p.awaitShutdown()
    st match {
      case GraftPipeline.ClosedNotGracefully(e) =>
        assert(e.getMessage.contains("task failed") ||
          Option(e.getCause).exists(_.getMessage.contains("task failed")))
      case other => fail(s"expected ClosedNotGracefully, got $other")
    }
    assert(seen.get().exists(_.isDefined))  // callback carried the cause
  }

  test("at_least_once failure surfaces ProcessingFailureException to the callback") {
    // reference RecordStatusObserverTest.shouldShutdownKafkaWorkers: a
    // record failure under at_least_once shuts the instance down with
    // ProcessingFailureException handed to the ShutdownCallback
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt-alo").toString
    val seen = new AtomicReference[Option[Option[Throwable]]](None)
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds",
      ex => seen.set(Some(ex)))(Guarantees.atLeastOnce { (batch, _) =>
      if (batch.count() > 0) throw new RuntimeException("record failed")
    })
    s.addData(SubRecord("k", new Timestamp(1000L), "a", "boom"))
    val st = p.awaitShutdown()
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    st match {
      case GraftPipeline.ClosedNotGracefully(e) =>
        assert(chain(e).exists(_.isInstanceOf[graft.ProcessingFailureException]),
          s"expected ProcessingFailureException in cause chain: $e")
      case other => fail(s"expected ClosedNotGracefully, got $other")
    }
    assert(seen.get().exists(_.exists(
      t => chain(t).exists(_.isInstanceOf[graft.ProcessingFailureException]))))
  }

  test("status transitions mirror the reference's legality table") {
    import GraftPipeline._
    assert(isTransitionAllowed(Created, Starting))
    assert(isTransitionAllowed(Starting, Started))
    assert(isTransitionAllowed(Started, Shutdown))
    assert(isTransitionAllowed(Shutdown, Closing))
    assert(isTransitionAllowed(Closing, ClosedGracefully))
    assert(isTransitionAllowed(Closing, ClosedNotGracefully(new Exception)))
    assert(isTransitionAllowed(Closing, CannotStopThreads))
    assert(isTransitionAllowed(Closing, ClosingInterrupted))
    // illegal jumps
    assert(!isTransitionAllowed(Created, Started))
    assert(!isTransitionAllowed(Started, Closing))
    assert(!isTransitionAllowed(Started, ClosedGracefully))
    assert(!isTransitionAllowed(ClosedGracefully, Started))
    // terminality
    assert(ClosedGracefully.isTerminal && CannotStopThreads.isTerminal &&
      ClosingInterrupted.isTerminal &&
      ClosedNotGracefully(new Exception).isTerminal)
    assert(!Created.isTerminal && !Started.isTerminal && !Closing.isTerminal)
  }

  test("watchdog: a hung batch terminates the pipeline with ProcessingTimeoutException") {
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    val seen = new AtomicReference[Option[Option[Throwable]]](None)
    val listener = new WorkersMetricsListener(processingTimeoutMs = 1500L)
    spark.streams.addListener(listener)
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds",
      ex => seen.set(Some(ex))) { (batch, _) =>
      if (batch.count() > 0) Thread.sleep(120000)  // hang (interruptible)
    }
    val dog = new PipelineWatchdog(p, listener, pollIntervalMs = 100L).start()
    try {
      s.addData(SubRecord("k", new Timestamp(1000L), "a", "hang"))
      val deadline = System.currentTimeMillis() + 30000
      while (!p.status.isTerminal && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      p.status match {
        case GraftPipeline.ClosedNotGracefully(e) =>
          assert(e.isInstanceOf[ProcessingTimeoutException],
            s"expected ProcessingTimeoutException, got $e")
        case other => fail(s"expected ClosedNotGracefully, got $other")
      }
      // the ShutdownCallback received the same taxonomy exception
      assert(seen.get().exists(_.exists(
        _.isInstanceOf[ProcessingTimeoutException])))
    } finally {
      dog.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("startWatched wires listener + watchdog to its own query") {
    import org.apache.spark.sql.DataFrame
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt5").toString
    val (p, listener, dog) = GraftPipeline.startWatched(
      s.toDF().writeStream.foreachBatch((b: DataFrame, _: Long) =>
        { b.count(); () }),
      ckpt, spark, "100 milliseconds", processingTimeoutMs = 60000L)
    try {
      s.addData(SubRecord("k", new Timestamp(1000L), "a", "v"))
      p.underlying.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (listener.metrics.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!listener.metrics.isEmpty, "listener saw no progress")
      assert(!listener.stalled())
      assert(p.shutdown() == GraftPipeline.ClosedGracefully)
      // terminal status tears the loop down deterministically: the
      // watchdog thread dies and is not left polling behind the pipeline
      val deadline2 = System.currentTimeMillis() + 5000
      while (dog.isAlive && System.currentTimeMillis() < deadline2)
        Thread.sleep(50)
      assert(!dog.isAlive, "watchdog thread leaked past pipeline terminal")
      assert(!Thread.getAllStackTraces.keySet.toArray.exists {
        case t: Thread => t.isAlive && t.getName == "graft-pipeline-watchdog"
      }, "a graft-pipeline-watchdog thread is still running")
    } finally {
      dog.stop() // no-op after auto-teardown; kept to pin idempotence
      spark.streams.removeListener(listener)
    }
  }

  test("exactlyOnceParquet: a replayed batch overwrites, never duplicates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-e1x").toString + "/t"
    val sink = Guarantees.exactlyOnceParquet(out)
    sink(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    sink(Seq((3L, "c")).toDF("id", "v"), 1L)
    // crash-replay of batch 0: same id, possibly different physical rows
    sink(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    val rows = spark.read.parquet(out)
      .select("id", "v", "batch_id").as[(Long, String, Long)]
      .collect().toSet
    assert(rows == Set((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)),
      s"replay duplicated or clobbered: $rows")
  }

  test("forced shutdown that cannot stop the query -> CannotStopThreads") {
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt4").toString
    val seen = new AtomicReference[Option[Option[Throwable]]](None)
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds",
      onShutdown = ex => seen.set(Some(ex)),
      shutdownTimeoutMs = 500L) { (batch, _) =>
      if (batch.count() > 0) {
        // stubborn: swallow interrupts, like a worker thread that won't die
        val deadline = System.currentTimeMillis() + 15000
        while (System.currentTimeMillis() < deadline)
          try Thread.sleep(50)
          catch { case _: InterruptedException => () }
      }
    }
    s.addData(SubRecord("k", new Timestamp(1000L), "a", "stubborn"))
    Thread.sleep(1000)  // let the stubborn batch start
    val st = p.shutdown()
    assert(st == GraftPipeline.CannotStopThreads)
    assert(p.status.isTerminal)
    // the callback must NOT read as a graceful close: a synthetic cause
    // is passed when nothing was recorded (ADVICE r2)
    assert(seen.get().exists(_.nonEmpty),
      s"CannotStopThreads fired callback with ${seen.get()}")
  }

  test("registerCleanup after terminal status runs immediately (ADVICE r4)") {
    // A query that fails faster than the caller can register its teardown
    // must still have the teardown run — otherwise startWatched would leak
    // its listener/watchdog on a fast failure.
    val s = MemoryStream[SubRecord](spark)
    val ckpt = Files.createTempDirectory("graft-ckpt-late").toString
    val p = GraftPipeline.foreachBatch(s.toDF(), ckpt, "100 milliseconds") {
      (_, _) => ()
    }
    assert(p.shutdown() == GraftPipeline.ClosedGracefully)
    val ran = new java.util.concurrent.atomic.AtomicBoolean(false)
    p.registerCleanup(() => ran.set(true))
    assert(ran.get(), "cleanup registered after terminal status never ran")
  }
}
