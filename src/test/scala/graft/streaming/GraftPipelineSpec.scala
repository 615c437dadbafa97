package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpecBase

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
    assert(p.status == p.Started)
    s.addData(SubRecord("k", new Timestamp(1000L), "a", "v1"),
      SubRecord("k", new Timestamp(2000L), "a", "v2"))
    p.underlying.processAllAvailable()
    assert(processed.get() == 2L)
    val st = p.shutdown()
    assert(st == p.ClosedGracefully)
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
      case p.ClosedNotGracefully(e) =>
        assert(e.getMessage.contains("task failed") ||
          Option(e.getCause).exists(_.getMessage.contains("task failed")))
      case other => fail(s"expected ClosedNotGracefully, got $other")
    }
    assert(seen.get().exists(_.isDefined))  // callback carried the cause
  }
}
