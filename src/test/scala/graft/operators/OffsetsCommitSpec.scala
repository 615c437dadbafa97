package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Property tests mirroring the reference's offsets-state semantics tables
  * (impl/offsets/OffsetsStateTest.java:115-198: out-of-order processing →
  * max contiguous prefix per partition, partitions independent).
  */
class OffsetsCommitSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(processed: Seq[Boolean]): Long =
    processed.indexWhere(!_) match {
      case -1 => processed.length.toLong
      case i  => i.toLong
    }

  test("committable == first unprocessed offset (seeded property loop)") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val parts = Seq.fill(3)(Seq.fill(1 + rnd.nextInt(20))(rnd.nextBoolean()))
      val rows = parts.zipWithIndex.flatMap { case (flags, p) =>
        flags.zipWithIndex.map { case (f, off) => (p, off.toLong, f) }
      }
      val df = rows.toDF("part", "offset", "processed")
      val got = OffsetsCommit
        .committable(df, col("part"), col("offset"), col("processed"))
        .select("part", "committable").as[(Int, Long)].collect().toMap
      parts.zipWithIndex.foreach { case (flags, p) =>
        assert(got(p) == brute(flags), s"partition $p flags=$flags")
      }
    }
  }

  test("reference example: out-of-order acks commit only the prefix") {
    // analog of OffsetsStateTest out-of-order case: offsets 0,1,2,3,4 with
    // 0,1,3 processed → committable = 2 (offset 2 not yet processed)
    val df = Seq(
      (0, 0L, true), (0, 1L, true), (0, 2L, false),
      (0, 3L, true), (0, 4L, false)).toDF("part", "offset", "processed")
    val r = OffsetsCommit
      .committable(df, col("part"), col("offset"), col("processed"))
      .select("part", "committable", "consumed", "processed_total")
      .as[(Int, Long, Long, Long)].head()
    assert(r == ((0, 2L, 5L, 3L)))
  }
}
