package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  test("asOf attaches the latest right ts at-or-before each left row") {
    val left = Seq((1L, 100L, t(1000)), (2L, 100L, t(5000)), (3L, 200L, t(1000)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 100L, t(1000)), (11L, 100L, t(4000)), (12L, 300L, t(500)))
      .toDF("event_id", "user_id", "ts")
    val r = TemporalJoins.asOf(left, right, "user_id", "ts", "m")
      .select("event_id", "m").as[(Long, Option[Timestamp])]
      .collect().toMap
    assert(r(1L).contains(t(1000)))  // tie: right at same ts counts
    assert(r(2L).contains(t(4000)))  // latest prior
    assert(r(3L).isEmpty)            // no right rows for user 200
  }

  test("rangeSelfJoinCount counts neighbors within the band only") {
    val df = Seq(
      (1L, 9L, 0L), (2L, 9L, 500L), (3L, 9L, 1800L), (4L, 9L, 10000L),
      (5L, 7L, 0L)).toDF("event_id", "user_id", "us")
    val r = TemporalJoins.rangeSelfJoinCount(df, col("user_id"), col("us"),
        col("event_id"), rangeUs = 1000L)
      .as[(Long, Long)].collect().toMap
    // 1↔2 (500), 2↔3 (1300 > 1000? no) — wait: |500-1800|=1300 → not paired;
    // |0-1800| = 1800 → no. So 1:{2}, 2:{1}; 3,4,5 isolated (absent).
    assert(r == Map(1L -> 1L, 2L -> 1L))
  }

  test("rangeSelfJoinCount pairs across bucket boundaries") {
    // 999 and 1001 straddle the 1000-bucket edge but are 2 apart
    val df = Seq((1L, 9L, 999L), (2L, 9L, 1001L))
      .toDF("event_id", "user_id", "us")
    val r = TemporalJoins.rangeSelfJoinCount(df, col("user_id"), col("us"),
        col("event_id"), rangeUs = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L))
  }
}

class RecordWeigherSpec extends SparkSpecBase {
  import spark.implicits._

  test("recordWeight = key + value + topic bytes + 256 overhead") {
    val r = Seq(("k1", "value-bytes", "topic-a"))
      .toDF("k", "v", "t")
      .select(graft.functions.RecordWeigher.recordWeight(
        col("k"), col("v"), col("t")).as("w"))
      .as[Long].head()
    assert(r == 2 + 11 + 7 + 256)
  }

  test("null key contributes zero, not null") {
    val r = Seq((Option.empty[String], "v", "t")).toDF("k", "v", "t")
      .select(graft.functions.RecordWeigher.recordWeight(
        col("k"), col("v"), col("t")).as("w"))
      .as[Long].head()
    assert(r == 0 + 1 + 1 + 256)
  }

  test("estimateInstanceSize reproduces the reference WeigherHelperTest vectors") {
    import graft.functions.RecordWeigher.estimateInstanceSize
    // WeigherHelperTest.java:15-22 (small-heap JVM): the JDK classes the
    // reference pins; WorkerRecord's 256 is carried as RecordOverheadBytes
    assert(estimateInstanceSize(classOf[Object], largeHeap = false) == 16)
    assert(estimateInstanceSize(classOf[java.lang.Byte], largeHeap = false) == 24)
    assert(estimateInstanceSize(classOf[java.lang.Long], largeHeap = false) == 24)
    assert(estimateInstanceSize(classOf[String], largeHeap = false) == 48)
  }

  test("estimateInstanceSize: WeigherHelpers rules, hand-computed KATs") {
    import graft.functions.RecordWeigher.estimateInstanceSize
    // two primitives: header 16 + long 8 + int 4 = 28 -> pad to 32
    class TwoPrims { var x: Long = 0L; var y: Int = 0 }
    assert(estimateInstanceSize(classOf[TwoPrims], largeHeap = false) == 32)
    // large heap: reference fields are 8 bytes, array headers 24
    class OneRef { var o: TwoPrims = null }
    // small: 16 + 4 = 20 -> 24, + deep 32 = 56
    assert(estimateInstanceSize(classOf[OneRef], largeHeap = false) == 56)
    // large: 16 + 8 = 24, + deep 32 = 56
    assert(estimateInstanceSize(classOf[OneRef], largeHeap = true) == 56)
    // arrays counted as empty: header only (16 small / 24 large heap)
    assert(estimateInstanceSize(classOf[Array[Long]], largeHeap = false) == 16)
    assert(estimateInstanceSize(classOf[Array[Long]], largeHeap = true) == 24)
    // self-referential type terminates (hardening over the reference)
    class Node { var next: Node = null; var v: Int = 0 }
    // 16 + 4(ref) + 4(int) = 24, cycle not re-entered -> 24
    assert(estimateInstanceSize(classOf[Node], largeHeap = false) == 24)
  }
}
