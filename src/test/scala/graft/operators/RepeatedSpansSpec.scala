package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Repeated-span (substring-level) dedup profile vs an independent
  * driver-side reference: plain Scala sliding windows + exact string
  * grouping, no hashing, no Bloom, no Spark expressions shared with the
  * implementation under test.
  */
class RepeatedSpansSpec extends SparkSpecBase {
  import spark.implicits._

  private val Span = 40
  private val Stride = 40

  /** Driver-side reference: stride-aligned windows, exact text equality,
    * duplicated = appears in >= minDocs distinct docs. */
  private def reference(docs: Seq[(Long, String)],
                        minDocs: Int = 2): Map[Long, (Long, Long)] = {
    def windows(t: String): Seq[String] = {
      val end = math.max(t.length - Span, 0)
      (0 to end by Stride).map(o => t.substring(o, math.min(o + Span, t.length)))
    }
    val all = docs.flatMap { case (id, t) => windows(t).map(s => (id, s)) }
    val dupSet = all.distinct.groupBy(_._2).collect {
      case (s, rows) if rows.map(_._1).distinct.size >= minDocs => s
    }.toSet
    docs.map { case (id, t) =>
      val w = windows(t)
      id -> (w.size.toLong, w.count(dupSet.contains).toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], fpp: Double = 0.01) =
    Dedup.repeatedSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), Span, Stride, minDocs = 2, fpp = fpp)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  // deterministic pseudo-text: a-z soup seeded by (docId, position)
  private def soup(id: Long, n: Int): String =
    (0 until n).map { i =>
      val x = (id * 1000003L + i * 2654435761L) & 0x7fffffffL
      ('a' + (x % 26).toInt).toChar
    }.mkString

  test("known answer: aligned shared block counts, unaligned is missed") {
    val block = "B" * Span
    val docs = Seq(
      // block at aligned offset 40 in two different docs -> duplicated
      1L -> (soup(1, 40) + block + soup(11, 60)),
      2L -> (soup(2, 40) + block + soup(12, 100)),
      // same block at UNALIGNED offset 25: the stride discretization
      // misses it by design (the documented recall caveat)
      3L -> (soup(3, 25) + block + soup(13, 60)),
      // block twice inside ONE doc only -> not duplicated (minDocs
      // counts distinct docs, not occurrences)
      4L -> ("C" * Span + soup(4, 40).take(40) + "C" * Span),
      5L -> soup(5, 120))
    val got = run(docs)
    val want = reference(docs)
    assert(got == want)
    // and the fixture really exercises both modes
    assert(got(1L)._2 == 1 && got(2L)._2 == 1, "aligned dup found")
    assert(got(3L)._2 == 0, "unaligned block not claimed")
    assert(got(4L)._2 == 0, "intra-doc repeat not claimed")
  }

  test("matches the driver-side reference on a planted-dup corpus") {
    val docs: Seq[(Long, String)] = (0L until 80L).map { i =>
      val t =
        if (i % 7 == 3) soup(i, 30) + soup(999, 80) + soup(i + 100, 50)
        else soup(i, 60 + (i % 5).toInt * 37)
      (i, t)
    } ++ Seq(200L -> "", 201L -> "short", 202L -> soup(42, Span),
      203L -> soup(42, Span + 1))
    val got = run(docs)
    val want = reference(docs)
    assert(got.size == docs.size, "one row per doc incl. empty/short")
    assert(got == want)
    assert(want.values.exists(_._2 > 0), "fixture contains duplicates")
    assert(want.values.exists(_._2 == 0), "fixture contains clean docs")
  }

  test("arithmetic totals == exploded window counts at every edge length") {
    val docs = Seq(0, 1, Span - 1, Span, Span + 1, 2 * Span - 1, 2 * Span,
      2 * Span + 1, 7 * Span + 13).zipWithIndex
      .map { case (n, i) => (i.toLong, soup(i, n)) }
    val got = run(docs)
    for ((id, t) <- docs) {
      val end = math.max(t.length - Span, 0)
      val expected = (0 to end by Stride).size.toLong
      assert(got(id)._1 == expected, s"doc $id len ${t.length}")
    }
  }

  test("hostile fpp cannot perturb the exact output") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) soup(7, 90) else soup(i, 90))
    }
    assert(run(docs, fpp = 0.9) == reference(docs))
  }
}
