package graft

import org.apache.spark.sql.functions._

/** Pins the GenScale embedding isometry across the FULL copy range,
  * including copies past the rotation space (i ≥ dim) where the seeded
  * sign pattern is the only thing standing between "10× decorrelated
  * workload" and "identical vectors under new ids" — the failure mode a
  * 100-copy (sf10) generation would hit silently with rotation alone. */
class GenScaleSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8
  private val vecs = Seq(
    Array(0.9f, 0.1f, -0.3f, 0.7f, 0.2f, -0.8f, 0.4f, 0.05f),
    Array(-0.2f, 0.6f, 0.6f, -0.1f, 0.9f, 0.3f, -0.5f, 0.11f),
    Array(0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f))

  private def transformed(i: Int): Seq[Array[Float]] =
    vecs.toDF("embedding")
      .select(GenScale.embeddingTransform(col("embedding"), i, dim))
      .as[Array[Float]].collect().toSeq

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("copy 0 is the identity; copies 1..dim-1 are the legacy rotation") {
    assert(transformed(0).map(_.toSeq) == vecs.map(_.toSeq))
    val r3 = transformed(3)
    val expect = vecs.map(v => v.drop(3) ++ v.take(3))
    assert(r3.map(_.toSeq) == expect.map(_.toSeq))
  }

  test("every copy is an isometry: pairwise cosines preserved exactly") {
    for (i <- Seq(1, 5, dim, dim + 3, 7 * dim + 1)) {
      val t = transformed(i)
      for (a <- vecs.indices; b <- vecs.indices if a < b)
        assert(math.abs(cos(t(a), t(b)) - cos(vecs(a), vecs(b))) < 1e-6,
          s"copy $i broke the cosine between vectors $a and $b")
    }
  }

  test("copies i and i+dim differ (signs break the rotation-space wrap)") {
    // same rotation amount, so WITHOUT the Rademacher pattern these would
    // be bit-identical — the fabricated-duplicate failure mode
    for (i <- 0 until dim) {
      val lo = transformed(i); val hi = transformed(i + dim)
      assert(lo.map(_.toSeq) != hi.map(_.toSeq),
        s"copies $i and ${i + dim} collided: sign pattern missing")
      // and the cross-copy cosine of the SAME base vector is not ~1
      val c = cos(lo.head, hi.head)
      assert(c < 0.999, s"copies $i/${i + dim} still near-duplicate: cos=$c")
    }
  }

  test("sign patterns are deterministic and ±1-valued") {
    val s1 = GenScale.signsFor(64, 64); val s2 = GenScale.signsFor(64, 64)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s == 1.0f || s == -1.0f))
    // patterns for distinct copies differ somewhere
    assert(GenScale.signsFor(64, 64).toSeq != GenScale.signsFor(65, 64).toSeq)
  }
}
