package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level tests: published known-answer vectors where the algorithm
  * has them (FNV-1a), semantic properties everywhere (the reference pins
  * its weigher/hash behavior the same way, WeigherHelperTest.java:15-33).
  */
class GraftHashSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("fnv1a64 matches published vectors") {
    // Fowler/Noll/Vo reference vectors (public domain test suite).
    assert(GraftHash.fnv1a64(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(GraftHash.fnv1a64("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(GraftHash.fnv1a64("foobar".getBytes("UTF-8")) == 0x85944171f73967e8L)
  }

  test("murmur2 is deterministic and sensitive to every byte") {
    val h1 = GraftHash.murmur2("hello-world".getBytes)
    assert(h1 == GraftHash.murmur2("hello-world".getBytes))
    assert(h1 != GraftHash.murmur2("hello-worle".getBytes))
    // tail handling: lengths 0..7 all distinct for distinct inputs
    val hs = (0 to 7).map(n => GraftHash.murmur2(("x" * n).getBytes))
    assert(hs.distinct.size == hs.size)
  }

  test("murmur2NonNegativeMod stays in [0, n) (seeded property loop)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(32))
      val n = rnd.nextInt(64) + 1
      val m = GraftHash.murmur2NonNegativeMod(u(s), n)
      assert(m >= 0 && m < n, s"s=$s n=$n m=$m")
    }
  }

  test("murmur2 distribution is roughly uniform over mod 16") {
    val counts = (0 until 4000)
      .map(i => GraftHash.murmur2NonNegativeMod(u(s"key-$i"), 16))
      .groupBy(identity).view.mapValues(_.size)
    // expected 250 per bucket; allow wide tolerance
    assert(counts.values.forall(c => c > 150 && c < 350))
  }

  test("minhash: equal token sets give equal signatures; estimate tracks jaccard") {
    def sig(tokens: Seq[String], k: Int = 128) =
      GraftHash.minHashSignature(
        new GenericArrayData(tokens.map(u).toArray[Any]), k, 42L)
        .toLongArray.toSeq

    val a = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    assert(sig(a) == sig(scala.util.Random.shuffle(a))) // order-insensitive
    // overlap 4 of 12 distinct → jaccard = 4/12
    val b = Seq("e", "f", "g", "h", "x", "y", "z", "w")
    val (sa, sb) = (sig(a), sig(b))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 4.0 / 12.0) < 0.15)
  }

  test("jaccardSorted: empty sets are identical (J=1), one-sided empty is 0") {
    def arr(xs: Long*) = new GenericArrayData(xs.toArray[Any])
    assert(GraftHash.jaccardSorted(arr(), arr()) == 1.0)
    assert(GraftHash.jaccardSorted(arr(1L, 2L), arr()) == 0.0)
    assert(GraftHash.jaccardSorted(arr(1L, 2L, 3L), arr(2L, 3L, 4L)) == 0.5)
  }

  test("zOrder62: known interleavings and locality") {
    assert(GraftHash.zOrder62(0, 0) == 0L)
    assert(GraftHash.zOrder62(1, 0) == 1L)   // x bit 0 -> z bit 0
    assert(GraftHash.zOrder62(0, 1) == 2L)   // y bit 0 -> z bit 1
    assert(GraftHash.zOrder62(3, 0) == 5L)   // 0b11 -> 0b0101
    assert(GraftHash.zOrder62(0, 3) == 10L)  // 0b11 -> 0b1010
    assert(GraftHash.zOrder62(3, 3) == 15L)
    assert(GraftHash.zOrder62(Int.MaxValue, Int.MaxValue) ==
      (1L << 62) - 1)                        // 62 bits, never negative
    intercept[IllegalArgumentException](GraftHash.zOrder62(-1, 0))
    // locality: nearby 2-D points have z-values in a bounded band
    val base = GraftHash.zOrder62(512, 512)
    val near = for { dx <- 0 to 3; dy <- 0 to 3 }
      yield GraftHash.zOrder62(512 + dx, 512 + dy)
    assert(near.forall(z => math.abs(z - base) <= 63))
  }

  test("simHashMd5_60: first-15-hex-chars equivalence, hand-checked") {
    def arr(t: Seq[String]) = new GenericArrayData(t.map(u).toArray[Any])
    // single token: signature = the 60-bit token hash itself (votes = sign
    // of each bit), which must equal parseLong(md5hex.take(15), 16)
    val tok = "hello"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16)
    assert(GraftHash.simHashMd5_60(arr(Seq(tok))) == expected)
    // 60-bit range and determinism
    val s = GraftHash.simHashMd5_60(arr(Seq("a", "b", "c")))
    assert(s >= 0L && s < (1L << 60))
    assert(s == GraftHash.simHashMd5_60(arr(Seq("c", "a", "b")))) // order-free
  }

  test("simhash: permutation-invariant; disjoint sets differ") {
    def arr(t: Seq[String]) = new GenericArrayData(t.map(u).toArray[Any])
    val a = Seq("spark", "scala", "stream", "merge", "offset")
    assert(GraftHash.simHash64(arr(a)) ==
      GraftHash.simHash64(arr(scala.util.Random.shuffle(a))))
    val b = Seq("entirely", "different", "token", "universe", "here")
    val d = GraftHash.hamming64(GraftHash.simHash64(arr(a)),
      GraftHash.simHash64(arr(b)))
    assert(d > 10, s"disjoint sets should be far apart, got $d")
  }

  test("rollingFingerprint is order-sensitive") {
    assert(GraftHash.rollingFingerprint(u("ab")) !=
      GraftHash.rollingFingerprint(u("ba")))
    assert(GraftHash.rollingFingerprint(u("abc")) ==
      GraftHash.rollingFingerprint(u("abc")))
  }

  test("hamming64 basics") {
    assert(GraftHash.hamming64(0L, 0L) == 0)
    assert(GraftHash.hamming64(0L, -1L) == 64)
    assert(GraftHash.hamming64(5L, 4L) == 1)
  }
}
