package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The Misra–Gries guarantee, exercised directly: any item with stream
  * count > N/(capacity+1) must be present in the summary — regardless of
  * stream order (the operator's candidate-superset proof rests on exactly
  * this, so it gets its own adversarial property loop).
  */
class SketchesSpec extends AnyFunSuite {

  private def check(stream: Seq[String], capacity: Int): Unit = {
    val mg = new MisraGries(capacity)
    stream.foreach(mg.offer)
    val items = mg.items.toSet
    val n = stream.length.toLong
    val bound = n / (capacity + 1L)
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val missed = counts.filter { case (k, c) => c > bound && !items(k) }
    assert(missed.isEmpty,
      s"items over the N/(k+1)=$bound bound missing from the summary: " +
        s"${missed.toMap} (N=$n, capacity=$capacity)")
    assert(mg.items.size <= capacity, "summary exceeded its capacity")
  }

  test("guarantee holds on seeded random zipf streams, any order") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val cap = 1 + rnd.nextInt(24)
      val n = 200 + rnd.nextInt(3000)
      // zipf-ish: item id ~ floor(1/u) capped — few heavy, many light
      val stream = Seq.fill(n)(
        s"t${math.min(200, (1.0 / math.max(1e-3, rnd.nextDouble())).toInt)}")
      check(stream, cap)                      // natural order
      check(rnd.shuffle(stream), cap)         // shuffled
      check(stream.sorted, cap)               // grouped runs
      check(stream.sortBy(s => (counts(stream)(s), s)), cap) // light first
    }
  }

  private def counts(s: Seq[String]): Map[String, Int] =
    s.groupBy(identity).view.mapValues(_.size).toMap

  test("adversarial: heavy item arrives only after the summary is full") {
    // capacity fills with unique junk, then the heavy item floods in —
    // decrement rounds must not permanently evict it
    val junk = (1 to 64).map(i => s"j$i")
    val stream = junk ++ Seq.fill(200)("HEAVY") ++ junk
    check(stream, capacity = 8)
    val mg = new MisraGries(8)
    stream.foreach(mg.offer)
    assert(mg.items.contains("HEAVY"))
  }

  test("no evictions below capacity: summary is the exact item set") {
    val mg = new MisraGries(100)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    stream.foreach(mg.offer)
    assert(mg.items.toSet == Set("a", "b", "c"))
  }
}
