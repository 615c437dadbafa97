package graft.functions

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982, "Finding
  * repeated elements"; mergeability per Agarwal et al. 2013, "Mergeable
  * Summaries"): a bounded map of at most `capacity` counters over a
  * stream of items. The reference pipeline has no sketch operators; this
  * backs the engine's heavy-hitters profiling path
  * ([[graft.operators.Profile.heavyHitters]]), where the 100-TB shape —
  * a full-vocabulary groupBy shuffles billions of distinct-token partial
  * aggregates — is replaced by a two-scan plan whose only shuffled rows
  * are the ≤ `capacity × partitions` sketch candidates.
  *
  * Guarantee used downstream: after summarizing a stream of N items, any
  * item ABSENT from the summary has true stream count ≤ N/(capacity+1)
  * (each eviction round decrements capacity+1 counts including the
  * incoming item's, so an item evicted to zero `d` times had at most `d ≤
  * N/(capacity+1)` occurrences). The per-partition union of summaries
  * therefore contains every item with global count > N/(capacity+1).
  */
final class MisraGries(val capacity: Int) {
  require(capacity > 0, "need capacity > 0")
  private val counts = new mutable.HashMap[String, Long]

  def offer(item: String): Unit = {
    val cur = counts.getOrElse(item, -1L)
    if (cur >= 0L) counts.update(item, cur + 1L)
    else if (counts.size < capacity) counts.update(item, 1L)
    else {
      // decrement round: every stored counter and (implicitly) the
      // incoming item lose one; zeros drop out — O(capacity), amortized
      // O(1) per offer because each decrement pays down one increment
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, v) => v - 1L)
      counts.foreach { case (k, v) => if (v <= 0L) dead += k }
      dead.foreach(counts.remove)
    }
  }

  /** Items currently held — a superset of every item with stream count
    * above N/(capacity+1). Estimated counts are deliberately NOT exposed:
    * the operator recounts candidates exactly, so only membership matters. */
  def items: Seq[String] = counts.keys.toSeq
}
