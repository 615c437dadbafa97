package graft.operators

import graft.{BadOffsetException, ProcessingTimeoutException}

/** Per-partition RECORD-LEVEL out-of-order offset acknowledgment — the
  * reference's full `DefaultOffsetsState` semantics
  * (impl/offsets/DefaultOffsetsState.java:142-338,
  * impl/offsets/ConsumedOffsets.java:52-131,
  * impl/range/SortedRanges.java:46-162), re-expressed originally. This
  * closes the one semantic delta the micro-batch form
  * ([[OffsetsCommit]]) deliberately kept: records acknowledge
  * INDIVIDUALLY, in any order, and the committable offset is always the
  * exact floor of the first still-unprocessed consumed offset.
  *
  * State, per partition:
  *  - consumed-but-not-yet-head-stripped ranges, APPEND-ONLY and
  *    head-shrunk, each carrying the consumedAt instant of its original
  *    `addConsumed` (a left-shrink keeps it — the timeout clock belongs
  *    to the batch the record arrived in);
  *  - processed offsets as DISJOINT MERGED ranges (a TreeMap start→end):
  *    out-of-order singles coalesce as holes fill, so state size is
  *    bounded by the instantaneous out-of-orderness, never by stream
  *    length — the property that makes record-level tracking viable at
  *    100 TB (state per Kafka partition is a handful of ranges; the
  *    streaming deployment in [[graft.streaming.OffsetsTracker]] keys by
  *    partition so a million partitions spread across executors).
  *
  * Exactness quirks preserved deliberately (pinned by OffsetsStateSpec
  * against the reference's own test tables):
  *  - consumed heads strip ONLY when the lowest processed range STARTS at
  *    the consumed head's lower endpoint — so a commit that has not yet
  *    come back through [[removeCommitted]] keeps the committable at the
  *    previous floor (monotone, conservative, never regressing) even
  *    though later offsets already processed;
  *  - `offsetToCommit` answers None when nothing below the first
  *    unprocessed offset is processed (nothing NEW to commit);
  *  - double-consume, double-process, and process-before-consume raise
  *    [[BadOffsetException]] with the reference's messages;
  *  - [[timeoutConsumedBefore]] raises [[ProcessingTimeoutException]]
  *    naming the FIRST unprocessed consumed offset when its range's
  *    consumedAt is older than the deadline.
  */
final class OffsetsState private (
    partition: String,
    consumed0: Seq[(Long, Long, Long)],
    processed0: Seq[(Long, Long)]) {

  def this(partition: String) = this(partition, Nil, Nil)

  // (lo, hi, consumedAtMillis); ascending, disjoint, append-only
  private val consumed =
    scala.collection.mutable.ArrayDeque.from(consumed0)
  // start -> end, disjoint, merged
  private val processed = scala.collection.mutable.TreeMap.empty[Long, Long]
  processed0.foreach { case (lo, hi) => processed.put(lo, hi) }

  /** Register a consumed range (dense [lo, hi], consumed at `atMillis`).
    * Ranges must arrive in ascending offset and time order; overlap with
    * anything still tracked is the reference's BadOffsetException. */
  def addConsumed(lo: Long, hi: Long, atMillis: Long): Unit = {
    require(lo <= hi, s"bad range [$lo, $hi]")
    // overlap detection mirrors SortedRanges.getMinExistingElement: the
    // reported offset is the new range's lo when it lands inside an
    // existing range, else the first existing lo the new range swallows
    val over = floorConsumed(lo) match {
      case Some((_, hi0, _)) if lo <= hi0 => Some(lo)
      case _ => consumed.find(r => r._1 >= lo && r._1 <= hi).map(_._1)
    }
    over.foreach { o =>
      throw new BadOffsetException(
        s"Offset: $o for partition: $partition was consumed before")
    }
    consumed.lastOption.foreach { case (_, lastHi, lastAt) =>
      if (lo <= lastHi) throw new IllegalStateException(
        s"consumed ranges must ascend: last hi $lastHi, new lo $lo")
      if (atMillis < lastAt) throw new IllegalStateException(
        s"consumedAt must be monotone: last $lastAt, new $atMillis")
    }
    consumed.append((lo, hi, atMillis))
  }

  /** Acknowledge ONE record, in any order. */
  def updateProcessed(offset: Long): Unit = {
    if (processedContains(offset))
      throw new BadOffsetException(
        s"Offset: $offset for partition: $partition was processed before")
    if (!consumedContains(offset))
      throw new BadOffsetException(
        s"Offset: $offset for partition: $partition was not consumed before")
    addProcessed(offset)
  }

  /** The committable offset — the largest processed offset at or below
    * (first unprocessed consumed offset − 1) — or the last processed
    * offset when nothing consumed remains unprocessed; None when there is
    * nothing new to commit. The Kafka commit value is this + 1. */
  def offsetToCommit(): Option[Long] = {
    stripProcessedHeads()
    consumed.headOption match {
      case Some((lo, _, _)) => floorProcessed(lo - 1)
      case None => processed.lastOption.map(_._2)
    }
  }

  /** Prune state below a completed commit (`nextOffset` = the committed
    * Kafka offset, i.e. committable + 1). */
  def removeCommitted(nextOffset: Long): Unit = {
    val max = nextOffset - 1
    dropConsumedUpTo(max)
    // processed: drop ranges ending at/below max, shrink one straddler
    var done = false
    while (!done) {
      processed.headOption match {
        case Some((lo, hi)) if hi <= max => processed.remove(lo): Unit
        case Some((lo, hi)) if lo <= max =>
          processed.remove(lo); processed.put(max + 1, hi); done = true
        case _ => done = true
      }
    }
  }

  /** Raise [[ProcessingTimeoutException]] if the FIRST unprocessed
    * consumed range was consumed before `minConsumedAtMillis`
    * (DefaultOffsetsState.timeoutRecordsConsumedBefore). */
  def timeoutConsumedBefore(minConsumedAtMillis: Long): Unit = {
    stripProcessedHeads()
    consumed.headOption.foreach { case (lo, _, at) =>
      if (at < minConsumedAtMillis)
        throw new ProcessingTimeoutException(
          s"Offset [$lo] for partition [$partition] exceeded timeout: " +
            s"consumedAt [$at]")
    }
  }

  /** Processed-but-uncommitted record count (the reference's
    * getProcessedUncommittedRecordsTotal, per partition). */
  def processedUncommitted(): Long =
    processed.iterator.map { case (lo, hi) => hi - lo + 1 }.sum

  /** Serializable snapshot (for streaming state stores). */
  def snapshot(): (Seq[(Long, Long, Long)], Seq[(Long, Long)]) =
    (consumed.toSeq, processed.toSeq)

  // --- internals ------------------------------------------------------

  private def floorConsumed(off: Long): Option[(Long, Long, Long)] = {
    // consumed is ascending; binary search the last range with lo <= off
    var lo = 0
    var hi = consumed.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (consumed(mid)._1 <= off) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0) Some(consumed(ans)) else None
  }

  private def consumedContains(off: Long): Boolean =
    floorConsumed(off).exists(off <= _._2)

  private def floorEntryProcessed(x: Long): Option[(Long, Long)] =
    processed.maxBefore(x + 1) // greatest start <= x

  private def processedContains(off: Long): Boolean =
    floorEntryProcessed(off).exists(off <= _._2)

  private def floorProcessed(x: Long): Option[Long] =
    floorEntryProcessed(x).map(e => math.min(e._2, x))

  private def addProcessed(o: Long): Unit = {
    val left = floorEntryProcessed(o).filter(_._2 == o - 1)
    val right = processed.get(o + 1)
    (left, right) match {
      case (Some((llo, _)), Some(rhi)) =>
        processed.remove(o + 1); processed.put(llo, rhi): Unit
      case (Some((llo, _)), None) => processed.put(llo, o): Unit
      case (None, Some(rhi)) =>
        processed.remove(o + 1); processed.put(o, rhi): Unit
      case (None, None) => processed.put(o, o): Unit
    }
  }

  /** Drop/shrink consumed ranges wholly/partially at or below `max`. */
  private def dropConsumedUpTo(max: Long): Long = {
    var removed = Long.MinValue
    while (consumed.nonEmpty && consumed.head._2 <= max) {
      removed = consumed.head._2
      consumed.removeHead()
    }
    consumed.headOption.foreach { case (lo, hi, at) =>
      if (lo <= max) { consumed(0) = (max + 1, hi, at); removed = max }
    }
    removed
  }

  /** The reference's removeProcessedOffsetsFromHeadConsumedOffsets: walk
    * processed ranges ascending; strip the consumed head only while the
    * processed range STARTS exactly at the head's lower endpoint, and
    * stop at the first processed range the head does not fully cover. */
  private def stripProcessedHeads(): Unit = {
    val it = processed.iterator
    var done = false
    while (it.hasNext && !done) {
      val (plo, phi) = it.next()
      consumed.headOption match {
        case Some((lo, _, _)) if lo == plo =>
          val removed = dropConsumedUpTo(phi)
          if (removed < phi) done = true
        case _ => done = true
      }
    }
  }
}

object OffsetsState {
  /** Rehydrate from a [[OffsetsState.snapshot]] (streaming state store). */
  def restore(partition: String, consumed: Seq[(Long, Long, Long)],
              processed: Seq[(Long, Long)]): OffsetsState =
    new OffsetsState(partition, consumed, processed)
}
