package graft.streaming

/** Source admission control — the reference's byte-weighted queue budget
  * (README.md:231-245, impl/queues/QueuesManager.java:59,76-88) translated
  * to Structured Streaming's rate limits.
  *
  * Reference math: queue budget = heap × queue.total.size.heap.ratio
  * (default 0.5), split evenly across subpartitions; a partition pauses
  * when its queue exceeds its share. Spark's equivalent knobs are
  * `maxBytesPerTrigger` / `maxOffsetsPerTrigger` on the source: one
  * micro-batch's input plays the role of the in-flight queue, so the same
  * budget bounds it.
  */
object Backpressure {

  /** Per-trigger byte budget from the reference's sizing rule. With the
    * reference's worked example (8 GiB heap, ratio 0.5) this yields 4 GiB —
    * the exact total queue budget QueuesManager would allocate. */
  def maxBytesPerTrigger(heapBytes: Long, heapRatio: Double = 0.5): Long = {
    require(heapRatio > 0 && heapRatio <= 1, s"bad ratio $heapRatio")
    (heapBytes * heapRatio).toLong
  }

  /** Per-trigger record budget given a mean record weight (see
    * graft.functions.RecordWeigher): budget / weight, floored at 1. */
  def maxOffsetsPerTrigger(heapBytes: Long, meanRecordBytes: Long,
                           heapRatio: Double = 0.5): Long =
    math.max(1L, maxBytesPerTrigger(heapBytes, heapRatio) /
      math.max(1L, meanRecordBytes))

  /** Kafka-source options implementing the budget. */
  def kafkaRateOptions(heapBytes: Long, meanRecordBytes: Long,
                       heapRatio: Double = 0.5): Map[String, String] = Map(
    "maxOffsetsPerTrigger" ->
      maxOffsetsPerTrigger(heapBytes, meanRecordBytes, heapRatio).toString)
}
