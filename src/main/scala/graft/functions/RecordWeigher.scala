package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record-size accounting — the engine form of the reference's Weigher
  * surface (api/record/weigher/Weigher.java:3-9, RecordWeigher.java:47-65):
  * record weight = key bytes + value bytes + topic chars + fixed JVM
  * overhead. The reference uses it for queue admission control; Spark's
  * memory manager subsumes that, so here it is an analytics column (skew
  * detection, size-based routing, maxBytesPerTrigger planning).
  *
  * The 256-byte constant matches the reference's measured WorkerRecord
  * shell (WeigherHelperTest.java:15-22).
  */
object RecordWeigher {
  val RecordOverheadBytes = 256L

  /** Byte weight of a record given its key/value/topic columns. Binary or
    * string inputs both work (octet_length of the UTF-8 form). */
  def recordWeight(key: Column, value: Column, topic: Column): Column =
    coalesce(octet_length(key.cast("binary")), lit(0L)).cast("long") +
      coalesce(octet_length(value.cast("binary")), lit(0L)).cast("long") +
      coalesce(octet_length(topic.cast("binary")), lit(0L)).cast("long") +
      lit(RecordOverheadBytes)
}
