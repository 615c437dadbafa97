package graft.streaming

import java.sql.Timestamp

/** Canonical record shapes for the streaming operators.
  *
  * [[SubRecord]] is the engine's analog of the reference's WorkerRecord
  * (api/record/WorkerRecord.java:11-70): a payload plus the (topic,
  * partition, subpartition) ordering key — collapsed here to one string
  * `subKey` — and an event timestamp. Deserialization of `value` stays at
  * the edge, exactly as the reference leaves K/V opaque (README.md:24).
  */
case class SubRecord(subKey: String, ts: Timestamp, src: String, value: String)

/** One punctuation tick for a key — the reference's punctuate(long)
  * callback (api/task/WorkerTask.java:59-60) as data. */
case class Punctuation(subKey: String, punctuateTimeMs: Long, seenRecords: Long)

/** Buffered row inside the merge gate's state. */
private[streaming] case class BufRow(ms: Long, src: String, value: String)
