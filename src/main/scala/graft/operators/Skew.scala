package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed — the
  * 100 TB failure mode where one hot key pins a single reducer while the
  * rest of the cluster idles.
  *
  * First line of defense is AQE's skew-join split
  * (spark.sql.adaptive.skewJoin.enabled, on by default in the engine's
  * sessions); [[saltedJoin]] is the explicit fallback for cases AQE can't
  * re-plan (e.g. aggregations after the join keyed the same way, or sinks
  * that need the finer partitioning).
  *
  * Scheme (classic salting): the probe side gets a random-but-deterministic
  * salt in [0, n); the build side is replicated n times, once per salt
  * value; the join key becomes (key, salt), spreading a hot key over n
  * reducers. Replication multiplies the build side ×n — use it when build
  * is the small side.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small`, salted n ways.
    * Both frames must expose the join key as column `key`.
    *
    * The salt is a deterministic hash — no RNG, so plans are reproducible
    * and streams replayable — of `rowKey` when given, else of the whole
    * big-side row. CAVEAT (the silent failure mode of the whole-row
    * default): fully-IDENTICAL big-side rows hash to the SAME salt, so a
    * hot key carried by duplicate rows does not spread at all. Pass
    * `rowKey` = a per-row-distinct column (a unique id; NOT
    * monotonically_increasing_id, which is non-deterministic under
    * retries) whenever big-side rows can repeat. */
  /** The salt derivation (exposed for the spec that pins the
    * duplicate-row collapse caveat as observed behavior). */
  private[graft] def saltOf(big: DataFrame, rowKey: Option[Column],
                            saltBuckets: Int): Column =
    pmod(hash(rowKey.getOrElse(struct(big.columns.map(col).toSeq: _*))),
      lit(saltBuckets))

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int,
                 rowKey: Option[Column] = None): DataFrame = {
    val salted = big.withColumn("_salt", saltOf(big, rowKey, saltBuckets))
    val replicated = small
      .withColumn("_salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
