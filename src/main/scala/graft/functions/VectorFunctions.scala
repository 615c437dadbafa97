package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector column functions: the pure-builtin formulations next to the
  * custom-expression fast paths, plus a typed Aggregator (the UDAF
  * surface of SURVEY §2.9).
  */
object VectorFunctions {

  /** Cosine via builtins only (zip_with + aggregate): the no-custom-code
    * alternative to GraftFunctions.cosineSimilarity. Same value; slower
    * (higher-order lambdas evaluate interpreted) — kept as the portable
    * fallback and as executable documentation of the builtin path. */
  def cosineBuiltin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Typed top-k aggregator: keeps the k largest (score, payload) pairs
    * per group — a bounded-state alternative to window-rank top-k when
    * groups are huge and only k rows matter (partial aggregation keeps at
    * most k entries per map-side partition, so the shuffle carries
    * k × partitions rows instead of the whole group). */
  class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0)
    override def zero: Seq[(Double, Long)] = Seq.empty
    private def trim(s: Seq[(Double, Long)]) =
      s.sortBy(t => (-t._1, t._2)).take(k)
    override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      trim(buf :+ in)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  def topK(k: Int): TopK = new TopK(k)
}
