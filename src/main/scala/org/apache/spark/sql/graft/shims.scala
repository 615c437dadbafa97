package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.StreamingQuery

/** Bridge into Spark's `private[sql]` surface — the one place the engine
  * touches non-public API. Everything else builds on the public DataFrame /
  * Catalyst-expression contracts; this shim only converts Column <->
  * Expression (needed to expose custom codegen expressions as user-facing
  * `Column`s) and registers SQL function names. Living in the
  * `org.apache.spark.sql` namespace for access is the established pattern for
  * Spark-native extension libraries.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `CollectTopK` (private[sql]) with the ordering reversed: a size-k
    * bounded priority queue per group keeping the SMALLEST k elements,
    * partial-aggregating map-side. See GraftFunctions.collectSmallest. */
  def collectSmallestExpr(e: Expression, k: Int): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate
      .CollectTopK(e, k, true, 0, 0).toAggregateExpression()

  /** `BloomFilterAggregate` (private[sql]) over a LONG column with an
    * explicit size: lets a caller who KNOWS the approximate item count
    * build the sketch in one pass — `DataFrameStatFunctions.bloomFilter`
    * needs the exact count up front, which costs a whole extra execution
    * of the input pipeline. The aggregate's putLong path is bit-compatible
    * with `BloomFilter.mightContainLong` (graft's codegen probe). Returns
    * the serialized filter bytes; NULL on empty input (callers must
    * short-circuit — see Dedup.repeatedSpans). */
  def bloomFilterAggExpr(e: Expression, estItems: Long,
                         numBits: Long): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(e,
        org.apache.spark.sql.catalyst.expressions.Literal(estItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()

  /** True while the query's stream-execution thread is actually alive.
    * `StreamingQuery.isActive` flips false as soon as stop() marks the
    * state TERMINATED — even though a hung batch can keep the execution
    * thread running (exactly the situation the reference's
    * CANNOT_STOP_THREADS status reports, KafkaWorkersImpl.java:180). */
  def executionThreadAlive(q: StreamingQuery): Boolean = q match {
    case w: StreamingQueryWrapper => w.streamingQuery.queryExecutionThread.isAlive
    case s: StreamExecution => s.queryExecutionThread.isAlive
    case _ => q.isActive
  }

  /** Register a SQL function name building a custom expression. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
