package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Failure-handling split — the engine form of the reference's `none`
  * processing guarantee (api/record/RecordProcessingGuarantee.java:9-19,
  * impl/record/RecordStatusObserverImpl.java:39-47): a failing record is
  * logged and skipped rather than killing the pipeline.
  *
  * Spark-first: classify each record with a vectorized CASE expression and
  * split into (ok, deadLetter) frames. Both sides reuse one scan (Spark
  * caches nothing here — two filters over the same source; Catalyst pushes
  * each predicate to parquet).
  */
object DeadLetter {

  /** Returns the frame annotated with an `error` column (null = ok).
    * `rules` is an ordered list of (errorName, failurePredicate). */
  def classify(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val err = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), tail) => when(pred, lit(name)).otherwise(tail)
    }
    df.withColumn("error", err)
  }

  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val classified = classify(df, rules)
    (classified.filter(col("error").isNull).drop("error"),
      classified.filter(col("error").isNotNull))
  }
}
