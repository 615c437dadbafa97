package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin matches plain join results on a skewed key") {
    // 90% of big rows share one hot key
    val big = (0 until 2000).map(i =>
      (if (i % 10 == 0) s"k$i" else "HOT", i.toLong)).toDF("key", "v")
    val small = Seq(("HOT", "hot-dim"), ("k10", "d10"), ("k20", "d20"))
      .toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", saltBuckets = 8)
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1800 + 2)   // HOT rows + k10 + k20
  }
}

class BucketedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    (0 until 10000).map(i => (i.toLong % 500, s"v$i")).toDF("k", "v")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("fact_b")
    (0 until 500).map(i => (i.toLong, s"name$i")).toDF("k", "name")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("dim_b")

    // disable broadcast so the join must pick a shuffle strategy — bucketing
    // should satisfy the distribution requirement with zero Exchange nodes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
    }
  }
}
