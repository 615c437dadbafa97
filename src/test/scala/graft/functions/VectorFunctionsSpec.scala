package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosineBuiltin matches the custom expression") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val r = df.select(
      round(VectorFunctions.cosineBuiltin($"a", $"b"), 9).as("x"),
      round(GraftFunctions.cosineSimilarity($"a", $"b"), 9).as("y"))
      .as[(Double, Double)].collect()
    r.foreach { case (x, y) => assert(x == y) }
  }

  test("TopK aggregator keeps the k best per group with bounded state") {
    val ds = (0 until 1000)
      .map(i => (i % 4, (i % 97).toDouble, i.toLong))
      .toDF("g", "score", "id").as[(Int, Double, Long)]
    val agg = VectorFunctions.topK(3).toColumn
    val r = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg)
      .collect().toMap
    assert(r.keySet == Set(0, 1, 2, 3))
    // brute-force expectation: top 3 by (score desc, id asc) per group
    val expect = (0 until 1000)
      .map(i => (i % 4, (i % 97).toDouble, i.toLong))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3))
        .sortBy(t => (-t._1, t._2)).take(3).toSeq).toMap
    assert(r == expect)
  }
}
