package graft

/** Plan-audit main: print the EXECUTED physical plan of one or more
  * inventory queries (after AQE finalizes, i.e. what actually ran — the
  * noop write materializes the query first). Usage:
  *
  *   sbt "runMain graft.Explain <sfDir> <query1,query2,...>"
  *
  * This is the loop behind PLANS.md: run, read the tree, fix the shape.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = GraftSession.local(8, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"==== $n ====\n${df.queryExecution.executedPlan}")
    }
    spark.stop()
  }
}
