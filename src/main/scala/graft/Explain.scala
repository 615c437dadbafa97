package graft

/** Plan-audit main: print the EXECUTED physical plan of one or more
  * inventory queries (after AQE finalizes, i.e. what actually ran — the
  * query is materialized through its own QueryExecution first). Usage:
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
      // Materialize through the Dataset's OWN QueryExecution: a noop write
      // (or count()) plans a SEPARATE QueryExecution, whose
      // AdaptiveSparkPlanExec never executes — printing it shows the
      // pre-AQE initial plan and hides runtime SMJ→BHJ conversions, skew
      // splits, and coalescing. Running this qe's toRdd finalizes ITS
      // adaptive plan, so the printed tree is what actually ran
      // (isFinalPlan=true).
      val qe = df.queryExecution
      qe.toRdd.foreach(_ => ())
      println(s"==== $n ====\n${qe.executedPlan}")
    }
    spark.stop()
  }
}
