package graft

/** Plan-audit main: print the EXECUTED physical plan of one or more
  * inventory queries (after AQE finalizes, i.e. what actually ran — the
  * query is materialized through its own QueryExecution first). Usage:
  *
  *   sbt "runMain graft.Explain <sfDir> <query1,query2,...> [outDir]"
  *
  * With `outDir`, each query's `explain("formatted")` text (plus the
  * executed adaptive plan tree) is written to `<outDir>/<name>.txt` —
  * the round's plans/<round>/ artifacts. This is the loop behind
  * PLANS.md: run, read the tree, fix the shape.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).filter(_ != "all").map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val outDir = args.lift(2).map { d =>
      val f = new java.io.File(d); f.mkdirs(); f
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-explain")
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
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val text = s"==== $n ====\n$formatted\n---- executed (AQE final) ----\n${qe.executedPlan}"
      outDir match {
        case Some(dir) =>
          java.nio.file.Files.write(
            new java.io.File(dir, s"$n.txt").toPath, text.getBytes)
          println(s"[explain] wrote $n")
        case None => println(text)
      }
    }
    spark.stop()
  }
}
