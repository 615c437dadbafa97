package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r13 profiling probe (VERDICT item 4): decompose the streaming twins'
  * cost into batch-side build vs micro-batch replay, and measure the
  * state-store twin under different state partition counts. Not on any
  * driver path — a measurement tool like BpeLoopExperiment.
  */
object StreamTwinProbe {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "stream-twin-probe")
    spark.sparkContext.setLogLevel("WARN")
    def T(name: String): DataFrame = Tables.load(spark, d, name)
    Tables.all.foreach(t => Tables.load(spark, d, t).count())

    // ---- offsets_ooo_stream decomposition --------------------------------
    for (rep <- 1 to 2) {
      t(s"offsets: full query (rep $rep)") {
        SparkEntry.queries("offsets_ooo_stream")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // batch build alone (the driver-side collect of the event log)
    val ev = t("offsets: event-log collect") {
      T("events")
        .filter(col("event_id") < 20000L)
        .select((col("event_id") % 8).cast("string").as("part"),
          expr("event_id div 8").cast("long").as("off"),
          (substring(md5(concat(lit("oc"),
            col("event_id").cast("string"))), 1, 1) =!= "f").as("consumed"),
          substring(md5(concat(lit("op"),
            col("event_id").cast("string"))), 1, 1).isin("e", "f")
            .unary_!.as("procbit"),
          conv(substring(md5(concat(lit("ord"),
            col("event_id").cast("string"))), 1, 8), 16, 10)
            .cast("long").as("ordkey"))
        .filter(col("consumed"))
        .collect()
    }
    println(s"PROBE offsets: event rows = ${ev.length}")
    // replay alone under different state partition counts
    for (parts <- Seq(cpus, 8)) {
      t(s"offsets: 2-batch replay, statePartitions=$parts") {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.streaming.{OffsetEvent, OffsetsTracker}
        val sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", parts.toString)
        implicit val enc: org.apache.spark.sql.Encoder[OffsetEvent] =
          org.apache.spark.sql.Encoders.product[OffsetEvent]
        val events = ev.sortBy(_.getLong(1)).map(r =>
          OffsetEvent(r.getString(0), r.getLong(1), "consumed",
            r.getLong(1), r.getLong(1), 10L))
        val ms = MemoryStream[OffsetEvent](sess)
        val q = OffsetsTracker.track(ms.toDS()).writeStream
          .outputMode("append")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[
              graft.streaming.OffsetsProgress], _: Long) =>
              b.collect(): Unit
          }.start()
        try {
          val half = events.length / 2
          ms.addData(events.take(half).toSeq: _*)
          q.processAllAvailable()
          ms.addData(events.drop(half).toSeq: _*)
          q.processAllAvailable()
        } finally q.stop()
      }
    }

    // ---- lm_score_stream / ccnet_gate_stream / decontaminate_stream -----
    for (name <- Seq("lm_score_stream", "ccnet_gate_stream",
        "decontaminate_stream", "url_filter_stream")) {
      t(s"$name: full query") {
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // model build alone for the lm twins
    t("lmScorer build (shared by lm/ccnet twins)") {
      val sc = operators.Corpus.lmScorer(T("documents"), col("doc_id"),
        col("text"), k = 0.5)
      sc.close()
    }
    t("ccnet ranking pass (score corpus + rank + boundaries)") {
      val docs = T("documents")
      val sc = operators.Corpus.lmScorer(docs, col("doc_id"), col("text"),
        k = 0.5)
      try {
        val scored = sc.score(docs, col("doc_id"), col("text"),
            batchDocs = Some(graft.plans.PlanStats.rowCount(docs)))
          .filter(col("ppl").isNotNull)
          .select(col("doc_id"), col("ppl"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bucketed = operators.Windows.rankFunctionsScan(scored,
          Seq(lit(1)), col("ppl"), col("doc_id"), ntileK = 3)
        val cuts = operators.Corpus.ntileBoundaries(bucketed, col("ppl"),
          col("doc_id"), col("ntile"), 3)
        println(s"PROBE cuts = $cuts")
        scored.unpersist(): Unit
      } finally sc.close()
    }
    spark.stop()
  }
}
