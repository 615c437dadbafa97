package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator for the sf1 sweep: writes a `copies`×
  * replica of an existing testdata directory by unioning key-shifted
  * copies of every fact table, so the heavy-tail queries can be benched
  * one decade above the largest driver-provided SF.
  *
  * Fidelity rules (the point is a REPRESENTATIVE 10× workload, not just
  * 10× rows):
  *  - Keys shift by a per-domain offset ≥ the domain's width, so FK
  *    consistency holds within each copy (orders.o_custkey moves with
  *    customer.c_custkey) and no cross-copy key collides. Copy 0 is the
  *    original data bit-for-bit.
  *  - region/nation stay fixed (TPC-H semantics: dimension cardinality
  *    does not scale with SF).
  *  - documents: every token of copy i > 0 gets a `~i` suffix. Within-copy
  *    duplicate/near-dup structure replicates exactly (the dedup workload
  *    scales linearly); cross-copy texts share NO shingles, so replicas
  *    don't masquerade as a 10×-denser duplicate graph.
  *  - embeddings: copy i's vectors are cyclically rotated by i mod dim
  *    dims, and copies i ≥ dim additionally flip signs by a per-copy
  *    seeded Rademacher pattern (the rotation space is exhausted past
  *    dim copies — without the signs, copies i and i+dim would be
  *    IDENTICAL vectors under new ids, fabricating a cross-copy duplicate
  *    graph). Both maps are isometries — within-copy cosine geometry
  *    (clusters, near-dup pairs) is preserved EXACTLY — while any two
  *    distinct copies differ by rotation or sign pattern, so cross-copy
  *    cosines decorrelate, mirroring the documents treatment. Copies
  *    1..dim-1 are bit-identical to the pre-sign generator (the sf1
  *    artifacts stay reproducible).
  *  - events keep their timestamp distribution (time-range queries see
  *    10× density, the realistic growth mode) and write ts back as the
  *    source wire format (int64 nanos) so Tables.load treats sf1
  *    identically to the driver SFs.
  */
object GenScale {

  /** Copy-i isometry for an `array<float>` embedding column of width `dim`:
    * cyclic rotation by i mod dim, plus — once the rotation space is
    * exhausted (i ≥ dim) — an elementwise ±1 pattern from [[signsFor]].
    * i == 0 is the identity. */
  def embeddingTransform(c: Column, i: Int, dim: Int): Column = {
    val r = i % dim
    val rotated =
      if (r == 0) c
      else concat(slice(c, lit(r + 1), size(c) - lit(r)), slice(c, lit(1), lit(r)))
    if (i < dim) rotated
    else zip_with(rotated, typedlit(signsFor(i, dim).toSeq),
      (x, s) => (x * s).cast("float"))
  }

  /** Deterministic Rademacher pattern for copy i (splitmix64 bit per dim):
    * the same seed always yields the same signs, so generation is
    * reproducible run-to-run. */
  def signsFor(i: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { k =>
      var z = i.toLong * 0x9E3779B97F4A7C15L + k.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0f else -1.0f
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-genscale")
    spark.sparkContext.setLogLevel("WARN")

    // per-domain shift offsets (≥ domain width, round for readability)
    val CUST = 100000L; val SUPP = 10000L; val PART = 100000L
    val ORD = 1000000L; val DOC = 10000L; val VEC = 10000L
    val EVT = 1000000L; val USR = 10000L

    lazy val embeddingDim = Tables.load(spark, src, "embeddings")
      .select(size(col("embedding"))).first.getInt(0)

    def shiftCopy(name: String, df: DataFrame, i: Int): DataFrame =
      name match {
        case "customer" =>
          df.withColumn("c_custkey", col("c_custkey") + lit(i * CUST))
        case "supplier" =>
          df.withColumn("s_suppkey", col("s_suppkey") + lit(i * SUPP))
        case "part" =>
          df.withColumn("p_partkey", col("p_partkey") + lit(i * PART))
        case "orders" => df
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * ORD))
          .withColumn("o_custkey", col("o_custkey") + lit(i * CUST))
        case "lineitem" => df
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * ORD))
          .withColumn("l_partkey", col("l_partkey") + lit(i * PART))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * SUPP))
        case "events" => df
          .withColumn("event_id", col("event_id") + lit(i * EVT))
          .withColumn("user_id", col("user_id") + lit(i * USR))
        case "documents" =>
          val shifted = df
            .withColumn("doc_id", col("doc_id") + lit(i * DOC))
          if (i == 0) shifted
          else shifted
            .withColumn("text", concat_ws(" ",
              transform(split(trim(col("text")), "\\s+"),
                t => concat(t, lit(s"~$i")))))
            .withColumn("n_chars", length(col("text")).cast("long"))
        case "embeddings" =>
          val shifted = df
            .withColumn("vec_id", col("vec_id") + lit(i * VEC))
          if (i == 0) shifted
          else shifted.withColumn("embedding",
            embeddingTransform(col("embedding"), i, embeddingDim))
        case _ => df // region, nation: fixed dimensions
      }

    val files = Map("lineitem" -> 16, "events" -> 8, "orders" -> 8)
    // Bound the union plan: a 1000-copy sf100 generation as ONE left-deep
    // unionByName chain is a Catalyst analysis cliff (tree depth = copies),
    // so copies are written in fixed-size chunks appended to the same
    // directory. File counts scale with the copy count so per-file row
    // counts stay in the sf1-proven range.
    val chunkSize = args.lift(3).map(_.toInt).getOrElse(25).max(1)
    // optional 5th arg: comma-separated table subset — a documents-only
    // decade-4 corpus needn't pay for 2.4B lineitem rows
    val only = args.lift(4).map(_.split(',').toSet)
    only.foreach { names =>
      val unknown = names.diff(Tables.all.toSet)
      require(unknown.isEmpty,
        s"unknown table(s) ${unknown.toSeq.sorted.mkString(",")} in subset arg; " +
          s"valid: ${Tables.all.mkString(",")}")
    }
    val fileScale = math.max(1, copies / 10)
    Tables.all.filter(n => only.forall(_.contains(n))).foreach { name =>
      val base = Tables.load(spark, src, name)
      def finalize(df: DataFrame): DataFrame =
        // events: write ts back as int64 nanos (the source wire format), so
        // Tables.load applies the same nanos->micros conversion at scale SFs
        if (name == "events") df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        else df
      if (name == "region" || name == "nation") {
        finalize(base).repartition(1)
          .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      } else {
        val totalFiles = files.getOrElse(name, 4) * fileScale
        val chunks = (0 until copies).grouped(chunkSize).toSeq
        val perChunkFiles = math.max(1, totalFiles / chunks.size)
        chunks.zipWithIndex.foreach { case (idxs, ci) =>
          val part = idxs.map(i => shiftCopy(name, base, i))
            .reduce(_ unionByName _)
          finalize(part).repartition(perChunkFiles)
            .write.mode(if (ci == 0) "overwrite" else "append")
            .parquet(s"$dst/$name.parquet")
        }
      }
      println(s"[genscale] $name -> $dst (${copies}x)")
    }
    spark.stop()
  }
}
