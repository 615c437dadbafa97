package graft

import org.apache.spark.sql.DataFrame

/** Engine-independent canonical form for a query result, used by the
  * whole-surface invariance suites (OrderFuzzSpec, FaultToleranceSpec) to
  * assert two executions produced the SAME result without requiring
  * bit-identical doubles.
  *
  * Doubles/floats are rounded to 9 significant digits before comparison:
  * re-partitioning the input reorders partial-aggregation sums, which is
  * legal IEEE drift in the last ulps (the same effect CORRECTNESS_sf100
  * measured at 4e-15..1.5e-13 relative over 6e8 addends) — 9 significant
  * digits is ~1e-9 relative, seven orders looser than the worst observed
  * drift and seven orders tighter than any semantic difference these
  * suites could miss. Everything else compares exactly.
  */
object RowCanon {

  private val mc = new java.math.MathContext(9)

  def fmt(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double => fmtDouble(d)
    case f: java.lang.Float => fmtDouble(f.toDouble)
    case b: Array[Byte] => "0x" + b.map(x => f"$x%02x").mkString
    case s: scala.collection.Seq[_] => s.map(fmt).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => fmt(k) + "->" + fmt(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(fmt).mkString("(", ",", ")")
    case t: java.sql.Timestamp => t.toInstant.toString
    case x => x.toString
  }

  private def fmtDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) d.toString
    // -0.0 == 0.0 in IEEE compare but toString distinguishes them; the sign
    // of a zero sum is partial-order-dependent, so canonicalize both to "0.0"
    else if (d == 0.0) "0.0"
    else BigDecimal(d).round(mc).bigDecimal.stripTrailingZeros.toPlainString

  /** Rows as sorted canonical strings (schema prefixed so a column rename
    * or type change also counts as a difference). */
  def collect(df: DataFrame): Seq[String] = {
    val header = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString("|")
    header +: df.collect().map(r => fmt(r)).toSeq.sorted
  }

  /** First few positions where the two canonical forms differ. */
  def diff(a: Seq[String], b: Seq[String], n: Int = 3): String = {
    val onlyA = a.diff(b).take(n)
    val onlyB = b.diff(a).take(n)
    s"rows=${a.size - 1}/${b.size - 1}; only in first: $onlyA; only in second: $onlyB"
  }
}
