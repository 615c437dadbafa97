package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory integrity audit. Scala Map LITERALS keep the LAST duplicate
  * key silently — adding a query under an existing name compiles clean,
  * passes Verify, and passes the oracle gate while the shadowed operator
  * quietly leaves the inventory (this happened in round 10: a typed
  * `pii_redact` shadowed the digit-run one until a source audit caught
  * it). The runtime Map cannot see the collision, so this spec parses the
  * SOURCE: every top-level entry key in `queries`/`oracleSql` (pinned at
  * the map literal's 4-space indentation) must be unique, the source key
  * count must equal the runtime Map size, and every query must carry an
  * oracle.
  */
class InventoryAuditSpec extends AnyFunSuite {

  private val src = {
    val p = java.nio.file.Paths.get(sys.props("user.dir"),
      "src", "main", "scala", "graft", "SparkEntry.scala")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private val keyPat = """(?m)^    "([a-z0-9_]+)" ->""".r
  private def keysIn(section: String): Seq[String] =
    keyPat.findAllMatchIn(section).map(_.group(1)).toSeq

  private val qSrc = src.substring(src.indexOf("def queries"),
    src.indexOf("def oracleSql"))
  private val oSrc = src.substring(src.indexOf("def oracleSql"))

  test("no duplicate query keys in source (shadowing is silent)") {
    val keys = keysIn(qSrc)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate queries keys: $dups")
    assert(keys.size == SparkEntry.queries.size,
      s"source declares ${keys.size} query entries but the Map holds " +
        s"${SparkEntry.queries.size} — a duplicate key is shadowing one " +
        "(or the map literal's indentation changed; update keyPat)")
  }

  test("no duplicate oracle keys in source") {
    val keys = keysIn(oSrc)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate oracleSql keys: $dups")
    assert(keys.size == SparkEntry.oracleSql.size)
  }

  test("every query has an oracle, every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }
}
