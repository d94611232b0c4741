package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard (round 19): `docs/FUNCTIONS.md`'s per-function table rows
  * must cover EXACTLY the Sig registry's names — a new kernel that skips
  * the reference doc, or a doc row for a function that no longer exists,
  * fails here instead of rotting silently. The two aggregates
  * (`st_extent_agg` / `st_union_agg`) register through GeoAggregates, not
  * the Sig registry, and are documented in prose — excluded from the
  * table contract on both sides. No SparkSession needed: the registry is
  * a static structure. */
class DocsRegistrySpec extends AnyFunSuite {

  private def repoFile(rel: String): java.io.File = {
    // tests run with user.dir = the project root; walk up defensively in
    // case a future harness runs them from a subdirectory
    var d = new java.io.File(System.getProperty("user.dir")).getAbsoluteFile
    while (d != null && !new java.io.File(d, rel).exists()) d = d.getParentFile
    assert(d != null, s"cannot locate $rel above ${System.getProperty("user.dir")}")
    new java.io.File(d, rel)
  }

  test("docs/FUNCTIONS.md table rows == Sig registry names, exactly") {
    val registered = graft.functions.GeoFunctions.kernelMatrix.map(_._1).toSet
    val rowRe = """^\| `([a-z_0-9]+)` \|.*""".r
    val documented = scala.io.Source.fromFile(repoFile("docs/FUNCTIONS.md"), "UTF-8")
      .getLines().collect { case rowRe(name) => name }.toSet
    val missing = (registered -- documented).toSeq.sorted
    val stale = (documented -- registered).toSeq.sorted
    assert(missing.isEmpty,
      s"registered but undocumented in docs/FUNCTIONS.md: ${missing.mkString(", ")}")
    assert(stale.isEmpty,
      s"documented but not in the Sig registry (stale rows): ${stale.mkString(", ")}")
  }

  test("every documented overload arity exists in the registry") {
    // rows repeat a name once per overload; the total row count per name
    // must not exceed the registry's arity count for it (a duplicated doc
    // row is drift too)
    val arities = graft.functions.GeoFunctions.kernelMatrix
      .groupBy(_._1).view.mapValues(_.length).toMap
    val rowRe = """^\| `([a-z_0-9]+)` \|.*""".r
    val rows = scala.io.Source.fromFile(repoFile("docs/FUNCTIONS.md"), "UTF-8")
      .getLines().collect { case rowRe(name) => name }.toSeq
    val over = rows.groupBy(identity).collect {
      case (n, rs) if rs.length > arities.getOrElse(n, 0) =>
        s"$n (${rs.length} rows vs ${arities.getOrElse(n, 0)} overloads)"
    }
    assert(over.isEmpty, s"doc rows exceed registry overloads: ${over.mkString(", ")}")
  }
}
