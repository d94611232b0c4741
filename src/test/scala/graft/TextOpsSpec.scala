package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.core.TextOps

/** Winnowing fingerprint kernel (`graft_fingerprints`): the SIGMOD'03
  * guarantee and the edge cases the oracle data never hits. */
class TextOpsSpec extends SparkTestBase {

  private def fps(s: String, k: Int, w: Int): Set[Long] = {
    val a = TextOps.fingerprints(UTF8String.fromString(s), k, w)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  test("shorter than k yields no fingerprints; exactly k yields one") {
    assert(fps("", 8, 4).isEmpty)
    assert(fps("1234567", 8, 4).isEmpty)
    assert(fps("12345678", 8, 4).size == 1)
  }

  test("fewer than w hashes still fingerprints (one window over all)") {
    // length 10, k=8 → 3 k-gram hashes < w=4 → min of the 3
    val f = fps("abcdefghij", 8, 4)
    assert(f.size == 1)
  }

  test("winnowing guarantee: shared substring of length >= k + w - 1 shares a fingerprint") {
    // k=8, w=4: any common substring of length >= 11 must contribute at
    // least one common fingerprint (the window fully inside the overlap)
    val common = "the quick brown fox jumps"
    val a = "XXXX " + common + " YYYY"
    val b = "completely different prefix " + common + " and suffix"
    assert(fps(a, 8, 4).intersect(fps(b, 8, 4)).nonEmpty)
  }

  test("fingerprints are a subset of the k-gram hashes and deterministic") {
    val s = "spark grid shuffle join order"
    val cps = s.codePoints().toArray
    val all = (0 to cps.length - 8).map { p =>
      (0 until 8).foldLeft(0L)((h, j) => h * 31L + cps(p + j))
    }.toSet
    val f = fps(s, 8, 4)
    assert(f.subsetOf(all))
    assert(f == fps(s, 8, 4))
  }

  test("identical docs share all fingerprints; disjoint alphabets share none") {
    assert(fps("hello world document", 8, 4) == fps("hello world document", 8, 4))
    assert(fps("aaaaaaaaaaaaaaaa", 8, 4).intersect(fps("bbbbbbbbbbbbbbbb", 8, 4)).isEmpty)
  }

  test("SQL surface registered (graft_fingerprints)") {
    graft.functions.TextFunctions.register(spark)
    val n = sql("SELECT size(graft_fingerprints('abcdefghijklmnop', 8, 4)) AS n").head().getInt(0)
    assert(n >= 1)
  }

  test("invalid k/w rejected") {
    intercept[IllegalArgumentException] { fps("abc", 0, 4) }
    intercept[IllegalArgumentException] { fps("abc", 3, 0) }
  }
}
