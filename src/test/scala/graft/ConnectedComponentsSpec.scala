package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkTestBase {

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    ConnectedComponents.run(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, cycle, and a separate pair resolve to min-id components") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4),          // chain 1-2-3-4
      (10, 11), (11, 12), (12, 10),    // cycle 10-11-12
      (20, 21))                        // pair
    val got = comps(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicate, reversed, and self edges are harmless") {
    val got = comps(Seq[(Long, Long)]((5, 6), (6, 5), (5, 6), (5, 5), (7, 7)))
    // 7 only appears in a self-edge → dropped (documented: no real edge)
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("bridged clusters merge (transitivity across shared member)") {
    // two quasi-cliques sharing vertex 3 — the near-dup bucket shape
    val got = comps(Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (3, 40), (40, 41), (41, 3)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 40L, 41L))
  }

  test("long chain converges within maxIter") {
    val chain = (0L until 15L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.values.toSet == Set(0L) && got.size == 16)
  }

  test("strict mode raises on non-convergence instead of returning wrong labels") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val df = spark.createDataFrame(chain).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(df, "src", "dst", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // explicit opt-out returns the partial labels without throwing
    val partial = ConnectedComponents.run(df, "src", "dst", maxIter = 3, strict = false)
    assert(partial.count() == 13)
  }
}
