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

  private def starComps(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    ConnectedComponents.runStars(df, "src", "dst", maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("runStars: equivalent to min-label on mixed topologies") {
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)),
      Seq((5L, 6L), (6L, 5L), (5L, 6L), (5L, 5L), (7L, 7L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 40L), (40L, 41L), (41L, 3L)),
      // random sparse graph, fixed seed — includes shuffled ids and merges
      {
        val rnd = new scala.util.Random(7)
        (0 until 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
          .filter { case (a, b) => a != b }
      })
    shapes.foreach { edges =>
      assert(starComps(edges) == comps(edges), s"divergence on ${edges.take(5)}…")
    }
  }

  test("runStars: long-chain graph converges in logarithmic rounds") {
    // a 4096-node chain has diameter 4096: min-label needs thousands of
    // shuffles (provably does NOT converge when the auto-switch is
    // forbidden), the star algorithm finishes inside 20 rounds (O(log² n)
    // bound; measured ~6)
    val n = 4096L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val df = spark.createDataFrame(chain).toDF("src", "dst")
    intercept[IllegalStateException] {
      ConnectedComponents.run(df, "src", "dst", maxIter = 10,
        starSwitchIter = Int.MaxValue)
    }
    val labels = ConnectedComponents.runStars(df, "src", "dst", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every chain node must label to the min id 0")
  }

  test("DEFAULT entry point converges on a 4096-chain via the automatic star switch") {
    // a user who never heard of runStars gets the O(log² n) algorithm
    // instead of a failure: min-label makes no fixpoint by starSwitchIter
    // rounds, the switch fires (counter-pinned), and every node labels to 0
    val n = 4096L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val df = spark.createDataFrame(chain).toDF("src", "dst")
    val s0 = ConnectedComponents.starSwitches.sum()
    val labels = ConnectedComponents.run(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ConnectedComponents.starSwitches.sum() == s0 + 1,
      "the 4096-chain must trip the min-label → star switch")
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "every chain node must label to the min id 0")
    // short-diameter graphs stay on cheap min-label: no switch
    val clique = for (a <- 0L until 20L; b <- 0L until a) yield (a, b)
    val s1 = ConnectedComponents.starSwitches.sum()
    val cl = ConnectedComponents.run(
      spark.createDataFrame(clique).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(1)).toSet
    assert(cl == Set(0L) && ConnectedComponents.starSwitches.sum() == s1,
      "a diameter-1 clique must not trip the star switch")
  }

  test("runStars: strict mode raises when rounds are exhausted") {
    val chain = (0L until 64L).map(i => (i, i + 1))
    val df = spark.createDataFrame(chain).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.runStars(df, "src", "dst", maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(ConnectedComponents.runStars(df, "src", "dst", maxIter = 1, strict = false)
      .count() > 0)
  }

  test("orchestration pin: runStars driver-job count stays bounded (round 21)") {
    // The round-20 wins (observed convergence signatures riding the
    // checkpoint job, window-based star minima, dropped intermediate
    // distinct) live in per-round driver jobs a final plan dump cannot
    // show. This pins them: a re-introduced per-round signature scan,
    // aggregate+join star, or eager double-checkpoint shows up here as a
    // job-count regression. Bound: measured 33 jobs on this fixture
    // (64-chain, ~7 star rounds with AQE stage-materialization jobs) +
    // ~10% slack — one extra job per round (a separate signature scan, an
    // eager double checkpoint) would add ~7 and trip it.
    val s = spark
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val chain = (0L until 64L).map(i => (i, i + 1))
    val df = spark.createDataFrame(chain).toDF("src", "dst")
    s.sparkContext.addSparkListener(listener)
    try {
      val out = ConnectedComponents.runStars(df, "src", "dst")
      assert(out.count() == 65) // 64 edges → 65 chain nodes
      Thread.sleep(300) // drain the async listener bus
      val n = jobs.get()
      assert(n <= 36, s"runStars orchestration regressed: $n driver jobs on the 64-chain fixture")
    } finally s.sparkContext.removeSparkListener(listener)
  }
}
