package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Blocks

/** Distributed connected components over a candidate-pair edge list —
  * the clustering step of a near-dup dedup pipeline: MinHash/SimHash/ANN
  * buckets emit pairwise edges (t07/t08 topologies), and components turn
  * "a~b, b~c" into one keep-one-per-cluster decision at 100 TB scale.
  *
  * Algorithm: iterative min-label propagation. Each iteration every vertex
  * takes the minimum label among itself and its neighbors — one
  * shuffle-join + one shuffle-aggregate per iteration, converging in
  * O(graph diameter) iterations (near-dup graphs are short-diameter:
  * clusters are quasi-cliques from shared buckets). Each iteration is
  * `localCheckpoint`ed so lineage stays O(1) and AQE re-plans per step —
  * the standard Spark shape for iterative graph algorithms without
  * dragging in a graph framework.
  */
object ConnectedComponents {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Spec probe: number of automatic min-label → star-rounds switches. */
  private[graft] val starSwitches = new java.util.concurrent.atomic.LongAdder

  /** Observed metrics with a BOUNDED wait (round-20 ADVICE): `obs.get`
    * blocks indefinitely, so if a future Spark version stopped delivering
    * CollectMetrics for the checkpoint action the loop would hang instead
    * of failing loudly. Await the observation's public `future` up to a
    * generous 120 s (the checkpoint job has already completed when this is
    * called, so the listener delivery is normally microseconds away), then
    * fall back to re-deriving the signature with a direct aggregate scan —
    * one extra job, on a path never expected to be taken. */
  private def awaitMetrics(obs: org.apache.spark.sql.Observation,
                           fallback: => Map[String, Any]): Map[String, Any] =
    try {
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(120, "s"))
      row.schema.fieldNames.zip(row.toSeq).toMap
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        log.warn("ConnectedComponents: observed metrics not delivered within " +
          "120 s — falling back to a direct signature aggregate")
        fallback
    }

  /** `edges(srcCol, dstCol)` (any numeric/long ids) → `(id, component)`
    * where `component` is the minimum vertex id reachable from `id`.
    * Vertices only ever seen as isolated (no edges) are absent — union the
    * full vertex set afterwards if singleton clusters matter.
    *
    * Label propagation converges in O(diameter) iterations — the right
    * regime for near-dup cluster graphs (quasi-cliques, diameter 2-3). A
    * graph still unconverged after `starSwitchIter` rounds is evidently
    * high-diameter (chains, lineage paths), so the default entry point
    * SWITCHES to [[runStars]] (O(log² n) rounds independent of diameter)
    * instead of burning O(diameter) shuffles or failing at `maxIter` — a
    * cheap diameter probe by observation, not estimation. Set
    * `starSwitchIter >= maxIter` to forbid the switch (the pre-round-15
    * strict-failure contract). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20,
          strict: Boolean = true, starSwitchIter: Int = 8): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // undirected closure; checkpointed once, reused by every iteration
    // (lazy — the initial labels sig below scans through it, one job)
    val (und, undIds) = Blocks.checkpointLazy(
      e.union(e.select(col("b").as("a"), col("a").as("b")))
        .where(col("a") =!= col("b")).distinct())
    // labels are monotonically non-increasing, so the global label sum
    // strictly decreases until fixpoint. The signal rides the checkpoint
    // materialization itself via observe() (round 20): CollectMetrics is
    // pipelined into the same job, so a round pays ONE pass over the
    // labels — the old separate sig() aggregate re-scanned the freshly
    // checkpointed table every round (an extra job here, an extra full
    // pass at scale).
    def sigExpr = sum(col("label").cast("decimal(38,0)")).as("s")
    // SUM over zero rows is null — an edgeless graph must converge on the
    // first compare, not NPE
    def sigOf(obs: org.apache.spark.sql.Observation, df: DataFrame): java.math.BigDecimal =
      awaitMetrics(obs, Map("s" -> df.agg(sigExpr).collect()(0).get(0)))("s") match {
        case d: java.math.BigDecimal => d
        case _ => java.math.BigDecimal.ZERO
      }
    val obs0 = org.apache.spark.sql.Observation()
    var (labels, labelIds) = Blocks.checkpoint(
      und.select(col("a").as("id")).distinct().withColumn("label", col("id"))
        .observe(obs0, sigExpr))
    var iter = 0
    var converged = false
    var prevSig = sigOf(obs0, labels)
    while (iter < maxIter && !converged) {
      if (iter >= starSwitchIter) {
        // still moving after starSwitchIter rounds => high-diameter graph;
        // hand the ORIGINAL (checkpointed) edge closure to the star
        // algorithm — correct by construction, and the wasted label rounds
        // are bounded by the threshold
        starSwitches.increment()
        log.info(s"ConnectedComponents: no fixpoint after $iter min-label rounds — " +
          "switching to alternating star rounds (diameter-independent)")
        Blocks.release(spark, labelIds)
        try return runStars(und, "a", "b", maxIter = math.max(maxIter, 50), strict = strict)
        finally Blocks.release(spark, undIds)
      }
      // neighbor labels flow along edges; min with own label; the
      // convergence signal is observed inside the checkpoint job
      val msgs = und.join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .select(col("a").as("id"), col("label"))
      val obs = org.apache.spark.sql.Observation()
      val (next, nextIds) = Blocks.checkpoint(
        labels.union(msgs).groupBy("id").agg(min("label").as("label"))
          .observe(obs, sigExpr))
      val s = sigOf(obs, next)
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      // the new checkpoint is materialized — the previous round's blocks are
      // dead weight from here on (the supersede assert makes that ordering
      // loud instead of a recompute heisenbug if checkpointing ever changed)
      Blocks.releaseSuperseded(spark, labelIds, nextIds)
      labels = next
      labelIds = nextIds
      iter += 1
    }
    // the result reads only the final checkpoint; the edge closure is done
    Blocks.release(spark, undIds)
    if (strict && !converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxIter iterations — the graph's " +
        "diameter exceeds maxIter; use runStars (diameter-independent), lower " +
        "starSwitchIter to re-enable the automatic switch, raise maxIter, or pass " +
        "strict = false to accept partial labels")
    // NOTE: the final labels checkpoint stays pinned until the caller is done
    // with the result (it IS the result); Blocks.scrub at harness boundaries
    // reclaims it
    labels.withColumnRenamed("label", "component")
  }

  /** Alternating large-star/small-star connected components (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    * MapReduce and Beyond", ACM SoCC 2014): converges in O(log² n) rounds
    * INDEPENDENT of graph diameter, where [[run]]'s min-label propagation
    * needs O(diameter) full shuffles. Opt in for chain/path-shaped graphs
    * (lineage chains, citation paths, temporal follows); near-dup cluster
    * graphs are quasi-cliques where min-label's 2-3 rounds stay cheaper
    * per round (star rounds shuffle twice).
    *
    * Per round: large-star hooks every neighbor v > u onto
    * min(Γ(u) ∪ {u}); small-star then hooks each node's smaller
    * neighborhood onto its minimum. Both minima are `min over
    * (partition by u)` WINDOWS (round 20) — computed inside the single
    * partition-by-u exchange each star pays anyway, with no aggregate
    * exchange, no equi-join, no intermediate distinct; no collect, no
    * driver-side graph. At fixpoint the edge set IS the component stars
    * (child → root). Output matches [[run]]: `(id, component)` with
    * component = min reachable id; isolated vertices absent.
    *
    * Skew note (round 21): a hub vertex puts its whole neighborhood in ONE
    * window task's sort — WindowExec buffers spill to disk past
    * `spark.sql.windowExec.buffer.spill.threshold`, so the round completes
    * bounded by one task scanning the hub's edges (ScaleCheck pins a
    * 1M-edge star within a sane wall). The alternative groupBy-min +
    * equi-join form absorbs the hub map-side and its join partition is
    * AQE-skew-splittable, but costs a second full edge shuffle per star
    * round at any scale — a worse trade than one spill-bounded straggler
    * task on the rare hub. Star rounds also SHRINK hubs: large-star hooks
    * the hub's neighbors onto the minimum, so the skewed key lasts O(1)
    * rounds, not the whole run. */
  def runStars(edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 50, strict: Boolean = true): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val spark = edges.sparkSession
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      // canonical (bigger, smaller) — the shape small-star consumes and
      // large-star symmetrizes from
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    // signature: (count, sum u, sum v, sum xxhash64(u, v)) of the canonical
    // distinct set — rounds strictly shrink the label mass until fixpoint.
    // Observed inside each round's checkpoint job (round 20): CollectMetrics
    // pipelines into the materialization, so no separate signature scan —
    // one less job per round here, one less full edge pass at scale.
    def sigExprs = Seq(count(lit(1)).as("n"),
      sum(col("u").cast("decimal(38,0)")).as("su"),
      sum(col("v").cast("decimal(38,0)")).as("sv"),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("sh"))
    def sigOf(obs: org.apache.spark.sql.Observation, df: DataFrame): Seq[Any] = {
      val m = awaitMetrics(obs, {
        val r = df.agg(sigExprs.head, sigExprs.tail: _*).collect()(0)
        Map("n" -> r.get(0), "su" -> r.get(1), "sv" -> r.get(2), "sh" -> r.get(3))
      })
      Seq(m("n"), m("su"), m("sv"), m("sh"))
    }
    def observed(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs, sigExprs.head, sigExprs.tail: _*), obs)
    }
    val (e0Obs, obs0) = observed(e0)
    var (cur, curIds) = Blocks.checkpoint(e0Obs)
    var prevSig = sigOf(obs0, cur)
    var iter = 0
    var converged = false
    // per-node neighborhood minima via a WINDOW over the hook key (round
    // 20): the groupBy(min) + equi-join form paid an aggregate exchange
    // PLUS a join (a broadcast build locally, a second full edge shuffle
    // at scale) per star; the window computes the same min in the single
    // partition-by-u exchange and every edge reads it in place.
    val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    while (iter < maxIter && !converged) {
      // ── large-star: for every node a, hook neighbors b > a onto
      // m = min(Γ(a) ∪ {a}); emitted (b, m) always has b > m
      val und = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      // no intermediate distinct: duplicate (u, v) pairs don't move the
      // small-star window minima, and the round's final distinct
      // canonicalizes — dropping it removes one full exchange per round
      // (duplicates here are bounded by |und|: each input edge emits at
      // most one large-star pair)
      val large = und.withColumn("mn", min(col("v")).over(wU))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
        .where(col("u") =!= col("v"))
      // ── small-star over the (bigger → smaller) edges: for every node u,
      // m = min(N_small(u)); hook N_small(u) ∪ {u} (minus m itself) onto m
      val largeM = large.withColumn("mn", min(col("v")).over(wU))
      val hooked = largeM
        .select(col("v").as("u"), col("mn").as("v"))
        .where(col("u") =!= col("v"))
        .union(largeM.select(col("u"), col("mn").as("v")))
        .distinct()
      val (hookedObs, obs) = observed(hooked)
      val (next, nextIds) = Blocks.checkpoint(hookedObs)
      val s = sigOf(obs, next)
      converged = s == prevSig
      prevSig = s
      Blocks.releaseSuperseded(spark, curIds, nextIds)
      cur = next
      curIds = nextIds
      iter += 1
    }
    if (strict && !converged) throw new IllegalStateException(
      s"ConnectedComponents.runStars did not converge in $maxIter rounds — " +
        "raise maxIter or pass strict = false to accept partial stars")
    // fixpoint stars: (child, root) per non-root vertex, plus the roots
    cur.select(col("u").as("id"), col("v").as("component"))
      .union(cur.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }
}
