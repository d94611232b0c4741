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
    val (und, undIds) = Blocks.checkpoint(
      e.union(e.select(col("b").as("a"), col("a").as("b")))
        .where(col("a") =!= col("b")).distinct())
    var (labels, labelIds) = Blocks.checkpoint(
      und.select(col("a").as("id")).distinct().withColumn("label", col("id")))
    var iter = 0
    var converged = false
    // labels are monotonically non-increasing, so the global label sum
    // strictly decreases until fixpoint — convergence is one cheap scan of
    // the checkpointed table, not a join
    def sig(df: DataFrame): java.math.BigDecimal =
      // SUM over zero rows is null — an edgeless graph must converge on the
      // first compare, not NPE
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSig = sig(labels)
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
      // neighbor labels flow along edges; min with own label
      val msgs = und.join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .select(col("a").as("id"), col("label"))
      val (next, nextIds) = Blocks.checkpoint(
        labels.union(msgs).groupBy("id").agg(min("label").as("label")))
      val s = sig(next)
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
    * neighborhood onto its minimum. Both are one groupBy-min + one
    * equi-join — no collect, no driver-side graph. At fixpoint the edge
    * set IS the component stars (child → root). Output matches [[run]]:
    * `(id, component)` with component = min reachable id; isolated
    * vertices absent. */
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
    var (cur, curIds) = Blocks.checkpoint(e0)
    // signature: (count, sum u, sum v, sum xxhash64(u, v)) of the canonical
    // distinct set — rounds strictly shrink the label mass until fixpoint
    def sig(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("u").cast("decimal(38,0)")),
        sum(col("v").cast("decimal(38,0)")),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head().toSeq
    var prevSig = sig(cur)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // ── large-star: for every node a, hook neighbors b > a onto
      // m = min(Γ(a) ∪ {a}); emitted (b, m) always has b > m
      val und = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = und.groupBy("u").agg(min("v").as("mn"))
      val large = und.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // ── small-star over the (bigger → smaller) edges: for every node u,
      // m = min(N_small(u)); hook N_small(u) ∪ {u} (minus m itself) onto m
      val smins = large.groupBy("u").agg(min("v").as("mn"))
      val hooked = large.join(smins, "u")
        .select(col("v").as("u"), col("mn").as("v"))
        .where(col("u") =!= col("v"))
        .union(smins.select(col("u"), col("mn").as("v")))
        .distinct()
      val (next, nextIds) = Blocks.checkpoint(hooked)
      val s = sig(next)
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
