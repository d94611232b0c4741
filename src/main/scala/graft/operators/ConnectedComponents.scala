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

  /** `edges(srcCol, dstCol)` (any numeric/long ids) → `(id, component)`
    * where `component` is the minimum vertex id reachable from `id`.
    * Vertices only ever seen as isolated (no edges) are absent — union the
    * full vertex set afterwards if singleton clusters matter.
    *
    * Label propagation converges in O(diameter) iterations. If `maxIter` is
    * reached without a fixpoint the labels are NOT components yet; with
    * `strict` (the default) that raises instead of silently returning a
    * wrong clustering — raise `maxIter` for long-chain graphs, or pass
    * `strict = false` to accept the partial labels deliberately. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20,
          strict: Boolean = true): DataFrame = {
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
      // neighbor labels flow along edges; min with own label
      val msgs = und.join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .select(col("a").as("id"), col("label"))
      val (next, nextIds) = Blocks.checkpoint(
        labels.union(msgs).groupBy("id").agg(min("label").as("label")))
      val s = sig(next)
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      // the new checkpoint is materialized — the previous round's blocks are
      // dead weight from here on
      Blocks.release(spark, labelIds)
      labels = next
      labelIds = nextIds
      iter += 1
    }
    // the result reads only the final checkpoint; the edge closure is done
    Blocks.release(spark, undIds)
    if (strict && !converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxIter iterations — the graph's " +
        "diameter exceeds maxIter; raise maxIter or pass strict = false to accept " +
        "partial labels")
    // NOTE: the final labels checkpoint stays pinned until the caller is done
    // with the result (it IS the result); Blocks.scrub at harness boundaries
    // reclaims it
    labels.withColumnRenamed("label", "component")
  }
}
