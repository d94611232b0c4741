package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Blocks

/** Distributed DBSCAN (Ester et al. 1996) as a composition of the engine's
  * own scale primitives — no new physical operator:
  *
  *   1. ε-neighbor pairs via the planner's `ST_DWithin` grid join
  *      ([[graft.plans.SpatialJoinStrategy]]): both sides shuffle on ε-sized
  *      cells, so pair generation is O(local density), never all-pairs.
  *   2. core points = ε-degree (incl. self) ≥ minPts — one shuffle count.
  *   3. clusters = connected components over core–core edges
  *      ([[ConnectedComponents]] min-label propagation, O(diameter) rounds).
  *   4. border points adopt the smallest cluster label among their core
  *      neighbors; everything else is noise (null cluster).
  *
  * Matches PostGIS `ST_ClusterDBSCAN` semantics (minPts counts the point
  * itself; noise → null) with one documented determinism choice: a border
  * point reachable from several clusters joins the one with the smallest
  * label (PostGIS picks arbitrarily). Cluster labels are the minimum point
  * id in the cluster's core set — stable across runs and partitionings.
  *
  * Scale shape at 100 TB: the only super-linear term is the pair list
  * inside a dense blob (inherent to edge-list DBSCAN — a blob of m points
  * within ε of each other emits O(m²) pairs). The grid join's hot-cell
  * sub-split spreads those pairs across tasks; ε governs blob size, and the
  * component step is the same bounded-iteration machinery t09 uses.
  */
object Dbscan {

  /** Append a nullable `cluster_id` (long) to `df`: cluster label for core
    * and border points, null for noise. `idCol` must be unique per row
    * (cast to long). Runs `2 + O(diameter)` shuffles. */
  def cluster(df: DataFrame, idCol: String, geomCol: String,
              eps: Double, minPts: Int, maxIter: Int = 20): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    componentsOf(df, idCol, geomCol,
      s"ST_DWithin(a.geom, b.geom, $eps)", minPts, maxIter)
  }

  /** The shared engine: neighbor pairs via the planner's grid join on
    * `predicateSql` (any binary ST_ predicate over `a.geom`/`b.geom`),
    * then DBSCAN's core/border/noise labeling over them. */
  private def componentsOf(df: DataFrame, idCol: String, geomCol: String,
                           predicateSql: String, minPts: Int,
                           maxIter: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    graft.functions.GeoFunctions.register(df.sparkSession)
    // checkpointed intermediates stay pinned until the session evicts them:
    // the returned plan still reads pts/pairs/labels, so releasing here
    // would evict blocks a localCheckpoint cannot recompute
    val (pts, _) = Blocks.checkpoint(
      df.select(col(idCol).cast("long").as("id"), col(geomCol).as("geom")))

    // neighbor pairs CANONICAL (src < dst), self excluded — round 21: the
    // symmetric predicate means (a,b) matches iff (b,a) does, so emitting
    // each unordered pair once HALVES the join's exact refine tests (the
    // inequality is absorbed into GridSpatialJoinExec's probe loop and
    // evaluated before the JTS test) and halves the operator's widest
    // intermediate — this pair checkpoint. Consumers that need both
    // directions read the cheap `both` union below (a narrow op over the
    // half-size checkpoint, not a second join pass).
    val (pairs, _) = Blocks.checkpoint(
      pts.as("a").join(pts.as("b"),
          expr(predicateSql) && col("a.id") < col("b.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst")))
    // symmetric view via a NARROW explode — one scan of the half-size
    // checkpoint, not a two-branch union (the union shape measured +2
    // sequential stages on g53's critical path: each branch scans + maps
    // separately before the consumer's exchange)
    def both = pairs.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

    // ε-degree including the point itself. A point with zero ε-neighbors
    // never reaches the pairs list, so minPts <= 1 (every point core by
    // deg-incl-self = 1) must come from pts, not pairs — otherwise
    // isolated points would read as noise instead of singleton clusters.
    val core =
      if (minPts <= 1) pts.select("id")
      else both.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") + 1 >= minPts)
        .select(col("src").as("id"))
    val (coreCp, _) = Blocks.checkpoint(core)

    // core–core edges → components; isolated core points label themselves.
    // The half-size canonical pairs are enough: run() symmetrizes its input
    // into the same undirected closure either way.
    val coreEdges = pairs
      .join(coreCp.withColumnRenamed("id", "src"), Seq("src"))
      .join(coreCp.withColumnRenamed("id", "dst"), Seq("dst"))
      .select("src", "dst")
    val comp = ConnectedComponents.run(coreEdges, "src", "dst", maxIter)
    val coreLabels = coreCp.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("__core_cluster"))
    val (coreLabelsCp, _) = Blocks.checkpoint(coreLabels)

    val labels =
      if (minPts <= 1)
        // every point is core (deg-incl-self = 1 ≥ minPts), so the border
        // pass can never contribute: coalesce(core, border) always takes
        // the core label. Skipping it saves a join + aggregate over the
        // full pair stream for the ST_ClusterWithin/ClusterIntersecting
        // family (round 21) — coreLabelsCp already has one row per point.
        coreLabelsCp.select(col("id").as("__dbscan_id"),
          col("__core_cluster").as("cluster_id"))
      else {
        // border candidates: smallest core-neighbor cluster per point (core
        // points also appear here, but coalesce below prefers their own label)
        val borderLabels = both
          .join(coreLabelsCp.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(min("__core_cluster").as("__border_cluster"))
        pts.select("id")
          .join(coreLabelsCp, Seq("id"), "left")
          .join(borderLabels, Seq("id"), "left")
          .select(col("id").as("__dbscan_id"),
            coalesce(col("__core_cluster"), col("__border_cluster")).as("cluster_id"))
      }

    df.join(labels, df(idCol).cast("long") === col("__dbscan_id"), "left")
      .drop("__dbscan_id")
  }

  /** PostGIS `ST_ClusterWithin` as a DataFrame transform (round 19):
    * clusters are the CONNECTED COMPONENTS of the "within `dist`" graph —
    * exactly DBSCAN with minPts = 1 (every point core, no noise, so
    * `cluster_id` is never null). Labels are the minimum id in the
    * component, stable across runs and partitionings; the scale shape is
    * [[cluster]]'s: ε-grid pair join + bounded-round components, never
    * all-pairs. */
  def clusterWithin(df: DataFrame, idCol: String, geomCol: String,
                    dist: Double, maxIter: Int = 20): DataFrame =
    cluster(df, idCol, geomCol, dist, minPts = 1, maxIter = maxIter)

  /** PostGIS `ST_ClusterIntersecting` as a DataFrame transform (round 19,
    * completing the cluster quartet): clusters are the connected
    * components of the `ST_Intersects` graph — [[clusterWithin]] minus the
    * distance. Every row gets a non-null `cluster_id` (the minimum id in
    * its component; a geometry intersecting nothing is its own singleton
    * cluster). The pair join rides the planner's grid strategy like every
    * ST_Intersects join, so candidate generation is O(local overlap),
    * never all-pairs. PostGIS shapes the result as an aggregate of
    * GeometryCollections; the per-row label is this engine's convention
    * (collect with `ST_Union_Agg`/`collect_list` GROUP BY cluster_id). */
  def clusterIntersecting(df: DataFrame, idCol: String, geomCol: String,
                          maxIter: Int = 20): DataFrame =
    componentsOf(df, idCol, geomCol, "ST_Intersects(a.geom, b.geom)",
      minPts = 1, maxIter = maxIter)
}
