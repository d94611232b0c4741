package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.functions.{col, monotonically_increasing_id}

/** Physical node for the auto-planned kNN join — the
  * `ROW_NUMBER() OVER (PARTITION BY l.id ORDER BY ST_Distance(l.g, r.g))
  * <= k` over a cross join shape that [[SpatialJoinStrategy]] recognises.
  *
  * Without this, Catalyst executes the shape literally: a
  * BroadcastNestedLoopJoin cartesian followed by a full window sort —
  * O(n·m) pairs shuffled. Here the shape is handed to the adaptive
  * radius-doubling kNN operator ([[graft.operators.SpatialJoin.knn]],
  * the g37 path: bucketed equi-shuffle candidates per round, never a
  * cartesian), whose driver-coordinated iteration cannot be expressed as a
  * static plan — so, like [[GridSpatialJoinExec]]'s execution-time
  * sampling, the node runs it as nested query executions at doExecute
  * time (reference ships kNN as an explicit operator only; this planner
  * hook is the Spark-native equivalent of the SQL shape).
  *
  * Semantics notes (documented contract):
  *  - ties in distance are broken arbitrarily by ROW_NUMBER in the literal
  *    plan; here they break by an internal right-row id. Both are
  *    admissible outputs of the same nondeterministic query.
  *  - rows of `left` sharing a partition-key value form one ranking group
  *    in both formulations.
  *  - null geometries: the literal plan ranks their null distances FIRST
  *    (ASC NULLS FIRST) — k meaningless pairs per group; the operator
  *    excludes null-geometry rows from candidate generation instead. This
  *    is the one deliberate divergence.
  */
case class KnnTopKExec(
    output: Seq[Attribute],
    // only read driver-side in doExecute; @transient so AQE's serialized
    // (canonicalized) stage plans don't drag a FileIndex to executors
    @transient leftPlan: LogicalPlan,
    @transient rightPlan: LogicalPlan,
    leftGeom: Attribute,
    rightGeom: Attribute,
    partKey: Attribute,
    k: Int,
    rankId: ExprId,
    distIds: Set[ExprId]) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val ss = session
    // canonical disjoint names: the operator API is name-based and the two
    // sides of a self-join may collide on names (never on exprIds)
    val lNames = leftPlan.output.indices.map(i => s"__knn_l$i")
    val rNames = rightPlan.output.indices.map(i => s"__knn_r$i")
    val lDf = GraftInternal.ofRows(ss, leftPlan).toDF(lNames: _*)
    // a synthesized unique right id drives the operator's pair dedup and
    // tie-break; localCheckpoint(eager) freezes it across the operator's
    // candidate rounds (and caches the probe side the rounds re-scan)
    val rDf = GraftInternal.ofRows(ss, rightPlan).toDF(rNames: _*)
      .withColumn("__knn_rid", monotonically_increasing_id())
      .localCheckpoint(true)
    val gi = leftPlan.output.indexWhere(_.exprId == leftGeom.exprId)
    val gj = rightPlan.output.indexWhere(_.exprId == rightGeom.exprId)
    val pi = leftPlan.output.indexWhere(_.exprId == partKey.exprId)
    val res = graft.operators.SpatialJoin.knn(
      lDf, rDf, lNames(gi), rNames(gj), k, lNames(pi), "__knn_rid")
    val byId: Map[ExprId, org.apache.spark.sql.Column] =
      (leftPlan.output.map(_.exprId).zip(lNames.map(col)) ++
       rightPlan.output.map(_.exprId).zip(rNames.map(col))).toMap
    val sel = output.map { a =>
      if (a.exprId == rankId) col("knn_rank").cast("int").as(a.name)
      else if (distIds.contains(a.exprId)) col("knn_dist").as(a.name)
      else byId(a.exprId).as(a.name)
    }
    res.select(sel: _*).queryExecution.toRdd
  }
}

/** Reflection shims onto Spark-internal (Scala package-private, bytecode
  * public) entry points — the GeoParquetFileFormat pattern. */
private[plans] object GraftInternal {
  private val datasetModule = {
    val c = Class.forName("org.apache.spark.sql.classic.Dataset$")
    c.getField("MODULE$").get(null)
  }
  private val ofRowsMethod = datasetModule.getClass.getMethods
    .find(m => m.getName == "ofRows" && m.getParameterCount == 2)
    .getOrElse(throw new IllegalStateException("classic.Dataset.ofRows not found"))

  /** `Dataset.ofRows(session, logicalPlan)` — run a resolved logical plan
    * as a DataFrame (nested query execution). */
  def ofRows(session: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    ofRowsMethod.invoke(datasetModule, session, plan)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
}
