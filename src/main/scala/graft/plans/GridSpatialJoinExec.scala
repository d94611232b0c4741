package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.internal.SQLConf
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

import graft.core.GeomOps

/** Big×big spatial join: grid-partitioned shuffle, STRtree refinement,
  * reference-point dedup. The scale path when neither side fits under the
  * broadcast threshold — where Spark would otherwise plan an O(n·m)
  * BroadcastNestedLoopJoin for a θ-join on an `ST_*` predicate.
  *
  * Topology (the reference's candidate primitive
  * `intersection_candidates_with_other`,
  * rust/geoarrow-old/src/indexed/array.rs:50-57, distributed):
  *  1. sample both children's envelope sizes (a bounded first-rows-per-
  *     partition job, the same trick Spark's RangePartitioner uses) and pick
  *     a cell size — no hand-tuned parameter, unlike the explicit
  *     [[graft.operators.SpatialJoin.grid]] API;
  *  2. explode each row to the grid cells covering its envelope (left
  *     envelopes expanded by `radius` for dwithin) and shuffle both sides on
  *     the cell key — each 100 TB side moves once, keyed, never crossed;
  *  3. per cell, bulk-load an STRtree of the left rows (JTS
  *     PreparedGeometry for the refinement), stream the right rows through;
  *  4. emit a pair only in the cell containing the min corner of its
  *     envelope intersection (reference-point rule) — exactly-once output
  *     with no global DISTINCT pass.
  *
  * `predicate` is normalized by [[SpatialJoinStrategy]] to take the LEFT
  * geometry as its first argument (GeomOps method name).
  *
  * Skew note: the join is a sort-based single pass — both sides shuffle
  * keyed by (cell, side) with a partitioner that routes by cell only, so
  * within a partition each cell's LEFT (build) rows sort before its RIGHT
  * (probe) rows. Only the build side of a cell is ever resident (it has to
  * be — it becomes the STRtree); probe rows stream through one at a time.
  * A pathological hotspot cell therefore costs memory proportional to its
  * build-side rows only, and the cell-size floor (extent/8192 per axis)
  * bounds the common case.
  */
case class GridSpatialJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftGeom: Expression,
    rightGeom: Expression,
    predicate: String,
    radius: Double,
    projection: Option[Seq[Attribute]] = None) extends BinaryExecNode {

  /** see [[SpatialJoinExec.output]] — narrowed to the consumed attributes */
  override def output: Seq[Attribute] =
    projection.getOrElse(left.output ++ right.output)

  private def test(p: PreparedGeometry, g: Geometry): Boolean = predicate match {
    case "intersects" => p.intersects(g)
    case "contains" => p.contains(g)
    case "within" => p.within(g)
    case "covers" => p.covers(g)
    case "coveredBy" => p.coveredBy(g)
    case "touches" => p.touches(g)
    case "overlaps" => p.overlaps(g)
    case "crosses" => p.crosses(g)
    case "equalsTopo" => p.getGeometry.equalsTopo(g)
    case "dWithin" => p.getGeometry.isWithinDistance(g, radius)
    case other => throw new IllegalStateException(s"unsupported spatial predicate: $other")
  }

  /** (maxDim per sampled geometry, extent of the sample). Reads at most
    * `rowsPerPart` rows from at most `maxParts` evenly spaced partitions —
    * cost is bounded regardless of input size. */
  private def sampleEnvelopes(plan: SparkPlan, geom: Expression, expandBy: Double)
      : (Array[Double], Envelope) = {
    val bound = BindReferences.bindReference(geom, plan.output)
    val rdd = plan.execute()
    val nParts = rdd.getNumPartitions
    val maxParts = 128
    val step = math.max(1, nParts / maxParts)
    val rowsPerPart = 64
    // PartitionPruningRDD: the sample job schedules ONLY the ~128 selected
    // partitions — not one no-op task per input partition
    val pruned = org.apache.spark.rdd.PartitionPruningRDD.create(rdd, idx => idx % step == 0)
    val sampled = pruned.mapPartitions { it =>
      it.take(rowsPerPart).flatMap { row =>
        val wkb = bound.eval(row).asInstanceOf[Array[Byte]]
        if (wkb == null) Iterator.empty
        else {
          val g = GeomOps.read(wkb)
          if (g.isEmpty) Iterator.empty
          else {
            val e = g.getEnvelopeInternal
            Iterator.single(Array(
              math.max(e.getWidth, e.getHeight) + 2 * expandBy,
              e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
          }
        }
      }
    }.collect()
    val extent = new Envelope()
    sampled.foreach(a => extent.expandToInclude(new Envelope(a(1), a(3), a(2), a(4))))
    (sampled.map(_(0)), extent)
  }

  /** Cell edge from the sample: ~4× the median envelope dimension (each
    * geometry covers O(1) cells), floored so the grid is at most ~8k cells
    * per axis over the sampled extent (bounds duplication for outlier-huge
    * geometries and keeps key cardinality sane). */
  private def chooseCellSize(): Double = {
    val (lDims, lExt) = sampleEnvelopes(left, leftGeom, radius)
    val (rDims, rExt) = sampleEnvelopes(right, rightGeom, 0.0)
    val dims = lDims ++ rDims
    val extent = new Envelope(lExt); extent.expandToInclude(rExt)
    val eMax = math.max(extent.getWidth, extent.getHeight)
    if (dims.isEmpty) return 1.0
    java.util.Arrays.sort(dims)
    val med = dims(dims.length / 2)
    val base = if (med > 0) med * 4 else if (eMax > 0) eMax / 256 else 1.0
    val cell = math.max(base, if (eMax > 0) eMax / 8192 else 0.0)
    if (cell > 0) cell else 1.0
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val cs = chooseCellSize()
    val lBound = BindReferences.bindReference(leftGeom, left.output)
    val rBound = BindReferences.bindReference(rightGeom, right.output)
    val r = radius

    def keyed(plan: SparkPlan, bound: Expression, expandBy: Double)
        : RDD[((Long, Long), InternalRow)] =
      plan.execute().mapPartitions { it =>
        it.flatMap { row =>
          val wkb = bound.eval(row).asInstanceOf[Array[Byte]]
          if (wkb == null) Iterator.empty
          else {
            val g = GeomOps.read(wkb)
            if (g.isEmpty) Iterator.empty
            else {
              val env = new Envelope(g.getEnvelopeInternal)
              if (expandBy > 0) env.expandBy(expandBy)
              val x0 = math.floor(env.getMinX / cs).toLong
              val x1 = math.floor(env.getMaxX / cs).toLong
              val y0 = math.floor(env.getMinY / cs).toLong
              val y1 = math.floor(env.getMaxY / cs).toLong
              val copy = row.copy() // shuffled rows must own their bytes
              for { cx <- (x0 to x1).iterator; cy <- y0 to y1 } yield ((cx, cy), copy)
            }
          }
        }
      }

    val numParts = SQLConf.get.numShufflePartitions
    val outAttrs = output
    val joinedAttrs = left.output ++ right.output

    // (cell, side) sort key; side 0 = build (left), 1 = probe (right)
    val lK = keyed(left, lBound, r).map { case ((cx, cy), row) => ((cx, cy, 0: Byte), row) }
    val rK = keyed(right, rBound, 0.0).map { case ((cx, cy), row) => ((cx, cy, 1: Byte), row) }
    val merged = lK.union(rK)
      .repartitionAndSortWithinPartitions(new GridSpatialJoinExec.CellPartitioner(numParts))

    merged.mapPartitions { it =>
      val joined = new JoinedRow()
      val proj = UnsafeProjection.create(outAttrs, joinedAttrs)
      val prepF = new PreparedGeometryFactory()
      // per-cell state: build rows accumulate, tree builds lazily at the
      // first probe row, probe rows never buffer
      var curX = 0L
      var curY = 0L
      var haveCell = false
      var build = new scala.collection.mutable.ArrayBuffer[(InternalRow, PreparedGeometry, Envelope)]
      var tree: STRtree = null
      it.flatMap { case ((cx, cy, side), row) =>
        if (!haveCell || cx != curX || cy != curY) {
          haveCell = true; curX = cx; curY = cy
          if (build.nonEmpty) build = new scala.collection.mutable.ArrayBuffer
          tree = null
        }
        if (side == 0) {
          val g = GeomOps.read(lBound.eval(row).asInstanceOf[Array[Byte]])
          val env = new Envelope(g.getEnvelopeInternal)
          if (r > 0) env.expandBy(r)
          build += ((row, prepF.create(g), env))
          Iterator.empty
        } else if (build.isEmpty) Iterator.empty
        else {
          if (tree == null) {
            tree = new STRtree()
            build.foreach(t => tree.insert(t._3, t))
            tree.build()
          }
          val rg = GeomOps.read(rBound.eval(row).asInstanceOf[Array[Byte]])
          val renv = rg.getEnvelopeInternal
          val cands = tree.query(renv)
          (0 until cands.size()).iterator.flatMap { i =>
            val (lrow, pg, lenv) =
              cands.get(i).asInstanceOf[(InternalRow, PreparedGeometry, Envelope)]
            // reference point: min corner of the envelope intersection
            val refX = math.max(lenv.getMinX, renv.getMinX)
            val refY = math.max(lenv.getMinY, renv.getMinY)
            if (math.floor(refX / cs).toLong == cx &&
                math.floor(refY / cs).toLong == cy && test(pg, rg))
              Iterator.single(proj(joined(lrow, row)))
            else Iterator.empty
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): GridSpatialJoinExec =
    copy(left = newLeft, right = newRight)
}

object GridSpatialJoinExec {
  /** Routes by cell only (ignoring the side byte of the sort key), so both
    * sides of a cell land in the same partition; the key ordering then
    * yields build-before-probe within each cell. */
  private[plans] final class CellPartitioner(override val numPartitions: Int)
      extends org.apache.spark.Partitioner {
    override def getPartition(key: Any): Int = {
      val k = key.asInstanceOf[(Long, Long, Byte)]
      val h = scala.util.hashing.MurmurHash3.productHash((k._1, k._2))
      val mod = h % numPartitions
      if (mod < 0) mod + numPartitions else mod
    }
    override def equals(other: Any): Boolean = other match {
      case c: CellPartitioner => c.numPartitions == numPartitions
      case _ => false
    }
    override def hashCode: Int = numPartitions
  }
}
