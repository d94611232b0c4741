package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Aggregator
import org.locationtech.jts.operation.union.UnaryUnionOp

import graft.core.GeomOps

/** Geometry aggregates as Spark `Aggregator`s — true partial aggregation
  * (map-side combine on every executor, tiny merge buffers over the shuffle),
  * unlike a `collect_list`-then-reduce which ships every row to one task.
  *
  * `ExtentAgg` mirrors the reference's `BoundingRect` accumulator
  * (rust/geoparquet/src/total_bounds.rs:18-175): `reduce` = per-value
  * `update`, `merge` = rect-union of two partial rects. `UnionAgg` is the
  * cascaded-union aggregate (`ST_Union_Agg`): partials buffer up to
  * [[UnionAgg.FanIn]] geometries, then collapse through JTS UnaryUnionOp
  * (cascaded union) so work stays O(n log n) and the shuffled state is one
  * WKB blob per group per partition.
  */
object GeoAggregates {

  case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  object ExtentAgg extends Aggregator[Array[Byte], BBox, Option[BBox]] {
    private val empty = BBox(Double.PositiveInfinity, Double.PositiveInfinity,
                             Double.NegativeInfinity, Double.NegativeInfinity)
    def zero: BBox = empty
    def reduce(b: BBox, wkb: Array[Byte]): BBox = {
      if (wkb == null) return b
      val e = GeomOps.read(wkb).getEnvelopeInternal
      if (e.isNull) b
      else BBox(math.min(b.xmin, e.getMinX), math.min(b.ymin, e.getMinY),
                math.max(b.xmax, e.getMaxX), math.max(b.ymax, e.getMaxY))
    }
    def merge(a: BBox, b: BBox): BBox =
      BBox(math.min(a.xmin, b.xmin), math.min(a.ymin, b.ymin),
           math.max(a.xmax, b.xmax), math.max(a.ymax, b.ymax))
    // Option output → NULL struct for all-null/empty groups (a bare null
    // trips the non-nullable top-level product assertion)
    def finish(r: BBox): Option[BBox] = if (r.xmin.isInfinite) None else Some(r)
    def bufferEncoder: Encoder[BBox] = Encoders.product[BBox]
    def outputEncoder: Encoder[Option[BBox]] = Encoders.product[Option[BBox]]
  }

  object UnionAgg extends Aggregator[Array[Byte], Seq[Array[Byte]], Array[Byte]] {
    /** collapse threshold: keeps per-group state bounded while letting
      * UnaryUnionOp see batches big enough for its cascaded strategy. */
    final val FanIn = 32
    def zero: Seq[Array[Byte]] = Vector.empty
    // Dedupe on entry, not just inside the collapse: tile/grid workloads
    // repeat a few distinct shapes per group, and skipping them here keeps
    // the buffer below FanIn — one JTS union per partition-group instead of
    // one per FanIn rows. The linear scan is ≤ FanIn short-circuiting
    // byte-compares, noise next to a single overlay op.
    def reduce(buf: Seq[Array[Byte]], wkb: Array[Byte]): Seq[Array[Byte]] =
      if (wkb == null || buf.exists(java.util.Arrays.equals(_, wkb))) buf
      else collapse(buf :+ wkb)
    def merge(a: Seq[Array[Byte]], b: Seq[Array[Byte]]): Seq[Array[Byte]] =
      collapse(a ++ b)
    def finish(buf: Seq[Array[Byte]]): Array[Byte] =
      if (buf.isEmpty) null else unionAll(buf)
    private def collapse(buf: Seq[Array[Byte]]): Seq[Array[Byte]] =
      if (buf.length < FanIn) buf else Vector(unionAll(buf))
    private def unionAll(buf: Seq[Array[Byte]]): Array[Byte] = {
      // union is idempotent: drop byte-identical geometries before the
      // cascade (tile/grid workloads repeat a few shapes millions of times)
      val seen = new java.util.HashSet[java.nio.ByteBuffer]()
      val distinct = buf.filter(b => seen.add(java.nio.ByteBuffer.wrap(b)))
      if (distinct.length == 1) return distinct.head
      val geoms = new java.util.ArrayList[org.locationtech.jts.geom.Geometry](distinct.length)
      distinct.foreach(b => geoms.add(GeomOps.read(b)))
      GeomOps.write(UnaryUnionOp.union(geoms))
    }
    def bufferEncoder: Encoder[Seq[Array[Byte]]] = Encoders.kryo[Seq[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Idempotent registration under `ST_Extent_Agg` / `ST_Union_Agg`. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_extent_agg", F.udaf(ExtentAgg, Encoders.BINARY))
    spark.udf.register("st_union_agg", F.udaf(UnionAgg, Encoders.BINARY))
  }
}
