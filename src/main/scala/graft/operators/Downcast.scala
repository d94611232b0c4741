package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compact-type inference: scan the distinct (geometry-type, dims) tags of a
  * column and name the narrowest type that can represent every row.
  *
  * Spark re-expression of the reference's downcast pass
  * (rust/geoarrow-cast/src/downcast.rs:82 `infer_downcast_type`,
  * :331 `downcast`): there it picks the most compact of the 16 physical
  * array layouts; here the column stays type-erased WKB (SURVEY.md §1.5),
  * so the result is metadata — the name a writer (e.g. GeoParquet `geo`
  * footer, which records per-column `geometry_types`) stamps on the column.
  *
  * Distributed shape: one partial-aggregated `collect_set` over ~10 distinct
  * tags — a metadata-sized shuffle regardless of row count.
  */
object Downcast {

  private def promote(tags: Set[String]): String = {
    if (tags.isEmpty) return "Geometry"
    // X + Multi-X collapse to Multi-X (infallible promotion); anything mixed
    // beyond one family → type-erased Geometry
    val family = Map(
      "ST_Point" -> "ST_MultiPoint", "ST_MultiPoint" -> "ST_MultiPoint",
      "ST_LineString" -> "ST_MultiLineString", "ST_MultiLineString" -> "ST_MultiLineString",
      "ST_Polygon" -> "ST_MultiPolygon", "ST_MultiPolygon" -> "ST_MultiPolygon")
    if (tags.size == 1) tags.head.stripPrefix("ST_")
    else {
      val fams = tags.map(t => family.getOrElse(t, "Geometry"))
      if (fams.size == 1) fams.head.stripPrefix("ST_") else "Geometry"
    }
  }

  /** Narrowest geometry type name covering every row of `geom` (an action). */
  def inferDowncastType(df: DataFrame, geom: Column): String = {
    val tags = df.select(collect_set(call_function("st_geometrytype", geom)).as("t"))
      .head().getSeq[String](0).toSet
    promote(tags)
  }

  /** Same inference but as a one-row DataFrame (tag set + inferred type), for
    * pipelines that stay declarative. Uses the `graft_downcast_promote`
    * StaticInvoke kernel — no Scala UDF anywhere in the engine. */
  def inferDowncastTypeDF(df: DataFrame, geom: Column): DataFrame =
    df.select(sort_array(collect_set(call_function("st_geometrytype", geom))).as("tags"))
      .select(col("tags"), call_function("graft_downcast_promote", col("tags")).as("inferred"))

  /** StaticInvoke target for the promotion lattice (ArrayData of tag
    * strings → narrowest type name). */
  def promoteTags(a: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val tags = (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toSet
    org.apache.spark.unsafe.types.UTF8String.fromString(promote(tags))
  }
}
