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
    * pipelines that stay declarative. */
  def inferDowncastTypeDF(df: DataFrame, geom: Column): DataFrame =
    df.select(sort_array(collect_set(call_function("st_geometrytype", geom))).as("tags"))
      .select(col("tags"), udf(promoteSet _).apply(col("tags")).as("inferred"))

  private def promoteSet(tags: Seq[String]): String = promote(tags.toSet)
}
