package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON IO — the reference's feature-collection + newline-delimited
  * readers (rust/geoarrow-old/src/io/geojson/reader.rs:12,
  * geojson_lines/reader.rs:16) and streaming writer
  * (rust/geoarrow-geojson/src/writer/mod.rs:51,141).
  *
  * Read: Spark's JSON source infers the properties schema (arrow-json does
  * the same in the reference); the geometry member re-serializes through
  * `to_json` and parses with the [[graft.core.GeoJson]] codec into WKB.
  * Note the reference's readers also require a uniform geometry type per
  * file for schema inference (common.rs geometry-type from header).
  *
  * Write: one Feature per line (RFC 7946 newline-delimited), geometry
  * encoded by ST_AsGeoJSON, all non-geometry columns as properties.
  */
object GeoJsonSource {

  /** Newline-delimited GeoJSON features (one Feature per line). */
  def readLines(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val raw = spark.read.json(path)
    flatten(raw)
  }

  /** A single FeatureCollection document. */
  def readFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val raw = spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f")).select("f.*")
    flatten(raw)
  }

  private def flatten(raw: DataFrame): DataFrame = {
    val props = if (raw.columns.contains("properties")) Seq(col("properties.*")) else Nil
    raw.select(props :+
      call_function("st_geomfromgeojson", to_json(col("geometry"))).as("geometry"): _*)
  }

  /** Write as newline-delimited GeoJSON features. */
  def writeLines(df: DataFrame, path: String, geometryColumn: String = "geometry",
                 mode: String = "overwrite"): Unit = {
    graft.functions.GeoFunctions.register(df.sparkSession)
    val propCols = df.columns.filterNot(_ == geometryColumn).map(col)
    df.select(concat(
        lit("""{"type":"Feature","properties":"""),
        to_json(struct(propCols.toIndexedSeq: _*)),
        lit(""","geometry":"""),
        call_function("st_asgeojson", col(geometryColumn)),
        lit("}")).as("value"))
      .write.mode(mode).text(path)
  }
}
