package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PostGIS source — re-expression of the reference's `read_postgis(conn,
  * sql)` (rust/geoarrow-old/src/io/postgis/; python surface
  * python/geoarrow-io/.../_postgis.pyi:7).
  *
  * Spark already ships the relational half (`spark.read.jdbc` with
  * partitioned reads); the geospatial half is decoding PostGIS's wire format:
  * geometry columns arrive as hex-encoded EWKB strings over JDBC, which
  * `unhex` + ST_GeomFromWKB turn into this engine's WKB columns (JTS reads
  * EWKB, including the embedded-SRID flag).
  *
  * Scale note: pass `partitionColumn`/`numPartitions` for a parallel read —
  * each executor pulls its own key range; geometry decode happens
  * distributed, inside whole-stage codegen, not on the driver.
  */
object PostGis {

  /** Decode hex-EWKB string columns (PostGIS JDBC wire format) to WKB. */
  def decodeGeometryColumns(df: DataFrame, geometryColumns: Seq[String]): DataFrame = {
    graft.functions.GeoFunctions.register(df.sparkSession)
    geometryColumns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, call_function("st_geomfromwkb", unhex(col(c))))
    }
  }

  /** Read a PostGIS query over JDBC; `geometryColumns` are decoded to WKB.
    * The query should cast geometry to text (`geom::text` or
    * `encode(ST_AsEWKB(geom), 'hex')`) so the driver sees hex strings.
    * `options` passes through to the JDBC source (partitionColumn,
    * lowerBound, upperBound, numPartitions, fetchsize, ...). */
  def read(spark: SparkSession, url: String, query: String,
           geometryColumns: Seq[String] = Seq("geometry", "geom"),
           options: Map[String, String] = Map.empty): DataFrame = {
    val df = options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", query)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
    decodeGeometryColumns(df, geometryColumns)
  }
}
