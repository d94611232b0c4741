package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV with a WKT geometry column — the reference's geoarrow-csv driver
  * (rust/geoarrow-csv/src/reader.rs:21-48, writer.rs:14-38): arrow-csv with
  * a configurable geometry column (default "geometry") parsed from WKT.
  * Here the CSV scan, schema inference, partitioned listing and projection
  * pushdown are Spark's own; the geometry column enters/leaves the engine
  * through ST_GeomFromText / ST_AsText.
  */
object GeoCsv {

  def read(spark: SparkSession, path: String, geometryColumn: String = "geometry",
           options: Map[String, String] = Map("header" -> "true", "inferSchema" -> "true")): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val df = spark.read.options(options).csv(path)
    if (df.columns.contains(geometryColumn))
      df.withColumn(geometryColumn, call_function("st_geomfromtext", col(geometryColumn)))
    else df
  }

  def write(df: DataFrame, path: String, geometryColumn: String = "geometry",
            options: Map[String, String] = Map("header" -> "true"),
            mode: String = "overwrite"): Unit = {
    graft.functions.GeoFunctions.register(df.sparkSession)
    val out =
      if (df.columns.contains(geometryColumn))
        df.withColumn(geometryColumn, call_function("st_astext", col(geometryColumn)))
      else df
    out.write.mode(mode).options(options).csv(path)
  }
}
