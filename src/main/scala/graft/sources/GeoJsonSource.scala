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
  * encoded by ST_AsGeoJSON, all non-geometry columns as properties; or a
  * single FeatureCollection document ([[writeFeatureCollection]], the
  * reference's streaming collection writer).
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

  /** Write ONE FeatureCollection document (the reference's collection
    * writer, rust/geoarrow-geojson/src/writer/mod.rs:51 — it too streams
    * features into a single output). Feature serialization is distributed
    * (each task JSON-encodes its partition into staged parts); the final
    * assembly streams the staged bytes through a single Hadoop FS output —
    * a single JSON document is single-stream by definition — and runs as a
    * one-task Spark job, so the bytes flow executor→filesystem and never
    * transit the driver. Prefer [[writeLines]] for corpus-scale exports;
    * this is the web-map / interchange shape. */
  def writeFeatureCollection(df: DataFrame, path: String,
                             geometryColumn: String = "geometry"): Unit = {
    val staging = path + "_fc_staging_" + java.util.UUID.randomUUID().toString.take(8)
    writeLines(df, staging, geometryColumn)
    val serConf = new GeoParquet.SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    df.sparkSession.sparkContext.parallelize(Seq(path -> staging), 1).foreach {
      case (targetStr, stagingStr) =>
        val target = new org.apache.hadoop.fs.Path(targetStr)
        val fs = target.getFileSystem(serConf.value)
        val stagingPath = new org.apache.hadoop.fs.Path(stagingStr)
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        try {
          // task order is part-file order; listStatus (not listFiles) so any
          // Hadoop scheme serves it (see MockFsSpec). Sort by the PARSED
          // part number, not the raw name: Spark zero-pads to 5 digits, so
          // past 99999 tasks "part-100000" would sort before "part-99999"
          // lexicographically and scramble feature order
          val partNum = "part-(\\d+)".r
          val parts = fs.listStatus(stagingPath)
            .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
            .sortBy { st =>
              partNum.findFirstMatchIn(st.getPath.getName)
                .map(_.group(1).toLong).getOrElse(Long.MaxValue)
            }
          val out = fs.create(target, true)
          try {
            out.write("""{"type":"FeatureCollection","features":[""".getBytes(utf8))
            var first = true
            parts.foreach { p =>
              val in = new java.io.BufferedReader(
                new java.io.InputStreamReader(fs.open(p.getPath), utf8))
              try {
                var line = in.readLine()
                while (line != null) {
                  if (line.nonEmpty) {
                    if (!first) out.write(','.toInt)
                    out.write(line.getBytes(utf8))
                    first = false
                  }
                  line = in.readLine()
                }
              } finally in.close()
            }
            out.write("]}".getBytes(utf8))
          } finally out.close()
        } finally fs.delete(stagingPath, true)
    }
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
