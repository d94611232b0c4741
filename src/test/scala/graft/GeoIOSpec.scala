package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{GeoCsv, GeoJsonSource}

class GeoIOSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory("geoio").toString + "/" + name

  test("GeoCsv: WKT roundtrip with property columns") {
    val dir = tmp("csv")
    val df = spark.sql("""
      SELECT id, CONCAT('name_', id) AS name,
             ST_Point(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE)) AS geometry
      FROM range(50)""")
    GeoCsv.write(df, dir)
    val back = GeoCsv.read(spark, dir)
    assert(back.count() == 50)
    val r = back.where("id = 7")
      .select(call_function("st_x", col("geometry")), col("name")).head()
    assert(r.getDouble(0) == 7.0 && r.getString(1) == "name_7")
  }

  test("GeoJSON lines: feature roundtrip preserves properties and geometry") {
    val dir = tmp("gjl")
    val df = spark.sql("""
      SELECT id AS fid, CAST(id * 1.5 AS DOUBLE) AS score,
             ST_Point(CAST(id AS DOUBLE), CAST(id % 10 AS DOUBLE)) AS geometry
      FROM range(30)""")
    GeoJsonSource.writeLines(df, dir)
    // the emitted lines are valid single-Feature JSON
    val line = spark.read.text(dir).head().getString(0)
    assert(line.startsWith("""{"type":"Feature","properties":{"""))
    assert(line.contains(""""geometry":{"type":"Point""""))
    val back = GeoJsonSource.readLines(spark, dir)
    assert(back.count() == 30)
    val r = back.where("fid = 12")
      .select(call_function("st_x", col("geometry")),
              call_function("st_y", col("geometry")), col("score")).head()
    assert(r.getDouble(0) == 12.0 && r.getDouble(1) == 2.0 && r.getDouble(2) == 18.0)
  }

  test("GeoJSON FeatureCollection read") {
    val dir = Files.createTempDirectory("geoio").toString
    // uniform geometry type per file (same constraint as the reference's
    // header-driven schema inference)
    val fc = """{"type":"FeatureCollection","features":[
      {"type":"Feature","properties":{"name":"a"},"geometry":{"type":"LineString","coordinates":[[0,0],[0,2]]}},
      {"type":"Feature","properties":{"name":"b"},"geometry":{"type":"LineString","coordinates":[[0,0],[3,4]]}}]}"""
    Files.write(java.nio.file.Paths.get(dir, "fc.geojson"), fc.getBytes)
    val back = GeoJsonSource.readFeatureCollection(spark, dir + "/fc.geojson")
    assert(back.count() == 2)
    val lens = back.select(col("name"), call_function("st_length", col("geometry")).as("len"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lens("a") == 2.0 && lens("b") == 5.0)
  }

  test("GeoJSON FeatureCollection write: one valid document, roundtrips") {
    val dir = Files.createTempDirectory("geoio").toString
    val df = spark.sql("""
      SELECT id AS fid, concat('n', CAST(id AS STRING)) AS name,
             ST_Point(CAST(id AS DOUBLE), 1.0) AS geometry
      FROM range(20)""").repartition(4) // multiple staged parts → comma joins
    GeoJsonSource.writeFeatureCollection(df, dir + "/out.geojson")
    // exactly one file, a single well-formed FeatureCollection document
    val doc = new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "out.geojson")), "UTF-8")
    assert(doc.startsWith("""{"type":"FeatureCollection","features":[{"""))
    assert(doc.endsWith("]}"))
    assert(doc.count(_ == '\n') == 0)
    assert("\"type\":\"Feature\"".r.findAllIn(doc).length == 20)
    val back = GeoJsonSource.readFeatureCollection(spark, dir + "/out.geojson")
    assert(back.count() == 20)
    val r = back.where("fid = 7")
      .select(col("name"), call_function("st_x", col("geometry"))).head()
    assert(r.getString(0) == "n7" && r.getDouble(1) == 7.0)
  }

  test("GeoJSON FeatureCollection write: zero rows → empty features array") {
    val dir = Files.createTempDirectory("geoio").toString
    val df = spark.sql(
      "SELECT id AS fid, ST_Point(1.0, 1.0) AS geometry FROM range(1)").where("fid < 0")
    GeoJsonSource.writeFeatureCollection(df, dir + "/empty.geojson")
    val doc = new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "empty.geojson")), "UTF-8")
    assert(doc == """{"type":"FeatureCollection","features":[]}""")
  }

  // mixed geometry types in one file: spark.read.json can't infer a single
  // coordinates schema (the reference has the same single-type constraint,
  // driven by the FGB/GeoJSON header type) — documents the boundary
  test("GeoJSON lines: mixed geometry types in one file parse exactly (round 18)") {
    // RFC 7946 allows mixed FeatureCollections; Spark's JSON schema merge
    // of Point [x,y] vs LineString [[x,y]…] coordinates used to mangle
    // them (and the reference requires a uniform type per file) — the
    // inference-free geometry path reads them correctly
    val dir = Files.createTempDirectory("geoio").toString
    val lines = Seq(
      """{"type":"Feature","properties":{"n":1},"geometry":{"type":"Point","coordinates":[1,2]}}""",
      """{"type":"Feature","properties":{"n":2},"geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]}}""",
      """{"type":"Feature","properties":{"n":3},"geometry":{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,0]]]}}""")
    Files.write(java.nio.file.Paths.get(dir, "mixed.json"), lines.mkString("\n").getBytes)
    val rows = GeoJsonSource.readLines(spark, dir + "/mixed.json")
      .selectExpr("n", "ST_AsText(geometry) AS wkt").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "POINT (1 2)"),
      (2L, "LINESTRING (0 0, 1 1)"),
      (3L, "POLYGON ((0 0, 2 0, 2 2, 0 0))")), rows.mkString("; "))
  }

  test("GeoJSON lines: bare geometry objects read; malformed lines fail loudly (round 18)") {
    // bare-geometry NDJSON (a common wild shape) is accepted as the row's
    // geometry, like the codec's parse(); a line that parses to nothing
    // raises instead of dissolving into an all-NULL row
    val dir = Files.createTempDirectory("geoio").toString
    Files.write(java.nio.file.Paths.get(dir, "bare.json"),
      """{"type":"Point","coordinates":[7,8]}""".getBytes)
    val bare = GeoJsonSource.readLines(spark, dir + "/bare.json")
      .selectExpr("ST_AsText(geometry)").collect()
    assert(bare.map(_.getString(0)).toSeq == Seq("POINT (7 8)"))
    // null-geometry Features stay NULL rows (RFC 7946 allows them)
    Files.write(java.nio.file.Paths.get(dir, "nullgeom.json"),
      """{"type":"Feature","properties":{"n":1},"geometry":null}""".getBytes)
    val ng = GeoJsonSource.readLines(spark, dir + "/nullgeom.json").collect()
    assert(ng.length == 1 && ng.head.isNullAt(ng.head.length - 1))
    // corrupt line → loud error
    Files.write(java.nio.file.Paths.get(dir, "corrupt.json"),
      "{\"type\":\"Feature\",\"properties\":{},\"geometry\":{\"type\":\"Point\",\"coordinates\":[1,2]}}\nnot json at all".getBytes)
    val err = intercept[Exception] {
      GeoJsonSource.readLines(spark, dir + "/corrupt.json").collect()
    }
    assert(err.getMessage.contains("not a Feature") ||
      Option(err.getCause).exists(_.getMessage.contains("not a Feature")), err.getMessage)
  }

  // the JDBC connection itself needs a live server; the PostGIS-specific
  // logic — hex-EWKB wire format → WKB column — is what's testable here
  test("PostGis.decodeGeometryColumns: hex EWKB (with SRID flag) → WKB") {
    import graft.sources.PostGis
    // hex of EWKB POINT(1 2) with SRID=4326: 01 01000020 E6100000 x y
    val hex = "0101000020E6100000000000000000F03F0000000000000040"
    val df = spark.sql(s"SELECT 7 AS id, '$hex' AS geom")
    val out = PostGis.decodeGeometryColumns(df, Seq("geom", "geometry"))
    val r = out.selectExpr("id", "ST_X(geom)", "ST_Y(geom)", "ST_SRID(geom)").head()
    assert(r.getInt(0) == 7 && r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0)
    assert(r.getInt(3) == 4326) // SRID carried through the EWKB flag
  }
}
