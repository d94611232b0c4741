package graft

import org.apache.spark.sql.functions._
import graft.sources.FlatGeobuf

/** Exercised against the reference repo's public FGB fixtures
  * (read-only test data; behavior parity with the reference reader). */
class FlatGeobufSpec extends SparkTestBase {

  private val fixtures = "/root/reference/fixtures/flatgeobuf"

  test("countries.fgb: header, count, property + geometry decode") {
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    assert(df.columns.toSeq == Seq("id", "name", "geometry"))
    val n = df.count()
    assert(n == 179, s"countries.fgb should have 179 features, got $n")
    // well-known member, decoded through the full stack
    assert(df.where("name = 'Canada'").count() == 1)
    // every geometry decodes to a valid multi/polygon with positive area
    val stats = df.select(
      sum(when(call_function("st_geometrytype", col("geometry"))
        .isin("ST_Polygon", "ST_MultiPolygon"), 1).otherwise(0)).as("polys"),
      min(call_function("st_area", col("geometry"))).as("min_area")).head()
    assert(stats.getLong(0) == n)
    assert(stats.getDouble(1) > 0.0)
  }

  test("countries.fgb: world envelope matches header envelope") {
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    val hdrEnv = {
      val fs = new org.apache.hadoop.fs.Path(s"$fixtures/countries.fgb")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$fixtures/countries.fgb"))
      val bytes = new Array[Byte](4096)
      in.readFully(0, bytes); in.close()
      FlatGeobuf.parseHeader(bytes).envelope
    }
    val ext = df.agg(
      min(call_function("st_xmin", col("geometry"))),
      min(call_function("st_ymin", col("geometry"))),
      max(call_function("st_xmax", col("geometry"))),
      max(call_function("st_ymax", col("geometry")))).head()
    assert(math.abs(ext.getDouble(0) - hdrEnv(0)) < 1e-6)
    assert(math.abs(ext.getDouble(1) - hdrEnv(1)) < 1e-6)
    assert(math.abs(ext.getDouble(2) - hdrEnv(2)) < 1e-6)
    assert(math.abs(ext.getDouble(3) - hdrEnv(3)) < 1e-6)
  }

  test("bbox read selects the features intersecting the rect") {
    // roughly western Europe
    val sub = FlatGeobuf.readBbox(spark, s"$fixtures/countries.fgb", -10, 35, 20, 60)
    val names = sub.select("name").collect().map(_.getString(0)).toSet
    assert(names.contains("France") && names.contains("Germany") && names.contains("Spain"))
    assert(!names.contains("Australia"))
    assert(sub.count() < 179)
  }

  test("alldatatypes.fgb: every property type decodes") {
    val df = FlatGeobuf.read(spark, s"$fixtures/alldatatypes.fgb")
    assert(df.count() >= 1)
    val row = df.head()
    // all columns non-null on the sample feature (the fixture populates all)
    val nulls = df.schema.fieldNames.dropRight(1).count(f => row.isNullAt(row.fieldIndex(f)))
    assert(nulls == 0, s"unexpected nulls in $row with schema ${df.schema}")
  }

  test("poly00.fgb: single polygon file") {
    val df = FlatGeobuf.read(spark, s"$fixtures/poly00.fgb")
    assert(df.count() >= 1)
    assert(df.select(call_function("st_area", col("geometry"))).head().getDouble(0) > 0)
  }

  test("writer roundtrip: synthetic mixed types + typed properties") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbw").toString
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id, CONCAT('row-', id) AS label,
             CAST(id * 1.5 AS DOUBLE) AS score, id % 2 = 0 AS flag,
             ST_GeomFromText(CASE CAST(id % 4 AS INT)
               WHEN 0 THEN CONCAT('POINT (', id, ' 2)')
               WHEN 1 THEN 'LINESTRING (0 0, 3 4)'
               WHEN 2 THEN 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))'
               ELSE 'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))'
             END) AS geometry
      FROM range(40)""").repartition(3)
    FlatGeobufWriter.write(df, out)
    val back = FlatGeobuf.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "label", "score", "flag", "geometry"))
    assert(back.count() == 40)
    // typed properties survive
    val r7 = back.where("id = 7").head()
    assert(r7.getAs[String]("label") == "row-7" && r7.getAs[Double]("score") == 10.5
      && !r7.getAs[Boolean]("flag"))
    // geometry fidelity: every row's WKT matches the source exactly
    val src = df.selectExpr("id", "ST_AsText(geometry) AS w")
    val dst = back.selectExpr("id", "ST_AsText(geometry) AS w")
    assert(src.except(dst).isEmpty && dst.except(src).isEmpty)
  }

  test("writer roundtrip: countries.fgb through write → read preserves all geometry") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbw2").toString
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    FlatGeobufWriter.write(df.repartition(4), out)
    val back = FlatGeobuf.read(spark, out)
    assert(back.count() == 179)
    // areas and names survive the full circle
    val a = df.selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    val b = back.selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
