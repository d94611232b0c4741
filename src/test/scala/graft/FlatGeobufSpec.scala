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
}
