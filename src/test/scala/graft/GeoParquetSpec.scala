package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.GeoParquet

class GeoParquetSpec extends SparkTestBase {

  private lazy val dir = Files.createTempDirectory("geoparquet").toString + "/pts"

  private lazy val written = {
    val s = spark
    val df = s.sql("""
      SELECT /*+ REPARTITION(3) */ id,
             ST_Point(CAST(id % 50 AS DOUBLE), CAST(CAST(id / 50 AS INT) AS DOUBLE)) AS geometry
      FROM range(2500)""")
    GeoParquet.write(df, dir, crs = Some("""{"id":{"authority":"EPSG","code":4326}}"""))
    dir
  }

  test("write: geo footer KV with per-file bounds from covering stats") {
    val meta = GeoParquet.metadata(spark, written)
    assert(meta.isDefined)
    val m = meta.get
    assert(m.primaryColumn == "geometry")
    val gc = m.columns.find(_.name == "geometry").get
    assert(gc.encoding == "WKB")
    assert(gc.covering.contains("bbox"))
    assert(gc.crs.exists(_.contains("4326")))
    // bounds of the FIRST part file only — must be within the global extent
    val (x0, y0, x1, y1) = gc.bbox.get
    assert(x0 >= 0.0 && y0 >= 0.0 && x1 <= 49.0 && y1 <= 49.0)
  }

  test("read: roundtrip values + column metadata attach") {
    val df = GeoParquet.read(spark, written)
    assert(df.count() == 2500)
    val fld = df.schema("geometry")
    assert(fld.metadata.getString("geoparquet.encoding") == "WKB")
    assert(fld.metadata.getString("geoparquet.crs").contains("4326"))
    // values survive: centroid of all points
    val r = df.agg(avg(call_function("st_x", col("geometry")))).head().getDouble(0)
    assert(math.abs(r - 24.5) < 1e-9)
  }

  test("read with bbox: correct rows + pushed filters on covering leaves") {
    val q = GeoParquet.read(spark, written, bbox = Some((10.0, 10.0, 19.0, 19.0)))
    // 10..19 x 10..19 → 100 points
    assert(q.count() == 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
           (plan.contains("bbox.xmin") || plan.contains("LessThanOrEqual(bbox.xmin")),
      s"covering-leaf filters must reach the parquet scan:\n$plan")
  }

  test("read with bbox and no covering column still filters correctly") {
    val noCov = dir + "_nocov"
    val df = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(100)")
    GeoParquet.write(df, noCov, covering = false)
    val q = GeoParquet.read(spark, noCov, bbox = Some((5.0, -1.0, 9.0, 1.0)))
    assert(q.count() == 5)
    assert(GeoParquet.metadata(spark, noCov).exists(_.columns.head.covering.isEmpty))
  }

  test("plain spark.read.parquet still reads rewritten files (footer intact)") {
    assert(spark.read.parquet(written).where("id = 1234").count() == 1)
  }
}
