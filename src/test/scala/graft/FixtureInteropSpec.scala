package graft

import org.apache.spark.sql.functions._

import graft.sources.{FlatGeobuf, GeoJsonSource, GeoParquet}

/** Reads every reference fixture not already exercised by another suite —
  * real files written by OTHER tools (GDAL, pyarrow, the Overture pipeline,
  * the flatgeobuf reference implementation), so these are the external
  * producer interop gates. Expected values were computed independently
  * (DuckDB over the parquet files, a JSON walk over the GeoJSON) and are
  * pinned as literals.
  */
class FixtureInteropSpec extends SparkTestBase {

  private val fx = "/root/reference/fixtures"

  test("roads.geojson: single-document FeatureCollection from another producer") {
    val df = GeoJsonSource.readFeatureCollection(spark, s"$fx/roads.geojson")
    assert(df.count() == 21)
    // every feature is a LineString totalling 73 points (independent JSON walk)
    val tags = df.selectExpr("ST_GeometryType(geometry) AS t").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(tags == Seq("ST_LineString"))
    assert(df.selectExpr("ST_NPoints(geometry) AS n")
      .agg(sum("n")).head().getLong(0) == 73)
    // properties survive with their values: the three road kinds
    assert(df.select("kind").distinct().collect().map(_.getString(0)).toSet ==
      Set("major_road", "minor_road", "path"))
  }

  test("nybb.parquet (external covering-less WKB): bbox read equals the wkb twin filtered") {
    // no covering struct declared → the envelope-refine path; values must
    // equal the nybb_wkb twin under the same window
    val m = GeoParquet.metadata(spark, s"$fx/geoparquet/nybb.parquet").get
    val gc = m.columns.find(_.name == "geometry").get
    assert(gc.covering.isEmpty && gc.geometryTypes == Seq("MultiPolygon"))
    val full = GeoParquet.read(spark, s"$fx/geoparquet/nybb.parquet")
    assert(full.count() == 5)
    // Manhattan-ish window in the file's EPSG:2263 feet coordinates
    val win = (970000.0, 190000.0, 1010000.0, 260000.0)
    val got = GeoParquet.read(spark, s"$fx/geoparquet/nybb.parquet", bbox = Some(win))
      .select("BoroName").collect().map(_.getString(0)).toSet
    val twin = GeoParquet.read(spark, s"$fx/geoparquet/nybb_wkb.parquet", bbox = Some(win))
      .select("BoroName").collect().map(_.getString(0)).toSet
    assert(got == twin && got.nonEmpty, s"got $got vs twin $twin")
  }

  test("nybb_wkb_covering.parquet (external covering): pushdown engages, values match") {
    val m = GeoParquet.metadata(spark, s"$fx/geoparquet/nybb_wkb_covering.parquet").get
    assert(m.columns.find(_.name == "geometry").get.covering.contains("bbox"))
    val win = (970000.0, 190000.0, 1010000.0, 260000.0)
    val q = GeoParquet.read(spark, s"$fx/geoparquet/nybb_wkb_covering.parquet", bbox = Some(win))
    // the coarse filter must reach the parquet scan through the EXTERNAL
    // file's covering leaves (not just our own writer's)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"external covering leaves must push:\n$plan")
    val got = q.select("BoroName").collect().map(_.getString(0)).toSet
    val twin = GeoParquet.read(spark, s"$fx/geoparquet/nybb_wkb.parquet", bbox = Some(win))
      .select("BoroName").collect().map(_.getString(0)).toSet
    assert(got == twin && got.nonEmpty)
  }

  test("Overture samples: nested real-world GeoParquet decodes whole") {
    // Overture's pipeline writes deeply nested structs (sources/names maps)
    // around the WKB column — the reconcile and the decode must both hold
    Seq(
      ("overture_buildings", Map[Any, Long](null.asInstanceOf[Any] -> 55L, "residential" -> 45L)),
      ("overture_infrastructure", Map[Any, Long]("barrier" -> 41L, "bridge" -> 9L,
        "pedestrian" -> 30L, "pier" -> 1L, "tower" -> 1L, "transit" -> 14L,
        "waste_management" -> 4L))
    ).foreach { case (name, expectedSubtypes) =>
      val path = s"$fx/geoparquet/$name.parquet"
      val df = GeoParquet.read(spark, path)
      assert(df.count() == 100, s"$name count")
      // every WKB decodes to a non-empty valid-typed geometry
      val decoded = df.selectExpr("ST_GeometryType(geometry) AS t", "ST_IsEmpty(geometry) AS e")
      assert(decoded.where("e").count() == 0, s"$name has empty geometries")
      val types = decoded.select("t").distinct().collect().map(_.getString(0)).toSet
      val declared = GeoParquet.metadata(spark, path).get
        .columns.find(_.name == "geometry").get.geometryTypes.map("ST_" + _).toSet
      assert(types.subsetOf(declared), s"$name observed $types outside declared $declared")
      // independent histogram (DuckDB) pinned
      val got = df.groupBy("subtype").count().collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
      assert(got == expectedSubtypes, s"$name subtypes: $got")
    }
  }

  test("FGB reference files from other writers: header-consistent, valid, in-bounds") {
    Seq("ns-water_water-line_small.fgb", "nz-building-outlines-small.fgb", "poly01.fgb")
      .foreach { name =>
        val path = s"$fx/flatgeobuf/$name"
        val hdr = FlatGeobuf.parseHeader(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)))
        val df = FlatGeobuf.read(spark, path)
        val n = df.count()
        assert(hdr.featuresCount > 0 && n == hdr.featuresCount,
          s"$name: decoded $n vs header ${hdr.featuresCount}")
        // every geometry lands inside the header envelope (when declared)
        hdr.envelope match {
          case env if env.length >= 4 =>
            val out = df.where(
              call_function("st_xmin", col("geometry")) < env(0) - 1e-6 ||
              call_function("st_ymin", col("geometry")) < env(1) - 1e-6 ||
              call_function("st_xmax", col("geometry")) > env(2) + 1e-6 ||
              call_function("st_ymax", col("geometry")) > env(3) + 1e-6).count()
            assert(out == 0, s"$name: $out features outside the header envelope")
          case _ =>
        }
        assert(df.selectExpr("ST_IsEmpty(geometry) AS e").where("e").count() == 0)
      }
    // poly00 (indexless) and poly01 (indexed) carry the same dataset: the
    // two independent files must decode to identical content
    val a = FlatGeobuf.read(spark, s"$fx/flatgeobuf/poly00.fgb")
      .selectExpr("ST_AsText(geometry) AS w")
    val b = FlatGeobuf.read(spark, s"$fx/flatgeobuf/poly01.fgb")
      .selectExpr("ST_AsText(geometry) AS w")
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "poly00 and poly01 must decode identically")
  }
}
