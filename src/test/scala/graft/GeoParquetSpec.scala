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
    // dataset bounds = union of every part-file's footer bounds
    val (x0, y0, x1, y1) = gc.bbox.get
    assert(x0 == 0.0 && y0 == 0.0 && x1 == 49.0 && y1 == 49.0)
  }

  test("metadata cache: second read does zero footer IO, mutation invalidates") {
    val out = dir + "_metacache"
    val df = spark.sql(
      "SELECT CAST(id AS BIGINT) AS fid, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(64)")
    GeoParquet.write(df.repartition(4), out)
    GeoParquet.invalidateMetadataCache()
    GeoParquet.footerOpens.reset()
    val m1 = GeoParquet.metadata(spark, out)
    val coldOpens = GeoParquet.footerOpens.sum()
    assert(m1.isDefined && coldOpens >= 4, s"cold metadata must read footers: $coldOpens")
    // warm: the listing signature matches → ZERO footer opens
    GeoParquet.footerOpens.reset()
    val m2 = GeoParquet.metadata(spark, out)
    assert(m2 == m1)
    assert(GeoParquet.footerOpens.sum() == 0,
      s"warm metadata must do zero footer IO, did ${GeoParquet.footerOpens.sum()}")
    // read() rides the same cache
    GeoParquet.footerOpens.reset()
    assert(GeoParquet.read(spark, out).count() == 64)
    assert(GeoParquet.footerOpens.sum() == 0, "read() must reuse cached metadata")
    // mutating the dataset (overwrite → new file list/mtimes) recomputes
    GeoParquet.write(df.repartition(2), out)
    GeoParquet.footerOpens.reset()
    val m3 = GeoParquet.metadata(spark, out)
    assert(m3.isDefined && GeoParquet.footerOpens.sum() >= 2,
      s"changed listing must recompute, did ${GeoParquet.footerOpens.sum()} opens")
    // explicit invalidation forces a recompute even with an unchanged listing
    GeoParquet.invalidateMetadataCache(Some(out))
    GeoParquet.footerOpens.reset()
    assert(GeoParquet.metadata(spark, out) == m3)
    assert(GeoParquet.footerOpens.sum() >= 2, "invalidate must drop the entry")
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

  test("write records observed dataset-level geometry_types (WKB)") {
    // all-point dataset written above: constrained to exactly Point
    assert(GeoParquet.metadata(spark, written).get.columns.head.geometryTypes == Seq("Point"))

    // mixed 2D/3D multi-type dataset → sorted distinct set with Z suffix
    val mixed = dir + "_types"
    val df = spark.sql("""
      SELECT id,
             CASE WHEN id % 3 = 0 THEN ST_Point(1.0, 2.0)
                  WHEN id % 3 = 1 THEN ST_GeomFromText('LINESTRING(0 0, 1 1)')
                  ELSE ST_PointZ(1.0, 2.0, 3.0) END AS geometry
      FROM range(30)""")
    GeoParquet.write(df, mixed)
    val gc = GeoParquet.metadata(spark, mixed).get.columns.head
    assert(gc.geometryTypes == Seq("LineString", "Point", "Point Z"))
    // a reader that prunes by type gets a real constraint, and the data
    // still reads back whole
    assert(GeoParquet.read(spark, mixed).count() == 30)
  }

  // ── multi-file dataset metadata (per-file footers, reconciled) ─────────

  /** copy every part-file of `src` into `dst` with a distinct prefix. */
  private def mixInto(dst: String, src: String, prefix: String): Unit = {
    val d = new java.io.File(dst); d.mkdirs()
    new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(d, prefix + f.getName).toPath)
    }
  }

  private lazy val mixRoot = Files.createTempDirectory("geoparquet_mix").toString

  test("dataset: heterogeneous covering across part-files disables pushdown, reads correctly") {
    val aDir = s"$mixRoot/cov_a"; val bDir = s"$mixRoot/cov_b"; val mixed = s"$mixRoot/cov_mixed"
    val a = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(50)")
    val b = spark.sql("SELECT id, ST_Point(CAST(id + 100 AS DOUBLE), 0.0) AS geometry FROM range(50)")
    GeoParquet.write(a.coalesce(1), aDir, covering = true)
    GeoParquet.write(b.coalesce(1), bDir, covering = false)
    mixInto(mixed, aDir, "a-")
    mixInto(mixed, bDir, "b-")
    // covering must NOT be trusted: file b has no bbox column, so the coarse
    // row-level filter would silently drop all of b's rows
    val m = GeoParquet.metadata(spark, mixed).get
    assert(m.columns.find(_.name == "geometry").get.covering.isEmpty)
    // schema union makes b's bbox NULL — and the read stays correct because
    // only the exact-refine path runs
    val q = GeoParquet.read(spark, mixed, bbox = Some((100.0, -1.0, 149.0, 1.0)))
    assert(q.count() == 50)
    assert(GeoParquet.read(spark, mixed).count() == 100)
  }

  test("dataset: part-file missing the geo footer entirely is tolerated for WKB") {
    val gDir = s"$mixRoot/miss_g"; val pDir = s"$mixRoot/miss_p"; val mixed = s"$mixRoot/miss_mixed"
    val g = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(30)")
    GeoParquet.write(g.coalesce(1), gDir, covering = false,
      crs = Some("""{"id":{"authority":"EPSG","code":4326}}"""))
    // a plain Spark-written part-file (same schema, no geo KV) appended in
    g.withColumn("id", col("id") + 1000).coalesce(1).write.parquet(pDir)
    mixInto(mixed, gDir, "g-")
    mixInto(mixed, pDir, "p-")
    val m = GeoParquet.metadata(spark, mixed).get
    val gc = m.columns.find(_.name == "geometry").get
    assert(gc.encoding == "WKB")
    assert(gc.covering.isEmpty && gc.bbox.isEmpty) // unknowable for the plain file
    assert(gc.crs.exists(_.contains("4326")))
    assert(GeoParquet.read(spark, mixed).count() == 60)
  }

  test("dataset: CRS disagreement between part-files fails loudly") {
    val aDir = s"$mixRoot/crs_a"; val bDir = s"$mixRoot/crs_b"; val mixed = s"$mixRoot/crs_mixed"
    val df = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(10)")
    GeoParquet.write(df.coalesce(1), aDir, crs = Some("""{"id":{"authority":"EPSG","code":4326}}"""))
    GeoParquet.write(df.coalesce(1), bDir, crs = Some("""{"id":{"authority":"EPSG","code":3857}}"""))
    mixInto(mixed, aDir, "a-")
    mixInto(mixed, bDir, "b-")
    val e = intercept[IllegalStateException] { GeoParquet.metadata(spark, mixed) }
    assert(e.getMessage.contains("CRS"))
    assert(e.getMessage.contains("ST_Transform"))
  }

  test("dataset: native encoding with a metadata-less part-file fails loudly") {
    val nDir = s"$mixRoot/nat_n"; val pDir = s"$mixRoot/nat_p"; val mixed = s"$mixRoot/nat_mixed"
    val df = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(10)")
    GeoParquet.write(df.coalesce(1), nDir, encoding = "point", covering = false)
    // plain parquet with a same-named binary column and no geo KV
    df.coalesce(1).write.parquet(pDir)
    mixInto(mixed, nDir, "n-")
    mixInto(mixed, pDir, "p-")
    val e = intercept[IllegalStateException] { GeoParquet.metadata(spark, mixed) }
    assert(e.getMessage.contains("native encoding"))
  }

  // ── GeoParquet 1.1 native (geoarrow) encoding ──────────────────────────

  private val fixtures = "/root/reference/fixtures/geoparquet"

  test("read: native-encoded file transcodes to WKB and matches the WKB twin") {
    val native = GeoParquet.read(spark, s"$fixtures/nybb_geoarrow.parquet")
    val wkb = GeoParquet.read(spark, s"$fixtures/nybb_wkb.parquet")
    // scan-time transcode: column is WKB binary afterwards
    assert(native.schema("geometry").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val fld = native.schema("geometry")
    assert(fld.metadata.getString("geoparquet.encoding") == "WKB")
    assert(fld.metadata.getString("geoparquet.source_encoding") == "multipolygon")
    def byBoro(df: org.apache.spark.sql.DataFrame) =
      df.select(col("BoroCode"),
          call_function("st_astext", col("geometry")).as("wkt"),
          call_function("st_npoints", col("geometry")).as("np"))
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val n = byBoro(native)
    val w = byBoro(wkb)
    assert(n.keySet == w.keySet && n.nonEmpty)
    n.keySet.foreach { k => assert(n(k) == w(k), s"BoroCode $k differs") }
  }

  test("native-encoded column is queryable by every ST_* path (area agg)") {
    val native = GeoParquet.read(spark, s"$fixtures/nybb_geoarrow.parquet")
    val wkb = GeoParquet.read(spark, s"$fixtures/nybb_wkb.parquet")
    def totalArea(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(call_function("st_area", col("geometry")))).head().getDouble(0)
    assert(math.abs(totalArea(native) - totalArea(wkb)) < 1e-6)
  }

  test("ga_* transcode kernels: point/linestring/polygon with z") {
    val df = sql("""
      SELECT ga_point(named_struct('x', 1.0D, 'y', 2.0D), false, false) AS p,
             ga_point(named_struct('x', 1.0D, 'y', 2.0D, 'z', 3.0D), true, false) AS pz,
             ga_linestring(array(named_struct('x', 0.0D, 'y', 0.0D),
                                 named_struct('x', 3.0D, 'y', 4.0D)), false, false) AS l,
             ga_polygon(array(array(named_struct('x', 0.0D, 'y', 0.0D),
                                    named_struct('x', 4.0D, 'y', 0.0D),
                                    named_struct('x', 4.0D, 'y', 4.0D),
                                    named_struct('x', 0.0D, 'y', 4.0D),
                                    named_struct('x', 0.0D, 'y', 0.0D))), false, false) AS pg""")
      .selectExpr("ST_AsText(p) AS p", "ST_AsText(pz) AS pz",
                  "ST_Length(l) AS ll", "ST_Area(pg) AS pa")
      .head()
    assert(df.getString(0) == "POINT (1 2)")
    assert(df.getString(1) == "POINT Z(1 2 3)")
    assert(df.getDouble(2) == 5.0)
    assert(df.getDouble(3) == 16.0)
  }

  test("ga_to_* export refuses Z/M input loudly; ST_Force2D is the escape hatch") {
    // XY-only export layout: silently dropping Z would corrupt a 3D write
    def rootMsg(t: Throwable): String = {
      var cur = t
      while (cur.getCause != null && (cur.getCause ne cur)) cur = cur.getCause
      cur.getMessage
    }
    val e = intercept[Exception] {
      sql("SELECT ga_to_point(ST_PointZ(1.0D, 2.0D, 3.0D)) AS p").collect()
    }
    assert(rootMsg(e).contains("XY only") && rootMsg(e).contains("ST_Force2D"), rootMsg(e))
    // measured geometries refuse too
    val em = intercept[Exception] {
      sql("""SELECT ga_to_linestring(ST_GeomFromText('LINESTRING M(0 0 1, 1 1 2)')) AS l""").collect()
    }
    assert(rootMsg(em).contains("XY only"), rootMsg(em))
    // ST_Force2D strips Z/M and the export then succeeds
    val r = sql("""
      SELECT ST_AsText(ST_Force2D(ST_PointZ(1.0D, 2.0D, 3.0D))) AS w,
             ST_AsText(ST_Force2D(ST_GeomFromText('LINESTRING M(0 0 1, 1 1 2)'))) AS wm,
             ga_point(ga_to_point(ST_Force2D(ST_PointZ(1.0D, 2.0D, 3.0D))), false, false) AS rt""")
      .selectExpr("w", "wm", "ST_AsText(rt) AS rt").head()
    assert(r.getString(0) == "POINT (1 2)")
    assert(r.getString(1) == "LINESTRING (0 0, 1 1)")
    assert(r.getString(2) == "POINT (1 2)")
  }

  test("native-encoding write: WKB fixture → native file → read back identically") {
    val natOut = dir + "_native"
    val wkb = GeoParquet.read(spark, s"$fixtures/nybb_wkb.parquet")
    GeoParquet.write(wkb, natOut, covering = false, encoding = "multipolygon")
    // footer declares the native encoding
    val meta = GeoParquet.metadata(spark, natOut).get
    assert(meta.columns.head.encoding == "multipolygon")
    // the physical schema is the GeoArrow nested layout, like the reference fixture
    val raw = spark.read.parquet(natOut)
    assert(raw.schema("geometry").dataType.simpleString ==
      "array<array<array<struct<x:double,y:double>>>>", raw.schema("geometry").dataType.simpleString)
    // read back through the scan-time transcode: values identical to the source
    val back = GeoParquet.read(spark, natOut)
    def byBoro2(df: org.apache.spark.sql.DataFrame) =
      df.select(col("BoroCode"), call_function("st_astext", col("geometry")).as("w"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byBoro2(back) == byBoro2(wkb))
  }

  test("native XYZ write (encoding = point_z): z survives the native hop; footer stays 'point'") {
    val zOut = dir + "_native_z"
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS fid,
             ST_PointZ(CAST(id AS DOUBLE), 1.0, CAST(id * 10 AS DOUBLE)) AS geometry
      FROM range(15)""")
    GeoParquet.write(df.coalesce(1), zOut, covering = false, encoding = "point_z")
    // footer encoding is the dimensionless GeoParquet 1.1 name; the coord
    // struct carries the z field the reader's zmFlags detect
    val meta = GeoParquet.metadata(spark, zOut).get
    assert(meta.columns.head.encoding == "point")
    val raw = spark.read.parquet(zOut)
    assert(raw.schema("geometry").dataType.simpleString ==
      "struct<x:double,y:double,z:double>", raw.schema("geometry").dataType.simpleString)
    val back = GeoParquet.read(spark, zOut)
    val a = df.selectExpr("fid", "ST_AsText(geometry) w")
    val b = back.selectExpr("fid", "ST_AsText(geometry) w")
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "native point_z parquet roundtrip")
    assert(back.selectExpr("SUM(ST_Z(geometry))").head().getDouble(0) == (0 until 15).map(_ * 10).sum)
    // 2D input through a _z encoding fails loudly (no fabricated ordinate)
    val flat = intercept[Exception] {
      GeoParquet.write(spark.sql(
        "SELECT ST_Point(1.0, 2.0) AS geometry FROM range(3)").coalesce(1),
        dir + "_native_z_bad", covering = false, encoding = "point_z")
    }
    assert(flat.getMessage.contains("XYZ export requires Z") ||
      Option(flat.getCause).exists(_.getMessage.contains("XYZ export requires Z")),
      flat.getMessage)
  }

  test("native XYM/XYZM write (encoding = point_m / linestring_zm): measures survive the hop") {
    // round 17: all four dimensions write natively, matching the
    // reference's encode.rs:21-74 coverage
    val mOut = dir + "_native_m"
    val mdf = spark.sql("""
      SELECT CAST(id AS INT) AS fid,
             ST_PointM(CAST(id AS DOUBLE), 1.0, CAST(id * 3 AS DOUBLE)) AS geometry
      FROM range(12)""")
    GeoParquet.write(mdf.coalesce(1), mOut, covering = false, encoding = "point_m")
    assert(GeoParquet.metadata(spark, mOut).get.columns.head.encoding == "point")
    assert(spark.read.parquet(mOut).schema("geometry").dataType.simpleString ==
      "struct<x:double,y:double,m:double>")
    val mBack = GeoParquet.read(spark, mOut)
    val ma = mdf.selectExpr("fid", "ST_AsText(geometry) w")
    val mb = mBack.selectExpr("fid", "ST_AsText(geometry) w")
    assert(ma.except(mb).isEmpty && mb.except(ma).isEmpty, "native point_m parquet roundtrip")
    val zmOut = dir + "_native_zm"
    val zmdf = spark.sql("""
      SELECT CAST(id AS INT) AS fid,
             ST_GeomFromText(CONCAT('LINESTRING ZM(0 0 1 2, ', CAST(id AS STRING), ' 3 4 5)')) AS geometry
      FROM range(9)""")
    GeoParquet.write(zmdf.coalesce(1), zmOut, covering = false, encoding = "linestring_zm")
    assert(spark.read.parquet(zmOut).schema("geometry").dataType.simpleString ==
      "array<struct<x:double,y:double,z:double,m:double>>")
    val zmBack = GeoParquet.read(spark, zmOut)
    val za = zmdf.selectExpr("fid", "ST_AsText(geometry) w")
    val zb = zmBack.selectExpr("fid", "ST_AsText(geometry) w")
    assert(za.except(zb).isEmpty && zb.except(za).isEmpty, "native linestring_zm parquet roundtrip")
    // Z-only input through a _zm encoding fails loudly (no fabricated measure)
    val half = intercept[Exception] {
      GeoParquet.write(spark.sql(
        "SELECT ST_PointZ(1.0, 2.0, 3.0) AS geometry FROM range(3)").coalesce(1),
        dir + "_native_zm_bad", covering = false, encoding = "point_zm")
    }
    assert(half.getMessage.contains("XYZM export requires") ||
      Option(half.getCause).exists(_.getMessage.contains("XYZM export requires")),
      half.getMessage)
  }

  test("native point write roundtrips POINT EMPTY as the NaN pair (empty back, not null)") {
    val out = dir + "_native_empty"
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS fid,
             CASE CAST(id % 3 AS INT)
               WHEN 0 THEN ST_Point(CAST(id AS DOUBLE), 1.0)
               WHEN 1 THEN ST_GeomFromText('POINT EMPTY')
               ELSE NULL
             END AS geometry
      FROM range(9)""")
    GeoParquet.write(df.coalesce(1), out, covering = false, encoding = "point")
    val back = GeoParquet.read(spark, out)
    val r = back.selectExpr(
      "SUM(CASE WHEN geometry IS NULL THEN 1 ELSE 0 END) AS nn",
      "SUM(CASE WHEN geometry IS NOT NULL AND ST_IsEmpty(geometry) THEN 1 ELSE 0 END) AS ne").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3,
      s"EMPTY/NULL must stay distinct through the native point hop: $r")
  }

  test("ga_to_* export kernels roundtrip through ga_* decode") {
    val r = sql("""
      SELECT ST_AsText(ga_polygon(ga_to_polygon(g), false, false)) AS rt,
             ST_AsText(ga_linestring(ga_to_linestring(l), false, false)) AS rtl
      FROM (SELECT ST_GeomFromText(
              'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))') AS g,
            ST_GeomFromText('LINESTRING (0 0, 3 4, 10 0)') AS l)""").head()
    assert(r.getString(0) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    assert(r.getString(1) == "LINESTRING (0 0, 3 4, 10 0)")
  }

  test("spatialSort: per-file bboxes become tight (pushdown actually prunes)") {
    def partBoxes(path: String): Seq[(Double, Double, Double, Double)] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap(f => GeoParquet.metadata(spark, f.toString).flatMap(_.columns.head.bbox))
    def area(b: (Double, Double, Double, Double)): Double = (b._3 - b._1) * (b._4 - b._2)
    // 2500 points on a 50×50 grid in random row order
    val df = spark.sql("""
      SELECT id, ST_Point(CAST(hash(id) % 50 + 49 AS DOUBLE),
                          CAST(hash(id * 7) % 50 + 49 AS DOUBLE)) AS geometry
      FROM range(2500)""")
    val globalArea = 98.0 * 98.0 // coords span [-1+50=?]: hash%50 in (-49,49) → ~98 wide
    val sortedDir = dir + "_hsorted"
    val unsortedDir = dir + "_hunsorted"
    GeoParquet.write(GeoParquet.spatialSort(df, numPartitions = 8), sortedDir)
    GeoParquet.write(df.repartition(8), unsortedDir)
    val sortedBoxes = partBoxes(sortedDir)
    val unsortedBoxes = partBoxes(unsortedDir)
    assert(sortedBoxes.size >= 4 && unsortedBoxes.size >= 4)
    val sortedAvg = sortedBoxes.map(area).sum / sortedBoxes.size
    val unsortedAvg = unsortedBoxes.map(area).sum / unsortedBoxes.size
    // hilbert clustering: each file covers a small fraction of the extent;
    // round-robin: each file covers nearly all of it
    assert(sortedAvg < unsortedAvg / 2.5,
      s"sortedAvg=$sortedAvg unsortedAvg=$unsortedAvg")
    assert(unsortedAvg > globalArea * 0.5)
    // and values survive the clustering untouched
    val back = GeoParquet.read(spark, sortedDir)
    assert(back.count() == 2500)
  }

  test("write propagates CRS from read-attached field metadata") {
    val crsDir = dir + "_crsprop"
    val df = GeoParquet.read(spark, written) // carries geoparquet.crs metadata
    GeoParquet.write(df.drop("bbox"), crsDir) // no crs argument
    val meta = GeoParquet.metadata(spark, crsDir).get
    assert(meta.columns.head.crs.exists(_.contains("4326")),
      s"CRS must survive read→write→read without caller involvement: $meta")
  }

  test("wkbTypeTag header parse agrees with the full JTS parse across the matrix") {
    import graft.core.GeomOps
    val wkts = Seq(
      "POINT (1 2)", "POINT Z(1 2 3)", "POINT M(1 2 4)", "POINT ZM(1 2 3 4)",
      "LINESTRING (0 0, 1 1)", "LINESTRING Z(0 0 1, 1 1 2)",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "MULTIPOINT ((1 1), (2 2))", "MULTILINESTRING ((0 0, 1 1))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 1))")
    for (wkt <- wkts) {
      val wkb = GeomOps.geomFromText(
        org.apache.spark.unsafe.types.UTF8String.fromString(wkt)) // our writer's EWKB-flagged bytes
      val (name, hasZ) = graft.sources.GeoParquetFileFormat.wkbTypeTag(wkb).get
      val g = GeomOps.read(wkb)
      assert(name == g.getGeometryType, s"$wkt: $name vs ${g.getGeometryType}")
      val expectZ = !java.lang.Double.isNaN(g.getCoordinate.getZ)
      assert(hasZ == expectZ, s"$wkt: hasZ=$hasZ")
    }
    // ISO-coded big-endian bytes (other tools' WKB): POINT Z = 1001, BE
    val isoBe = Array[Byte](0, 0, 0, 3, -23) ++ Array.fill(24)(0: Byte) // 1001 = 0x3E9
    assert(graft.sources.GeoParquetFileFormat.wkbTypeTag(isoBe).contains(("Point", true)))
    // garbage stays None, never a wrong tag
    assert(graft.sources.GeoParquetFileFormat.wkbTypeTag(Array[Byte](1, 99, 0, 0, 0)).isEmpty)
    assert(graft.sources.GeoParquetFileFormat.wkbTypeTag(null).isEmpty)
  }

  test("footer rewrite runs in executor tasks, not on the driver") {
    val taskDir = dir + "_taskrewrite"
    val df = spark.sql("""
      SELECT /*+ REPARTITION(5) */ id, ST_Point(CAST(id AS DOUBLE), 1.0) AS geometry
      FROM range(500)""")
    df.write.mode("overwrite").parquet(taskDir) // plain parquet, no geo KV yet
    val parts = new java.io.File(taskDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == 5)
    // addGeoMetadata returns the count of footers rewritten INSIDE Spark
    // tasks (accumulator only incremented under a live TaskContext) — equal
    // to the part count means zero driver-side byte copies
    val inTask = GeoParquet.addGeoMetadata(spark, taskDir, "geometry",
      crs = None, covering = None)
    assert(inTask == parts.toLong,
      s"expected all $parts footer rewrites to run in executor tasks, got $inTask")
    assert(GeoParquet.metadata(spark, taskDir).exists(_.primaryColumn == "geometry"))
    assert(spark.read.parquet(taskDir).count() == 500)
  }

  test("metadata reconciles >64 part-files (footer reads take the Spark-job path)") {
    val manyDir = dir + "_many"
    val df = spark.sql(
      "SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(700)")
      .repartition(70)
    GeoParquet.write(df, manyDir, covering = false)
    val m = GeoParquet.metadata(spark, manyDir).get
    assert(m.primaryColumn == "geometry")
    assert(m.columns.head.geometryTypes == Seq("Point"))
    assert(spark.read.parquet(manyDir).count() == 700)
  }

  test("empty and null-geometry writes still produce valid geo footers") {
    // zero rows: footer carries encoding + unconstrained types, no bbox
    val emptyDir = dir + "_empty"
    val empty = spark.sql(
      "SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(0)")
    GeoParquet.write(empty, emptyDir)
    val me = GeoParquet.metadata(spark, emptyDir).get
    assert(me.columns.head.encoding == "WKB")
    assert(me.columns.head.geometryTypes.isEmpty && me.columns.head.bbox.isEmpty)
    assert(GeoParquet.read(spark, emptyDir).count() == 0)

    // null geometries among real rows: bbox/types track the non-null subset
    val nullDir = dir + "_nulls"
    val withNulls = spark.sql("""
      SELECT id, CASE WHEN id % 3 = 0 THEN NULL
                      ELSE ST_Point(CAST(id AS DOUBLE), 1.0) END AS geometry
      FROM range(30)""")
    GeoParquet.write(withNulls, nullDir)
    val mn = GeoParquet.metadata(spark, nullDir).get
    assert(mn.columns.head.geometryTypes == Seq("Point"))
    // bbox spans only ids with a geometry (1..29 minus multiples of 3)
    assert(mn.columns.head.bbox.contains((1.0, 1.0, 29.0, 1.0)), mn.columns.head.bbox)
    val back = GeoParquet.read(spark, nullDir)
    assert(back.count() == 30 && back.where("geometry IS NULL").count() == 10)
  }

  test("multi-geometry-column write: both columns in the footer, per-column CRS/types") {
    val multiDir = dir + "_multi"
    val df = spark.sql("""
      SELECT /*+ REPARTITION(2) */ id,
             ST_Point(CAST(id AS DOUBLE), 1.0) AS geometry,
             ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0, CAST(id AS DOUBLE) + 1, 2.0) AS boundary
      FROM range(100)""")
    GeoParquet.write(df, multiDir, secondaryGeometry = Seq("boundary"),
      crs = Some("""{"id":{"authority":"EPSG","code":4326}}"""))
    val m = GeoParquet.metadata(spark, multiDir).get
    assert(m.primaryColumn == "geometry")
    assert(m.columns.map(_.name).sorted == Seq("boundary", "geometry"))
    val prim = m.columns.find(_.name == "geometry").get
    val sec = m.columns.find(_.name == "boundary").get
    assert(prim.geometryTypes == Seq("Point") && prim.covering.contains("bbox"))
    assert(sec.geometryTypes == Seq("Polygon") && sec.covering.isEmpty)
    assert(prim.crs.exists(_.contains("4326")) && sec.crs.exists(_.contains("4326")))
    // read attaches metadata to BOTH columns; discovery reports both
    val back = GeoParquet.read(spark, multiDir)
    assert(back.schema("boundary").metadata.getString("geoparquet.encoding") == "WKB")
    assert(graft.functions.GeoFunctions.geometryColumns(back.schema).toSet ==
      Set("geometry", "boundary"))
    assert(back.count() == 100)
  }

  test("partitioned dataset (partitionBy): metadata recursion + pruning") {
    val partDir = dir + "_partby"
    val df = spark.sql("""
      SELECT id, CASE WHEN id < 60 THEN 'east' ELSE 'west' END AS region,
             ST_Point(CAST(id AS DOUBLE), CAST(id % 10 AS DOUBLE)) AS geometry
      FROM range(100)""")
    GeoParquet.write(df, partDir, partitionBy = Seq("region"),
      crs = Some("""{"id":{"authority":"EPSG","code":4326}}"""))
    // part-files live one level down (region=east/, region=west/) — metadata
    // must recurse, reconcile CRS, union bbox, and keep geometry_types
    val m = GeoParquet.metadata(spark, partDir).get
    val gc = m.columns.find(_.name == "geometry").get
    assert(gc.crs.exists(_.contains("4326")))
    assert(gc.bbox.contains((0.0, 0.0, 99.0, 9.0)), s"unioned bbox: ${gc.bbox}")
    assert(gc.geometryTypes == Seq("Point"))
    assert(gc.covering.contains("bbox"))
    // read back: partition column survives, values intact, bbox read prunes
    val back = GeoParquet.read(spark, partDir)
    assert(back.columns.contains("region") && back.count() == 100)
    val q = GeoParquet.read(spark, partDir, bbox = Some((70.0, -1.0, 79.0, 11.0)))
    assert(q.count() == 10)
    assert(q.where(col("region") === "east").count() == 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bbox.xmin"),
      s"covering-leaf filters must reach the partitioned parquet scan:\n$plan")
  }

  /** Rows the parquet scan actually DECODED (post-action metric) — pruned
    * row groups never reach the decoder, so this is the skip proof. */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
    finalPlan(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("native covering-less bbox read: row groups skipped via coord-leaf stats (point layout)") {
    // Externally-produced shape: NATIVE point encoding, NO covering struct.
    // Small parquet.block.size forces many row groups per part-file so the
    // skip is visible WITHIN files, not just across them.
    val out = dir + "_native_nocov"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val pts = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Point(CAST(id % 64 AS DOUBLE), CAST(CAST(id / 64 AS INT) AS DOUBLE)) AS geometry
        FROM range(4096)""")
      GeoParquet.write(GeoParquet.spatialSort(pts, numPartitions = 4), out,
        covering = false, encoding = "point")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
    }
    val m = GeoParquet.metadata(spark, out).get.columns.head
    assert(m.encoding == "point" && m.covering.isEmpty, s"fixture must be native covering-less: $m")
    // corner query window: 7×7 of the 64×64 grid
    val q = GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5)))
      .selectExpr("fid", "CAST(ST_X(geometry) AS BIGINT) AS x", "CAST(ST_Y(geometry) AS BIGINT) AS y")
    val rows = q.collect()
    // correctness: exactly the strictly-inside grid points, same as a full scan
    assert(rows.length == 49, s"expected 49 surviving points, got ${rows.length}")
    val expected = (for (y <- 21 to 27; x <- 11 to 17) yield (y * 64 + x).toLong).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
    // the skip: decoded rows are a small fraction of the 4096 total — row
    // groups whose x/y leaf stats miss the window were never decoded
    val decoded = scannedRows(GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5))))
    assert(decoded >= 49 && decoded < 4096 / 2,
      s"stats pruning must skip most row groups: decoded $decoded of 4096")
    // control: the same file without bbox decodes everything
    assert(scannedRows(GeoParquet.read(spark, out)) == 4096)
    // a window that misses the whole extent decodes NOTHING — every split
    // returns empty after footer-only IO (the file-level skip case)
    val miss = GeoParquet.read(spark, out, bbox = Some((500.0, 500.0, 510.0, 510.0)))
    assert(miss.count() == 0)
    assert(scannedRows(GeoParquet.read(spark, out, bbox = Some((500.0, 500.0, 510.0, 510.0)))) == 0,
      "fully-pruned read must decode zero rows")
  }

  test("native bbox read: row-level refine pushes point leaves to the scan, skips pages") {
    val out = dir + "_native_rowrefine"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevPage = hc.get("parquet.page.size")
    val prevRows = hc.get("parquet.page.row.count.limit")
    // LARGE row groups with MANY SMALL PAGES inside: the row-group prune
    // keeps whole groups, the page-level (column index) skip inside
    // partially-matching groups is what this test isolates
    hc.setInt("parquet.block.size", 4 * 1024 * 1024)
    hc.setInt("parquet.page.size", 1024)
    hc.setInt("parquet.page.row.count.limit", 256)
    try {
      val pts = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Point(CAST(id % 64 AS DOUBLE), CAST(CAST(id / 64 AS INT) AS DOUBLE)) AS geometry
        FROM range(16384)""")
      GeoParquet.write(GeoParquet.spatialSort(pts, numPartitions = 1), out,
        covering = false, encoding = "point")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
      if (prevPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", prevPage)
      if (prevRows == null) hc.unset("parquet.page.row.count.limit")
      else hc.set("parquet.page.row.count.limit", prevRows)
    }
    val q = GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5)))
    // the raw struct-leaf envelope comparisons reach the parquet scan as
    // pushed filters (nested predicate pushdown) — the page-skip contract
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("geometry.x"),
      s"point-leaf filters must push to the scan:\n${plan.take(2000)}")
    // correctness unchanged
    val rows = q.selectExpr("fid").collect().map(_.getLong(0)).toSet
    assert(rows == (for (y <- 21 to 27; x <- 11 to 17) yield (y * 64 + x).toLong).toSet)
    // decode gauge: within surviving row groups, column-index page skipping
    // decodes a small fraction of the 16384 rows — strictly tighter than
    // the row-group-only bound (a 4 MB block holds ALL rows: group-level
    // pruning alone could not skip anything here)
    val decoded = scannedRows(GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5))))
    assert(decoded >= 49 && decoded <= 16384 / 4,
      s"page-level refine must skip most pages: decoded $decoded of 16384")
    // nested layout (polygon): no pushdown possible, but the pre-transcode
    // refine still returns exactly the right rows
    val outPoly = dir + "_native_rowrefine_poly"
    val hc2 = spark.sparkContext.hadoopConfiguration
    val prevBlock2 = hc2.get("parquet.block.size")
    hc2.setInt("parquet.block.size", 16 * 1024)
    try {
      val polys = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Buffer(ST_Point(CAST(id % 32 AS DOUBLE) * 4, CAST(CAST(id / 32 AS INT) AS DOUBLE) * 4), 0.5) AS geometry
        FROM range(1024)""")
      GeoParquet.write(GeoParquet.spatialSort(polys, numPartitions = 2), outPoly,
        covering = false, encoding = "polygon")
    } finally {
      if (prevBlock2 == null) hc2.unset("parquet.block.size") else hc2.set("parquet.block.size", prevBlock2)
    }
    val polyQ = GeoParquet.read(spark, outPoly, bbox = Some((15.9, 15.9, 24.1, 24.1)))
    val polyFull = GeoParquet.read(spark, outPoly)
      .where("ST_Intersects(geometry, ST_MakeEnvelope(15.9, 15.9, 24.1, 24.1))")
    assert(polyQ.select("fid").collect().map(_.getLong(0)).toSet ==
      polyFull.select("fid").collect().map(_.getLong(0)).toSet)
  }

  test("nested list layout: page-stats row ranges prune partially-matching row groups") {
    // parquet-mr refuses page FILTERS on repeated leaves (so polygon
    // layouts get no pushed-filter page skip), but it still WRITES
    // column/offset indexes for them: per-page x/y min-max + first-row
    // spans. A row group whose halves occupy disjoint corners has an
    // AGGREGATE box covering both — the window below hits the box, yet the
    // rows whose x pages reach it and the rows whose y pages reach it
    // never overlap, which proves no row can match and the whole group is
    // skipped before any decode.
    val out = dir + "_native_pagejudge_poly"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevRows = hc.get("parquet.page.row.count.limit")
    hc.setInt("parquet.block.size", 8 * 1024 * 1024) // ONE row group
    hc.setInt("parquet.page.row.count.limit", 256)   // many pages inside it
    try {
      // rows 0..2047: x∈[0,6.4], y∈[100,106.5); rows 2048..4095: x∈[50,56.4], y∈[0,6.5)
      val polys = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               CASE WHEN id < 2048
                 THEN ST_MakeEnvelope(
                   CAST(id % 64 AS DOUBLE) * 0.1,
                   100.0 + CAST(CAST(id / 64 AS INT) AS DOUBLE) * 0.2,
                   CAST(id % 64 AS DOUBLE) * 0.1 + 0.05,
                   100.0 + CAST(CAST(id / 64 AS INT) AS DOUBLE) * 0.2 + 0.05)
                 ELSE ST_MakeEnvelope(
                   50.0 + CAST(id % 64 AS DOUBLE) * 0.1,
                   CAST(CAST((id - 2048) / 64 AS INT) AS DOUBLE) * 0.2,
                   50.0 + CAST(id % 64 AS DOUBLE) * 0.1 + 0.05,
                   CAST(CAST((id - 2048) / 64 AS INT) AS DOUBLE) * 0.2 + 0.05)
               END AS geometry
        FROM range(4096)""")
      GeoParquet.write(polys.repartition(1).sortWithinPartitions("fid"), out,
        covering = false, encoding = "polygon")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
      if (prevRows == null) hc.unset("parquet.page.row.count.limit")
      else hc.set("parquet.page.row.count.limit", prevRows)
    }
    // the window hits the group's aggregate box ([0,56.45]×[0,106.55]) but
    // x-hit rows (first half) and y-hit rows (second half) are disjoint
    graft.sources.GeoParquetFileFormat.pageRefinePrunedGroups.reset()
    val decoded = scannedRows(GeoParquet.read(spark, out, bbox = Some((2.0, 2.0, 4.0, 4.0))))
    assert(decoded == 0,
      s"page-range refine must skip the partially-matching group: decoded $decoded of 4096")
    assert(graft.sources.GeoParquetFileFormat.pageRefinePrunedGroups.sum() >= 1,
      "the page-level re-judge must be what pruned it")
    assert(GeoParquet.read(spark, out, bbox = Some((2.0, 2.0, 4.0, 4.0))).count() == 0)
    // a window that genuinely matches first-half rows keeps the group and
    // returns exactly the full-scan-refined set
    val q = GeoParquet.read(spark, out, bbox = Some((2.0, 100.5, 4.0, 104.0)))
    val full = GeoParquet.read(spark, out)
      .where("ST_Intersects(geometry, ST_MakeEnvelope(2.0, 100.5, 4.0, 104.0))")
    val got = q.select("fid").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == full.select("fid").collect().map(_.getLong(0)).toSet)
  }

  test("statsPrunedRead: footer parsed once per file across many splits") {
    val out = dir + "_native_footercache"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val pts = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Point(CAST(id % 64 AS DOUBLE), CAST(CAST(id / 64 AS INT) AS DOUBLE)) AS geometry
        FROM range(16384)""")
      // ONE part-file, many row groups — so many splits share one footer
      GeoParquet.write(GeoParquet.spatialSort(pts, numPartitions = 1), out,
        covering = false, encoding = "point")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
    }
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val q = GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5)))
        .selectExpr("fid")
      // the plan must actually have split the file — otherwise this test
      // proves nothing about per-split reuse
      val parts = q.rdd.getNumPartitions
      assert(parts > 2, s"expected a multi-split scan, got $parts partitions")
      graft.sources.GeoParquetFileFormat.prunedFooterOpens.reset()
      assert(q.count() == 49)
      val opens = graft.sources.GeoParquetFileFormat.prunedFooterOpens.sum()
      assert(opens <= 1,
        s"footer must be parsed at most once per distinct file (was $opens for $parts splits)")
      // second query over the same file: zero opens (digest cached)
      graft.sources.GeoParquetFileFormat.prunedFooterOpens.reset()
      assert(GeoParquet.read(spark, out, bbox = Some((0.5, 0.5, 5.5, 5.5))).count() == 25)
      assert(graft.sources.GeoParquetFileFormat.prunedFooterOpens.sum() == 0,
        "repeated reads of an unchanged file must reuse the cached footer digest")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("native covering-less bbox read: pruned == full-scan-filtered for random windows") {
    // equivalence property over the stats-pruning planner: for ANY window
    // (incl. degenerate, off-extent, negative-coord, and sliver shapes),
    // the pruned read returns exactly the rows a full scan + envelope
    // filter would — row groups may be skipped, rows may not
    val out = dir + "_native_nocov_prop"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val pts = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Point(CAST(id % 64 AS DOUBLE) - 32.0, CAST(CAST(id / 64 AS INT) AS DOUBLE) - 32.0) AS geometry
        FROM range(4096)""")
      GeoParquet.write(GeoParquet.spatialSort(pts, numPartitions = 4), out,
        covering = false, encoding = "point")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
    }
    val full = GeoParquet.read(spark, out)
    full.createOrReplaceTempView("prop_full")
    val rnd = new scala.util.Random(7)
    val windows = Seq(
      (-100.0, -100.0, -90.0, -90.0),   // fully off-extent
      (-32.5, -32.5, 31.5, 31.5),       // whole extent
      (0.0, 0.0, 0.0, 0.0),             // degenerate point window
      (-5.0, -40.0, -4.9, 40.0)         // sliver column
    ) ++ (0 until 8).map { _ =>
      val x0 = rnd.nextDouble() * 80 - 40; val y0 = rnd.nextDouble() * 80 - 40
      (x0, y0, x0 + rnd.nextDouble() * 30, y0 + rnd.nextDouble() * 30)
    }
    windows.foreach { case (x0, y0, x1, y1) =>
      val pruned = GeoParquet.read(spark, out, bbox = Some((x0, y0, x1, y1)))
        .selectExpr("fid").collect().map(_.getLong(0)).toSet
      val expected = spark.sql(
        s"""SELECT fid FROM prop_full
            WHERE ST_X(geometry) BETWEEN $x0 AND $x1 AND ST_Y(geometry) BETWEEN $y0 AND $y1""")
        .collect().map(_.getLong(0)).toSet
      assert(pruned == expected,
        s"window ($x0,$y0,$x1,$y1): pruned ${pruned.size} vs expected ${expected.size}; " +
          s"missing=${(expected -- pruned).take(5)} extra=${(pruned -- expected).take(5)}")
    }
  }

  test("native covering-less bbox read: partitionBy layout prunes per leaf file") {
    // partition dirs + native encoding + no covering: the stats-pruning
    // reader must coexist with partition discovery (partition column rides
    // as a directory value, row groups prune within each leaf file)
    val out = dir + "_native_nocov_part"
    val pts = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             CASE WHEN id < 2048 THEN 'west' ELSE 'east' END AS side,
             ST_Point(CAST(id % 64 AS DOUBLE), CAST(CAST(id / 64 AS INT) AS DOUBLE)) AS geometry
      FROM range(4096)""")
    GeoParquet.write(pts, out, covering = false, encoding = "point",
      partitionBy = Seq("side"))
    val q = GeoParquet.read(spark, out, bbox = Some((10.5, 20.5, 17.5, 27.5)))
    val rows = q.selectExpr("fid", "side").collect()
    // same 49 surviving grid points as the flat-layout test; ids 11..17 +
    // 64*(21..27) are all < 2048 → all 'west'
    assert(rows.length == 49 && rows.forall(_.getString(1) == "west"))
    val expected = (for (y <- 21 to 27; x <- 11 to 17) yield (y * 64 + x).toLong).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
  }

  test("edges metadata: footer roundtrip, column stamp, measure dispatch") {
    import graft.functions.GeoFunctions
    val line = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_MakeLine(ST_Point(0.0, 0.0), ST_Point(CAST(1 AS DOUBLE), 0.0)) AS geometry
      FROM range(3)""")
    // spherical: footer records edges, read stamps it, dispatch = haversine
    val outS = dir + "_edges_sph"
    GeoParquet.write(line, outS, edges = Some("spherical"))
    assert(GeoParquet.metadata(spark, outS).get.columns.head.edges.contains("spherical"))
    val backS = GeoParquet.read(spark, outS)
    assert(backS.schema("geometry").metadata.getString("geoparquet.edges") == "spherical")
    val oneDeg = 6371008.8 * math.Pi / 180.0 // 1 deg of equatorial great circle
    val lenS = backS.select(GeoFunctions.edgeLength(backS)).head().getDouble(0)
    assert(math.abs(lenS - oneDeg) < 1e-6, s"spherical dispatch: $lenS vs $oneDeg")
    // read→write propagation: rewriting the stamped frame keeps edges
    val outS2 = dir + "_edges_sph2"
    GeoParquet.write(backS, outS2)
    assert(GeoParquet.metadata(spark, outS2).get.columns.head.edges.contains("spherical"))
    // perimeter dispatch: spherical composes haversine over the boundary
    val sq = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_MakeEnvelope(0.0, 0.0, 1.0, 1.0) AS geometry FROM range(2)""")
    val outSq = dir + "_edges_sq"
    GeoParquet.write(sq, outSq, edges = Some("spherical"))
    val backSq = GeoParquet.read(spark, outSq)
    val perim = backSq.select(GeoFunctions.edgePerimeter(backSq)).head().getDouble(0)
    val perimDirect = backSq.selectExpr("ST_LengthSphere(ST_Boundary(geometry))").head().getDouble(0)
    assert(perim == perimDirect && perim > 4 * 110000.0 && perim < 4 * 112000.0,
      s"spherical perimeter dispatch: $perim vs $perimDirect")
    // planar control is the cartesian perimeter
    assert(sq.select(GeoFunctions.edgePerimeter(sq)).head().getDouble(0) == 4.0)
    // planar (no declaration): dispatch = euclidean degrees
    val outP = dir + "_edges_pla"
    GeoParquet.write(line, outP)
    assert(GeoParquet.metadata(spark, outP).get.columns.head.edges.isEmpty)
    val backP = GeoParquet.read(spark, outP)
    assert(!backP.schema("geometry").metadata.contains("geoparquet.edges"))
    assert(backP.select(GeoFunctions.edgeLength(backP)).head().getDouble(0) == 1.0)
    // each spheroid name routes to ITS named kernel — pinned by exact
    // double equality against the kernel called directly, on a long
    // diagonal where Karney-exact and the Andoyer approximation visibly
    // differ (so a wrong route can't hide inside a tolerance)
    val diag = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_MakeLine(ST_Point(2.0, 41.0), ST_Point(55.0, -21.0)) AS geometry
      FROM range(2)""")
    def dispatched(edgesName: String): Double = {
      val out = dir + "_edges_" + edgesName
      GeoParquet.write(diag, out, edges = Some(edgesName))
      val back = GeoParquet.read(spark, out)
      back.select(GeoFunctions.edgeLength(back)).head().getDouble(0)
    }
    def direct(fn: String): Double =
      diag.selectExpr(s"$fn(geometry)").head().getDouble(0)
    val kar = dispatched("karney")
    val and = dispatched("andoyer")
    val vin = dispatched("vincenty")
    assert(kar == direct("ST_LengthGeodesic"), "karney must route to the Karney-exact kernel")
    assert(and == direct("ST_LengthSpheroid"), "andoyer must route to the Andoyer kernel")
    assert(vin == direct("ST_LengthVincenty"), "vincenty must route to the Vincenty kernel")
    // Karney-exact and Andoyer genuinely differ on this line (else the
    // routing assertions above would be vacuous); Vincenty agrees with
    // Karney to sub-mm (same ellipsoid geodesic, iterative solution)
    assert(math.abs(kar - and) > 0.01, s"kernels indistinguishable: kar=$kar and=$and")
    assert(math.abs(kar - vin) < 0.01, s"vincenty vs karney: $vin vs $kar")
    // footer vocabulary: GeoParquet 1.1 `edges` admits only planar|spherical,
    // so a spheroid family must footer-encode as edges=spherical + the exact
    // model in the auxiliary graft:edges_model key (round-tripped above by
    // the dispatch assertions); external validators never see 'karney'
    def rawGeoKv(path: String): String = {
      val f = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getKeyValueMetaData.get("geo") finally r.close()
    }
    val karKv = rawGeoKv(dir + "_edges_karney")
    assert(karKv.contains("\"edges\":\"spherical\""), karKv)
    assert(karKv.contains("\"graft:edges_model\":\"karney\""), karKv)
    assert(!karKv.contains("\"edges\":\"karney\""), karKv)
    val sphKv = rawGeoKv(outS)
    assert(sphKv.contains("\"edges\":\"spherical\"") && !sphKv.contains("graft:edges_model"), sphKv)
    // ── SQL-level dispatch (GeoFunctions.build's edgesDispatch): plain ST_Length/ST_Area/
    // ST_Perimeter over the stamped column rewrite to the declared model
    backS.createOrReplaceTempView("edges_sph_view")
    val sqlLen = spark.sql("SELECT ST_Length(geometry) AS l FROM edges_sph_view")
      .head().getDouble(0)
    assert(math.abs(sqlLen - oneDeg) < 1e-6, s"SQL dispatch must be haversine: $sqlLen")
    val sqlPer = spark.sql(
      "SELECT ST_Perimeter(ST_MakeEnvelope(0.0, 0.0, 1.0, 1.0)) AS p FROM edges_sph_view LIMIT 1")
      .head().getDouble(0)
    assert(sqlPer == 4.0, "literal (unstamped) geometry keeps the planar measure")
    // a DERIVED geometry keeps the measure the user wrote (the derivation
    // may not preserve the edge model) — conservative scope
    val derived = spark.sql(
      "SELECT ST_Length(ST_Simplify(geometry, 0.0)) AS l FROM edges_sph_view").head().getDouble(0)
    assert(derived == 1.0, s"derived geometry must stay planar: $derived")
    // kill switch restores planar behavior for the direct reference too
    spark.conf.set("spark.graft.edges.dispatch", "false")
    try {
      val off = spark.sql("SELECT ST_Length(geometry) AS l FROM edges_sph_view").head().getDouble(0)
      assert(off == 1.0, s"disabled dispatch must measure planar: $off")
    } finally spark.conf.unset("spark.graft.edges.dispatch")

    // an unknown declaration is rejected at the PRODUCER — a typo must not
    // poison the footer with a model no reader can honor
    intercept[IllegalArgumentException] {
      GeoParquet.write(line, dir + "_edges_bogus", edges = Some("mercatorish"))
    }
    // ...and a frame stamped with one (externally produced file) fails
    // loudly at dispatch instead of silently measuring planar
    val bogusMd = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("geoparquet.edges", "mercatorish").build()
    val bogus = line.select(org.apache.spark.sql.functions.col("fid"),
      org.apache.spark.sql.functions.col("geometry").as("geometry", bogusMd))
    intercept[IllegalArgumentException] { GeoFunctions.edgeLength(bogus) }
    // …but the IMPLICIT SQL dispatch must NOT break every plain measure
    // over an externally-stamped table: unknown model → planar, the
    // pre-dispatch behavior (only the explicit helpers are loud)
    bogus.createOrReplaceTempView("edges_bogus_view")
    assert(spark.sql("SELECT ST_Length(geometry) AS l FROM edges_bogus_view")
      .head().getDouble(0) == 1.0,
      "unknown external stamp keeps the planar measure in implicit dispatch")
  }

  test("edges dispatch: ST_Distance/ST_DWithin honor the declared model") {
    import graft.functions.GeoFunctions
    import org.apache.spark.sql.functions.{col, lit}
    val pts = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(3)""")
    val outS = dir + "_edges_dist_sph"
    GeoParquet.write(pts, outS, edges = Some("spherical"))
    val backS = GeoParquet.read(spark, outS)
    backS.createOrReplaceTempView("edges_dist_sph")
    val oneDeg = 6371008.8 * math.Pi / 180.0
    // plain SQL over the stamped column → haversine meters
    val d = spark.sql(
      "SELECT ST_Distance(geometry, ST_Point(0.0, 0.0)) AS d FROM edges_dist_sph WHERE fid = 1")
      .head().getDouble(0)
    assert(math.abs(d - oneDeg) < 1e-6, s"spherical ST_Distance dispatch: $d vs $oneDeg")
    // symmetric: stamp on the SECOND argument dispatches too
    val d2 = spark.sql(
      "SELECT ST_Distance(ST_Point(0.0, 0.0), geometry) AS d FROM edges_dist_sph WHERE fid = 1")
      .head().getDouble(0)
    assert(math.abs(d2 - oneDeg) < 1e-6, s"second-arg stamp must dispatch: $d2")
    // ST_DWithin threshold is in model units (meters): 1° ≈ 111 km
    val within = spark.sql(
      s"""SELECT fid, ST_DWithin(geometry, ST_Point(0.0, 0.0), 150000.0) AS w
          FROM edges_dist_sph ORDER BY fid""").collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(within.toSeq == Seq(0L -> true, 1L -> true, 2L -> false),
      s"meter-unit DWithin under spherical model: ${within.toSeq}")
    // per-model routing pinned against the explicit kernels
    for ((model, fn) <- Seq("karney" -> "ST_DistanceGeodesic",
                            "andoyer" -> "ST_DistanceSpheroid",
                            "vincenty" -> "ST_DistanceVincenty")) {
      val out = dir + "_edges_dist_" + model
      GeoParquet.write(pts, out, edges = Some(model))
      val back = GeoParquet.read(spark, out)
      back.createOrReplaceTempView("edges_dist_m")
      val got = spark.sql(
        "SELECT ST_Distance(geometry, ST_Point(10.0, 20.0)) AS d FROM edges_dist_m WHERE fid = 2")
        .head().getDouble(0)
      val want = pts.where(col("fid") === 2)
        .selectExpr(s"$fn(geometry, ST_Point(10.0, 20.0))").head().getDouble(0)
      assert(got == want, s"$model must route to $fn: $got vs $want")
    }
    // explicit helper rides the same model; planar frame stays euclidean
    val helper = backS.where(col("fid") === 1)
      .select(GeoFunctions.edgeDistance(backS, GeoFunctions.st_point(lit(0.0), lit(0.0))))
      .head().getDouble(0)
    assert(math.abs(helper - oneDeg) < 1e-6, s"edgeDistance helper: $helper")
    assert(pts.where(col("fid") === 1)
      .select(GeoFunctions.edgeDistance(pts, GeoFunctions.st_point(lit(0.0), lit(0.0))))
      .head().getDouble(0) == 1.0, "planar edgeDistance = euclidean")
    val hw = backS.select(GeoFunctions.edgeDWithin(backS,
      GeoFunctions.st_point(lit(0.0), lit(0.0)), lit(150000.0)).as("w"), col("fid"))
      .orderBy("fid").collect().map(_.getBoolean(0)).toSeq
    assert(hw == Seq(true, true, false), s"edgeDWithin helper: $hw")
    // kill switch restores planar for distance too
    spark.conf.set("spark.graft.edges.dispatch", "false")
    try {
      val off = spark.sql(
        "SELECT ST_Distance(geometry, ST_Point(0.0, 0.0)) AS d FROM edges_dist_sph WHERE fid = 1")
        .head().getDouble(0)
      assert(off == 1.0, s"disabled dispatch must measure planar: $off")
    } finally spark.conf.unset("spark.graft.edges.dispatch")
    // conflicting declarations between the two sides: planar (with a
    // warning), because no one model is right — pinned so the behavior
    // is deliberate, not dispatch-order luck
    val outK = dir + "_edges_dist_karney2"
    GeoParquet.write(pts, outK, edges = Some("karney"))
    val backK = GeoParquet.read(spark, outK).selectExpr("fid", "geometry AS kgeom")
    val both = backS.join(backK, "fid").where(col("fid") === 1)
    both.createOrReplaceTempView("edges_dist_conflict")
    val conflicted = spark.sql(
      "SELECT ST_Distance(geometry, kgeom) AS d FROM edges_dist_conflict")
      .head().getDouble(0)
    assert(conflicted == 0.0, s"conflicting stamps must fall back planar: $conflicted")
    // derived geometry keeps the planar measure (conservative scope, as g83)
    val derived = spark.sql(
      "SELECT ST_Distance(ST_Centroid(geometry), ST_Point(0.0, 0.0)) AS d " +
        "FROM edges_dist_sph WHERE fid = 1").head().getDouble(0)
    assert(derived == 1.0, s"derived geometry stays planar: $derived")
  }

  test("edges distance dispatch is gated on point-only geometry_types evidence") {
    // the geodesic distance kernels are FIRST-COORDINATE distance; for a
    // line, planar ST_Distance is true geometry distance (0 for a point ON
    // the line) while first-vertex haversine would be ~55 km — an automatic
    // rewrite over non-point geometry would silently change semantics, so
    // the dispatch must keep the planar measure and warn
    val lines = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_MakeLine(ST_Point(CAST(id AS DOUBLE), 0.0),
                         ST_Point(CAST(id AS DOUBLE) + 1.0, 0.0)) AS geometry
      FROM range(3)""")
    val out = dir + "_edges_dist_lines"
    GeoParquet.write(lines, out, edges = Some("spherical"))
    val back = GeoParquet.read(spark, out)
    // the footer constrains the column to LineString — stamped, not point
    assert(back.schema("geometry").metadata.getString("geoparquet.edges") == "spherical")
    assert(back.schema("geometry").metadata
      .getString("geoparquet.geometry_types").contains("LineString"))
    back.createOrReplaceTempView("edges_dist_lines")
    val d = spark.sql(
      "SELECT ST_Distance(geometry, ST_Point(0.5, 0.0)) AS d FROM edges_dist_lines WHERE fid = 0")
      .head().getDouble(0)
    assert(d == 0.0, s"line-typed stamped column must keep planar geometry distance: $d")
    // dWithin inherits the same gate: threshold stays in planar units
    val w = spark.sql(
      "SELECT ST_DWithin(geometry, ST_Point(0.5, 0.1), 0.2) AS w FROM edges_dist_lines WHERE fid = 0")
      .head().getBoolean(0)
    assert(w, "planar dWithin over the gated line column")
    // UNARY measures are whole-geometry kernels — they still dispatch:
    // spherical length of a 1-degree equatorial segment is ~111.195 km
    val len = spark.sql(
      "SELECT ST_Length(geometry) AS l FROM edges_dist_lines WHERE fid = 0")
      .head().getDouble(0)
    assert(math.abs(len - 6371008.8 * math.Pi / 180.0) < 1e-6,
      s"unary measures keep dispatching for line columns: $len")
  }

  test("zero-row part-files do not defeat the dataset geometry_types/bbox union") {
    // a writer task that received an empty partition observes
    // `geometry_types: []` and no bbox — vacuous, must not collapse the
    // dataset-level constraint (it gates the edges distance dispatch)
    val pts = spark.sql(
      "SELECT CAST(id AS BIGINT) AS fid, ST_Point(CAST(id AS DOUBLE), 1.0) AS geometry FROM range(3)")
      .repartition(8) // more partitions than rows → guaranteed empty tasks
    val out = dir + "_empty_parts"
    GeoParquet.write(pts, out)
    val meta = GeoParquet.metadata(spark, out).get
    val c = meta.columns.find(_.name == "geometry").get
    assert(c.geometryTypes == Seq("Point"), s"types union: ${c.geometryTypes}")
    assert(c.bbox.contains((0.0, 1.0, 2.0, 1.0)), s"bbox union: ${c.bbox}")
  }

  test("native covering-less bbox read: nested list layout (polygon) also prunes") {
    // polygon native layout nests coords under list/list/element — the leaf
    // path still ends in x/y, so the same stats planning applies
    val out = dir + "_native_poly_nocov"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val polys = spark.sql("""
        SELECT CAST(id AS BIGINT) AS fid,
               ST_Buffer(ST_Point(CAST(id % 32 AS DOUBLE) * 4, CAST(CAST(id / 32 AS INT) AS DOUBLE) * 4), 0.5) AS geometry
        FROM range(1024)""")
      GeoParquet.write(GeoParquet.spatialSort(polys, numPartitions = 4), out,
        covering = false, encoding = "polygon")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
    }
    // window catches the buffered cells centered at x ∈ {8,12}, y ∈ {8,12}
    val q = GeoParquet.read(spark, out, bbox = Some((7.0, 7.0, 13.0, 13.0)))
    val got = q.selectExpr("fid").collect().map(_.getLong(0)).toSet
    val expected = (for (cy <- 2 to 3; cx <- 2 to 3) yield (cy * 32 + cx).toLong).toSet
    assert(got == expected, s"got $got")
    val decoded = scannedRows(GeoParquet.read(spark, out, bbox = Some((7.0, 7.0, 13.0, 13.0))))
    assert(decoded >= 4 && decoded < 1024 / 2,
      s"nested-layout stats pruning must skip most row groups: decoded $decoded of 1024")
  }
}
