package graft

import org.apache.spark.sql.Row

/** Kernel specs in the reference's labeled-pair style
  * (rust/geoarrow-expr-geo/src/intersects.rs:46-173): overlap, disjoint,
  * corner-touch, mixed types, null→null. */
class GeoFunctionsSpec extends SparkTestBase {

  private def one(q: String): Any = sql(s"SELECT $q").head().get(0)

  test("constructors + wkt roundtrip") {
    assert(one("ST_AsText(ST_Point(1, 2))") == "POINT (1 2)")
    assert(one("ST_AsText(ST_GeomFromText('POINT (3 4)'))") == "POINT (3 4)")
    assert(one("ST_AsText(ST_MakeEnvelope(0,0,2,3))") ==
      "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))")
  }

  test("measures") {
    assert(one("ST_Area(ST_MakeEnvelope(0,0,2,3))") == 6.0)
    assert(one("ST_Length(ST_GeomFromText('LINESTRING(0 0, 3 4)'))") == 5.0)
    assert(one("ST_Distance(ST_Point(0,0), ST_Point(3,4))") == 5.0)
  }

  test("predicates: overlap / disjoint / corner-touch / mixed / null") {
    assert(one("ST_Intersects(ST_MakeEnvelope(0,0,2,2), ST_MakeEnvelope(1,1,3,3))") == true)
    assert(one("ST_Intersects(ST_MakeEnvelope(0,0,1,1), ST_MakeEnvelope(2,2,3,3))") == false)
    assert(one("ST_Intersects(ST_MakeEnvelope(0,0,1,1), ST_MakeEnvelope(1,1,2,2))") == true)
    assert(one("ST_Contains(ST_MakeEnvelope(0,0,4,4), ST_Point(2,2))") == true)
    assert(one("ST_Intersects(ST_Point(0,0), CAST(NULL AS BINARY))") == null)
  }

  test("null propagation through unary kernels") {
    assert(one("ST_Area(CAST(NULL AS BINARY))") == null)
    assert(one("ST_AsText(CAST(NULL AS BINARY))") == null)
  }

  test("transforms") {
    assert(one("ST_AsText(ST_Centroid(ST_MakeEnvelope(0,0,2,2)))") == "POINT (1 1)")
    assert(one("ST_NPoints(ST_Simplify(ST_GeomFromText('LINESTRING(0 0, 1 0.0000001, 2 0)'), 0.001))") == 2)
    assert(one("ST_AsText(ST_Translate(ST_Point(1,1), 2, 3))") == "POINT (3 4)")
    // buffer of a point with quad_segs q is a 4q-gon: area = 1/2 * n * r^2 * sin(2π/n)
    val r = 2.0; val n = 32
    val expected = 0.5 * n * r * r * math.sin(2 * math.Pi / n)
    assert(math.abs(one("ST_Area(ST_Buffer(ST_Point(5,5), 2))").asInstanceOf[Double] - expected) < 1e-9)
  }

  test("overlays") {
    assert(one("ST_Area(ST_Intersection(ST_MakeEnvelope(0,0,2,2), ST_MakeEnvelope(1,1,3,3)))") == 1.0)
    assert(one("ST_Area(ST_Union(ST_MakeEnvelope(0,0,2,2), ST_MakeEnvelope(1,1,3,3)))") == 7.0)
  }

  test("dump + explode") {
    val rows = sql(
      "SELECT explode(ST_Dump(ST_GeomFromText('MULTIPOINT((1 1),(2 2),(3 3))')))").collect()
    assert(rows.length == 3)
  }

  test("subdivide: partition invariants, vertex bound, small-geometry passthrough") {
    // Small geometry under the budget comes back whole.
    val whole = sql(
      "SELECT ST_AsText(p) FROM (SELECT explode(ST_Subdivide(ST_MakeEnvelope(0,0,2,3), 8)) AS p)")
      .collect()
    assert(whole.map(_.getString(0)).toSeq == Seq("POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"))

    // A top-densified 32x1 rectangle (37 vertices) must split into pieces that
    // (a) each respect the vertex budget, (b) tile the input exactly: areas sum
    // to 32 and pairwise interiors are disjoint (sum == union area).
    val topPts = (32 to 0 by -1).map(x => s"$x 1").mkString(", ")
    val wkt = s"POLYGON ((0 0, 32 0, $topPts, 0 0))"
    val rows = sql(
      s"""SELECT COUNT(*) AS n, SUM(ST_Area(p)) AS area, MAX(ST_NPoints(p)) AS maxnp,
         |       ST_Area(ST_Union_Agg(p)) AS uarea
         |FROM (SELECT explode(ST_Subdivide(ST_GeomFromText('$wkt'), 10)) AS p)""".stripMargin)
      .head()
    assert(rows.getLong(0) > 1)
    assert(math.abs(rows.getDouble(1) - 32.0) < 1e-9)
    assert(rows.getInt(2) <= 10)
    assert(math.abs(rows.getDouble(3) - 32.0) < 1e-9)

    // Multi-geometries subdivide per part; a linestring subdivides too (dim 1).
    val multi = sql(
      """SELECT SUM(ST_Area(p)) FROM (SELECT explode(ST_Subdivide(
        |ST_GeomFromText('MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 14 0, 14 4, 10 4, 10 0)))'), 5)) AS p)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(multi - 32.0) < 1e-9)
    val lineLen = sql(
      s"""SELECT SUM(ST_Length(p)), MAX(ST_NPoints(p)) FROM (SELECT explode(ST_Subdivide(
         |ST_GeomFromText('LINESTRING (${(0 to 40).map(x => s"$x ${x % 2}").mkString(", ")})'), 8)) AS p)""".stripMargin)
      .head()
    assert(math.abs(lineLen.getDouble(0) - 40 * math.sqrt(2)) < 1e-9)
    assert(lineLen.getInt(1) <= 8)
  }

  test("subdivide: half-plane fast path vs OverlayNG fallback agree on partition invariants") {
    // A REAL comb (teeth with gaps): any horizontal cut across the teeth
    // produces a disconnected region, so the ring crosses the clip line >2
    // times and the clip must route to the OverlayNG fallback rather than
    // emit Sutherland–Hodgman bridge slivers. 8 teeth, each 1x3, on a 16x1
    // spine => area = 16*1 + 8*3 = 40.
    val teeth = (7 to 0 by -1).map { i =>
      val x = 2 * i
      s"${x + 1} 1, ${x + 1} 4, $x 4, $x 1"
    }.mkString(", ")
    val comb = s"POLYGON ((0 0, 16 0, 16 1, $teeth, 0 1, 0 0))"
    val r = sql(
      s"""SELECT COUNT(*) AS n, SUM(ST_Area(p)) AS area, MAX(ST_NPoints(p)) AS maxnp,
         |       ST_Area(ST_Union_Agg(p)) AS uarea
         |FROM (SELECT explode(ST_Subdivide(ST_GeomFromText('$comb'), 8)) AS p)""".stripMargin).head()
    assert(r.getLong(0) > 1)
    assert(math.abs(r.getDouble(1) - 40.0) < 1e-9)
    assert(r.getInt(2) <= 8)
    assert(math.abs(r.getDouble(3) - 40.0) < 1e-9)

    // Donut with a densified outer ring: splits keep the hole when it lands
    // entirely in one half and fall back when the hole straddles the line.
    // Outer 10x10 with densified top (16 extra vertices), hole 2x2 at center
    // => area 96.
    val top = (10 to 0 by -1).map(x => s"$x 10").mkString(", ")
    val donut = s"POLYGON ((0 0, 10 0, $top, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    val d = sql(
      s"""SELECT SUM(ST_Area(p)) AS area, ST_Area(ST_Union_Agg(p)) AS uarea,
         |       MAX(ST_NPoints(p)) AS maxnp
         |FROM (SELECT explode(ST_Subdivide(ST_GeomFromText('$donut'), 8)) AS p)""".stripMargin).head()
    assert(math.abs(d.getDouble(0) - 96.0) < 1e-9)
    assert(math.abs(d.getDouble(1) - 96.0) < 1e-9)
    assert(d.getInt(2) <= 8)
  }

  test("subdivide: hole edge collinear with the clip chord stays valid (overlay fallback)") {
    // 10x20 shell (densified so it must split; envelope mid-Y = 10) with a
    // triangular hole whose base (4 10)-(6 10) lies exactly ON the clip
    // line: keeping the hole verbatim would overlap the shell's closing
    // chord (an invalid pinch) — the clip must detect the touch and route
    // to the robust overlay. Pieces must be valid and tile exactly.
    val top = (10 to 0 by -1).map(x => s"$x 20").mkString(", ")
    val wkt = s"POLYGON ((0 0, 10 0, $top, 0 0), (4 10, 6 10, 5 12, 4 10))"
    val r = sql(
      s"""SELECT SUM(ST_Area(p)) AS area, ST_Area(ST_Union_Agg(p)) AS uarea,
         |       MIN(CAST(ST_IsValid(p) AS INT)) AS all_valid
         |FROM (SELECT explode(ST_Subdivide(ST_GeomFromText('$wkt'), 8)) AS p)""".stripMargin).head()
    val expected = 10.0 * 20.0 - 2.0 // hole area = base 2 * height 2 / 2
    assert(math.abs(r.getDouble(0) - expected) < 1e-9, s"area ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - expected) < 1e-9, s"union ${r.getDouble(1)}")
    assert(r.getInt(2) == 1, "every piece must be OGC-valid")
  }

  test("subdivide: seeded fuzz — random star polygons tile exactly") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val f = new GeometryFactory()
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 120) {
      val nPts = 12 + rnd.nextInt(40)
      val coords = (0 until nPts).map { i =>
        val ang = 2 * math.Pi * i / nPts
        val r = 1.0 + 9.0 * rnd.nextDouble()
        new Coordinate(r * math.cos(ang), r * math.sin(ang))
      }.toArray
      val poly = f.createPolygon(coords :+ coords.head.copy())
      val wkb = graft.core.GeomOps.write(poly)
      val maxV = 6 + rnd.nextInt(8)
      val pieces = graft.core.GeomOps.subdivide(wkb, maxV)
      val geoms = (0 until pieces.numElements())
        .map(i => graft.core.GeomOps.read(pieces.getBinary(i)))
      assert(geoms.nonEmpty)
      // The depth-32 bailout may emit an over-budget piece, but only after 32
      // envelope halvings — i.e. only microscopic slivers at razor-sharp
      // spikes (same contract as the pre-fast-path implementation).
      assert(geoms.forall(g => g.getNumPoints <= maxV ||
        g.getEnvelopeInternal.getDiameter < 1e-2))
      val areaSum = geoms.map(_.getArea).sum
      assert(math.abs(areaSum - poly.getArea) < 1e-8 * math.max(1.0, poly.getArea),
        s"area sum $areaSum != ${poly.getArea} for $poly")
      val union = org.locationtech.jts.operation.union.UnaryUnionOp.union(
        scala.jdk.CollectionConverters.SeqHasAsJava(geoms).asJava)
      assert(math.abs(union.getArea - poly.getArea) < 1e-8 * math.max(1.0, poly.getArea),
        s"union area ${union.getArea} != ${poly.getArea} (overlapping pieces?) for $poly")
    }
  }

  test("subdivide: seeded fuzz — polygons WITH HOLES and zigzag lines tile exactly") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    val f = new GeometryFactory()
    val rnd = new scala.util.Random(99)
    // donuts: random star shell + 1-2 small rectangular holes strictly inside
    for (_ <- 0 until 60) {
      val nPts = 16 + rnd.nextInt(24)
      val shell = (0 until nPts).map { i =>
        val ang = 2 * math.Pi * i / nPts
        val r = 6.0 + 4.0 * rnd.nextDouble()
        new Coordinate(r * math.cos(ang), r * math.sin(ang))
      }.toArray
      val holes = (0 until 1 + rnd.nextInt(2)).map { h =>
        val cx = -2.0 + 4.0 * rnd.nextDouble(); val cy = -2.0 + 4.0 * rnd.nextDouble()
        val w = 0.3 + 0.5 * rnd.nextDouble(); val ht = 0.3 + 0.5 * rnd.nextDouble()
        f.createLinearRing(Array(
          new Coordinate(cx - w, cy - ht), new Coordinate(cx - w, cy + ht),
          new Coordinate(cx + w, cy + ht), new Coordinate(cx + w, cy - ht),
          new Coordinate(cx - w, cy - ht)))
      }.toArray
      val poly = f.createPolygon(f.createLinearRing(shell :+ shell.head.copy()), holes)
      if (poly.isValid) { // hole placement is random; only valid donuts are fixtures
        val maxV = 8 + rnd.nextInt(8)
        val pieces = graft.core.GeomOps.subdivide(graft.core.GeomOps.write(poly), maxV)
        val geoms = (0 until pieces.numElements())
          .map(i => graft.core.GeomOps.read(pieces.getBinary(i)))
        val areaSum = geoms.map(_.getArea).sum
        assert(math.abs(areaSum - poly.getArea) < 1e-8 * poly.getArea,
          s"hole-polygon area sum $areaSum != ${poly.getArea} for $poly")
        val union = org.locationtech.jts.operation.union.UnaryUnionOp.union(
          scala.jdk.CollectionConverters.SeqHasAsJava(geoms).asJava)
        assert(math.abs(union.getArea - poly.getArea) < 1e-8 * poly.getArea,
          s"hole-polygon union ${union.getArea} != ${poly.getArea} for $poly")
      }
    }
    // zigzag lines: length must be conserved exactly across line splits
    for (_ <- 0 until 40) {
      val n = 20 + rnd.nextInt(60)
      var x = 0.0; var y = 0.0
      val pts = Array.tabulate(n) { _ =>
        x += rnd.nextDouble() * 3.0; y = rnd.nextDouble() * 5.0 - 2.5
        new Coordinate(x, y)
      }
      val line = f.createLineString(pts)
      val maxV = 5 + rnd.nextInt(8)
      val pieces = graft.core.GeomOps.subdivide(graft.core.GeomOps.write(line), maxV)
      val geoms = (0 until pieces.numElements())
        .map(i => graft.core.GeomOps.read(pieces.getBinary(i)))
      val lenSum = geoms.map(_.getLength).sum
      assert(math.abs(lenSum - line.getLength) < 1e-8 * line.getLength,
        s"line length sum $lenSum != ${line.getLength}")
      assert(geoms.forall(g => g.getNumPoints <= maxV ||
        g.getEnvelopeInternal.getDiameter < 1e-2))
    }
  }

  test("bbox struct is plain (pushdown-friendly)") {
    val row = sql("SELECT ST_Bbox(ST_MakeEnvelope(1,2,3,4)) AS b").select("b.xmin", "b.ymax").head()
    assert(row == Row(1.0, 4.0))
  }

  test("geodesy: transform 4326<->3857 roundtrip, haversine") {
    val x = one("ST_X(ST_Transform(ST_Point(90, 0), 4326, 3857))").asInstanceOf[Double]
    assert(math.abs(x - 20037508.342789244 / 2) < 1e-6)
    val back = one("ST_X(ST_Transform(ST_Transform(ST_Point(12.5, 41.9), 4326, 3857), 3857, 4326))")
      .asInstanceOf[Double]
    assert(math.abs(back - 12.5) < 1e-9)
    // quarter meridian ~ 10,007.5 km on the sphere
    val d = one("ST_DistanceSphere(ST_Point(0,0), ST_Point(0,90))").asInstanceOf[Double]
    assert(math.abs(d - math.Pi / 2 * 6371008.8) < 1.0)
  }

  test("Z dimension fidelity through WKB roundtrip") {
    assert(one("ST_Z(ST_PointZ(1, 2, 3))") == 3.0)
    assert(one("ST_Z(ST_GeomFromText('POINT Z(1 2 3)'))") == 3.0)
    assert(one("ST_HasZ(ST_PointZ(1, 2, 3))") == true)
    assert(one("ST_HasZ(ST_Point(1, 2))") == false)
    // Z survives a transform chain (translate only touches x/y)
    assert(one("ST_Z(ST_Translate(ST_PointZ(1, 2, 3), 5, 5))") == 3.0)
    assert(one("ST_AsText(ST_PointZ(1, 2, 3))") == "POINT Z(1 2 3)")
    // 2D text output unchanged by the 4-dim writer
    assert(one("ST_AsText(ST_Point(1, 2))") == "POINT (1 2)")
  }

  test("null vs EMPTY distinction (reference trait_.rs:157 logical nulls)") {
    assert(one("ST_IsEmpty(ST_GeomFromText('POINT EMPTY'))") == true)
    assert(one("ST_IsEmpty(CAST(NULL AS BINARY))") == null)
    assert(one("ST_Area(ST_GeomFromText('POLYGON EMPTY'))") == 0.0)
  }

  test("GeoJSON codec: all seven types + Z + feature unwrap") {
    assert(one("ST_AsGeoJSON(ST_Point(1, 2))") == """{"type":"Point","coordinates":[1,2]}""")
    assert(one("ST_AsGeoJSON(ST_PointZ(1, 2, 3))") == """{"type":"Point","coordinates":[1,2,3]}""")
    val types = Seq(
      "LINESTRING (0 0, 1 1)",
      "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))",
      "MULTIPOINT ((0 0), (1 1))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    types.foreach { wkt =>
      assert(one(s"ST_AsText(ST_GeomFromGeoJSON(ST_AsGeoJSON(ST_GeomFromText('$wkt'))))") == wkt,
        s"roundtrip of $wkt")
    }
    // Feature wrapper → geometry member (legacy reader semantics)
    assert(one("""ST_AsText(ST_GeomFromGeoJSON('{"type":"Feature","properties":{"a":1},"geometry":{"type":"Point","coordinates":[5,6]}}'))""") == "POINT (5 6)")
  }

  test("cast/affine additions: multi, skew, chaikin, interior rings") {
    assert(one("ST_AsText(ST_Multi(ST_Point(1, 2)))") == "MULTIPOINT ((1 2))")
    assert(one("ST_GeometryType(ST_Multi(ST_GeomFromText('LINESTRING(0 0, 1 1)')))") == "ST_MultiLineString")
    // skew x by 45° maps (0,1)→(1,1); tan(pi/4) is 1-1ulp so round
    assert(one("ROUND(ST_X(ST_Skew(ST_GeomFromText('POINT(0 1)'), PI()/4, 0)), 9)") == 1.0)
    // chaikin: open 3-pt line, 1 iter → endpoints + 2 per segment = 6 pts
    // (matches the reference's open-line convention, chaikin_smoothing.rs:22)
    assert(one("ST_NPoints(ST_ChaikinSmoothing(ST_GeomFromText('LINESTRING(0 0, 4 4, 8 0)'), 1))") == 6)
    assert(one("ST_AsText(ST_PointN(ST_ChaikinSmoothing(ST_GeomFromText('LINESTRING(0 0, 4 4, 8 0)'), 1), 0))") == "POINT (0 0)")
    // ring stays closed through chaikin
    assert(one("ST_IsValid(ST_ChaikinSmoothing(ST_MakeEnvelope(0,0,10,10), 2))") == true)
    assert(one("ST_NumInteriorRings(ST_GeomFromText('POLYGON((0 0,3 0,3 3,0 3,0 0),(1 1,2 1,2 2,1 2,1 1))'))") == 1)
    assert(one("ST_Length(ST_InteriorRingN(ST_GeomFromText('POLYGON((0 0,3 0,3 3,0 3,0 0),(1 1,2 1,2 2,1 2,1 1))'), 0))") == 4.0)
  }

  test("aggregates: ST_Extent_Agg / ST_Union_Agg partial-merge semantics") {
    // 100 points over 8 partitions → merge path exercised
    val r = spark.sql("""
      SELECT ST_Extent_Agg(pt) AS ext FROM (
        SELECT /*+ REPARTITION(8) */ ST_Point(CAST(id AS DOUBLE), CAST(id % 7 AS DOUBLE)) AS pt
        FROM range(100))""").head()
    val ext = r.getStruct(0)
    assert(ext.getDouble(0) == 0.0 && ext.getDouble(1) == 0.0 &&
           ext.getDouble(2) == 99.0 && ext.getDouble(3) == 6.0)
    // 100 overlapping unit tiles on a 10-tile line → union area 10x... tiles at id%10
    val area = spark.sql("""
      SELECT ST_Area(ST_Union_Agg(ST_MakeEnvelope(CAST(id % 10 AS DOUBLE), 0, CAST(id % 10 + 1 AS DOUBLE), 1))) AS a
      FROM (SELECT /*+ REPARTITION(8) */ id FROM range(100))""").head().getDouble(0)
    assert(area == 10.0)
    // null/empty-group handling
    assert(spark.sql("SELECT ST_Union_Agg(CAST(NULL AS BINARY)) FROM range(5)").head().isNullAt(0))
    assert(spark.sql("SELECT ST_Extent_Agg(CAST(NULL AS BINARY)) FROM range(5)").head().isNullAt(0))
  }

  test("geometry type + validity") {
    assert(one("ST_GeometryType(ST_Point(1,1))") == "ST_Point")
    assert(one("ST_IsValid(ST_MakeEnvelope(0,0,1,1))") == true)
    assert(one("ST_IsEmpty(ST_GeomFromText('POINT EMPTY'))") == true)
  }

  test("M dimension fidelity: XYM and XYZM through WKB/WKT roundtrips") {
    // reference Dimension axis: rust/geoarrow-schema/src/dimension.rs:12-24
    assert(one("ST_M(ST_PointM(1, 2, 42))") == 42.0)
    assert(one("ST_HasM(ST_PointM(1, 2, 42))") == true)
    assert(one("ST_HasZ(ST_PointM(1, 2, 42))") == false)
    assert(one("ST_M(ST_PointZM(1, 2, 3, 4))") == 4.0)
    assert(one("ST_Z(ST_PointZM(1, 2, 3, 4))") == 3.0)
    // internal (EWKB) and ISO WKB roundtrips both keep M
    assert(one("ST_M(ST_GeomFromWKB(ST_AsBinary(ST_PointZM(1, 2, 3, 4))))") == 4.0)
    assert(one("ST_M(ST_GeomFromText('POINT M (1 2 7)'))") == 7.0)
    assert(one("ST_AsText(ST_PointM(1, 2, 7))") == "POINT M(1 2 7)")
    assert(one("ST_AsText(ST_PointZM(1, 2, 3, 4))") == "POINT ZM(1 2 3 4)")
    // linestring with measures survives too
    assert(one("ST_M(ST_PointN(ST_GeomFromText('LINESTRING M (0 0 1, 5 0 9)'), 1))") == 9.0)
  }

  test("geometryColumns locates geometry by metadata or convention") {
    import graft.functions.GeoFunctions
    val df = sql("SELECT 1 AS id, ST_Point(1,2) AS geometry, ST_Point(3,4) AS other")
    assert(GeoFunctions.geometryColumns(df.schema) == Seq("geometry"))
  }

  test("ST_AsSVG: PostGIS path-data conventions (y negated)") {
    assert(one("ST_AsSVG(ST_Point(1, 2))") == "cx=\"1\" cy=\"-2\"")
    assert(one("ST_AsSVG(ST_GeomFromText('LINESTRING (0 0, 3 4)'))") == "M 0 0 L 3 -4")
    assert(one("ST_AsSVG(ST_MakeEnvelope(0, 0, 2, 2))") == "M 0 0 L 2 0 L 2 -2 L 0 -2 Z")
    assert(one("ST_AsSVG(ST_GeomFromText('MULTIPOINT ((1 1), (2 2))'))") ==
      "cx=\"1\" cy=\"-1\" cx=\"2\" cy=\"-2\"")
  }

  test("spheroid measures: Andoyer distance vs haversine sanity") {
    // 1 degree of longitude at the equator: a = 6378137 m on the ellipsoid
    val d = one("ST_DistanceSpheroid(ST_Point(0, 0), ST_Point(1, 0))").asInstanceOf[Double]
    assert(math.abs(d - 111319.49) < 1.0, s"equator degree = $d")
    // spheroid and sphere agree within 0.6% anywhere
    val s = one("ST_DistanceSphere(ST_Point(12, 41), ST_Point(2, 48))").asInstanceOf[Double]
    val e = one("ST_DistanceSpheroid(ST_Point(12, 41), ST_Point(2, 48))").asInstanceOf[Double]
    assert(math.abs(s - e) / e < 0.006, s"sphere=$s spheroid=$e")
    assert(one("ST_DistanceSpheroid(ST_Point(5, 5), ST_Point(5, 5))") == 0.0)
  }

  test("signed area: orientation, holes, non-areal") {
    val r = sql("""
      SELECT ST_SignedArea(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))')) AS ccw,
             ST_SignedArea(ST_GeomFromText('POLYGON ((0 0, 0 2, 4 2, 4 0, 0 0))')) AS cw,
             ST_SignedArea(ST_GeomFromText(
               'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))')) AS holed,
             ST_SignedArea(ST_GeomFromText('LINESTRING (0 0, 5 5)')) AS line
      """).head()
    assert(r.getDouble(0) == 8.0)   // CCW positive
    assert(r.getDouble(1) == -8.0)  // CW negative
    assert(r.getDouble(2) == 15.0)  // 16 - CW-wound hole of 1
    assert(r.getDouble(3) == 0.0)
  }

  test("ST_SimplifyVWPreserve: topology guard blocks the crossing shortcut") {
    // A SIMPLE line whose only sub-threshold vertex is (5,2) (area 10 < 11):
    // the tail climbs to (5,1), INSIDE the (0,0)/(5,2)/(10,0) triangle, so
    // the input crosses nothing, but the shortcut (0,0)→(10,0) would cross
    // the (5,-5)→(5,1) segment at (5,0). VW-preserve must keep all 6
    // points; plain VW (JTS, distance tol 3.3 → area 10.89) removes the
    // vertex and produces a self-intersecting line.
    val block = "'LINESTRING (0 0, 5 2, 10 0, 11 -5, 5 -5, 5 1)'"
    val r = sql(s"""
      SELECT ST_IsSimple(ST_GeomFromText($block)) AS input_simple,
             ST_NPoints(ST_SimplifyVWPreserve(ST_GeomFromText($block), 11.0)) AS keep_pts,
             ST_IsSimple(ST_SimplifyVWPreserve(ST_GeomFromText($block), 11.0)) AS keep_simple,
             ST_NPoints(ST_SimplifyVW(ST_GeomFromText($block), 3.3)) AS vw_pts,
             ST_IsSimple(ST_SimplifyVW(ST_GeomFromText($block), 3.3)) AS vw_simple
      """).head()
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 6 && r.getBoolean(2))
    assert(r.getInt(3) == 5 && !r.getBoolean(4)) // plain VW self-intersects here
  }

  test("ST_SimplifyVWPreserve: unblocked vertices eliminate in area order") {
    val open = "'LINESTRING (0 0, 5 2, 10 0, 10 10, 5 11, 0 10)'"
    val r = sql(s"""
      SELECT ST_AsText(ST_SimplifyVWPreserve(ST_GeomFromText($open), 20.0)) AS wkt,
             ST_NPoints(ST_SimplifyVWPreserve(ST_GeomFromText($open), 0.0)) AS eps0
      """).head()
    // areas: (5,2)=10, (5,11)=5 both < 20, neither shortcut crosses → both
    // removed; survivors' fresh areas are 50 ≥ 20
    assert(r.getString(0) == "LINESTRING (0 0, 10 0, 10 10, 0 10)")
    assert(r.getInt(1) == 6) // eps <= 0 is the identity
  }

  test("ST_SimplifyVWPreserve: rings keep 4 coords; points/GC pass through") {
    val r = sql("""
      SELECT ST_NPoints(ST_SimplifyVWPreserve(ST_GeomFromText(
               'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), 1000.0)) AS sq,
             ST_AsText(ST_SimplifyVWPreserve(ST_GeomFromText(
               'POLYGON ((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))'), 5.0)) AS notched,
             ST_AsText(ST_SimplifyVWPreserve(ST_Point(3.0, 4.0), 100.0)) AS pt,
             ST_AsText(ST_SimplifyVWPreserve(ST_GeomFromText(
               'GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1, 2 0))'), 100.0)) AS gc
      """).head()
    assert(r.getInt(0) == 4)                      // square can shed one corner, never below a triangle
    assert(r.getString(1).count(_ == ',') == 3)   // notched ring → 4 coords
    assert(r.getString(2) == "POINT (3 4)")
    assert(r.getString(3).startsWith("GEOMETRYCOLLECTION")) // unchanged, like the reference
    assert(r.getString(3).contains("1 1"))        // GC interior untouched
  }

  test("ST_Transform: EPSG domain bounds fail loudly; valid poles pass") {
    // out-of-domain lon/lat error with the EPSG context, like PROJ engines
    val badLon = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(200.0, 10.0), 4326, 3857)").collect())
    assert(badLon.getMessage.contains("EPSG:4326 domain"), badLon.getMessage)
    val badLat = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(0.0, 91.0), 4326, 32631)").collect())
    assert(badLat.getMessage.contains("EPSG:4326 domain"), badLat.getMessage)
    // the web-mercator pole singularity is its own, clearer error
    val pole = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(0.0, 90.0), 4326, 3857)").collect())
    assert(pole.getMessage.contains("pole singularity"), pole.getMessage)
    // unsupported EPSG pair still names the supported set (2154 became a
    // supported conic in round 15; 27700 gained its Helmert datum shift in
    // round 18 — 2193 NZTM stays out)
    val crs = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(0.0, 0.0), 4326, 2193)").collect())
    assert(crs.getMessage.contains("326xx/327xx"), crs.getMessage)
    // 27700 is now a supported target (datum-shifted — see
    // TransverseMercatorSpec for the numeric anchors)
    val bng = sql(
      "SELECT ST_X(ST_Transform(ST_Point(-0.1276, 51.5072), 4326, 27700)) AS e").head()
    assert(math.abs(bng.getDouble(0) - 530000.0) < 3000.0, s"BNG easting ${bng.getDouble(0)}")
    // conic targets enforce the same 4326 input domain
    val conicBad = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(200.0, 0.0), 4326, 5070)").collect())
    assert(conicBad.getMessage.contains("EPSG:4326 domain"), conicBad.getMessage)
    // 85 degrees is fine in 3857 (finite), and cross-zone composition runs
    val ok = sql("""SELECT ST_Y(ST_Transform(ST_Point(0.0, 85.0), 4326, 3857)) AS y,
                           ST_X(ST_Transform(ST_Transform(ST_Point(9.0, 50.0), 4326, 32632),
                                             32632, 32633)) AS e""").head()
    assert(ok.getDouble(0) > 1.9e7 && ok.getDouble(1) < 500000.0)
    // conic targets share the pole-singularity contract with 3857: LCC's
    // forward is tan(π/2)-divergent and the Albers inverse divides by
    // cos(φ)=0 at the pole — loud error, never silent Infinity/NaN
    for (conic <- Seq(5070, 2154); lat <- Seq(90.0, -90.0)) {
      val p = intercept[Exception](
        sql(s"SELECT ST_Transform(ST_Point(0.0, $lat), 4326, $conic)").collect())
      assert(p.getMessage.contains("pole singularity"), s"$conic/$lat: ${p.getMessage}")
    }
  }

  test("ST_Transform conic pivot matrix: projected↔projected composes through 4326 with the same bounds contract") {
    // round-trip closure for every conic-involving pair shape — two pivot
    // hops accumulate only the 1e-13 rad inverse-iteration tolerance, so
    // closure holds at micrometer scale
    val rt = sql("""
      SELECT
        ST_X(ST_Transform(ST_Transform(ST_Point(-100.0, 40.0), 5070, 2154), 2154, 5070)) AS x1,
        ST_Y(ST_Transform(ST_Transform(ST_Point(-100.0, 40.0), 5070, 2154), 2154, 5070)) AS y1,
        ST_X(ST_Transform(ST_Transform(ST_Point(-1.1e7, 4.8e6), 3857, 5070), 5070, 3857)) AS x2,
        ST_X(ST_Transform(ST_Transform(ST_Point(500000.0, 4400000.0), 32618, 2154), 2154, 32618)) AS x3
    """).head()
    assert(math.abs(rt.getDouble(0) - -100.0) < 1e-6 && math.abs(rt.getDouble(1) - 40.0) < 1e-6)
    assert(math.abs(rt.getDouble(2) - -1.1e7) < 1e-5)
    assert(math.abs(rt.getDouble(3) - 500000.0) < 1e-5)
    // composed-through-pivot equals the direct analytic leg exactly at the
    // shared 4326 waypoint: 4326→5070→2154 vs 4326→2154 diverge only by the
    // 5070 round-trip's iteration tolerance
    val d = sql("""
      SELECT ABS(ST_X(ST_Transform(ST_Transform(ST_Point(2.35, 48.85), 4326, 5070), 5070, 2154))
               - ST_X(ST_Transform(ST_Point(2.35, 48.85), 4326, 2154))) AS dx
    """).head().getDouble(0)
    assert(d < 1e-4, s"composed vs direct diverged by $d m")
    // a projected input whose pivot waypoint falls outside the 4326 domain
    // surfaces as the pivot leg's loud domain error, not NaN propagation
    // (an easting of 1e9 m in 3857 inverts to lon ≈ 5157°)
    val bad = intercept[Exception](
      sql("SELECT ST_Transform(ST_Point(1.0e9, 0.0), 3857, 5070)").collect())
    assert(bad.getMessage.contains("EPSG:4326 domain"), bad.getMessage)
  }

  test("ST_Polygonize: assembles enclosed cells, ignores dangles, empty when open") {
    // closed square + a dangling edge: one polygon, dangle discarded
    val r = sql("""
      SELECT ST_NumGeometries(g) AS n, ST_Area(g) AS a, ST_AsText(g) AS wkt
      FROM (SELECT ST_Polygonize(ST_Collect(ARRAY(
        ST_GeomFromText('LINESTRING(0 0, 1 0)'),
        ST_GeomFromText('LINESTRING(1 0, 1 1)'),
        ST_GeomFromText('LINESTRING(1 1, 0 1)'),
        ST_GeomFromText('LINESTRING(0 1, 0 0)'),
        ST_GeomFromText('LINESTRING(1 1, 5 5)')))) AS g)""").head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 1.0, s"got $r")
    // open linework closes nothing → empty collection, zero area
    val e = sql("""
      SELECT ST_NumGeometries(g) AS n, ST_Area(g) AS a
      FROM (SELECT ST_Polygonize(ST_Collect(ARRAY(
        ST_GeomFromText('LINESTRING(0 0, 1 0)'),
        ST_GeomFromText('LINESTRING(1 0, 1 1)')))) AS g)""").head()
    assert(e.getInt(0) == 0 && e.getDouble(1) == 0.0, s"got $e")
    // determinism: two shared-edge cells produce WKT-sorted normalized
    // polygons regardless of input order
    val ab = sql("""
      SELECT ST_AsText(ST_Polygonize(ST_Collect(ARRAY(
        ST_GeomFromText('LINESTRING(0 0, 1 0)'), ST_GeomFromText('LINESTRING(1 0, 1 1)'),
        ST_GeomFromText('LINESTRING(1 1, 0 1)'), ST_GeomFromText('LINESTRING(0 1, 0 0)'),
        ST_GeomFromText('LINESTRING(1 0, 2 0)'), ST_GeomFromText('LINESTRING(2 0, 2 1)'),
        ST_GeomFromText('LINESTRING(2 1, 1 1)')))) ) AS w""").head().getString(0)
    val ba = sql("""
      SELECT ST_AsText(ST_Polygonize(ST_Collect(ARRAY(
        ST_GeomFromText('LINESTRING(2 1, 1 1)'), ST_GeomFromText('LINESTRING(2 0, 2 1)'),
        ST_GeomFromText('LINESTRING(1 0, 2 0)'), ST_GeomFromText('LINESTRING(0 1, 0 0)'),
        ST_GeomFromText('LINESTRING(1 1, 0 1)'), ST_GeomFromText('LINESTRING(1 0, 1 1)'),
        ST_GeomFromText('LINESTRING(0 0, 1 0)')))) ) AS w""").head().getString(0)
    assert(ab == ba, s"order-dependent polygonize: $ab vs $ba")
  }

  test("ST_DelaunayTriangles: unique triangulation is order-independent; degenerates empty") {
    // general position (no cocircular quad) → the Delaunay triangulation is
    // UNIQUE, so any input order must give the identical normalized WKT
    val a = sql("""SELECT ST_AsText(ST_DelaunayTriangles(ST_Collect(ARRAY(
      ST_Point(0.0, 0.0), ST_Point(2.0, 0.0), ST_Point(1.0, 3.0), ST_Point(0.2, 1.1))))) AS w""")
      .head().getString(0)
    val b = sql("""SELECT ST_AsText(ST_DelaunayTriangles(ST_Collect(ARRAY(
      ST_Point(0.2, 1.1), ST_Point(1.0, 3.0), ST_Point(2.0, 0.0), ST_Point(0.0, 0.0))))) AS w""")
      .head().getString(0)
    assert(a == b && a.contains("POLYGON"), s"order-dependent: $a vs $b")
    // collinear and sub-3-point inputs triangulate to nothing
    for (wkt <- Seq("MULTIPOINT((0 0), (1 1), (2 2), (3 3))", "MULTIPOINT((0 0), (1 1))")) {
      val r = sql(s"""SELECT ST_NumGeometries(ST_DelaunayTriangles(ST_GeomFromText('$wkt'))) AS n""").head()
      assert(r.getInt(0) == 0, s"$wkt -> ${r.getInt(0)} triangles")
    }
  }

  test("geodesic signed area orientation (Karney)") {
    val r = sql("""
      SELECT ST_AreaSpheroidSigned(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) AS ccw,
             ST_AreaSpheroidSigned(ST_GeomFromText('POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))')) AS cw
      """).head()
    assert(r.getDouble(0) > 0 && r.getDouble(1) < 0)
    assert(math.abs(r.getDouble(0) + r.getDouble(1)) < 1e-3)
    assert(math.abs(r.getDouble(0) - 12308778361.47) < 1.0) // geographiclib value
  }

  test("ST_ClosestPoint / ST_ShortestLine: boundary clamp, inside identity, degenerate") {
    // outside point clamps to the box edge
    assert(one("ST_AsText(ST_ClosestPoint(ST_MakeEnvelope(0,0,10,10), ST_Point(15, 5)))") ==
      "POINT (10 5)")
    // point INSIDE a polygon is its own closest point (distance 0)
    assert(one("ST_AsText(ST_ClosestPoint(ST_MakeEnvelope(0,0,10,10), ST_Point(3, 4)))") ==
      "POINT (3 4)")
    // shortest line spans the gap, its length equals ST_Distance
    assert(one("ST_AsText(ST_ShortestLine(ST_Point(0, 0), ST_Point(3, 4)))") ==
      "LINESTRING (0 0, 3 4)")
    assert(one("ST_Length(ST_ShortestLine(ST_Point(15, 5), ST_MakeEnvelope(0,0,10,10)))") == 5.0)
    // touching geometries give a zero-length line, not an error
    assert(one("ST_Length(ST_ShortestLine(ST_Point(10, 5), ST_MakeEnvelope(0,0,10,10)))") == 0.0)
  }

  test("ST_Project: spherical forward problem, cardinal bearings, meridian arc") {
    // one degree of meridian arc on the IAU sphere = R * pi/180 meters
    val oneDeg = 6371008.8 * math.Pi / 180.0
    val north = sql(s"SELECT ST_Y(ST_Project(ST_Point(10, 0), $oneDeg, 0.0))").head().getDouble(0)
    assert(math.abs(north - 1.0) < 1e-9, s"1 deg north from equator gave lat $north")
    // due east from the equator stays on the equator
    val east = sql(s"SELECT ST_Y(ST_Project(ST_Point(10, 0), $oneDeg, radians(90.0)))")
      .head().getDouble(0)
    assert(math.abs(east) < 1e-9)
    // antimeridian wrap normalizes into (-180, 180]
    val wrapped = sql(s"SELECT ST_X(ST_Project(ST_Point(179.9, 0), $oneDeg, radians(90.0)))")
      .head().getDouble(0)
    assert(wrapped < -178.0 && wrapped > -180.0, s"wrap gave $wrapped")
  }

  test("ST_Azimuth: PostGIS convention — clockwise from north, [0, 2pi)") {
    assert(one("ST_Azimuth(ST_Point(0,0), ST_Point(0,1))") == 0.0)                 // due north
    assert(one("ST_Azimuth(ST_Point(0,0), ST_Point(1,0))") == math.Pi / 2)         // due east
    assert(one("ST_Azimuth(ST_Point(0,0), ST_Point(0,-1))") == math.Pi)            // due south
    assert(one("ST_Azimuth(ST_Point(0,0), ST_Point(-1,0))") == 3 * math.Pi / 2)    // due west
    assert(one("ST_Azimuth(ST_Point(0,0), ST_Point(1,1))") == math.Pi / 4)         // NE diagonal
    assert(one("ST_Azimuth(ST_Point(2,2), ST_Point(2,2))")
      .asInstanceOf[Double].isNaN)                                                 // coincident
    assert(one("ST_Azimuth(ST_Point(0,0), CAST(NULL AS BINARY))") == null)
  }

  test("ST_TileX/Y/Envelope: OSM anchors, clamping, edge-point covers") {
    // OSM wiki anchor: zoom 0 is the single world tile
    assert(one("ST_TileX(CAST(13.41 AS DOUBLE), 0)") == 0L)
    assert(one("ST_TileY(CAST(52.52 AS DOUBLE), 0)") == 0L)
    // Berlin (13.41, 52.52) at z=10 → tile (550, 335) — the wiki's worked example
    assert(one("ST_TileX(CAST(13.41 AS DOUBLE), 10)") == 550L)
    assert(one("ST_TileY(CAST(52.52 AS DOUBLE), 10)") == 335L)
    // lon=180 clamps into the last column; mercator-cutoff lats clamp to rows 0 / n-1
    assert(one("ST_TileX(CAST(180 AS DOUBLE), 4)") == 15L)
    assert(one("ST_TileY(CAST(89.9 AS DOUBLE), 4)") == 0L)
    assert(one("ST_TileY(CAST(-89.9 AS DOUBLE), 4)") == 15L)
    // poles clamp to the edge rows instead of aborting the job (round-11
    // advice fix — tan/sec blow up past the cutoff; tileX's lon=180
    // convention applied to latitude)
    assert(one("ST_TileY(CAST(90 AS DOUBLE), 4)") == 0L)
    assert(one("ST_TileY(CAST(-90 AS DOUBLE), 4)") == 15L)
    assert(one("ST_TileY(CAST(90 AS DOUBLE), 0)") == 0L)
    // but GARBAGE latitudes still fail loudly (round-12 advice fix): the
    // pole clamp only absorbs a small projection-round-trip epsilon; NaN
    // and lat=200 are corrupt data, not pole overshoots
    intercept[Exception] { graft.core.Geodesy.tileY(Double.NaN, 4) }
    intercept[Exception] { graft.core.Geodesy.tileY(200.0, 4) }
    intercept[Exception] { graft.core.Geodesy.tileY(-120.0, 4) }
    // the epsilon band just past the pole still clamps (reprojection jitter)
    assert(graft.core.Geodesy.tileY(90.2, 4) == 0L)
    assert(graft.core.Geodesy.tileY(-90.2, 4) == 15L)
    // envelope of the world tile is the full mercator square, area (2·pi·a)^2
    val os = math.Pi * 6378137.0
    val a0 = one("ST_Area(ST_TileEnvelope(0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)))")
      .asInstanceOf[Double]
    assert(math.abs(a0 - 4 * os * os) / (4 * os * os) < 1e-15)
    // a point exactly on a 45-degree tile edge is covered by its own tile
    val covered = sql(
      """SELECT ST_Covers(ST_TileEnvelope(6, ST_TileX(CAST(45 AS DOUBLE), 6),
                                             ST_TileY(CAST(-35 AS DOUBLE), 6)),
                          ST_Transform(ST_Point(45.0, -35.0), 4326, 3857))""")
      .head().getBoolean(0)
    assert(covered, "edge-landing point must be ST_Covers-ed by its floor-assigned tile")
    // adjacent tiles tile the plane: east edge of (z,x,y) = west edge of (z,x+1,y)
    val edges = sql(
      """SELECT ST_XMax(ST_TileEnvelope(3, CAST(2 AS BIGINT), CAST(1 AS BIGINT))),
                ST_XMin(ST_TileEnvelope(3, CAST(3 AS BIGINT), CAST(1 AS BIGINT)))""").head()
    assert(edges.getDouble(0) == edges.getDouble(1))
    // out-of-range tile / zoom fail loudly
    intercept[Exception] { sql("SELECT ST_TileEnvelope(2, CAST(4 AS BIGINT), CAST(0 AS BIGINT))").collect() }
    intercept[Exception] { sql("SELECT ST_TileX(CAST(0 AS DOUBLE), 31)").collect() }
  }

  test("ST_GeoHash: geohash.org anchor, prefix property, domain errors") {
    // the canonical worked example from the geohash spec: (-5.6, 42.6) -> ezs42
    assert(one("ST_GeoHash(ST_Point(-5.6, 42.6), 5)") == "ezs42")
    // a second public anchor: 57.64911, 10.40744 (Jutland) -> u4pruydqqvj
    assert(one("ST_GeoHash(ST_Point(10.40744, 57.64911), 11)") == "u4pruydqqvj")
    // prefix property: lower precision is a strict prefix of higher
    val h8 = one("ST_GeoHash(ST_Point(13.41, 52.52), 8)").asInstanceOf[String]
    val h4 = one("ST_GeoHash(ST_Point(13.41, 52.52), 4)").asInstanceOf[String]
    assert(h8.startsWith(h4) && h4.length == 4 && h8.length == 8)
    intercept[Exception] { sql("SELECT ST_GeoHash(ST_Point(200.0, 0.0), 5)").collect() }
    intercept[Exception] { sql("SELECT ST_GeoHash(ST_Point(0.0, 0.0), 13)").collect() }
  }

  test("ST_Buffer styles + ST_ForcePolygonCCW: styles parse, holes counter-orient") {
    // unknown style fails loudly; integer segs still routes to quadrant variant
    intercept[Exception] {
      sql("SELECT ST_Buffer(ST_Point(0,0), 1.0D, 'endcap=bevel')").collect()
    }
    assert(one("ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'endcap=flat'))") == 8.0)
    // donut: exterior forced CCW, hole forced CW — signed area = outer - hole
    val donut = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))"
    val sa = one(s"ST_SignedArea(ST_ForcePolygonCCW(ST_GeomFromText('$donut')))")
      .asInstanceOf[Double]
    assert(sa == 99.0, s"donut CCW signed area $sa")
    val saCw = one(s"ST_SignedArea(ST_ForcePolygonCW(ST_GeomFromText('$donut')))")
      .asInstanceOf[Double]
    assert(saCw == -99.0, s"donut CW signed area $saCw")
    // non-polygonal input passes through untouched
    assert(one("ST_AsText(ST_ForcePolygonCCW(ST_Point(1, 2)))") == "POINT (1 2)")
    // POLYGON EMPTY passes through instead of throwing in Orientation.isCCW
    // (round-11 advice fix; PostGIS returns the empty geometry)
    assert(one("ST_IsEmpty(ST_ForcePolygonCCW(ST_GeomFromText('POLYGON EMPTY')))") == true)
    // multi-key PostGIS style strings tokenize (round-11 grammar): flat
    // caps with explicit quad_segs behave like the single-key form
    assert(one("ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'quad_segs=4 endcap=flat'))") == 8.0)
    // join=mitre on a right-angle line keeps the square outer corner:
    // area = round-join area + the (2 - pi/2) corner wedge at d=1
    val aRound = one("ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0, 4 4)'), 1.0D, 'quad_segs=64 endcap=flat join=round'))").asInstanceOf[Double]
    val aMitre = one("ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0, 4 4)'), 1.0D, 'quad_segs=64 endcap=flat join=mitre mitre_limit=5'))").asInstanceOf[Double]
    assert(math.abs((aMitre - aRound) - (1.0 - math.Pi / 4)) < 1e-3,
      s"mitre corner wedge: round=$aRound mitre=$aMitre")
    // side=left/right: single-sided buffers of a straight segment are
    // half-plane strips of area len*d on opposite sides
    val left = one("ST_AsText(ST_Centroid(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'side=left')))")
    val right = one("ST_AsText(ST_Centroid(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'side=right')))")
    assert(left == "POINT (2 0.5)" && right == "POINT (2 -0.5)", s"$left / $right")
    // unknown key still fails loudly under the tokenizer
    intercept[Exception] {
      sql("SELECT ST_Buffer(ST_Point(0,0), 1.0D, 'endcap=flat frobnicate=1')").collect()
    }
    // a REPEATED side token must not double-negate back to the other side
    // (round-12 advice fix: negation is applied once after parsing)
    val rr = one("ST_AsText(ST_Centroid(ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'side=right side=right')))")
    assert(rr == "POINT (2 -0.5)", s"repeated side=right stayed right: $rr")
    // conflicting sides and bad side values fail loudly
    intercept[Exception] {
      sql("SELECT ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'side=left side=right')").collect()
    }
    intercept[Exception] {
      sql("SELECT ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 4 0)'), 1.0D, 'side=up')").collect()
    }
  }

  test("function registry: no duplicate (name, arity) registrations") {
    // round-12 fix: st_delaunaytriangles was declared twice at arity 1 and
    // survived only via Seq→Map ordering. byName now fails at class-init on
    // collisions; this spec pins the invariant directly on the sig table.
    val dupes = graft.functions.GeoFunctions.kernelMatrix
      .groupBy { case (name, _, _, params, _) => (name, params.length) }
      .filter(_._2.length > 1)
    assert(dupes.isEmpty, s"duplicate (name, arity) sigs: ${dupes.keys.mkString(", ")}")
  }

  test("ST_CrossTrackDistance: meridian anchor, on-track zero, side signs") {
    // route due north along the prime meridian; a point 1 deg east at the
    // equator is ~111.19 km right of track (R * 1 deg, small-angle exact
    // to < 20 m at this distance)
    val xt = one("ST_CrossTrackDistance(ST_Point(1, 0), ST_Point(0, -10), ST_Point(0, 10))")
      .asInstanceOf[Double]
    val oneDeg = 6371008.8 * math.Pi / 180.0
    assert(math.abs(xt - oneDeg) < 20.0, s"expected ~$oneDeg, got $xt")
    // west of the northbound track is negative (left)
    val xtw = one("ST_CrossTrackDistance(ST_Point(-1, 0), ST_Point(0, -10), ST_Point(0, 10))")
      .asInstanceOf[Double]
    assert(math.abs(xtw + oneDeg) < 20.0, s"expected ~-$oneDeg, got $xtw")
    // a point ON the route midpoint is on-track
    val xt0 = one("ST_CrossTrackDistance(ST_Point(0, 0), ST_Point(0, -10), ST_Point(0, 10))")
      .asInstanceOf[Double]
    assert(math.abs(xt0) < 1e-6)
  }

  test("line editing: OffsetCurve / FlipCoordinates / Add-Set-RemovePoint (round 19)") {
    // PostGIS conventions: offset positive = left; AddPoint -1 appends,
    // position inserts BEFORE; SetPoint -1 = last; RemovePoint must leave
    // a line
    assert(one("ST_AsText(ST_OffsetCurve(ST_GeomFromText('LINESTRING (0 0, 10 0)'), 2.0))") ==
      "LINESTRING (0 2, 10 2)")
    assert(one("ST_AsText(ST_OffsetCurve(ST_GeomFromText('LINESTRING (0 0, 10 0)'), -2.0))") ==
      "LINESTRING (0 -2, 10 -2)")
    // Z/M survive the flip (in-sequence mutation, not XY rebuild)
    assert(one("ST_AsText(ST_FlipCoordinates(ST_GeomFromText('LINESTRING ZM (1 2 7 8, 3 4 5 6)')))") ==
      "LINESTRING ZM(2 1 7 8, 4 3 5 6)")
    assert(one("ST_AsText(ST_AddPoint(ST_GeomFromText('LINESTRING (0 0, 1 1)'), ST_Point(2, 2)))") ==
      "LINESTRING (0 0, 1 1, 2 2)")
    assert(one("ST_AsText(ST_AddPoint(ST_GeomFromText('LINESTRING (0 0, 1 1)'), ST_Point(5, 5), 1))") ==
      "LINESTRING (0 0, 5 5, 1 1)")
    assert(one("ST_AsText(ST_SetPoint(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'), -1, ST_Point(9, 9)))") ==
      "LINESTRING (0 0, 1 1, 9 9)")
    assert(one("ST_AsText(ST_RemovePoint(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'), 1))") ==
      "LINESTRING (0 0, 2 2)")
    // loud contracts
    Seq(
      "ST_AddPoint(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0))'), ST_Point(1, 1))",
      "ST_SetPoint(ST_GeomFromText('LINESTRING (0 0, 1 1)'), 5, ST_Point(1, 1))",
      "ST_RemovePoint(ST_GeomFromText('LINESTRING (0 0, 1 1)'), 0)",
      "ST_AddPoint(ST_GeomFromText('LINESTRING (0 0, 1 1)'), ST_GeomFromText('POINT EMPTY'))"
    ).foreach { bad =>
      val e = intercept[Exception](one(s"ST_AsText($bad)"))
      assert(e.getMessage != null, bad)
    }
  }
}
