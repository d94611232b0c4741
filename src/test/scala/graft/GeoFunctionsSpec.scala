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

  test("geometry type + validity") {
    assert(one("ST_GeometryType(ST_Point(1,1))") == "ST_Point")
    assert(one("ST_IsValid(ST_MakeEnvelope(0,0,1,1))") == true)
    assert(one("ST_IsEmpty(ST_GeomFromText('POINT EMPTY'))") == true)
  }
}
