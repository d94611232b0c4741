package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.KarneyGeodesic

/** Anchored to the reference repo's own doctest/test expectations
  * (rust/geoarrow-old/src/algorithm/geo/geodesic_length.rs:51,
  * geodesic_area.rs:68,110) — independent Karney ground truth. */
class KarneyGeodesicSpec extends AnyFunSuite {

  test("inverse distance: NYC → London → Osaka = 15,109,158 m (reference doctest)") {
    val d = KarneyGeodesic.distance(40.7128, -74.006, 51.5074, -0.1278) +
      KarneyGeodesic.distance(51.5074, -0.1278, 34.687455, 135.5244559)
    assert(math.rint(d) == 15109158.0, s"got $d")
  }

  test("signed area: the O2 polygon = 78,596 m² (reference doctest)") {
    val pts = Array(
      (0.00388383, 51.501574), (0.00538587, 51.502278), (0.00553607, 51.503299),
      (0.00467777, 51.504181), (0.00327229, 51.504435), (0.00187754, 51.504168),
      (0.00087976, 51.503380), (0.00107288, 51.502324), (0.00185608, 51.501770))
    val lats = pts.map(_._2); val lons = pts.map(_._1)
    val area = KarneyGeodesic.ringAreaSigned(lats, lons)
    assert(math.rint(math.abs(area)) == 78596.0, s"got $area")
  }

  test("unsigned area: earth minus 1°-square = 510053312945726.94 m² (reference doctest)") {
    // the doctest's polygon is wound so its interior is everything EXCEPT
    // the square [0,1]×[0,1]; unsigned semantics resolve the negative signed
    // value to total − square
    val lats = Array(0.0, 1.0, 1.0, 0.0)
    val lons = Array(0.0, 0.0, 1.0, 1.0)
    val signed = KarneyGeodesic.ringAreaSigned(lats, lons)
    val unsigned = if (signed < 0) signed + KarneyGeodesic.area0 else signed
    val expected = 510053312945726.94
    assert(math.abs(unsigned - expected) / expected < 1e-12,
      s"got $unsigned, expected $expected (rel err ${math.abs(unsigned - expected) / expected})")
  }

  test("area0 equals 4π × authalic-radius²") {
    assert(math.abs(KarneyGeodesic.area0 - 4 * math.Pi * KarneyGeodesic.c2) == 0.0)
    // WGS84 authalic radius ≈ 6371007.1810 m
    assert(math.abs(math.sqrt(KarneyGeodesic.c2) - 6371007.1810) < 0.001)
  }

  test("antipodal and near-antipodal pairs (astroid start path)") {
    // equatorial antipodes: the geodesic runs over the pole — exactly twice
    // the WGS84 meridian quadrant (10,001,965.7293 m, public constant)
    val anti = KarneyGeodesic.distance(0, 0, 0, 180)
    assert(math.abs(anti - 2 * 10001965.7293) < 0.01, s"got $anti")
    // near-antipodal: finite, symmetric, bounded by the antipodal maximum
    val d1 = KarneyGeodesic.distance(0.3, 10.0, -0.2, -169.8)
    val d2 = KarneyGeodesic.distance(-0.2, -169.8, 0.3, 10.0)
    assert(d1.isFinite && math.abs(d1 - d2) < 1e-6)
    assert(d1 > 19.9e6 && d1 < 20.01e6, s"got $d1")
  }

  test("symmetry and degenerate cases") {
    // antisymmetric distance
    val d1 = KarneyGeodesic.distance(10, 20, -35, 140)
    val d2 = KarneyGeodesic.distance(-35, 140, 10, 20)
    assert(math.abs(d1 - d2) < 1e-6)
    // coincident points
    assert(KarneyGeodesic.distance(45, 45, 45, 45) == 0.0)
    // equatorial arc: s = a * lam (to first order exact on equator)
    val eq = KarneyGeodesic.distance(0, 0, 0, 1)
    assert(math.abs(eq - math.toRadians(1) * 6378137.0) < 1e-6)
    // ring with < 3 points
    assert(KarneyGeodesic.ringAreaSigned(Array(0, 1), Array(0, 1)) == 0.0)
    // CCW unit square at equator is positive, CW negative
    val ccw = KarneyGeodesic.ringAreaSigned(Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0))
    val cw = KarneyGeodesic.ringAreaSigned(Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 1.0))
    assert(ccw > 0 && cw < 0 && math.abs(ccw + cw) < 1e-3)
  }

  test("Vincenty inverse: reference doctest value and <1e-6 relative vs Karney") {
    import graft.core.Geodesy
    // vincenty_length.rs doctest: NYC → London → Osaka = 15,109,158 m
    val v = Geodesy.vincentyMeters(-74.006, 40.7128, -0.1278, 51.5074) +
      Geodesy.vincentyMeters(-0.1278, 51.5074, 135.5244559, 34.687455)
    assert(math.rint(v) == 15109158.0, s"got $v")
    // named variant agrees with Karney-exact to far better than 1e-6
    // relative on a spread of non-antipodal pairs (Vincenty's own bound is
    // ~0.5 mm); antipodal pairs take the documented Karney fallback
    val pairs = Seq(
      (-74.006, 40.7128, -0.1278, 51.5074),   // NYC-London
      (151.2093, -33.8688, -43.1729, -22.9068), // Sydney-Rio
      (0.0, 0.0, 0.001, 0.001),                // short equatorial
      (10.0, 89.0, 12.0, 88.5),                // near-polar
      (100.0, 45.0, 100.0, -45.0))             // same meridian
    pairs.foreach { case (lo1, la1, lo2, la2) =>
      val dv = Geodesy.vincentyMeters(lo1, la1, lo2, la2)
      val dk = KarneyGeodesic.distance(la1, lo1, la2, lo2)
      assert(math.abs(dv - dk) / dk < 1e-6, s"($lo1,$la1)->($lo2,$la2): $dv vs $dk")
    }
    // antipodal fallback stays finite and Karney-agreeing
    val anti = Geodesy.vincentyMeters(0.0, 0.0, 179.9999, 0.0001)
    val antiK = KarneyGeodesic.distance(0.0, 0.0, 0.0001, 179.9999)
    assert(math.abs(anti - antiK) / antiK < 1e-6)
    assert(Geodesy.vincentyMeters(5.0, 5.0, 5.0, 5.0) == 0.0)
  }
}
