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

  test("direct problem: cardinal anchors pin the azimuth convention") {
    // 10° of equator = 1,113,194.908 m (a·λ); due east keeps lat 0
    val (s, a1, a2) = KarneyGeodesic.inverseAzimuth(0, 0, 0, 10)
    assert(a1 == 90.0 && a2 == 90.0, s"equatorial azimuths $a1/$a2")
    assert(math.abs(s - 1113194.9079327357) < 1e-6)
    val (la, lo, az) = KarneyGeodesic.direct(0, 0, 90.0, s)
    assert(math.abs(la) < 1e-12 && math.abs(lo - 10.0) < 1e-12 && math.abs(az - 90.0) < 1e-12,
      s"east along equator: ($la, $lo, $az)")
    // due north along a meridian
    val (sm, m1, m2) = KarneyGeodesic.inverseAzimuth(10, 20, 45, 20)
    assert(m1 == 0.0 && m2 == 0.0, s"meridional azimuths $m1/$m2")
    val (la2, lo2, _) = KarneyGeodesic.direct(10, 20, 0.0, sm)
    assert(math.abs(la2 - 45.0) < 1e-11 && math.abs(lo2 - 20.0) < 1e-11)
    // due south and west come out negative-normalized
    val (_, w1, _) = KarneyGeodesic.inverseAzimuth(0, 10, 0, 0)
    assert(w1 == -90.0, s"westward azimuth $w1")
  }

  test("direct ∘ inverseAzimuth roundtrips to nanometers over a fuzz corpus") {
    // the reverted series C1pf + the unswap tail are exercised across all
    // canonical-form branches (swapp/latsign/lonsign, meridional,
    // equatorial, near-antipodal): shooting the inverse's azimuth for the
    // inverse's distance must land on the target point
    val rnd = new scala.util.Random(0xA5E9D17L)
    var worst = 0.0
    var worstAzi = 0.0
    (0 until 2000).foreach { _ =>
      val la1 = rnd.nextDouble() * 178 - 89
      val lo1 = rnd.nextDouble() * 360 - 180
      val la2 = rnd.nextDouble() * 178 - 89
      val lo2 = rnd.nextDouble() * 360 - 180
      val (s, az1, az2) = KarneyGeodesic.inverseAzimuth(la1, lo1, la2, lo2)
      val (rla, rlo, raz2) = KarneyGeodesic.direct(la1, lo1, az1, s)
      val err = KarneyGeodesic.distance(la2, lo2, rla, rlo)
      if (err > worst) worst = err
      val dAzi = math.abs(az2 - raz2)
      if (dAzi < 180 && dAzi > worstAzi) worstAzi = dAzi
    }
    assert(worst < 1e-6, s"worst position roundtrip $worst m")
    assert(worstAzi < 1e-9, s"worst azi2 disagreement $worstAzi deg")
    // structured slices: meridional (lon equal), equatorial, near-antipodal
    Seq((10.0, 30.0, 80.0, 30.0), (0.0, -170.0, 0.0, 170.0),
        (0.3, 10.0, -0.2, -169.8), (45.0, 0.0, -44.9, 179.9)).foreach {
      case (la1, lo1, la2, lo2) =>
        val (s, az1, _) = KarneyGeodesic.inverseAzimuth(la1, lo1, la2, lo2)
        val (rla, rlo, _) = KarneyGeodesic.direct(la1, lo1, az1, s)
        assert(KarneyGeodesic.distance(la2, lo2, rla, rlo) < 1e-6,
          s"($la1,$lo1)->($la2,$lo2)")
    }
  }

  test("direct vs an inline Vincenty direct: <1 mm (independent algorithm family)") {
    // Vincenty 1975 eqs. 1-11 (the DIRECT problem), implemented here from
    // the published paper — a fully independent check that KarneyGeodesic
    // .direct's azimuth convention and position are geodesy's, not a
    // self-consistent invention (Vincenty direct is ~0.5 mm accurate and
    // always converges)
    def vincentyDirect(lat1: Double, lon1: Double, azi1: Double, s: Double)
        : (Double, Double) = {
      val a = 6378137.0; val f = 1.0 / 298.257223563; val b = a * (1 - f)
      val al1 = math.toRadians(azi1)
      val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
      val sig1 = math.atan2(math.tan(u1), math.cos(al1))
      val sinAl = math.cos(u1) * math.sin(al1)
      val cos2Al = 1 - sinAl * sinAl
      val u2 = cos2Al * (a * a - b * b) / (b * b)
      val bigA = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
      val bigB = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
      var sig = s / (b * bigA)
      var prev = Double.MaxValue
      var cos2m = 0.0
      var it = 0
      while (math.abs(sig - prev) > 1e-13 && it < 200) {
        cos2m = math.cos(2 * sig1 + sig)
        val ss = math.sin(sig); val cs = math.cos(sig)
        val dSig = bigB * ss * (cos2m + bigB / 4 * (cs * (-1 + 2 * cos2m * cos2m) -
          bigB / 6 * cos2m * (-3 + 4 * ss * ss) * (-3 + 4 * cos2m * cos2m)))
        prev = sig; sig = s / (b * bigA) + dSig; it += 1
      }
      cos2m = math.cos(2 * sig1 + sig)
      val ss = math.sin(sig); val cs = math.cos(sig)
      val lat2 = math.atan2(
        math.sin(u1) * cs + math.cos(u1) * ss * math.cos(al1),
        (1 - f) * math.hypot(sinAl,
          math.sin(u1) * ss - math.cos(u1) * cs * math.cos(al1)))
      val lam = math.atan2(ss * math.sin(al1),
        math.cos(u1) * cs - math.sin(u1) * ss * math.cos(al1))
      val c = f / 16 * cos2Al * (4 + f * (4 - 3 * cos2Al))
      val bigL = lam - (1 - c) * f * sinAl *
        (sig + c * ss * (cos2m + c * cs * (-1 + 2 * cos2m * cos2m)))
      (math.toDegrees(lat2), lon1 + math.toDegrees(bigL))
    }
    val rnd = new scala.util.Random(0xC0FFEEL)
    (0 until 500).foreach { _ =>
      val la1 = rnd.nextDouble() * 160 - 80
      val lo1 = rnd.nextDouble() * 340 - 170
      val azi = rnd.nextDouble() * 360 - 180
      val s = rnd.nextDouble() * 15000000.0
      val (kla, klo, _) = KarneyGeodesic.direct(la1, lo1, azi, s)
      val (vla, vlo) = vincentyDirect(la1, lo1, azi, s)
      val err = KarneyGeodesic.distance(kla, klo, vla, vlo)
      assert(err < 1e-3, s"from ($la1,$lo1) azi=$azi s=$s: " +
        s"karney ($kla,$klo) vs vincenty ($vla,$vlo), $err m apart")
    }
    // Clairaut's relation: sin α · cos β is constant along every geodesic —
    // an exact invariant tying the REPORTED azimuths to the positions
    def beta(latDeg: Double) =
      math.atan((1 - 1.0 / 298.257223563) * math.tan(math.toRadians(latDeg)))
    (0 until 200).foreach { _ =>
      val la1 = rnd.nextDouble() * 160 - 80
      val lo1 = rnd.nextDouble() * 340 - 170
      val azi = rnd.nextDouble() * 360 - 180
      val s = rnd.nextDouble() * 15000000.0
      val (la2, _, azi2) = KarneyGeodesic.direct(la1, lo1, azi, s)
      val c1 = math.sin(math.toRadians(azi)) * math.cos(beta(la1))
      val c2 = math.sin(math.toRadians(azi2)) * math.cos(beta(la2))
      assert(math.abs(c1 - c2) < 1e-12, s"Clairaut violated: $c1 vs $c2")
    }
  }
}
