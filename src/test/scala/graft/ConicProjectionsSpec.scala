package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ConicProjections
import graft.core.ConicProjections.Conic

/** Pins the conic projections to Snyder's PUBLISHED worked examples (USGS
  * PP 1395, Clarke 1866 ellipsoid) and roundtrip properties on the shipped
  * GRS80 parameter sets — the same doctest-anchoring discipline as
  * KarneyGeodesicSpec. */
class ConicProjectionsSpec extends AnyFunSuite {

  // Clarke 1866: a = 6378206.4, e² = 0.00676866 → invF from e² = f(2−f)
  private val clarke1866InvF = {
    val e2 = 0.00676866
    1.0 / (1 - math.sqrt(1 - e2))
  }

  test("Albers forward matches Snyder's worked example (p. 292, Clarke 1866)") {
    // Snyder numerical example for eq. 14: lat1 29.5, lat2 45.5, lat0 23,
    // lon0 −96; φ = 35°N, λ = 75°W → x = 1 885 472.7, y = 1 535 925.0
    val p = Conic(6378206.4, clarke1866InvF, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
    val (x, y) = ConicProjections.albersForward(p, -75.0, 35.0)
    assert(math.abs(x - 1885472.7) < 0.3, s"x = $x")
    assert(math.abs(y - 1535925.0) < 0.3, s"y = $y")
    // and the inverse of the published pair recovers the input
    val (lon, lat) = ConicProjections.albersInverse(p, 1885472.7, 1535925.0)
    assert(math.abs(lon - (-75.0)) < 1e-5 && math.abs(lat - 35.0) < 1e-5, s"($lon, $lat)")
  }

  test("LCC 2SP forward matches Snyder's worked example (p. 296, Clarke 1866)") {
    // Snyder numerical example for eq. 15: lat1 33, lat2 45, lat0 23,
    // lon0 −96; φ = 35°N, λ = 75°W → x = 1 894 410.9, y = 1 564 649.5
    val p = Conic(6378206.4, clarke1866InvF, 33.0, 45.0, 23.0, -96.0, 0.0, 0.0)
    val (x, y) = ConicProjections.lccForward(p, -75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.3, s"x = $x")
    assert(math.abs(y - 1564649.5) < 0.3, s"y = $y")
    val (lon, lat) = ConicProjections.lccInverse(p, 1894410.9, 1564649.5)
    assert(math.abs(lon - (-75.0)) < 1e-5 && math.abs(lat - 35.0) < 1e-5, s"($lon, $lat)")
  }

  test("EPSG:5070 / EPSG:2154 roundtrip property over their domains") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 500) {
      // CONUS-ish domain for 5070
      val lon = -124.0 + rnd.nextDouble() * 57.0
      val lat = 24.0 + rnd.nextDouble() * 25.0
      val (x, y) = ConicProjections.albersForward(ConicProjections.conusAlbers, lon, lat)
      val (lon2, lat2) = ConicProjections.albersInverse(ConicProjections.conusAlbers, x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"albers roundtrip ($lon, $lat) -> ($lon2, $lat2)")
      // France-ish domain for 2154
      val flon = -5.0 + rnd.nextDouble() * 14.0
      val flat = 41.0 + rnd.nextDouble() * 10.0
      val (fx, fy) = ConicProjections.lccForward(ConicProjections.lambert93, flon, flat)
      val (flon2, flat2) = ConicProjections.lccInverse(ConicProjections.lambert93, fx, fy)
      assert(math.abs(flon2 - flon) < 1e-9 && math.abs(flat2 - flat) < 1e-9,
        s"lcc roundtrip ($flon, $flat) -> ($flon2, $flat2)")
    }
    // Albers is EQUAL-AREA: a 1°x1° quad at two latitudes must keep the
    // true ellipsoidal area ratio after projection (planar shoelace on the
    // projected corners, densified edges)
    def quadArea(lat: Double): Double = {
      val n = 32
      // densified rectangle boundary (lon −100..−99, lat..lat+1)
      val pts = ((0 to n).map(i => (-100.0 + i.toDouble / n, lat)) ++
        (0 to n).map(i => (-99.0, lat + i.toDouble / n)) ++
        (0 to n).map(i => (-99.0 - i.toDouble / n, lat + 1.0)) ++
        (0 to n).map(i => (-100.0, lat + 1.0 - i.toDouble / n)))
        .map { case (lo, la) => ConicProjections.albersForward(ConicProjections.conusAlbers, lo, la) }
      var a2 = 0.0
      for (i <- pts.indices) {
        val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % pts.length)
        a2 += x1 * y2 - x2 * y1
      }
      math.abs(a2) / 2
    }
    val a30 = quadArea(30.0)
    val a45 = quadArea(45.0)
    // true ellipsoidal area element: dA ∝ cosφ (1−e²) / (1 − e² sin²φ)²
    // (midlat evaluation is accurate to ~1e-4 over a 1° band)
    val e2 = ConicProjections.conusAlbers.e2
    def areaFactor(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      math.cos(math.toRadians(latDeg)) / math.pow(1 - e2 * s * s, 2)
    }
    val ratio = a45 / a30
    val trueRatio = areaFactor(45.5) / areaFactor(30.5)
    assert(math.abs(ratio - trueRatio) / trueRatio < 1e-3,
      s"equal-area ratio $ratio vs $trueRatio")
  }
}
