package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TransverseMercator

/** Verifies the Krüger-series UTM implementation against checks that are
  * INDEPENDENT of the series itself: a numerically integrated meridian arc,
  * finite-difference conformality, round-trip closure, and the textbook
  * anchor for (0°, 0°) in UTM 31N. */
class TransverseMercatorSpec extends AnyFunSuite {

  private val aWgs = 6378137.0
  private val fWgs = 1.0 / 298.257223563
  private val e2 = fWgs * (2.0 - fWgs)
  private val k0 = 0.9996

  /** meridian arc length 0→φ by Simpson integration of
    * a(1−e²)/(1−e²sin²θ)^{3/2} — no shared code with the series. */
  private def meridianArc(phiDeg: Double): Double = {
    val phi = math.toRadians(phiDeg)
    val nSteps = 20000
    val h = phi / nSteps
    def f(t: Double): Double = {
      val s = math.sin(t)
      aWgs * (1.0 - e2) / math.pow(1.0 - e2 * s * s, 1.5)
    }
    var sum = f(0.0) + f(phi)
    var i = 1
    while (i < nSteps) {
      sum += (if (i % 2 == 1) 4.0 else 2.0) * f(i * h)
      i += 1
    }
    sum * h / 3.0
  }

  test("central meridian: E exactly 500000, N = k0 x integrated meridian arc") {
    for (latDeg <- Seq(0.0, 12.5, 45.0, 63.3, 80.0)) {
      val (east, north) = TransverseMercator.forward(9.0, latDeg, 32, south = false)
      assert(math.abs(east - 500000.0) < 1e-6, s"lat=$latDeg east=$east")
      val expected = k0 * meridianArc(latDeg)
      assert(math.abs(north - expected) < 1e-3, // Simpson at 20k steps ~ sub-mm
        s"lat=$latDeg north=$north integrated=$expected")
    }
  }

  test("textbook anchor: (0N, 0E) in UTM 31N is E 166021.44, N 0") {
    val (east, north) = TransverseMercator.forward(0.0, 0.0, 31, south = false)
    assert(math.abs(east - 166021.44) < 0.02, s"east=$east")
    assert(math.abs(north) < 1e-9, s"north=$north")
  }

  test("round-trip closes below 1e-9 degrees across zones and hemispheres") {
    val cases = Seq(
      (9.0, 48.7758, 32, false),   // Stuttgart, zone 32N
      (13.4050, 52.5200, 33, false), // Berlin, zone 33N
      (-74.006, 40.7128, 18, false), // NYC, zone 18N
      (151.2093, -33.8688, 56, true), // Sydney, zone 56S
      (-58.3816, -34.6037, 21, true), // Buenos Aires, zone 21S
      (6.1, 0.05, 32, false),       // near equator, zone edge
      (11.9, 79.5, 33, false))      // high latitude
    for ((lon, lat, zone, south) <- cases) {
      val (e1, n1) = TransverseMercator.forward(lon, lat, zone, south)
      val (lon2, lat2) = TransverseMercator.reverse(e1, n1, zone, south)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) z$zone -> ($e1,$n1) -> ($lon2,$lat2)")
    }
  }

  test("conformality: finite-difference Jacobian is a scaled rotation; k0 on the meridian") {
    val h = 1e-7 // degrees
    for ((lon, lat, zone) <- Seq((9.0, 45.0, 32), (10.5, 52.0, 32), (6.2, -20.0, 32))) {
      val south = lat < 0
      val (ex0, ny0) = TransverseMercator.forward(lon, lat, zone, south)
      val (exLon, nyLon) = TransverseMercator.forward(lon + h, lat, zone, south)
      val (exLat, nyLat) = TransverseMercator.forward(lon, lat + h, zone, south)
      val dEdLon = (exLon - ex0) / h; val dNdLon = (nyLon - ny0) / h
      val dEdLat = (exLat - ex0) / h; val dNdLat = (nyLat - ny0) / h
      // conformal: the column scaled by metric factors forms a rotation —
      // scale along a parallel == scale along the meridian
      val phi = math.toRadians(lat)
      val sin2 = math.sin(phi) * math.sin(phi)
      val nu = aWgs / math.sqrt(1.0 - e2 * sin2) // prime vertical radius
      val rho = aWgs * (1.0 - e2) / math.pow(1.0 - e2 * sin2, 1.5) // meridian radius
      val degToRad = math.Pi / 180.0
      val scaleLon = math.hypot(dEdLon, dNdLon) / (nu * math.cos(phi) * degToRad)
      val scaleLat = math.hypot(dEdLat, dNdLat) / (rho * degToRad)
      assert(math.abs(scaleLon - scaleLat) < 1e-5, s"($lon,$lat): $scaleLon vs $scaleLat")
      // and on the central meridian the scale IS k0
      val (exA, nyA) = TransverseMercator.forward(9.0, lat, 32, south)
      val (exB, nyB) = TransverseMercator.forward(9.0, lat + h, 32, south)
      val k = math.hypot(exB - exA, nyB - nyA) / (rho * h * degToRad)
      assert(math.abs(k - k0) < 1e-6, s"lat=$lat central-meridian scale=$k")
    }
  }

  test("ST_Transform wires the EPSG families (and rejects the rest)") {
    val pt = graft.core.GeomOps.point(13.4050, 52.5200)
    val utm = graft.core.Geodesy.transform(pt, 4326, 32633)
    val g = graft.core.GeomOps.read(utm).getCoordinate
    val (expE, expN) = TransverseMercator.forward(13.4050, 52.5200, 33, south = false)
    assert(math.abs(g.x - expE) < 1e-9 && math.abs(g.y - expN) < 1e-9)
    val back = graft.core.GeomOps.read(
      graft.core.Geodesy.transform(utm, 32633, 4326)).getCoordinate
    assert(math.abs(back.x - 13.4050) < 1e-9 && math.abs(back.y - 52.5200) < 1e-9)
    // southern zone
    val syd = graft.core.Geodesy.transform(
      graft.core.GeomOps.point(151.2093, -33.8688), 4326, 32756)
    assert(graft.core.GeomOps.read(syd).getCoordinate.y > 6000000.0) // false northing applied
    intercept[IllegalArgumentException] {
      graft.core.Geodesy.transform(pt, 4326, 32661) // polar stereographic: not UTM
    }
    // zone-to-zone composes through 4326 and round-trips
    val z32 = graft.core.Geodesy.transform(utm, 32633, 32632)
    val back2 = graft.core.GeomOps.read(
      graft.core.Geodesy.transform(z32, 32632, 4326)).getCoordinate
    assert(math.abs(back2.x - 13.4050) < 1e-9 && math.abs(back2.y - 52.5200) < 1e-9)
    // and UTM <-> web mercator composes too
    val merc = graft.core.Geodesy.transform(utm, 32633, 3857)
    val back3 = graft.core.GeomOps.read(
      graft.core.Geodesy.transform(merc, 3857, 4326)).getCoordinate
    assert(math.abs(back3.x - 13.4050) < 1e-9 && math.abs(back3.y - 52.5200) < 1e-9)
  }
}
