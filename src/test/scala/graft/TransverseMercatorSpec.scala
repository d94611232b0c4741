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

  // ── EPSG:27700 — Airy 1830 TM + WGS84↔OSGB36 Helmert (round 18) ───────

  test("OS worked example: OSGB36 geodetic -> BNG E/N to the millimetre") {
    // OS "A guide to coordinate systems in Great Britain", worked example
    // (Caister water tower): OSGB36 φ = 52°39'27.2531"N, λ = 1°43'4.5177"E
    // → E 651409.903, N 313177.270. Pure projection — no datum shift —
    // so this anchors the Airy TM constants and the non-zero lat0 handling.
    val lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
    val lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
    val (e, n) = graft.core.Osgb36.projection.forward(lon, lat)
    assert(math.abs(e - 651409.903) < 2e-3, s"easting $e")
    assert(math.abs(n - 313177.270) < 2e-3, s"northing $n")
    // grid true origin: 49°N 2°W must land exactly on the false origin
    val (e0, n0) = graft.core.Osgb36.projection.reverse(400000.0, -100000.0)
    assert(math.abs(e0 - (-2.0)) < 1e-12 && math.abs(n0 - 49.0) < 1e-12,
      s"false origin inverts to ($e0, $n0)")
  }

  test("Helmert shift: ETRS89 Caister lands within the published ~3.5 m of OSTN truth") {
    // same tower in ETRS89/WGS84: φ = 52°39'28.8282", λ = 1°42'57.8663".
    // The single national Helmert is published as ~3.5 m accurate vs the
    // OSTN grid-shift truth (651409.903, 313177.270) — assert inside 5 m,
    // and well OUTSIDE 50 m of the unshifted projection (i.e. the datum
    // shift is actually doing ~100 m of work).
    val lat = 52.0 + 39.0 / 60.0 + 28.8282 / 3600.0
    val lon = 1.0 + 42.0 / 60.0 + 57.8663 / 3600.0
    val (e, n) = graft.core.Osgb36.forward(lon, lat)
    val d = math.hypot(e - 651409.903, n - 313177.270)
    assert(d < 5.0, s"Helmert path landed $d m from OSTN truth ($e, $n)")
    val (eRaw, nRaw) = graft.core.Osgb36.projection.forward(lon, lat)
    val dRaw = math.hypot(eRaw - 651409.903, nRaw - 313177.270)
    assert(dRaw > 50.0, s"unshifted projection only $dRaw m off — shift not exercised")
  }

  test("27700 round-trip closes below 1 cm across Great Britain") {
    // the negated-parameter inverse Helmert carries only second-order
    // error (s·r·R, sub-mm) — round-trip must close far inside a cm
    val pts = Seq((-5.5, 50.1), (-3.2, 51.5), (-0.1276, 51.5072), // Penzance/Cardiff/London
      (-2.0, 49.0), (1.75, 52.48), (-4.25, 57.48), (-6.2, 58.2), (-1.6, 54.97))
    for ((lon, lat) <- pts) {
      val (e, n) = graft.core.Osgb36.forward(lon, lat)
      val (lon2, lat2) = graft.core.Osgb36.reverse(e, n)
      val dm = math.hypot((lon2 - lon) * 111320.0 * math.cos(math.toRadians(lat)),
                          (lat2 - lat) * 110574.0)
      assert(dm < 0.01, s"($lon, $lat) round-trip moved $dm m")
    }
  }

  test("ST_Transform wires 27700 (both directions + composition through 4326)") {
    val london = graft.core.GeomOps.point(-0.1276, 51.5072)
    val bng = graft.core.Geodesy.transform(london, 4326, 27700)
    val c = graft.core.GeomOps.read(bng).getCoordinate
    // central London sits near E 530000, N 180000 on the national grid
    assert(math.abs(c.x - 530000) < 2000 && math.abs(c.y - 180000) < 2000,
      s"London on BNG reads (${c.x}, ${c.y})")
    val back = graft.core.GeomOps.read(
      graft.core.Geodesy.transform(bng, 27700, 4326)).getCoordinate
    assert(math.abs(back.x - -0.1276) < 1e-7 && math.abs(back.y - 51.5072) < 1e-7)
    // composes through 4326 with the other families
    val utm30 = graft.core.Geodesy.transform(bng, 27700, 32630)
    val back2 = graft.core.GeomOps.read(
      graft.core.Geodesy.transform(utm30, 32630, 4326)).getCoordinate
    assert(math.abs(back2.x - -0.1276) < 1e-7 && math.abs(back2.y - 51.5072) < 1e-7)
  }
}
