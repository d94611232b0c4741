package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Datum, Geodesy, GeomOps, LaeaEurope, LaeaProjection, NatCrs}

/** Round-18 CRS breadth: EPSG:3035 (LAEA Europe), the ED50 datum family
  * (4230 + ED50/UTM 230xx), ETRS89/UTM 258xx and the geographic datum
  * codes — anchored on the published EPSG worked example, physical
  * equal-area invariance, and roundtrip properties. */
class LaeaSpec extends AnyFunSuite {

  test("LAEA forward matches the EPSG guidance-note worked example (method 9820)") {
    // EPSG GN 7-2, Lambert Azimuthal Equal Area example on ETRS89-LAEA:
    // lat 50°N, lon 5°E → E 3962799.45, N 2999718.85
    val (e, n) = LaeaEurope.projection.forward(5.0, 50.0)
    assert(math.abs(e - 3962799.45) < 0.01, s"easting $e")
    assert(math.abs(n - 2999718.85) < 0.01, s"northing $n")
    // inverse of the published pair recovers the input
    val (lon, lat) = LaeaEurope.projection.reverse(3962799.45, 2999718.85)
    assert(math.abs(lon - 5.0) < 1e-7 && math.abs(lat - 50.0) < 1e-7, s"($lon, $lat)")
  }

  test("LAEA roundtrip property over the FULL globe (antipode vicinity excluded)") {
    // full-longitude coverage matters: reverse() computes lon0 + atan2 in
    // (lon0−180, lon0+180], so a western-hemisphere point (lon −175) used
    // to come back as 185 — outside the 4326 domain (review round 18)
    val rnd = new scala.util.Random(30352026L)
    var checked = 0
    for (_ <- 0 until 2000) {
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 178.0 - 89.0
      // skip a 5° disc around the antipode of (10, 52): no finite image
      if (graft.core.Geodesy.haversineMeters(lon, lat, -170.0, -52.0) > 556000.0) {
        val (x, y) = LaeaEurope.projection.forward(lon, lat)
        val (lon2, lat2) = LaeaEurope.projection.reverse(x, y)
        assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
          s"roundtrip ($lon, $lat) -> ($x, $y) -> ($lon2, $lat2)")
        assert(lon2 > -180.0 && lon2 <= 180.0, s"lon out of domain: $lon2")
        checked += 1
      }
    }
    assert(checked > 1800)
    // a composed hop from the western hemisphere must not throw on the
    // 4326 pivot (the original failure shape)
    val pt = GeomOps.point(-175.0, 10.0)
    val back = GeomOps.read(Geodesy.transform(
      Geodesy.transform(pt, 4326, 3035), 3035, 3857)).getCoordinate
    assert(back.x < 0.0, s"western-hemisphere mercator x must be negative: ${back.x}")
  }

  test("LAEA forward at the near-pole rounding boundary stays finite") {
    // q(φ)/qp can exceed 1 by an ulp within ~1e-8° of the pole; unclamped
    // asin NaN'd and mis-fired the antipode guard (review round 18)
    for (lat <- Seq(90.0, 89.999999999, -89.999999999, -90.0 + 1e-12)) {
      val (x, y) = LaeaEurope.projection.forward(10.0, lat)
      assert(!x.isNaN && !y.isNaN, s"lat $lat -> ($x, $y)")
    }
  }

  test("LAEA is genuinely equal-area: projected planar area == ellipsoidal area") {
    // the defining property, checked physically: a quadrilateral's planar
    // area in EPSG:3035 must equal its ellipsoidal (Karney geodesic) area.
    // Densify the edges so the planar polygon tracks the projected edge
    // curvature; agreement to ~1e-6 relative is far beyond coincidence.
    graft.core.GeomOps // touch
    for ((lon0, lat0) <- Seq((10.0, 45.0), (-5.0, 55.0), (25.0, 65.0))) {
      val step = 0.02
      val n = 50 // 1°-sided cell densified to 50 segments per edge
      val ring = (0 to n).map(i => (lon0 + i * step, lat0)) ++
        (0 to n).map(i => (lon0 + 1.0, lat0 + i * step)) ++
        (0 to n).map(i => (lon0 + 1.0 - i * step, lat0 + 1.0)) ++
        (0 to n).map(i => (lon0, lat0 + 1.0 - i * step))
      val wkt = "POLYGON ((" +
        (ring :+ ring.head).map { case (x, y) => s"$x $y" }.mkString(", ") + "))"
      val wkb = GeomOps.geomFromText(org.apache.spark.unsafe.types.UTF8String.fromString(wkt))
      val geodesicArea = Geodesy.areaSpheroid(wkb)
      val projected = Geodesy.transform(wkb, 4326, 3035)
      val planarArea = GeomOps.area(projected)
      val rel = math.abs(planarArea - geodesicArea) / geodesicArea
      assert(rel < 2e-6,
        f"cell at ($lon0, $lat0): planar $planarArea%.1f vs geodesic $geodesicArea%.1f (rel $rel%.2e)")
    }
  }

  test("LAEA fails loudly at the antipodal singularity") {
    val err = intercept[IllegalArgumentException] {
      LaeaEurope.projection.forward(-170.0, -52.0) // antipode of (10, 52)
    }
    assert(err.getMessage.contains("antipodal"), err.getMessage)
  }

  test("ED50 datum shift: magnitude and direction in the published range") {
    // the mean-European 3-param shift moves coordinates by ~100-250 m on
    // the ground everywhere in the ED50 use area; and its inverse composes
    // to identity at second order
    for ((lon, lat) <- Seq((2.0, 41.4), (10.0, 50.0), (25.0, 60.0), (-5.0, 40.0))) {
      val (lonE, latE) = Datum.shift(Datum.Wgs84, Datum.International1924,
        Datum.Wgs84ToEd50, lon, lat)
      // |T| = 178 m geocentric; the horizontal share varies with position
      // (at high latitude more of it goes into the ellipsoidal height)
      val moved = Geodesy.haversineMeters(lon, lat, lonE, latE)
      assert(moved > 40.0 && moved < 300.0, s"($lon, $lat): ED50 offset $moved m")
      // ED50 graticule sits SW of WGS84 in Europe → the same physical
      // point gets LARGER ED50 coordinates (positive lat/lon shift)
      assert(latE > lat && lonE > lon, s"expected NE-positive shift, got ($lonE, $latE)")
      val (lon2, lat2) = Datum.shift(Datum.International1924, Datum.Wgs84,
        Datum.Wgs84ToEd50.reversed, lonE, latE)
      // 2D shifts discard the ellipsoidal height the translation induces
      // (~180 m here), so the reversal is exact only to ~mm on the ground —
      // the same contract as PROJ's 2D pipelines
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }
  }

  test("ED50/UTM and ETRS89/UTM roundtrip through transform(); ETRS89 UTM == WGS84 UTM to sub-mm") {
    val rnd = new scala.util.Random(23031L)
    for (_ <- 0 until 300) {
      val lon = 3.0 + rnd.nextDouble() * 6.0 // zone 31/32 area
      val lat = 36.0 + rnd.nextDouble() * 24.0
      val zone = if (lon < 6.0) 31 else 32
      // ED50/UTM roundtrip via the registry fns
      val f23 = NatCrs.forwardFn(23000 + zone)
      val r23 = NatCrs.reverseFn(23000 + zone)
      val (x, y) = f23(lon, lat)
      val (lon2, lat2) = r23(x, y)
      // mm-scale reversal asymmetry from the 2D height discard (see above)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"ED50/UTM roundtrip ($lon, $lat) -> ($lon2, $lat2)")
      // the ED50 false origin shows: ED50/UTM differs from WGS84/UTM by
      // the ~100-250 m datum offset, NOT by projection differences
      val (xw, yw) = graft.core.TransverseMercator.forward(lon, lat, zone, south = false)
      val d = math.hypot(x - xw, y - yw)
      assert(d > 80.0 && d < 300.0, s"ED50 vs WGS84 UTM offset $d m")
      // ETRS89/UTM == WGS84/UTM to sub-mm (GRS80 vs WGS84 flattening tail)
      val (xe, ye) = NatCrs.forwardFn(25800 + zone)(lon, lat)
      assert(math.hypot(xe - xw, ye - yw) < 1e-3,
        s"ETRS89 vs WGS84 UTM diverged: ${math.hypot(xe - xw, ye - yw)} m")
    }
  }

  test("NAD27 datum (third non-WGS84): offset in the published CONUS range, roundtrips") {
    for ((lon, lat) <- Seq((-99.0, 35.0), (-120.0, 40.0), (-80.0, 30.0), (-95.0, 45.0))) {
      val (lonN, latN) = Datum.shift(Datum.Wgs84, Datum.Clarke1866,
        Datum.Wgs84ToNad27, lon, lat)
      // CONUS NAD27-vs-WGS84 ground differences run ~10-200 m: the
      // geocentric |T| is 238 m, the ellipsoid change adds tens of metres
      val moved = Geodesy.haversineMeters(lon, lat, lonN, latN)
      assert(moved > 5.0 && moved < 300.0, s"($lon, $lat): NAD27 offset $moved m")
      val (lon2, lat2) = Datum.shift(Datum.Clarke1866, Datum.Wgs84,
        Datum.Wgs84ToNad27.reversed, lonN, latN)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
      // NAD27/UTM 14N through the registry: roundtrip + datum-offset shows
      if (lon > -102.0 && lon < -96.0) {
        val (x, y) = NatCrs.forwardFn(26714)(lon, lat)
        val (lo3, la3) = NatCrs.reverseFn(26714)(x, y)
        assert(math.abs(lo3 - lon) < 1e-7 && math.abs(la3 - lat) < 1e-7)
        val (xw, yw) = graft.core.TransverseMercator.forward(lon, lat, 14, south = false)
        val d = math.hypot(x - xw, y - yw)
        assert(d > 5.0 && d < 300.0, s"NAD27 vs WGS84 UTM offset $d m")
      }
    }
  }

  test("geographic datum codes and compositions through ST_Transform WKB paths") {
    val pt = GeomOps.point(1.5, 52.5)
    // 4258 (ETRS89) / 4269 (NAD83): null shift — identical coordinates
    for (srid <- Seq(4258, 4269)) {
      val out = GeomOps.read(Geodesy.transform(pt, 4326, srid)).getCoordinate
      assert(out.x == 1.5 && out.y == 52.5, s"EPSG:$srid must be a null shift")
    }
    // 4277 (OSGB36 geographic): the datum shift alone, no projection —
    // composing 4277 → 27700 must equal 4326 → 27700 of the unshifted point
    val osgbGeo = Geodesy.transform(pt, 4326, 4277)
    val viaGeo = GeomOps.read(Geodesy.transform(osgbGeo, 4277, 27700)).getCoordinate
    val direct = GeomOps.read(Geodesy.transform(pt, 4326, 27700)).getCoordinate
    // the 4277 leg shifts to OSGB36 and back before re-shifting: two extra
    // 2D height discards -> agreement to ~5 mm, not exact
    assert(math.abs(viaGeo.x - direct.x) < 5e-3 && math.abs(viaGeo.y - direct.y) < 5e-3,
      s"4277→27700 composition: ($viaGeo) vs direct ($direct)")
    // 4230 → 23031: ED50 geographic into ED50/UTM composes through 4326
    val ed50Geo = Geodesy.transform(pt, 4326, 4230)
    val viaEd50 = GeomOps.read(Geodesy.transform(ed50Geo, 4230, 23031)).getCoordinate
    val c = GeomOps.read(ed50Geo).getCoordinate
    val (xDirect, yDirect) = new graft.core.TmProjection(
      a = Datum.International1924.a, f = Datum.International1924.f, k0 = 0.9996,
      lon0Deg = 3.0, lat0Deg = 0.0, falseEasting = 500000.0, falseNorthing = 0.0)
      .forward(c.x, c.y)
    assert(math.abs(viaEd50.x - xDirect) < 2e-3 && math.abs(viaEd50.y - yDirect) < 2e-3,
      s"4230→23031: (${viaEd50.x}, ${viaEd50.y}) vs ($xDirect, $yDirect)")
    // 27700 → 3035 cross-datum hop executes (sanity: lands in the LAEA
    // domain expected for Britain, roughly E 3.4-3.7M, N 3.1-3.4M)
    val bng = Geodesy.transform(pt, 4326, 27700)
    val laea = GeomOps.read(Geodesy.transform(bng, 27700, 3035)).getCoordinate
    assert(laea.x > 3.3e6 && laea.x < 3.8e6 && laea.y > 3.0e6 && laea.y < 3.5e6,
      s"27700→3035 hop landed at (${laea.x}, ${laea.y})")
  }
}
