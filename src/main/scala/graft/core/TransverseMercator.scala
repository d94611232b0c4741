package graft.core

/** Ellipsoidal transverse Mercator via the Krüger series in the third
  * flattening n, to order n^6 — the published Karney (2011, "Transverse
  * Mercator with an accuracy of a few nanometers", J. Geodesy 85)
  * formulation; coefficients are the standard public series (the same ones
  * GeographicLib documents). Accuracy within a national-grid zone
  * (|λ−λ0| ≤ 3-4°) is far below a millimeter, which the property spec
  * checks by independent numeric integration of the meridian arc and by
  * conformality of the finite-difference Jacobian.
  *
  * Parameterized over ellipsoid + grid constants (round 18): the same
  * series drives both WGS84 UTM (EPSG:326xx/327xx) and the Airy 1830
  * British National Grid (EPSG:27700, with [[Datum]] supplying the
  * WGS84↔OSGB36 Helmert shift).
  *
  * The reference's geodesy backend covers only 4326↔3857
  * (rust/geoarrow-old/src/algorithm/geodesy/reproject.rs:105); UTM and the
  * national grids are the first projections a user reprojecting regional
  * data reaches for, so graft adds them on top.
  */
final class TmProjection(val a: Double, val f: Double, val k0: Double,
                         val lon0Deg: Double, val lat0Deg: Double,
                         val falseEasting: Double, val falseNorthing: Double) {
  import TransverseMercator.{atanh, asinh}

  private val n = f / (2.0 - f)
  private val e = math.sqrt(f * (2.0 - f)) // first eccentricity

  /** rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64 + n⁶/256) */
  private val bigA = {
    val n2 = n * n
    a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0 + n2 * n2 * n2 / 256.0)
  }

  // forward (geodetic → TM) series coefficients α1..α6
  private val alpha: Array[Double] = {
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0 - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
      13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0 + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
      61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0 + 167603.0 * n6 / 181440.0,
      49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0 + 6601661.0 * n6 / 7257600.0,
      34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
      212378941.0 * n6 / 319334400.0)
  }

  // reverse (TM → geodetic) series coefficients β1..β6
  private val beta: Array[Double] = {
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0 - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
      n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0 - 1118711.0 * n6 / 3870720.0,
      17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0 + 5569.0 * n6 / 90720.0,
      4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0 - 830251.0 * n6 / 7257600.0,
      4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
      20648693.0 * n6 / 638668800.0)
  }

  /** Krüger ξ of a latitude on the central meridian (λ = λ0): η' = 0, so
    * ξ' is just the conformal latitude and every cosh factor is 1. */
  private def xiOfMeridian(latDeg: Double): Double = {
    val phi = math.toRadians(latDeg)
    val t = math.sinh(atanh(math.sin(phi)) - e * atanh(e * math.sin(phi)))
    val xiP = math.atan(t)
    var xi = xiP
    var j = 1
    while (j <= 6) { xi += alpha(j - 1) * math.sin(2.0 * j * xiP); j += 1 }
    xi
  }

  /** rectified northing of the grid's latitude origin — subtracted so a
    * non-equatorial origin (OSGB's 49°N) zeroes at the right parallel */
  private val xi0 = if (lat0Deg == 0.0) 0.0 else xiOfMeridian(lat0Deg)

  /** geodetic (lon°, lat°) → grid (easting, northing). */
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val lam = math.toRadians(lon - lon0Deg)
    val phi = math.toRadians(lat)
    // conformal latitude: tan χ = sinh( asinh(tan φ) − e atanh(e sin φ) )
    val t = math.sinh(atanh(math.sin(phi)) - e * atanh(e * math.sin(phi)))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val easting = falseEasting + k0 * bigA * eta
    val northing = falseNorthing + k0 * bigA * (xi - xi0)
    (easting, northing)
  }

  /** grid (easting, northing) → geodetic (lon°, lat°). */
  def reverse(easting: Double, northing: Double): (Double, Double) = {
    val xi = (northing - falseNorthing) / (k0 * bigA) + xi0
    val eta = (easting - falseEasting) / (k0 * bigA)
    var xiP = xi
    var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP)) // conformal latitude
    // invert χ(φ) by fixed-point iteration (converges to double precision
    // in a handful of rounds; avoids truncating yet another series)
    var phi = chi
    var k = 0
    while (k < 10) {
      val next = math.asin(math.tanh(atanh(math.sin(chi)) + e * atanh(e * math.sin(phi))))
      if (math.abs(next - phi) < 1e-15) { phi = next; k = 10 } else { phi = next; k += 1 }
    }
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
  }
}

/** WGS84 UTM facade over [[TmProjection]] — EPSG:326xx (north) / 327xx
  * (south); the southern false northing is additive over the shared
  * per-zone instance. */
object TransverseMercator {

  private val falseNorthingSouth = 10000000.0

  /** central meridian of UTM zone 1..60, degrees */
  def centralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  // one projection per zone, built lazily (a bench touches 1-2 zones)
  private val zones = new Array[TmProjection](60)
  private def zoneProj(zone: Int): TmProjection = {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone outside [1, 60]")
    var p = zones(zone - 1)
    if (p == null) {
      p = new TmProjection(a = 6378137.0, f = 1.0 / 298.257223563, k0 = 0.9996,
        lon0Deg = centralMeridian(zone), lat0Deg = 0.0,
        falseEasting = 500000.0, falseNorthing = 0.0)
      zones(zone - 1) = p // benign race: identical instances
    }
    p
  }

  /** geodetic (lon°, lat°) → UTM (easting, northing) for `zone`,
    * `south` = southern-hemisphere false northing. */
  def forward(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val (e, nn) = zoneProj(zone).forward(lon, lat)
    (e, nn + (if (south) falseNorthingSouth else 0.0))
  }

  /** UTM (easting, northing) → geodetic (lon°, lat°). */
  def reverse(easting: Double, northing: Double, zone: Int, south: Boolean): (Double, Double) = {
    val n0 = northing - (if (south) falseNorthingSouth else 0.0)
    zoneProj(zone).reverse(easting, n0)
  }

  private[core] def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private[core] def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
}

/** 7-parameter Helmert datum shifts between geodetic datums — the first
  * NON-WGS84 datum in the engine (round 18). The shift runs through
  * earth-centred cartesian coordinates: geodetic → ECEF on the source
  * ellipsoid, small-angle Helmert (position-vector / Bursa-Wolf sign
  * convention, the one OSGB publishes), ECEF → geodetic on the target
  * ellipsoid by fixed-point iteration. Heights are carried as 0 — the
  * engine's geometries are 2D-on-datum, matching PROJ's treatment of
  * 2D input. Formulas: OS "A guide to coordinate systems in Great
  * Britain" (public), annexes B/C. */
object Datum {

  final case class Ellipsoid(a: Double, f: Double) {
    val e2: Double = f * (2.0 - f)
  }
  val Wgs84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
  /** Airy 1830: a = 6377563.396, b = 6356256.909 (OS guide A.1). */
  val Airy1830 = Ellipsoid(6377563.396, (6377563.396 - 6356256.909) / 6377563.396)
  /** International 1924 (Hayford) — the ED50 ellipsoid. */
  val International1924 = Ellipsoid(6378388.0, 1.0 / 297.0)
  /** Clarke 1866 — the NAD27 ellipsoid: a = 6378206.4, b = 6356583.8. */
  val Clarke1866 = Ellipsoid(6378206.4, (6378206.4 - 6356583.8) / 6378206.4)
  /** GRS 1980 — NAD83/ETRS89; differs from WGS84 only in the 1e-10 tail
    * of the flattening. */
  val Grs80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)

  /** translations in metres, scale in ppm, rotations in arc-seconds
    * (position-vector convention). */
  final case class Helmert(tx: Double, ty: Double, tz: Double, sPpm: Double,
                           rxAs: Double, ryAs: Double, rzAs: Double) {
    val s: Double = sPpm * 1e-6
    private def rad(as: Double): Double = math.toRadians(as / 3600.0)
    val rx: Double = rad(rxAs); val ry: Double = rad(ryAs); val rz: Double = rad(rzAs)
    def reversed: Helmert = Helmert(-tx, -ty, -tz, -sPpm, -rxAs, -ryAs, -rzAs)
  }

  /** WGS84/ETRS89 → OSGB36 national standard single Helmert (OS guide
    * 6.6; ~3.5 m accuracy vs the OSTN grid shift, which needs an external
    * correction-grid file and is out of scope like full PROJ). */
  val Wgs84ToOsgb36 = Helmert(-446.448, 125.157, -542.060, 20.4894,
    -0.1502, -0.2470, -0.8421)

  /** WGS84 → ED50 (European Datum 1950 on International 1924): the
    * inverse of the published mean-European geocentric translation
    * "ED50 to WGS 84 (1)" (EPSG transformation 1133: dx −87, dy −98,
    * dz −121 m; ~10 m stated accuracy — the per-country variants refine
    * it but need regional parameter sets). */
  val Wgs84ToEd50 = Helmert(87.0, 98.0, 121.0, 0.0, 0.0, 0.0, 0.0)

  /** WGS84 → NAD27 (North American Datum 1927 on Clarke 1866): the
    * inverse of the published CONUS-mean geocentric translation
    * "NAD27 to WGS 84 (1)" (EPSG transformation 1173: dx −8, dy 160,
    * dz 176 m; ~10 m stated accuracy — NADCON grid shifts refine it but
    * need external grid files, out of scope like full PROJ). */
  val Wgs84ToNad27 = Helmert(8.0, -160.0, -176.0, 0.0, 0.0, 0.0, 0.0)

  /** GDA94 → GDA2020 national 7-param conformal transformation (ICSM
    * GDA2020 Technical Manual table 3.2 / EPSG transformation 8048 —
    * published in the COORDINATE-FRAME rotation convention, so the
    * rotation signs are NEGATED here for [[applyHelmert]]'s
    * position-vector form). The ~1.8 m NNE displacement is 25.75 years
    * of Australian plate motion (ITRF92@1994.0 → ITRF2014@2020.0);
    * WGS84 ≈ GDA94 under the same gridless convention as ETRS89/NAD83,
    * so this Helmert also serves WGS84 → GDA2020. */
  val Gda94ToGda2020 = Helmert(0.06155, -0.01087, -0.04019, -0.009994,
    0.0394924, 0.0327221, 0.0328979)

  /** 14-parameter TIME-DEPENDENT Helmert: parameters + per-year rates
    * about a reference epoch (decimal years), the EPSG "time-dependent
    * position vector" method re-expressed in [[applyHelmert]]'s
    * convention. `at(epoch)` materializes the plain 7-param set. */
  final case class Helmert14(tx: Double, ty: Double, tz: Double, sPpm: Double,
                             rxAs: Double, ryAs: Double, rzAs: Double,
                             dtx: Double, dty: Double, dtz: Double, dsPpm: Double,
                             drxAs: Double, dryAs: Double, drzAs: Double,
                             refEpoch: Double) {
    def at(epochYears: Double): Helmert = {
      val dt = epochYears - refEpoch
      Helmert(tx + dtx * dt, ty + dty * dt, tz + dtz * dt, sPpm + dsPpm * dt,
        rxAs + drxAs * dt, ryAs + dryAs * dt, rzAs + drzAs * dt)
    }
  }

  /** ITRF2014 → GDA2020 (EPSG transformation 8447): identity at the
    * 2020.0 reference epoch, pure Australian-plate rotation RATES
    * (published 1.50379 / 1.18346 / 1.20716 mas/yr in the
    * coordinate-frame convention → negated arc-seconds/yr here). At
    * epoch 1994.0 this reproduces [[Gda94ToGda2020]]'s rotations within
    * ~1 cm — the published consistency check between the pair. */
  val Itrf2014ToGda2020 = Helmert14(0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, -1.50379e-3, -1.18346e-3, -1.20716e-3, 2020.0)

  def geodeticToEcef(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lam = math.toRadians(lonDeg); val phi = math.toRadians(latDeg)
    val sp = math.sin(phi); val cp = math.cos(phi)
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * sp * sp)
    (nu * cp * math.cos(lam), nu * cp * math.sin(lam), nu * (1.0 - ell.e2) * sp)
  }

  def ecefToGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val lam = math.atan2(y, x)
    val p = math.hypot(x, y)
    // fixed point φ ← atan2(z + e²·ν(φ)·sinφ, p); linear convergence with
    // factor ≈ e² (~0.0067), so double precision in well under 10 rounds
    var phi = math.atan2(z, p * (1.0 - ell.e2))
    var k = 0
    while (k < 12) {
      val sp = math.sin(phi)
      val nu = ell.a / math.sqrt(1.0 - ell.e2 * sp * sp)
      val next = math.atan2(z + ell.e2 * nu * sp, p)
      if (math.abs(next - phi) < 1e-15) { phi = next; k = 12 } else { phi = next; k += 1 }
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** small-angle position-vector Helmert on ECEF (OS guide eq. 3):
    * x' = t + (1+s)·x + R×x with R the rotation pseudo-vector. */
  def applyHelmert(h: Helmert, x: Double, y: Double, z: Double): (Double, Double, Double) = {
    (h.tx + (1.0 + h.s) * x - h.rz * y + h.ry * z,
     h.ty + h.rz * x + (1.0 + h.s) * y - h.rx * z,
     h.tz - h.ry * x + h.rx * y + (1.0 + h.s) * z)
  }

  /** full geodetic datum shift `from` → `to` through ECEF. The inverse
    * direction uses the negated-parameter Helmert — second-order error
    * (s·r·R ≈ sub-millimetre), far inside the transformation's own
    * published accuracy. */
  def shift(from: Ellipsoid, to: Ellipsoid, h: Helmert,
            lonDeg: Double, latDeg: Double): (Double, Double) = {
    val (x, y, z) = geodeticToEcef(from, lonDeg, latDeg)
    val (x2, y2, z2) = applyHelmert(h, x, y, z)
    ecefToGeodetic(to, x2, y2, z2)
  }
}

/** EPSG:27700 — British National Grid: Airy 1830 transverse Mercator
  * (k0 = 0.9996012717, origin 49°N 2°W, false origin 400000/−100000, OS
  * guide A.2) composed with the national WGS84↔OSGB36 Helmert. The first
  * supported CRS whose datum is not WGS84 — exceeds the reference's
  * geodesy subset (reproject.rs:105). */
object Osgb36 {

  val projection = new TmProjection(
    a = Datum.Airy1830.a, f = Datum.Airy1830.f, k0 = 0.9996012717,
    lon0Deg = -2.0, lat0Deg = 49.0,
    falseEasting = 400000.0, falseNorthing = -100000.0)

  /** WGS84 (lon°, lat°) → OSGB easting/northing. */
  def forward(lonWgs: Double, latWgs: Double): (Double, Double) = {
    val (lo, la) = Datum.shift(Datum.Wgs84, Datum.Airy1830, Datum.Wgs84ToOsgb36, lonWgs, latWgs)
    projection.forward(lo, la)
  }

  /** OSGB easting/northing → WGS84 (lon°, lat°). */
  def reverse(easting: Double, northing: Double): (Double, Double) = {
    val (lo, la) = projection.reverse(easting, northing)
    Datum.shift(Datum.Airy1830, Datum.Wgs84, Datum.Wgs84ToOsgb36.reversed, lo, la)
  }
}

/** National/regional CRS registry beyond the analytic base set — every
  * entry maps WGS84 (lon°, lat°) ↔ the target CRS's native coordinates,
  * composing a datum shift (where the CRS's datum is not WGS84) with the
  * projection (where the CRS is projected). Geographic CRSs that ARE a
  * datum (4277/4230/4258/4269) are entries whose "projection" is the
  * identity, so datum hops compose through 4326 like everything else.
  *
  * Round-18 additions over 27700: EPSG:3035 (LAEA Europe), ED50 (4230 +
  * ED50/UTM 23028-23038, the second non-WGS84 datum), NAD27 (4267 +
  * NAD27/UTM 26701-26722 on Clarke 1866, the third), ETRS89 (4258 +
  * ETRS89/UTM 25828-25838) and NAD83 (4269). ETRS89/NAD83 use the null
  * datum shift (sub-metre vs WGS84, PROJ's own gridless default).
  *
  * Round 19: the GDA pair — GDA94 (4283 + MGA94 28349-28356, null shift
  * like ETRS89) and GDA2020 (7844 + MGA2020 7846-7859, the national
  * 7-param [[Datum.Gda94ToGda2020]]: ~1.8 m NNE of GDA94). The
  * time-dependent 14-param twin (EPSG 8447) is exposed as
  * `ST_TransformGda2020Epoch(g, epochYears)` for epoch-tagged ITRF2014
  * data — the engine's geometries carry no epoch, so it is an explicit
  * argument rather than a CRS-registry entry. */
object NatCrs {

  /** ED50/UTM zone from EPSG 230zz (zz = 28..38, northern Europe). */
  private def ed50Zone(srid: Int): Option[Int] = {
    val z = srid - 23000
    if (z >= 28 && z <= 38) Some(z) else None
  }
  /** ETRS89/UTM zone from EPSG 258zz (zz = 28..38). */
  private def etrsZone(srid: Int): Option[Int] = {
    val z = srid - 25800
    if (z >= 28 && z <= 38) Some(z) else None
  }
  /** NAD27/UTM zone from EPSG 267zz (zz = 01..22, the published range). */
  private def nad27Zone(srid: Int): Option[Int] = {
    val z = srid - 26700
    if (z >= 1 && z <= 22) Some(z) else None
  }
  /** MGA94 (GDA94 / Map Grid of Australia) zone from EPSG 283zz
    * (zz = 49..56, the published range). UTM SOUTH: false northing 10⁷. */
  private def mga94Zone(srid: Int): Option[Int] = {
    val z = srid - 28300
    if (z >= 49 && z <= 56) Some(z) else None
  }
  /** MGA2020 zone from EPSG 78zz (7846..7859 → zones 46..59). */
  private def mga2020Zone(srid: Int): Option[Int] = {
    val z = srid - 7800
    if (z >= 46 && z <= 59) Some(z) else None
  }

  // per-zone TM projections on the non-WGS84 ellipsoids, built lazily —
  // the same benign-race cache shape as TransverseMercator.zones; ONE
  // builder parameterized by ellipsoid serves every datum family (the
  // UTM grid constants are shared by all of them)
  private def zoneProj(cache: Array[TmProjection], ell: Datum.Ellipsoid,
                       zone: Int): TmProjection = {
    var p = cache(zone - 1)
    if (p == null) {
      p = new TmProjection(a = ell.a, f = ell.f, k0 = 0.9996,
        lon0Deg = TransverseMercator.centralMeridian(zone), lat0Deg = 0.0,
        falseEasting = 500000.0, falseNorthing = 0.0)
      cache(zone - 1) = p
    }
    p
  }
  private val ed50Zones = new Array[TmProjection](60)
  private def ed50Proj(zone: Int): TmProjection =
    zoneProj(ed50Zones, Datum.International1924, zone)
  private val etrsZones = new Array[TmProjection](60)
  private def etrsProj(zone: Int): TmProjection =
    zoneProj(etrsZones, Datum.Grs80, zone)
  private val nad27Zones = new Array[TmProjection](60)
  private def nad27Proj(zone: Int): TmProjection =
    zoneProj(nad27Zones, Datum.Clarke1866, zone)
  // MGA = UTM SOUTH on GRS80 (false northing 10,000,000); both MGA94 and
  // MGA2020 use the same grid — only the datum hop differs
  private def zoneProjSouth(cache: Array[TmProjection], ell: Datum.Ellipsoid,
                            zone: Int): TmProjection = {
    var p = cache(zone - 1)
    if (p == null) {
      p = new TmProjection(a = ell.a, f = ell.f, k0 = 0.9996,
        lon0Deg = TransverseMercator.centralMeridian(zone), lat0Deg = 0.0,
        falseEasting = 500000.0, falseNorthing = 10000000.0)
      cache(zone - 1) = p
    }
    p
  }
  private val mgaZones = new Array[TmProjection](60)
  private def mgaProj(zone: Int): TmProjection =
    zoneProjSouth(mgaZones, Datum.Grs80, zone)

  def supports(srid: Int): Boolean = srid match {
    case 27700 | 3035 | 4277 | 4230 | 4258 | 4269 | 4267 | 4283 | 7844 => true
    case s => ed50Zone(s).isDefined || etrsZone(s).isDefined || nad27Zone(s).isDefined ||
      mga94Zone(s).isDefined || mga2020Zone(s).isDefined
  }

  /** WGS84 (lon°, lat°) → target-CRS coordinates; resolved once per
    * geometry (the conic-fn discipline — no per-vertex dispatch). */
  def forwardFn(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 27700 => Osgb36.forward
    case 3035 => LaeaEurope.projection.forward // ETRS89 ≈ WGS84: null shift
    case 4277 => (lon, lat) =>
      Datum.shift(Datum.Wgs84, Datum.Airy1830, Datum.Wgs84ToOsgb36, lon, lat)
    case 4230 => (lon, lat) =>
      Datum.shift(Datum.Wgs84, Datum.International1924, Datum.Wgs84ToEd50, lon, lat)
    case 4258 | 4269 => (lon, lat) => (lon, lat) // ETRS89 / NAD83 ≈ WGS84
    case 4267 => (lon, lat) =>
      Datum.shift(Datum.Wgs84, Datum.Clarke1866, Datum.Wgs84ToNad27, lon, lat)
    case s if ed50Zone(s).isDefined =>
      val p = ed50Proj(ed50Zone(s).get)
      (lon, lat) => {
        val (lo, la) = Datum.shift(Datum.Wgs84, Datum.International1924,
          Datum.Wgs84ToEd50, lon, lat)
        p.forward(lo, la)
      }
    case s if etrsZone(s).isDefined =>
      val p = etrsProj(etrsZone(s).get)
      (lon, lat) => p.forward(lon, lat)
    case s if nad27Zone(s).isDefined =>
      val p = nad27Proj(nad27Zone(s).get)
      (lon, lat) => {
        val (lo, la) = Datum.shift(Datum.Wgs84, Datum.Clarke1866,
          Datum.Wgs84ToNad27, lon, lat)
        p.forward(lo, la)
      }
    case 4283 => (lon, lat) => (lon, lat) // GDA94 ≈ WGS84 (EPSG 1150: null)
    case 7844 => (lon, lat) =>
      Datum.shift(Datum.Grs80, Datum.Grs80, Datum.Gda94ToGda2020, lon, lat)
    case s if mga94Zone(s).isDefined =>
      val p = mgaProj(mga94Zone(s).get)
      (lon, lat) => p.forward(lon, lat) // null datum hop (GDA94 ≈ WGS84)
    case s if mga2020Zone(s).isDefined =>
      val p = mgaProj(mga2020Zone(s).get)
      (lon, lat) => {
        val (lo, la) = Datum.shift(Datum.Grs80, Datum.Grs80,
          Datum.Gda94ToGda2020, lon, lat)
        p.forward(lo, la)
      }
    case s => throw new IllegalArgumentException(s"NatCrs: unsupported EPSG:$s")
  }

  /** target-CRS coordinates → WGS84 (lon°, lat°). */
  def reverseFn(srid: Int): (Double, Double) => (Double, Double) = srid match {
    case 27700 => Osgb36.reverse
    case 3035 => LaeaEurope.projection.reverse
    case 4277 => (lon, lat) =>
      Datum.shift(Datum.Airy1830, Datum.Wgs84, Datum.Wgs84ToOsgb36.reversed, lon, lat)
    case 4230 => (lon, lat) =>
      Datum.shift(Datum.International1924, Datum.Wgs84, Datum.Wgs84ToEd50.reversed, lon, lat)
    case 4258 | 4269 => (lon, lat) => (lon, lat)
    case 4267 => (lon, lat) =>
      Datum.shift(Datum.Clarke1866, Datum.Wgs84, Datum.Wgs84ToNad27.reversed, lon, lat)
    case s if ed50Zone(s).isDefined =>
      val p = ed50Proj(ed50Zone(s).get)
      (x, y) => {
        val (lo, la) = p.reverse(x, y)
        Datum.shift(Datum.International1924, Datum.Wgs84, Datum.Wgs84ToEd50.reversed, lo, la)
      }
    case s if etrsZone(s).isDefined =>
      val p = etrsProj(etrsZone(s).get)
      (x, y) => p.reverse(x, y)
    case s if nad27Zone(s).isDefined =>
      val p = nad27Proj(nad27Zone(s).get)
      (x, y) => {
        val (lo, la) = p.reverse(x, y)
        Datum.shift(Datum.Clarke1866, Datum.Wgs84, Datum.Wgs84ToNad27.reversed, lo, la)
      }
    case 4283 => (lon, lat) => (lon, lat)
    case 7844 => (lon, lat) =>
      Datum.shift(Datum.Grs80, Datum.Grs80, Datum.Gda94ToGda2020.reversed, lon, lat)
    case s if mga94Zone(s).isDefined =>
      val p = mgaProj(mga94Zone(s).get)
      (x, y) => p.reverse(x, y)
    case s if mga2020Zone(s).isDefined =>
      val p = mgaProj(mga2020Zone(s).get)
      (x, y) => {
        val (lo, la) = p.reverse(x, y)
        Datum.shift(Datum.Grs80, Datum.Grs80, Datum.Gda94ToGda2020.reversed, lo, la)
      }
    case s => throw new IllegalArgumentException(s"NatCrs: unsupported EPSG:$s")
  }
}
