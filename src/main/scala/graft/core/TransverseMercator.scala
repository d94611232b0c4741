package graft.core

/** WGS84 transverse Mercator (UTM) via the Krüger series in the third
  * flattening n, to order n^6 — the published Karney (2011, "Transverse
  * Mercator with an accuracy of a few nanometers", J. Geodesy 85)
  * formulation; coefficients are the standard public series (the same ones
  * GeographicLib documents). Accuracy within a UTM zone (|λ−λ0| ≤ 3°) is
  * far below a millimeter, which the property spec checks by independent
  * numeric integration of the meridian arc and by conformality of the
  * finite-difference Jacobian.
  *
  * The reference's geodesy backend covers only 4326↔3857
  * (rust/geoarrow/src/algorithm/geo/ — `geodesy` feature); UTM is the first
  * projection a user reprojecting regional data reaches for, so graft adds
  * the 326xx/327xx EPSG families on top.
  */
object TransverseMercator {

  private val a = 6378137.0 // WGS84 semi-major
  private val f = 1.0 / 298.257223563
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

  private val k0 = 0.9996 // UTM central-meridian scale
  private val falseEasting = 500000.0
  private val falseNorthingSouth = 10000000.0

  /** central meridian of UTM zone 1..60, degrees */
  def centralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  /** geodetic (lon°, lat°) → UTM (easting, northing) for `zone`,
    * `south` = southern-hemisphere false northing. */
  def forward(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lam = math.toRadians(lon - centralMeridian(zone))
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
    val northing = (if (south) falseNorthingSouth else 0.0) + k0 * bigA * xi
    (easting, northing)
  }

  /** UTM (easting, northing) → geodetic (lon°, lat°). */
  def reverse(easting: Double, northing: Double, zone: Int, south: Boolean): (Double, Double) = {
    val xi = (northing - (if (south) falseNorthingSouth else 0.0)) / (k0 * bigA)
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
    (centralMeridian(zone) + math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))
}
