package graft.core

/** Ellipsoidal Lambert Azimuthal Equal-Area — the pan-European statistics
  * grid projection (EPSG:3035, ETRS89-extended / LAEA Europe), the third
  * projection family in the engine after transverse Mercator and the
  * conics. Formulas are Snyder, "Map Projections — A Working Manual"
  * (USGS PP 1395, 1987), oblique ellipsoidal case: forward eqs 24-2..24-8
  * + 3-11/3-12, inverse eqs 24-16..24-19 + the 3-16 latitude iteration
  * (same public source as the EPSG guidance-note method 9820).
  *
  * The reference's geodesy backend covers 4326↔3857 only
  * (rust/geoarrow-old/src/algorithm/geodesy/reproject.rs:105); LAEA Europe
  * is the CRS every EU-wide equal-area aggregation (area sums, density
  * grids) is published in, so graft adds it on top.
  */
final class LaeaProjection(val a: Double, val invF: Double,
                           val lat0Deg: Double, val lon0Deg: Double,
                           val falseEasting: Double, val falseNorthing: Double) {

  private val f = 1.0 / invF
  private val e2 = f * (2.0 - f)
  private val e = math.sqrt(e2)

  // Snyder 3-12: q(φ) = (1−e²)[ sinφ/(1−e²sin²φ) − (1/2e)·ln((1−e sinφ)/(1+e sinφ)) ]
  @inline private def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - e2) * (s / (1.0 - e2 * s * s) -
      (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
  }

  private val phi0 = math.toRadians(lat0Deg)
  private val lam0 = math.toRadians(lon0Deg)
  private val qp = qOf(math.Pi / 2.0)             // q at the pole
  private val q1 = qOf(phi0)
  private val beta1 = math.asin(q1 / qp)          // authalic origin latitude
  private val rq = a * math.sqrt(qp / 2.0)        // authalic-sphere radius (3-13)
  private val m1 = math.cos(phi0) / math.sqrt(1.0 - e2 * math.sin(phi0) * math.sin(phi0))
  private val bigD = a * m1 / (rq * math.cos(beta1)) // 24-20
  private val sinB1 = math.sin(beta1)
  private val cosB1 = math.cos(beta1)

  /** geodetic (lon°, lat°) → grid (easting, northing). Fails loudly at the
    * projection's antipodal singularity (the point opposite the origin has
    * no finite image) instead of emitting Infinity. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lam = math.toRadians(lonDeg) - lam0
    val phi = math.toRadians(latDeg)
    // clamp q/qp into asin's domain: within ~1e-8° of the poles the
    // analytic margin (~(π/2−φ)²) drops below the q computation's own
    // rounding noise and the ratio can exceed 1 by an ulp — unclamped
    // that NaNs beta and mis-fires the antipode guard for a point
    // nowhere near the antipode (the reverse path already clamps)
    val beta = math.asin(math.max(-1.0, math.min(1.0, qOf(phi) / qp)))
    val sinB = math.sin(beta); val cosB = math.cos(beta)
    val denom = 1.0 + sinB1 * sinB + cosB1 * cosB * math.cos(lam)
    require(denom > 1e-10,
      f"LAEA: point ($lonDeg%.6f, $latDeg%.6f) is antipodal to the projection " +
        f"origin ($lon0Deg%.1f, $lat0Deg%.1f) — no finite image")
    val b = rq * math.sqrt(2.0 / denom)            // 24-19
    val x = b * bigD * cosB * math.sin(lam)        // 24-17
    val y = (b / bigD) * (cosB1 * sinB - sinB1 * cosB * math.cos(lam)) // 24-18
    (falseEasting + x, falseNorthing + y)
  }

  /** grid (easting, northing) → geodetic (lon°, lat°). */
  def reverse(easting: Double, northing: Double): (Double, Double) = {
    val x = easting - falseEasting
    val y = northing - falseNorthing
    val rho = math.hypot(x / bigD, bigD * y)       // 24-28
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    val ce = 2.0 * math.asin(rho / (2.0 * rq))     // 24-29
    val sinCe = math.sin(ce); val cosCe = math.cos(ce)
    val q = qp * (cosCe * sinB1 + bigD * y * sinCe * cosB1 / rho) // 24-27
    val lam = math.atan2(x * sinCe,
      bigD * rho * cosB1 * cosCe - bigD * bigD * y * sinB1 * sinCe) // 24-26
    // lon0 + atan2(...) spans (lon0−180, lon0+180]: normalize into the
    // EPSG:4326 domain or a western-hemisphere roundtrip returns lon up
    // to lon0+180 (e.g. −175 → 185) and composed hops through 4326 throw
    var lonOut = lon0Deg + math.toDegrees(lam)
    if (lonOut > 180.0) lonOut -= 360.0
    if (lonOut <= -180.0) lonOut += 360.0
    // latitude from q: Snyder 3-16 fixed-point iteration (converges to
    // double precision in a handful of rounds; seed with the authalic
    // approximation φ ≈ asin(q/2 ... ) — asin(q/qp·sin 90°) is enough)
    val qClamped = math.max(-qp, math.min(qp, q))
    var phi = math.asin(qClamped / qp * 0.999999999) // stay inside asin's domain
    var k = 0
    while (k < 12) {
      val s = math.sin(phi)
      val c = math.cos(phi)
      if (math.abs(c) < 1e-12) { k = 12 } // at the pole: φ converged
      else {
        val corr = math.pow(1.0 - e2 * s * s, 2.0) / (2.0 * c) *
          (q / (1.0 - e2) - s / (1.0 - e2 * s * s) +
            (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
        val next = phi + corr
        if (math.abs(next - phi) < 1e-15) { phi = next; k = 12 }
        else { phi = next; k += 1 }
      }
    }
    (lonOut, math.toDegrees(phi))
  }
}

/** EPSG:3035 — ETRS89-extended / LAEA Europe: GRS80, origin 52°N 10°E,
  * false origin 4321000/3210000 (the published EPSG parameters). ETRS89
  * is treated as datum-identical to WGS84 (they diverge by continental
  * drift, < 1 m and growing ~2.5 cm/yr; the null transformation is
  * PROJ's own default without a plate-motion model). */
object LaeaEurope {
  val projection = new LaeaProjection(
    a = 6378137.0, invF = 298.257222101, // GRS80
    lat0Deg = 52.0, lon0Deg = 10.0,
    falseEasting = 4321000.0, falseNorthing = 3210000.0)
}
