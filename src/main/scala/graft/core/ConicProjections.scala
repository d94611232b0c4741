package graft.core

/** Ellipsoidal conic projections — Albers Equal-Area and Lambert Conformal
  * Conic (2SP), the two workhorse national-grid projections the reference's
  * geodesy backend (4326/3857/UTM only) does not cover. Formulas are Snyder,
  * "Map Projections — A Working Manual" (USGS PP 1395, 1987): Albers
  * eqs 14-1..14-12 + 3-16, LCC eqs 15-1..15-11 + 7-9; specs pin both to
  * Snyder's published worked examples (pp. 103, 116-117, Clarke 1866) and
  * roundtrip properties on the shipped EPSG parameter sets.
  *
  * Exposed EPSG codes (graft extension beyond the reference's subset):
  *  - 5070  NAD83 / Conus Albers (GRS80; lat1 29.5, lat2 45.5, lat0 23,
  *          lon0 −96, FE/FN 0)
  *  - 2154  RGF93 / Lambert-93   (GRS80; lat1 44, lat2 49, lat0 46.5,
  *          lon0 3, FE 700000, FN 6600000)
  */
object ConicProjections {

  /** Ellipsoid + parameter bundle; angles in degrees. */
  final case class Conic(a: Double, invF: Double,
                         lat1: Double, lat2: Double, lat0: Double, lon0: Double,
                         fe: Double, fn: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }

  private val GRS80_A = 6378137.0
  private val GRS80_INVF = 298.257222101

  /** EPSG:5070 — NAD83 / Conus Albers. */
  val conusAlbers: Conic = Conic(GRS80_A, GRS80_INVF, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
  /** EPSG:2154 — RGF93 / Lambert-93 (LCC 2SP). */
  val lambert93: Conic = Conic(GRS80_A, GRS80_INVF, 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)

  @inline private def sinD(d: Double) = math.sin(math.toRadians(d))
  @inline private def cosD(d: Double) = math.cos(math.toRadians(d))

  // Snyder 14-15: m = cosφ / sqrt(1 − e² sin²φ)
  @inline private def mOf(p: Conic, latDeg: Double): Double = {
    val s = sinD(latDeg)
    cosD(latDeg) / math.sqrt(1 - p.e2 * s * s)
  }

  // Snyder 3-12: q = (1−e²)[ sinφ/(1−e²sin²φ) − (1/2e) ln((1−e sinφ)/(1+e sinφ)) ]
  @inline private def qOf(p: Conic, latDeg: Double): Double = {
    val s = sinD(latDeg)
    (1 - p.e2) * (s / (1 - p.e2 * s * s) -
      (1 / (2 * p.e)) * math.log((1 - p.e * s) / (1 + p.e * s)))
  }

  // ── Albers Equal-Area (Snyder ch. 14) ─────────────────────────────────

  private final class AlbersConsts(val p: Conic) {
    val m1 = mOf(p, p.lat1); val m2 = mOf(p, p.lat2)
    val q1 = qOf(p, p.lat1); val q2 = qOf(p, p.lat2)
    val n = (m1 * m1 - m2 * m2) / (q2 - q1) // 14-14
    val c = m1 * m1 + n * q1                // 14-13
    val rho0 = p.a * math.sqrt(c - n * qOf(p, p.lat0)) / n // 14-12a
  }
  private val albersCache = new java.util.concurrent.ConcurrentHashMap[Conic, AlbersConsts]()
  private def albers(p: Conic): AlbersConsts =
    albersCache.computeIfAbsent(p, new AlbersConsts(_))

  /** Per-call closure binding the cone constants ONCE — the hot mapCoords
    * loop must not pay a map probe + 8-double hash per vertex. */
  def albersForwardFn(p: Conic): (Double, Double) => (Double, Double) = {
    val k = albers(p)
    (lon, lat) => {
      val rho = p.a * math.sqrt(k.c - k.n * qOf(p, lat)) / k.n // 14-12
      val theta = math.toRadians(k.n * (lon - p.lon0))         // 14-4
      (p.fe + rho * math.sin(theta), p.fn + k.rho0 - rho * math.cos(theta)) // 14-1/14-2
    }
  }

  /** (lon, lat) degrees → (easting, northing) meters. */
  def albersForward(p: Conic, lon: Double, lat: Double): (Double, Double) =
    albersForwardFn(p)(lon, lat)

  /** (easting, northing) meters → (lon, lat) degrees. Latitude by Snyder
    * 3-16 iteration (converges in 3-4 steps to <1e-12 rad). */
  def albersInverseFn(p: Conic): (Double, Double) => (Double, Double) = {
    val k = albers(p)
    (x0, y0) => albersInverseWith(p, k, x0, y0)
  }

  def albersInverse(p: Conic, x0: Double, y0: Double): (Double, Double) =
    albersInverseWith(p, albers(p), x0, y0)

  private def albersInverseWith(p: Conic, k: AlbersConsts, x0: Double, y0: Double): (Double, Double) = {
    val x = x0 - p.fe
    val y = k.rho0 - (y0 - p.fn)
    // for n < 0 (southern cone) both rho and the atan2 operands flip sign;
    // the shipped parameter sets are northern (n > 0)
    val sgn = if (k.n >= 0) 1.0 else -1.0
    val rho = sgn * math.hypot(x, y)
    val theta = math.atan2(sgn * x, sgn * y) // 14-11
    val q = (k.c - math.pow(rho * k.n / p.a, 2)) / k.n // 14-19
    // 3-16 iteration from the spherical seed
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    while (i < 8) {
      val s = math.sin(phi)
      val d = math.pow(1 - p.e2 * s * s, 2) / (2 * math.cos(phi)) *
        (q / (1 - p.e2) - s / (1 - p.e2 * s * s) +
          (1 / (2 * p.e)) * math.log((1 - p.e * s) / (1 + p.e * s)))
      phi += d
      if (math.abs(d) < 1e-13) i = 8 else i += 1
    }
    (p.lon0 + math.toDegrees(theta) / k.n, math.toDegrees(phi))
  }

  // ── Lambert Conformal Conic, 2SP (Snyder ch. 15) ──────────────────────

  // Snyder 15-9: t = tan(π/4 − φ/2) / [(1 − e sinφ)/(1 + e sinφ)]^(e/2)
  @inline private def tOf(p: Conic, latDeg: Double): Double = {
    val phi = math.toRadians(latDeg)
    val s = math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - p.e * s) / (1 + p.e * s), p.e / 2)
  }

  private final class LccConsts(val p: Conic) {
    val m1 = mOf(p, p.lat1); val m2 = mOf(p, p.lat2)
    val t1 = tOf(p, p.lat1); val t2 = tOf(p, p.lat2)
    val n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2)) // 15-8
    val bigF = m1 / (n * math.pow(t1, n))                                 // 15-10
    val rho0 = p.a * bigF * math.pow(tOf(p, p.lat0), n)                   // 15-7a
  }
  private val lccCache = new java.util.concurrent.ConcurrentHashMap[Conic, LccConsts]()
  private def lcc(p: Conic): LccConsts =
    lccCache.computeIfAbsent(p, new LccConsts(_))

  /** Per-call closure binding the cone constants ONCE (see albersForwardFn). */
  def lccForwardFn(p: Conic): (Double, Double) => (Double, Double) = {
    val k = lcc(p)
    (lon, lat) => {
      val rho = p.a * k.bigF * math.pow(tOf(p, lat), k.n) // 15-7
      val theta = math.toRadians(k.n * (lon - p.lon0))    // 14-4
      (p.fe + rho * math.sin(theta), p.fn + k.rho0 - rho * math.cos(theta))
    }
  }

  /** (lon, lat) degrees → (easting, northing) meters. */
  def lccForward(p: Conic, lon: Double, lat: Double): (Double, Double) =
    lccForwardFn(p)(lon, lat)

  /** (easting, northing) meters → (lon, lat) degrees. Latitude by Snyder
    * 7-9 fixed-point iteration. */
  def lccInverseFn(p: Conic): (Double, Double) => (Double, Double) = {
    val k = lcc(p)
    (x0, y0) => lccInverseWith(p, k, x0, y0)
  }

  def lccInverse(p: Conic, x0: Double, y0: Double): (Double, Double) =
    lccInverseWith(p, lcc(p), x0, y0)

  private def lccInverseWith(p: Conic, k: LccConsts, x0: Double, y0: Double): (Double, Double) = {
    val x = x0 - p.fe
    val y = k.rho0 - (y0 - p.fn)
    val sgn = if (k.n >= 0) 1.0 else -1.0
    val rho = sgn * math.hypot(x, y)
    val theta = math.atan2(sgn * x, sgn * y)
    val t = math.pow(rho / (p.a * k.bigF), 1 / k.n) // 15-11
    var phi = math.Pi / 2 - 2 * math.atan(t)        // spherical seed (7-13)
    var i = 0
    while (i < 8) {
      val s = math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(
        t * math.pow((1 - p.e * s) / (1 + p.e * s), p.e / 2)) // 7-9
      val d = next - phi
      phi = next
      if (math.abs(d) < 1e-13) i = 8 else i += 1
    }
    (p.lon0 + math.toDegrees(theta) / k.n, math.toDegrees(phi))
  }
}
