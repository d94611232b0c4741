package graft.core

/** Exact geodesic computations on the WGS84 ellipsoid after Karney (2013),
  * "Algorithms for geodesics" (https://arxiv.org/pdf/1109.4448.pdf) — the
  * same published algorithm behind GeographicLib / geographiclib-rs, which
  * is what the reference uses for its geodesic length/area kernels
  * (rust/geoarrow-old/src/algorithm/geo/geodesic_area.rs:17,
  * geodesic_length.rs:18).
  *
  * Implements the INVERSE problem (distance + the geodesic area integral
  * S12) with the standard order-6 series expansions, plus the polygon-area
  * accumulator (spherical-excess term, pole-encircling correction, and the
  * signed/unsigned reductions). Validated against the reference's own
  * doctest values: NYC→London→Osaka length 15,109,158 m; the O2 polygon
  * signed area 78,596 m²; earth-minus-1°-square unsigned area
  * 510053312945726.94 m² (KarneyGeodesicSpec).
  */
object KarneyGeodesic {

  private val nC = 6 // series order

  // WGS84
  val a: Double = 6378137.0
  val f: Double = 1.0 / 298.257223563

  private val f1 = 1 - f
  private val e2 = f * (2 - f)
  private val ep2 = e2 / (f1 * f1)
  private val n = f / (2 - f)
  private val b = a * f1
  /** authalic radius squared */
  val c2: Double = (a * a + b * b *
    (if (e2 == 0) 1.0
     else (if (e2 > 0) atanh(math.sqrt(e2)) else math.atan(math.sqrt(-e2))) /
       math.sqrt(math.abs(e2)))) / 2
  /** total area of the ellipsoid, m² */
  val area0: Double = 4 * math.Pi * c2

  private val tiny = math.sqrt(java.lang.Double.MIN_NORMAL)
  private val tol0 = math.ulp(1.0)
  private val tol1 = 200 * tol0
  private val tol2 = math.sqrt(tol0)
  private val tolb = tol0 * tol2
  private val xthresh = 1000 * tol2
  private val maxit1 = 20
  private val maxit2 = maxit1 + 53 + 10
  private val etol2 = 0.1 * tol2 /
    math.sqrt(math.max(0.001, math.abs(f)) * math.min(1.0, 1 - f / 2) / 2)

  private def atanh(x: Double): Double = {
    val y = math.abs(x)
    val r = math.log1p(2 * y / (1 - y)) / 2
    if (x > 0) r else if (x < 0) -r else x
  }

  private def sq(x: Double): Double = x * x

  private def norm(x: Double, y: Double): (Double, Double) = {
    val h = math.hypot(x, y); (x / h, y / h)
  }

  /** error-free two-sum: (s, t) with u + v = s + t exactly */
  private def twoSum(u: Double, v: Double): (Double, Double) = {
    val s = u + v
    var up = s - v
    var vpp = s - up
    up -= u
    vpp -= v
    (s, if (s != 0) 0.0 - (up + vpp) else s)
  }

  private def angNormalize(x: Double): Double = {
    val y = math.IEEEremainder(x, 360.0)
    if (y == -180) 180 else y
  }

  /** (d, t): angular difference y - x, with correction term */
  private def angDiff(x: Double, y: Double): (Double, Double) = {
    val (d0, t0) = twoSum(angNormalize(-x), angNormalize(y))
    val d = angNormalize(d0)
    if (d == 180 && t0 > 0) twoSum(-180, t0) else twoSum(d, t0)
  }

  private def angRound(x: Double): Double = {
    val z = 1.0 / 16
    var y = math.abs(x)
    if (y < z) y = z - (z - y)
    if (x == 0) 0.0 else if (x < 0) -y else y
  }

  /** sin/cos of x in degrees, exact at multiples of 90 */
  private def sincosd(x: Double): (Double, Double) = {
    var r = x % 360.0
    val q = math.rint(r / 90).toInt
    r = math.toRadians(r - 90 * q)
    val s = math.sin(r); val c = math.cos(r)
    (q & 3: @annotation.switch) match {
      case 0 => (s, c)
      case 1 => (c, -s)
      case 2 => (-s, -c)
      case _ => (-c, s)
    }
  }

  /** atan2 in degrees with exact cardinal directions (GeographicLib
    * atan2d: quadrant fold so ±90/180 come out exact). */
  private def atan2d(y: Double, x: Double): Double = {
    var xx = x; var yy = y
    var q = 0
    if (math.abs(yy) > math.abs(xx)) { val t = xx; xx = yy; yy = t; q = 2 }
    if (xx < 0) { xx = -xx; q += 1 }
    val ang = math.toDegrees(math.atan2(yy, xx))
    q match {
      case 1 => (if (yy >= 0) 180.0 else -180.0) - ang
      case 2 => 90.0 - ang
      case 3 => -90.0 + ang
      case _ => ang
    }
  }

  private def polyval(N: Int, p: Array[Double], s: Int, x: Double): Double = {
    var y = if (N < 0) 0.0 else p(s)
    var i = s + 1
    val end = s + N
    while (i <= end) { y = y * x + p(i); i += 1 }
    y
  }

  // ── series coefficients ───────────────────────────────────────────────

  private def A1m1f(eps: Double): Double = {
    val coeff = Array(1.0, 4, 64, 0, 256)
    val m = nC / 2
    val t = polyval(m, coeff, 0, sq(eps)) / coeff(m + 1)
    (t + eps) / (1 - eps)
  }

  private val C1fCoeff = Array[Double](
    -1, 6, -16, 32, -9, 64, -128, 2048, 9, -16, 768, 3, -5, 512, -7, 1280, -7, 2048)

  private def C1f(eps: Double, c: Array[Double]): Unit = {
    val eps2 = sq(eps)
    var d = eps
    var o = 0
    var l = 1
    while (l <= nC) {
      val m = (nC - l) / 2
      c(l) = d * polyval(m, C1fCoeff, o, eps2) / C1fCoeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  /** Reverted distance series C'₁ (Karney 2013 eq. 21): τ → σ for the
    * DIRECT problem. Coefficients are the paper's primed table reduced to
    * a common denominator per order (the same layout as [[C1fCoeff]]). */
  private val C1pfCoeff = Array[Double](
    205, -432, 768, 1536,      // C'1[1]: ε(205ε⁴ − 432ε² + 768)/1536
    4005, -4736, 3840, 12288,  // C'1[2]
    -225, 116, 384,            // C'1[3]
    -7173, 2695, 7680,         // C'1[4]
    3467, 7680,                // C'1[5]
    38081, 61440)              // C'1[6]

  private def C1pf(eps: Double, c: Array[Double]): Unit = {
    val eps2 = sq(eps)
    var d = eps
    var o = 0
    var l = 1
    while (l <= nC) {
      val m = (nC - l) / 2
      c(l) = d * polyval(m, C1pfCoeff, o, eps2) / C1pfCoeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  private def A2m1f(eps: Double): Double = {
    val coeff = Array[Double](-11, -28, -192, 0, 256)
    val m = nC / 2
    val t = polyval(m, coeff, 0, sq(eps)) / coeff(m + 1)
    (t - eps) / (1 + eps)
  }

  private val C2fCoeff = Array[Double](
    1, 2, 16, 32, 35, 64, 384, 2048, 15, 80, 768, 7, 35, 512, 63, 1280, 77, 2048)

  private def C2f(eps: Double, c: Array[Double]): Unit = {
    val eps2 = sq(eps)
    var d = eps
    var o = 0
    var l = 1
    while (l <= nC) {
      val m = (nC - l) / 2
      c(l) = d * polyval(m, C2fCoeff, o, eps2) / C2fCoeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  private val aA3x: Array[Double] = {
    val coeff = Array[Double](
      -3, 128, -2, -3, 64, -1, -3, -1, 16, 3, -1, -2, 8, 1, -1, 2, 1, 1)
    val out = new Array[Double](nC)
    var o = 0; var k = 0
    var j = nC - 1
    while (j >= 0) {
      val m = math.min(nC - j - 1, j)
      out(k) = polyval(m, coeff, o, n) / coeff(o + m + 1)
      k += 1; o += m + 2; j -= 1
    }
    out
  }

  private def A3f(eps: Double): Double = polyval(nC - 1, aA3x, 0, eps)

  private val cC3x: Array[Double] = {
    val coeff = Array[Double](
      3, 128, 2, 5, 128, -1, 3, 3, 64, -1, 0, 1, 8, -1, 1, 4,
      5, 256, 1, 3, 128, -3, -2, 3, 64, 1, -3, 2, 32,
      7, 512, -10, 9, 384, 5, -9, 5, 192,
      7, 512, -14, 7, 512,
      21, 2560)
    val out = new Array[Double](15)
    var o = 0; var k = 0
    var l = 1
    while (l < nC) {
      var j = nC - 1
      while (j >= l) {
        val m = math.min(nC - j - 1, j)
        out(k) = polyval(m, coeff, o, n) / coeff(o + m + 1)
        k += 1; o += m + 2; j -= 1
      }
      l += 1
    }
    out
  }

  private def C3f(eps: Double, c: Array[Double]): Unit = {
    var mult = 1.0
    var o = 0
    var l = 1
    while (l < nC) {
      val m = nC - l - 1
      mult *= eps
      c(l) = mult * polyval(m, cC3x, o, eps)
      o += m + 1
      l += 1
    }
  }

  private val cC4x: Array[Double] = {
    val coeff = Array[Double](
      97, 15015, 1088, 156, 45045, -224, -4784, 1573, 45045,
      -10656, 14144, -4576, -858, 45045,
      64, 624, -4576, 6864, -3003, 15015,
      100, 208, 572, 3432, -12012, 30030, 45045,
      1, 9009, -2944, 468, 135135, 5792, 1040, -1287, 135135,
      5952, -11648, 9152, -2574, 135135,
      -64, -624, 4576, -6864, 3003, 135135,
      8, 10725, 1856, -936, 225225, -8448, 4992, -1144, 225225,
      -1440, 4160, -4576, 1716, 225225,
      -136, 63063, 1024, -208, 105105,
      3584, -3328, 1144, 315315,
      -128, 135135, -2560, 832, 405405,
      128, 99099)
    val out = new Array[Double](21)
    var o = 0; var k = 0
    var l = 0
    while (l < nC) {
      var j = nC - 1
      while (j >= l) {
        val m = nC - j - 1
        out(k) = polyval(m, coeff, o, n) / coeff(o + m + 1)
        k += 1; o += m + 2; j -= 1
      }
      l += 1
    }
    out
  }

  private def C4f(eps: Double, c: Array[Double]): Unit = {
    var mult = 1.0
    var o = 0
    var l = 0
    while (l < nC) {
      val m = nC - l - 1
      c(l) = mult * polyval(m, cC4x, o, eps)
      o += m + 1
      mult *= eps
      l += 1
    }
  }

  /** Clenshaw summation of the trig series. For sinp the array holds c(1..N)
    * (c(0) unused); otherwise c(0..N-1). */
  private def sinCosSeries(sinp: Boolean, sinx: Double, cosx: Double, c: Array[Double]): Double = {
    var k = c.length
    var nTerms = k - (if (sinp) 1 else 0)
    val ar = 2 * (cosx - sinx) * (cosx + sinx)
    var y1 = 0.0
    var y0 = if ((nTerms & 1) != 0) { k -= 1; c(k) } else 0.0
    nTerms /= 2
    while (nTerms > 0) {
      nTerms -= 1
      k -= 1; y1 = ar * y0 - y1 + c(k)
      k -= 1; y0 = ar * y1 - y0 + c(k)
    }
    if (sinp) 2 * sinx * cosx * y0 else cosx * (y0 - y1)
  }

  // ── inverse problem ───────────────────────────────────────────────────

  private final class Scratch {
    val C1a = new Array[Double](nC + 1)
    val C2a = new Array[Double](nC + 1)
    val C3a = new Array[Double](nC)
    val C4a = new Array[Double](nC)
  }

  /** (s12b, m12b, m0) — distance/reduced-length integrals (÷b). */
  private def lengths(eps: Double, sig12: Double,
                      ssig1: Double, csig1: Double, dn1: Double,
                      ssig2: Double, csig2: Double, dn2: Double,
                      wantDist: Boolean, wantRed: Boolean,
                      w: Scratch): (Double, Double, Double) = {
    var s12b = Double.NaN; var m12b = Double.NaN; var m0 = Double.NaN
    var A1 = 0.0; var A2 = 0.0; var m0x = 0.0
    if (wantDist || wantRed) {
      A1 = A1m1f(eps)
      C1f(eps, w.C1a)
      if (wantRed) {
        A2 = A2m1f(eps)
        C2f(eps, w.C2a)
        m0x = A1 - A2
        A2 = 1 + A2
      }
      A1 = 1 + A1
    }
    var J12 = 0.0
    if (wantDist) {
      val B1 = sinCosSeries(sinp = true, ssig2, csig2, w.C1a) -
        sinCosSeries(sinp = true, ssig1, csig1, w.C1a)
      s12b = A1 * (sig12 + B1)
      if (wantRed) {
        val B2 = sinCosSeries(sinp = true, ssig2, csig2, w.C2a) -
          sinCosSeries(sinp = true, ssig1, csig1, w.C2a)
        J12 = m0x * sig12 + (A1 * B1 - A2 * B2)
      }
    } else if (wantRed) {
      var l = 1
      while (l <= nC) { w.C2a(l) = A1 * w.C1a(l) - A2 * w.C2a(l); l += 1 }
      J12 = m0x * sig12 + (sinCosSeries(sinp = true, ssig2, csig2, w.C2a) -
        sinCosSeries(sinp = true, ssig1, csig1, w.C2a))
    }
    if (wantRed) {
      m0 = m0x
      m12b = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * J12
    }
    (s12b, m12b, m0)
  }

  private def astroid(x: Double, y: Double): Double = {
    val p = sq(x); val q = sq(y)
    val r = (p + q - 1) / 6
    if (q == 0 && r <= 0) return 0.0
    val S = p * q / 4
    val r2 = sq(r); val r3 = r * r2
    val disc = S * (S + 2 * r3)
    var u = r
    if (disc >= 0) {
      var T3 = S + r3
      T3 += (if (T3 < 0) -math.sqrt(disc) else math.sqrt(disc))
      val T = math.cbrt(T3)
      u += T + (if (T != 0) r2 / T else 0.0)
    } else {
      val ang = math.atan2(math.sqrt(-disc), -(S + r3))
      u += 2 * r * math.cos(ang / 3)
    }
    val v = math.sqrt(sq(u) + q)
    val uv = if (u < 0) q / (v - u) else u + v
    val w = (uv - q) / (2 * v)
    uv / (math.sqrt(uv + sq(w)) + w)
  }

  /** Starting guess for Newton's method; sig12 >= 0 signals the short-line
    * exit with (salp2, calp2, dnm) valid. */
  private def inverseStart(sbet1: Double, cbet1: Double, dn1: Double,
                           sbet2: Double, cbet2: Double, dn2: Double,
                           lam12: Double, slam12: Double, clam12: Double,
                           w: Scratch): (Double, Double, Double, Double, Double, Double) = {
    var sig12 = -1.0
    var salp2 = Double.NaN; var calp2 = Double.NaN; var dnm = Double.NaN
    val sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    val cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    val sbet12a = sbet2 * cbet1 + cbet2 * sbet1
    val shortline = cbet12 >= 0 && sbet12 < 0.5 && cbet2 * lam12 < 0.5
    var somg12 = 0.0; var comg12 = 0.0
    if (shortline) {
      var sbetm2 = sq(sbet1 + sbet2)
      sbetm2 = sbetm2 / (sbetm2 + sq(cbet1 + cbet2))
      dnm = math.sqrt(1 + ep2 * sbetm2)
      val omg12 = lam12 / (f1 * dnm)
      somg12 = math.sin(omg12); comg12 = math.cos(omg12)
    } else {
      somg12 = slam12; comg12 = clam12
    }
    var salp1 = cbet2 * somg12
    var calp1 =
      if (comg12 >= 0) sbet12 + cbet2 * sbet1 * sq(somg12) / (1 + comg12)
      else sbet12a - cbet2 * sbet1 * sq(somg12) / (1 - comg12)
    val ssig12 = math.hypot(salp1, calp1)
    val csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12
    if (shortline && ssig12 < etol2) {
      salp2 = cbet1 * somg12
      calp2 = sbet12 - cbet1 * sbet2 *
        (if (comg12 >= 0) sq(somg12) / (1 + comg12) else 1 - comg12)
      val (s2, c2n) = norm(salp2, calp2); salp2 = s2; calp2 = c2n
      sig12 = math.atan2(ssig12, csig12)
    } else if (math.abs(n) > 0.1 || csig12 >= 0 ||
               ssig12 >= 6 * math.abs(n) * math.Pi * sq(cbet1)) {
      // good enough already
    } else {
      // near-antipodal: solve the astroid problem
      val lam12x = math.atan2(-slam12, -clam12)
      var x = 0.0; var y = 0.0; var lamscale = 0.0; var betscale = 0.0
      if (f >= 0) {
        val k2 = sq(sbet1) * ep2
        val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
        lamscale = f * cbet1 * A3f(eps) * math.Pi
        betscale = lamscale * cbet1
        x = lam12x / lamscale
        y = sbet12a / betscale
      } else {
        val cbet12a = cbet2 * cbet1 - sbet2 * sbet1
        val bet12a = math.atan2(sbet12a, cbet12a)
        val (_, m12b, m0) = lengths(n, math.Pi + bet12a,
          sbet1, -cbet1, dn1, sbet2, cbet2, dn2, wantDist = false, wantRed = true, w)
        x = -1 + m12b / (cbet1 * cbet2 * m0 * math.Pi)
        betscale = if (x < -0.01) sbet12a / x else -f * sq(cbet1) * math.Pi
        lamscale = betscale / cbet1
        y = lam12x / lamscale
      }
      if (y > -tol1 && x > -1 - xthresh) {
        if (f >= 0) {
          salp1 = math.min(1.0, -x)
          calp1 = -math.sqrt(1 - sq(salp1))
        } else {
          calp1 = math.max(if (x > -tol1) 0.0 else -1.0, x)
          salp1 = math.sqrt(1 - sq(calp1))
        }
      } else {
        val k = astroid(x, y)
        val omg12a = lamscale * (if (f >= 0) -x * k / (1 + k) else -y * (1 + k) / k)
        somg12 = math.sin(omg12a); comg12 = -math.cos(omg12a)
        salp1 = cbet2 * somg12
        calp1 = sbet12a - cbet2 * sbet1 * sq(somg12) / (1 - comg12)
      }
    }
    if (salp1 > 0) {
      val (s1, c1) = norm(salp1, calp1); salp1 = s1; calp1 = c1
    } else { salp1 = 1; calp1 = 0 }
    (sig12, salp1, calp1, salp2, calp2, dnm)
  }

  private final case class L12(lam12: Double, salp2: Double, calp2: Double,
                               sig12: Double, ssig1: Double, csig1: Double,
                               ssig2: Double, csig2: Double, eps: Double,
                               domg12: Double, dlam12: Double)

  private def lambda12(sbet1: Double, cbet1: Double, dn1: Double,
                       sbet2: Double, cbet2: Double, dn2: Double,
                       salp1In: Double, calp1In: Double,
                       slam120: Double, clam120: Double,
                       diffp: Boolean, w: Scratch): L12 = {
    var salp1 = salp1In; var calp1 = calp1In
    if (sbet1 == 0 && calp1 == 0) calp1 = -tiny
    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1
    val somg1 = salp0 * sbet1
    var csig1 = calp1 * cbet1
    val comg1 = csig1
    locally { val (s, c) = norm(ssig1, csig1); ssig1 = s; csig1 = c }
    val salp2 = if (cbet2 != cbet1) salp0 / cbet2 else salp1
    val calp2 =
      if (cbet2 != cbet1 || math.abs(sbet2) != -sbet1)
        math.sqrt(sq(calp1 * cbet1) +
          (if (cbet1 < -sbet1) (cbet2 - cbet1) * (cbet1 + cbet2)
           else (sbet1 - sbet2) * (sbet1 + sbet2))) / cbet2
      else math.abs(calp1)
    var ssig2 = sbet2
    val somg2 = salp0 * sbet2
    var csig2 = calp2 * cbet2
    val comg2 = csig2
    locally { val (s, c) = norm(ssig2, csig2); ssig2 = s; csig2 = c }
    val sig12 = math.atan2(math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
      csig1 * csig2 + ssig1 * ssig2)
    val somg12 = math.max(0.0, comg1 * somg2 - somg1 * comg2)
    val comg12 = comg1 * comg2 + somg1 * somg2
    val eta = math.atan2(somg12 * clam120 - comg12 * slam120,
      comg12 * clam120 + somg12 * slam120)
    val k2 = sq(calp0) * ep2
    val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
    C3f(eps, w.C3a)
    val B312 = sinCosSeries(sinp = true, ssig2, csig2, w.C3a) -
      sinCosSeries(sinp = true, ssig1, csig1, w.C3a)
    val domg12 = -f * A3f(eps) * salp0 * (sig12 + B312)
    val lam12v = eta + domg12
    var dlam12 = Double.NaN
    if (diffp) {
      if (calp2 == 0) dlam12 = -2 * f1 * dn1 / sbet1
      else {
        val (_, m12b, _) = lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
          wantDist = false, wantRed = true, w)
        dlam12 = m12b * f1 / (calp2 * cbet2)
      }
    }
    L12(lam12v, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2, eps, domg12, dlam12)
  }

  /** Inverse geodesic: (s12 meters, S12 area integral m²). */
  def inverse(lat1In: Double, lon1: Double, lat2In: Double, lon2: Double): (Double, Double) = {
    val r = inverseFull(lat1In, lon1, lat2In, lon2)
    (r._1, r._2)
  }

  /** Inverse geodesic with azimuths: (s12 meters, azi1°, azi2°) — the
    * forward azimuths at the endpoints, degrees clockwise from north in
    * (−180, 180]. */
  def inverseAzimuth(lat1: Double, lon1: Double,
                     lat2: Double, lon2: Double): (Double, Double, Double) = {
    val r = inverseFull(lat1, lon1, lat2, lon2)
    (r._1, r._3, r._4)
  }

  private def inverseFull(lat1In: Double, lon1: Double,
                          lat2In: Double, lon2: Double): (Double, Double, Double, Double) = {
    val w = new Scratch
    var (lon12, lon12s) = angDiff(lon1, lon2)
    var lonsign = if (lon12 >= 0) 1.0 else -1.0
    lon12 = lonsign * angRound(lon12)
    lon12s = angRound((180 - lon12) - lonsign * lon12s)
    val lam12 = math.toRadians(lon12)
    var slam12 = 0.0; var clam12 = 0.0
    if (lon12 > 90) {
      val (s, c) = sincosd(lon12s); slam12 = s; clam12 = -c
    } else {
      val (s, c) = sincosd(lon12); slam12 = s; clam12 = c
    }
    var lat1 = angRound(lat1In)
    var lat2 = angRound(lat2In)
    val swapp = if (math.abs(lat1) < math.abs(lat2)) -1.0 else 1.0
    if (swapp < 0) {
      lonsign = -lonsign
      val t = lat1; lat1 = lat2; lat2 = t
    }
    val latsign = if (lat1 < 0) 1.0 else -1.0
    lat1 *= latsign; lat2 *= latsign

    var sbet1 = 0.0; var cbet1 = 0.0
    locally { val (s, c) = sincosd(lat1); sbet1 = s * f1; cbet1 = c }
    locally { val (s, c) = norm(sbet1, cbet1); sbet1 = s; cbet1 = math.max(tiny, c) }
    var sbet2 = 0.0; var cbet2 = 0.0
    locally { val (s, c) = sincosd(lat2); sbet2 = s * f1; cbet2 = c }
    locally { val (s, c) = norm(sbet2, cbet2); sbet2 = s; cbet2 = math.max(tiny, c) }
    if (cbet1 < -sbet1) {
      if (cbet2 == cbet1) sbet2 = math.copySign(sbet1, sbet2)
    } else {
      if (math.abs(sbet2) == -sbet1) cbet2 = cbet1
    }
    val dn1 = math.sqrt(1 + ep2 * sq(sbet1))
    val dn2 = math.sqrt(1 + ep2 * sq(sbet2))

    var s12x = Double.NaN
    var sig12 = 0.0
    var calp1 = 0.0; var salp1 = 0.0; var calp2 = 0.0; var salp2 = 0.0
    var omg12 = 0.0
    var somg12 = 2.0; var comg12 = 0.0 // somg12 == 2 marks "unset"
    var meridian = lat1 == -90 || slam12 == 0

    if (meridian) {
      calp1 = clam12; salp1 = slam12
      calp2 = 1.0; salp2 = 0.0
      val ssig1 = sbet1; val csig1 = calp1 * cbet1
      val ssig2 = sbet2; val csig2 = calp2 * cbet2
      sig12 = math.atan2(math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
        csig1 * csig2 + ssig1 * ssig2)
      val (s12bx, m12x, _) = lengths(n, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
        wantDist = true, wantRed = true, w)
      if (sig12 < 1 || m12x >= 0) {
        var s12b = s12bx
        if (sig12 < 3 * tiny || (sig12 < tol0 && (s12b < 0 || m12x < 0))) {
          sig12 = 0; s12b = 0
        }
        s12x = s12b * b
      } else meridian = false
    }

    if (!meridian && sbet1 == 0 && (f <= 0 || lon12s >= f * 180)) {
      // equatorial
      calp1 = 0; calp2 = 0; salp1 = 1; salp2 = 1
      s12x = a * lam12
      sig12 = lam12 / f1
      omg12 = sig12
    } else if (!meridian) {
      val (sig12g, salp1g, calp1g, salp2g, calp2g, dnm) =
        inverseStart(sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12, slam12, clam12, w)
      sig12 = sig12g; salp1 = salp1g; calp1 = calp1g; salp2 = salp2g; calp2 = calp2g
      if (sig12 >= 0) {
        // short-line estimate is already good
        s12x = sig12 * b * dnm
        omg12 = lam12 / (f1 * dnm)
      } else {
        // Newton's method on alpha1
        var tripn = false; var tripb = false
        var salp1a = tiny; var calp1a = 1.0
        var salp1b = tiny; var calp1b = -1.0
        var eps = 0.0; var domg12 = 0.0
        var ssig1 = 0.0; var csig1 = 0.0; var ssig2 = 0.0; var csig2 = 0.0
        var numit = 0
        var done = false
        while (!done && numit < maxit2) {
          val r = lambda12(sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
            slam12, clam12, diffp = numit < maxit1, w)
          val v = r.lam12
          salp2 = r.salp2; calp2 = r.calp2; sig12 = r.sig12
          ssig1 = r.ssig1; csig1 = r.csig1; ssig2 = r.ssig2; csig2 = r.csig2
          eps = r.eps; domg12 = r.domg12
          if (tripb || !(math.abs(v) >= (if (tripn) 8 else 1) * tol0)) done = true
          else {
            if (v > 0 && (numit > maxit1 || calp1 / salp1 > calp1b / salp1b)) {
              salp1b = salp1; calp1b = calp1
            } else if (v < 0 && (numit > maxit1 || calp1 / salp1 < calp1a / salp1a)) {
              salp1a = salp1; calp1a = calp1
            }
            var stepped = false
            if (numit < maxit1 && r.dlam12 > 0) {
              val dalp1 = -v / r.dlam12
              val sdalp1 = math.sin(dalp1); val cdalp1 = math.cos(dalp1)
              val nsalp1 = salp1 * cdalp1 + calp1 * sdalp1
              if (nsalp1 > 0 && math.abs(dalp1) < math.Pi) {
                calp1 = calp1 * cdalp1 - salp1 * sdalp1
                salp1 = nsalp1
                val (s, c) = norm(salp1, calp1); salp1 = s; calp1 = c
                tripn = math.abs(v) <= 16 * tol0
                stepped = true
              }
            }
            if (!stepped) {
              salp1 = (salp1a + salp1b) / 2
              calp1 = (calp1a + calp1b) / 2
              val (s, c) = norm(salp1, calp1); salp1 = s; calp1 = c
              tripn = false
              tripb = math.abs(salp1a - salp1) + (calp1a - calp1) < tolb ||
                math.abs(salp1 - salp1b) + (calp1 - calp1b) < tolb
            }
          }
          numit += 1
        }
        val (s12b, _, _) = lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
          wantDist = true, wantRed = false, w)
        s12x = s12b * b
        val sdomg12 = math.sin(domg12); val cdomg12 = math.cos(domg12)
        somg12 = slam12 * cdomg12 - clam12 * sdomg12
        comg12 = clam12 * cdomg12 + slam12 * sdomg12
      }
    }

    // area integral S12
    var S12 = 0.0
    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    if (calp0 != 0 && salp0 != 0) {
      var ssig1 = sbet1; var csig1 = calp1 * cbet1
      var ssig2 = sbet2; var csig2 = calp2 * cbet2
      val k2 = sq(calp0) * ep2
      val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
      val A4 = sq(a) * calp0 * salp0 * e2
      locally { val (s, c) = norm(ssig1, csig1); ssig1 = s; csig1 = c }
      locally { val (s, c) = norm(ssig2, csig2); ssig2 = s; csig2 = c }
      C4f(eps, w.C4a)
      val B41 = sinCosSeries(sinp = false, ssig1, csig1, w.C4a)
      val B42 = sinCosSeries(sinp = false, ssig2, csig2, w.C4a)
      S12 = A4 * (B42 - B41)
    }
    if (!meridian && somg12 == 2.0) {
      somg12 = math.sin(omg12); comg12 = math.cos(omg12)
    }
    var alp12 = 0.0
    if (!meridian && comg12 > -0.7071 && sbet2 - sbet1 < 1.75) {
      // geodesic runs in one hemisphere: stable 2-argument formula
      val domg12v = 1 + comg12; val dbet1 = 1 + cbet1; val dbet2 = 1 + cbet2
      alp12 = 2 * math.atan2(somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
        domg12v * (sbet1 * sbet2 + dbet1 * dbet2))
    } else {
      var salp12 = salp2 * calp1 - calp2 * salp1
      var calp12 = calp2 * calp1 + salp2 * salp1
      if (salp12 == 0 && calp12 < 0) {
        salp12 = tiny * calp1; calp12 = -1
      }
      alp12 = math.atan2(salp12, calp12)
    }
    S12 += c2 * alp12
    S12 *= swapp * lonsign * latsign
    S12 += 0.0
    // undo the canonical reductions for the azimuths (GeographicLib tail:
    // swap endpoints back, then apply the sign folds to each component)
    if (swapp < 0) {
      var t = salp1; salp1 = salp2; salp2 = t
      t = calp1; calp1 = calp2; calp2 = t
    }
    salp1 *= swapp * lonsign; calp1 *= swapp * latsign
    salp2 *= swapp * lonsign; calp2 *= swapp * latsign
    (s12x, S12, atan2d(salp1, calp1), atan2d(salp2, calp2))
  }

  /** Karney inverse distance in meters. */
  def distance(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    inverse(lat1, lon1, lat2, lon2)._1

  /** DIRECT geodesic problem (Karney 2013 §5 / GeographicLib
    * GeodesicLine.Position, distance mode): from (lat1, lon1) along the
    * geodesic with forward azimuth `azi1Deg` for `s12` meters →
    * (lat2°, lon2°, azi2°). σ is recovered from the reverted distance
    * series [[C1pf]]; WGS84's |f| < 0.01 keeps the solution inside the
    * series' stated accuracy without the large-flattening Newton polish
    * (the GeographicLib gate). Longitude comes out normalized to
    * (−180, 180]. */
  def direct(lat1In: Double, lon1: Double, azi1Deg: Double, s12: Double)
      : (Double, Double, Double) = {
    require(math.abs(lat1In) <= 90.0, s"KarneyGeodesic.direct: |lat1| > 90 ($lat1In)")
    val lat1 = angRound(lat1In)
    val (salp1, calp1) = sincosd(angRound(angNormalize(azi1Deg)))
    var sbet1 = 0.0; var cbet1 = 0.0
    locally { val (s, c) = sincosd(lat1); sbet1 = s * f1; cbet1 = c }
    locally { val (s, c) = norm(sbet1, cbet1); sbet1 = s; cbet1 = math.max(tiny, c) }
    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1
    val somg1 = salp0 * sbet1
    var csig1 = if (sbet1 != 0 || calp1 != 0) cbet1 * calp1 else 1.0
    val comg1 = csig1
    locally { val (s, c) = norm(ssig1, csig1); ssig1 = s; csig1 = c }
    val k2 = sq(calp0) * ep2
    val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
    val A1m1 = A1m1f(eps)
    val C1a = new Array[Double](nC + 1)
    C1f(eps, C1a)
    val B11 = sinCosSeries(sinp = true, ssig1, csig1, C1a)
    val sB = math.sin(B11); val cB = math.cos(B11)
    val stau1 = ssig1 * cB + csig1 * sB
    val ctau1 = csig1 * cB - ssig1 * sB
    val C1pa = new Array[Double](nC + 1)
    C1pf(eps, C1pa)
    val C3a = new Array[Double](nC)
    C3f(eps, C3a)
    val A3c = -f * salp0 * A3f(eps)
    val B31 = sinCosSeries(sinp = true, ssig1, csig1, C3a)
    // τ₁₂ → σ₁₂ through the reverted series
    val tau12 = s12 / (b * (1 + A1m1))
    val st = math.sin(tau12); val ct = math.cos(tau12)
    val B12 = -sinCosSeries(sinp = true,
      stau1 * ct + ctau1 * st, ctau1 * ct - stau1 * st, C1pa)
    val sig12 = tau12 - (B12 - B11)
    val ssig12 = math.sin(sig12); val csig12 = math.cos(sig12)
    var ssig2 = ssig1 * csig12 + csig1 * ssig12
    var csig2 = csig1 * csig12 - ssig1 * ssig12
    val sbet2 = calp0 * ssig2
    var cbet2 = math.hypot(salp0, calp0 * csig2)
    if (cbet2 == 0) { cbet2 = tiny; csig2 = tiny }
    val somg2 = salp0 * ssig2; val comg2 = csig2
    val salp2 = salp0; val calp2 = calp0 * csig2
    val omg12 = math.atan2(somg2 * comg1 - comg2 * somg1,
      comg2 * comg1 + somg2 * somg1)
    val lam12 = omg12 + A3c *
      (sig12 + (sinCosSeries(sinp = true, ssig2, csig2, C3a) - B31))
    val lon12 = math.toDegrees(lam12)
    val lon2 = angNormalize(angNormalize(lon1) + angNormalize(lon12))
    val lat2 = atan2d(sbet2, f1 * cbet2)
    val azi2 = atan2d(salp2, calp2)
    (lat2, lon2, azi2)
  }

  // ── polygon area accumulation (GeographicLib PolygonArea) ─────────────

  private def transit(lon1: Double, lon2: Double): Int = {
    val lon12 = angDiff(lon1, lon2)._1
    val l1 = angNormalize(lon1)
    val l2 = angNormalize(lon2)
    if (lon12 > 0 && ((l1 < 0 && l2 >= 0) || (l1 > 0 && l2 == 0))) 1
    else if (lon12 < 0 && l1 >= 0 && l2 < 0) -1
    else 0
  }

  /** Signed area of a closed ring given as (lat, lon) vertices (last vertex
    * need not repeat the first). Counter-clockwise positive, result in
    * (-area0/2, area0/2] m² — geographiclib's `sign=true` convention. */
  def ringAreaSigned(lats: Array[Double], lons: Array[Double]): Double = {
    val m = lats.length
    if (m < 3) return 0.0
    var area = 0.0
    var crossings = 0
    var i = 0
    while (i < m) {
      val j = (i + 1) % m
      val (_, s12a) = inverse(lats(i), lons(i), lats(j), lons(j))
      area += s12a
      crossings += transit(lons(i), lons(j))
      i += 1
    }
    if ((crossings & 1) != 0)
      area += (if (area < 0) 1 else -1) * area0 / 2
    // geographiclib accumulates with the clockwise sense; flip to CCW-positive
    area = -area
    if (area > area0 / 2) area -= area0
    else if (area <= -area0 / 2) area += area0
    area
  }
}
