package graft.core

import org.locationtech.jts.geom._
import org.apache.spark.unsafe.types.UTF8String

/** Geodesic math the reference implements outside its geometry library —
  * spherical/ellipsoidal measures and web-mercator reprojection.
  *
  * ref: rust/geoarrow-old/src/algorithm/geo/{geodesic_area.rs:17,
  * haversine_length.rs:18, chamberlain_duquette_area.rs:61};
  * rust/geoarrow-old/src/algorithm/geodesy/reproject.rs:105 (the reference's
  * `geodesy` backend only supports a small analytic set — we mirror that with
  * EPSG:4326 ↔ EPSG:3857).
  *
  * All formulas are standard published geodesy (WGS84 constants; spherical
  * excess per Chamberlain–Duquette 2007; haversine per R.W. Sinnott 1984).
  */
object Geodesy {

  val EarthRadiusM = 6371008.8      // IAU mean radius
  val Wgs84A = 6378137.0            // semi-major axis
  val Wgs84F = 1.0 / 298.257223563  // flattening
  private val OriginShift = math.Pi * Wgs84A

  // ── EPSG:4326 ↔ EPSG:3857 (web mercator) ─────────────────────────────

  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = lon / 180.0 * OriginShift
    val y = math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) * Wgs84A
    (x, y)
  }

  def mercatorToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = x / OriginShift * 180.0
    val lat = math.atan(math.sinh(y / Wgs84A)) * 180.0 / math.Pi
    (lon, lat)
  }

  private def mapCoords(b: Array[Byte], f: Coordinate => Coordinate): Array[Byte] = {
    val g = GeomOps.read(b)
    val edited = new org.locationtech.jts.geom.util.GeometryEditor(GeomOps.factory).edit(g,
      new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
        override def edit(coords: Array[Coordinate], geom: Geometry): Array[Coordinate] =
          coords.map(f)
      })
    GeomOps.write(edited)
  }

  /** UTM zone from an EPSG code: 326zz (north) / 327zz (south), zz=01..60 */
  private def utmZone(srid: Int): Option[(Int, Boolean)] = {
    val zone = srid % 100
    if (zone < 1 || zone > 60) None
    else if (srid - zone == 32600) Some((zone, false))
    else if (srid - zone == 32700) Some((zone, true))
    else None
  }

  /** ST_Transform over the analytic pairs: 4326↔3857 (web mercator, what
    * the reference's geodesy backend covers) plus the UTM families
    * 4326↔326xx/327xx ([[TransverseMercator]], Krüger series). */
  /** EPSG:4326 domain validation on transform INPUT coordinates — the
    * bounds-error contract PROJ-backed engines give (out-of-domain
    * longitude/latitude fails loudly instead of propagating garbage
    * through the series). Projected-CRS sources are not bounds-checked:
    * eastings/northings have no hard domain, matching PROJ. */
  private def check4326(c: Coordinate, toSrid: Int): Unit = {
    require(math.abs(c.x) <= 180.0 && math.abs(c.y) <= 90.0,
      s"ST_Transform: coordinate (${c.x}, ${c.y}) outside the EPSG:4326 domain " +
        "(|lon| <= 180, |lat| <= 90)")
    if (toSrid == 3857) require(math.abs(c.y) < 90.0,
      s"ST_Transform: latitude ${c.y} not representable in EPSG:3857 " +
        "(web-mercator pole singularity)")
    // conic targets share the loud-failure contract: LCC's forward hits
    // tan(π/2)→∞ at the antipodal pole and the Albers inverse iteration
    // divides by cos(φ)=0 at ±90 — without this, pole inputs yield silent
    // Infinity/NaN coordinates where the 3857 path raises
    if (conicOf(toSrid).isDefined) require(math.abs(c.y) < 90.0,
      s"ST_Transform: latitude ${c.y} not representable in EPSG:$toSrid " +
        "(conic pole singularity)")
  }

  def transform(b: Array[Byte], fromSrid: Int, toSrid: Int): Array[Byte] =
    (fromSrid, toSrid) match {
      case (4326, 3857) => mapCoords(b, c => {
        check4326(c, 3857)
        val (x, y) = lonLatToMercator(c.x, c.y); new Coordinate(x, y)
      })
      case (3857, 4326) => mapCoords(b, c => {
        val (x, y) = mercatorToLonLat(c.x, c.y); new Coordinate(x, y)
      })
      case (f, t) if f == t => b
      case (4326, t) if utmZone(t).isDefined =>
        val (zone, south) = utmZone(t).get
        mapCoords(b, c => {
          check4326(c, t)
          val (x, y) = TransverseMercator.forward(c.x, c.y, zone, south); new Coordinate(x, y)
        })
      case (f, 4326) if utmZone(f).isDefined =>
        val (zone, south) = utmZone(f).get
        mapCoords(b, c => {
          val (x, y) = TransverseMercator.reverse(c.x, c.y, zone, south); new Coordinate(x, y)
        })
      // conic national grids (graft extension beyond the reference's
      // geodesy subset — Snyder 1987 ellipsoidal formulas, see
      // [[ConicProjections]]): 5070 Conus Albers, 2154 Lambert-93
      case (4326, t) if conicOf(t).isDefined =>
        val (conic, albersKind) = conicOf(t).get
        // constants resolved ONCE per geometry, not per vertex
        val fwd = if (albersKind) ConicProjections.albersForwardFn(conic)
                  else ConicProjections.lccForwardFn(conic)
        mapCoords(b, c => {
          check4326(c, t)
          val (x, y) = fwd(c.x, c.y)
          new Coordinate(x, y)
        })
      case (f, 4326) if conicOf(f).isDefined =>
        val (conic, albersKind) = conicOf(f).get
        val inv = if (albersKind) ConicProjections.albersInverseFn(conic)
                  else ConicProjections.lccInverseFn(conic)
        mapCoords(b, c => {
          val (lon, lat) = inv(c.x, c.y)
          new Coordinate(lon, lat)
        })
      // national/regional CRS registry ([[NatCrs]]): 27700 BNG (OSGB36
      // datum), 3035 LAEA Europe, ED50 (4230 + 230xx UTM), NAD27 (4267 +
      // 267xx UTM), ETRS89 (4258 + 258xx UTM), NAD83 (4269), OSGB36
      // geographic (4277) — datum shifts
      // compose with projections inside the registry entry, so a hop like
      // 4230→23031 or 27700→3035 is two analytic legs through 4326
      case (4326, t) if NatCrs.supports(t) =>
        val fwd = NatCrs.forwardFn(t) // resolved once per geometry
        mapCoords(b, c => {
          check4326(c, t)
          val (x, y) = fwd(c.x, c.y); new Coordinate(x, y)
        })
      case (f, 4326) if NatCrs.supports(f) =>
        val rev = NatCrs.reverseFn(f)
        mapCoords(b, c => {
          val (lon, lat) = rev(c.x, c.y); new Coordinate(lon, lat)
        })
      // any other pair of supported CRSs composes through 4326 (zone→zone,
      // UTM↔web-mercator, conic↔anything) — both legs are the analytic
      // base cases above
      case (f, t) if (f == 3857 || utmZone(f).isDefined || conicOf(f).isDefined || NatCrs.supports(f)) &&
                     (t == 3857 || utmZone(t).isDefined || conicOf(t).isDefined || NatCrs.supports(t)) =>
        transform(transform(b, f, 4326), 4326, t)
      case _ => throw new IllegalArgumentException(
        "ST_Transform: only EPSG 4326/3857/326xx/327xx (UTM)/5070/2154/27700/" +
          "3035/4230/230xx (ED50 UTM)/4267/267xx (NAD27 UTM)/4258/258xx " +
          s"(ETRS89 UTM)/4269/4277 pairs supported, got $fromSrid->$toSrid")
    }

  /** Conic parameter lookup: (params, isAlbers). */
  private def conicOf(srid: Int): Option[(ConicProjections.Conic, Boolean)] = srid match {
    case 5070 => Some((ConicProjections.conusAlbers, true))
    case 2154 => Some((ConicProjections.lambert93, false))
    case _ => None
  }

  // ── parameterized projections — the "my CRS has no EPSG code here"
  //    escape hatch (a PROJ-substitute for custom grids): the same four
  //    projection engines driven by RAW parameters instead of a code.
  //    Input/output geodetic coordinates are on the STATED ellipsoid's
  //    datum — datum shifts are the caller's job (compose with
  //    ST_Transform's datum codes when the grid sits on one of them).
  //    Projections are cached per parameter tuple: the StaticInvoke runs
  //    per ROW, and deriving the Krüger series (or conic constants) per
  //    row would dominate the scan — a bounded concurrent map makes the
  //    per-row cost one lookup. SQL: ST_TransformTM / ST_TransformTMInv /
  //    ST_TransformLAEA(+Inv) / ST_TransformAlbers(+Inv) /
  //    ST_TransformLCC(+Inv). ────────────────────────────────────────────
  private val customCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Double]), AnyRef]()
  private def cached[T <: AnyRef](kind: String, params: Seq[Double])(mk: => T): T = {
    if (customCache.size > 4096) customCache.clear() // literal-param workloads never get here
    customCache.computeIfAbsent((kind, params), _ => mk).asInstanceOf[T]
  }
  private def checkGeodetic(c: Coordinate): Unit =
    require(math.abs(c.x) <= 180.0 && math.abs(c.y) <= 90.0,
      s"parameterized transform: coordinate (${c.x}, ${c.y}) outside the geodetic domain")

  def transformTm(b: Array[Byte], a: Double, invF: Double, k0: Double,
                  lon0: Double, lat0: Double, fe: Double, fn: Double): Array[Byte] = {
    val p = cached("tm", Seq(a, invF, k0, lon0, lat0, fe, fn))(
      new TmProjection(a, 1.0 / invF, k0, lon0, lat0, fe, fn))
    mapCoords(b, c => { checkGeodetic(c)
      val (x, y) = p.forward(c.x, c.y); new Coordinate(x, y) })
  }
  def transformTmInv(b: Array[Byte], a: Double, invF: Double, k0: Double,
                     lon0: Double, lat0: Double, fe: Double, fn: Double): Array[Byte] = {
    val p = cached("tm", Seq(a, invF, k0, lon0, lat0, fe, fn))(
      new TmProjection(a, 1.0 / invF, k0, lon0, lat0, fe, fn))
    mapCoords(b, c => { val (lo, la) = p.reverse(c.x, c.y); new Coordinate(lo, la) })
  }

  def transformLaea(b: Array[Byte], a: Double, invF: Double, lat0: Double,
                    lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val p = cached("laea", Seq(a, invF, lat0, lon0, fe, fn))(
      new LaeaProjection(a, invF, lat0, lon0, fe, fn))
    mapCoords(b, c => { checkGeodetic(c)
      val (x, y) = p.forward(c.x, c.y); new Coordinate(x, y) })
  }
  def transformLaeaInv(b: Array[Byte], a: Double, invF: Double, lat0: Double,
                       lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val p = cached("laea", Seq(a, invF, lat0, lon0, fe, fn))(
      new LaeaProjection(a, invF, lat0, lon0, fe, fn))
    mapCoords(b, c => { val (lo, la) = p.reverse(c.x, c.y); new Coordinate(lo, la) })
  }

  /** Ellipsoidal forward problem (PostGIS ST_Project on GEOGRAPHY,
    * spheroid-exact): destination of `distM` meters from the point at
    * initial bearing `azRad` (radians clockwise from north — the planar
    * [[projectSphere]] argument convention) via the exact Karney direct
    * problem. SQL: ST_ProjectGeodesic(pt, m, azRad). */
  def projectGeodesic(b: Array[Byte], distM: Double, azRad: Double): Array[Byte] = {
    val c = GeomOps.read(b).getCoordinate
    val (la, lo, _) = KarneyGeodesic.direct(c.y, c.x, math.toDegrees(azRad), distM)
    GeomOps.point(lo, la)
  }

  /** Ellipsoidal forward azimuth from point a to point b (PostGIS
    * ST_Azimuth on GEOGRAPHY): radians clockwise from north in [0, 2π),
    * the planar [[GeomOps.azimuth]] convention — coincident points yield
    * NaN (null-free kernel, filter upstream). SQL: ST_AzimuthGeodesic. */
  def azimuthGeodesic(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    if (ca.x == cb.x && ca.y == cb.y) Double.NaN
    else {
      val azDeg = KarneyGeodesic.inverseAzimuth(ca.y, ca.x, cb.y, cb.x)._2
      val az = math.toRadians(azDeg)
      if (az < 0.0) az + 2.0 * math.Pi else az
    }
  }

  /** Geodesic segmentize (PostGIS ST_Segmentize on GEOGRAPHY): insert
    * vertices ALONG THE GEODESIC of every segment so no hop exceeds
    * `maxLenM` meters — the inserted points are exact Karney waypoints
    * (inverse for azimuth + total, direct for each fraction), so a
    * long segment densifies onto the true shortest path, not the
    * chart line. Applies to every coordinate sequence (LineString,
    * ring, Multi*); points pass through. Repeated vertices (zero-length
    * hops) are preserved untouched. SQL: ST_SegmentizeGeodesic(g, m). */
  def segmentizeGeodesic(b: Array[Byte], maxLenM: Double): Array[Byte] = {
    require(maxLenM > 0.0, s"ST_SegmentizeGeodesic: max length $maxLenM must be > 0")
    val g = GeomOps.read(b)
    val edited = new org.locationtech.jts.geom.util.GeometryEditor(GeomOps.factory).edit(g,
      new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
        override def edit(coords: Array[Coordinate], geom: Geometry): Array[Coordinate] = {
          if (coords.length < 2) return coords
          val out = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
          out += coords(0)
          var i = 1
          while (i < coords.length) {
            val p = coords(i - 1); val q = coords(i)
            val (s, azi1, _) = KarneyGeodesic.inverseAzimuth(p.y, p.x, q.y, q.x)
            if (s > maxLenM) {
              // Long math + a loud cap: ceil(...).toInt silently clamps at
              // Int.MaxValue, turning a fat-finger maxLen (1e-6 on a
              // 10,000-km segment) into a multi-hour task + OOM instead
              // of an error
              val n = math.ceil(s / maxLenM).toLong
              require(n <= 10000000L,
                f"ST_SegmentizeGeodesic: segment of $s%.0f m at max length $maxLenM " +
                  f"would insert $n%d vertices (cap 10,000,000) — raise the max length")
              var k = 1L
              while (k < n) {
                val (la, lo, _) = KarneyGeodesic.direct(p.y, p.x, azi1, s * k / n)
                out += new Coordinate(lo, la)
                k += 1
              }
            }
            out += q
            i += 1
          }
          out.toArray
        }
      })
    GeomOps.write(edited)
  }

  /** Does the GEODESIC trace of `b` intersect the lon/lat box — the
    * seam-aware membership test behind stamped bbox reads (the refine
    * step in [[graft.sources.GeoParquet.read]]). Edges are densified
    * with exact Karney waypoints at `stepM` (chord-vs-arc error
    * ~ stepM²/8R, ≈ 50 m at the 50 km default), then each waypoint
    * chord is tested against the box with JTS's exact segment-rectangle
    * kernel. A consecutive-waypoint pair whose longitudes jump by more
    * than 180° is a shortest path crossing the antimeridian: the chord
    * is UNWRAPPED to both sides of the seam and tested twice, so a
    * seam-crossing arc hits windows near ±180 and does NOT phantom-hit
    * mid-world windows the naive planar chord (which spans the whole
    * map) would cross. Polygon-bearing inputs fall back to the planar
    * intersects of the densified geometry (interior containment needs
    * ring topology, which a seam split would break — the documented
    * planar caveat for seam-crossing polygons). SQL:
    * ST_ArcIntersectsBox(g, xmin, ymin, xmax, ymax, stepMeters). */
  def arcIntersectsBox(b: Array[Byte], xmin: Double, ymin: Double,
                       xmax: Double, ymax: Double, stepM: Double): Boolean = {
    val dense = GeomOps.read(segmentizeGeodesic(b, stepM))
    if (dense.isEmpty) return false
    val env = new Envelope(xmin, xmax, ymin, ymax)
    var hasPoly = false
    dense.apply(new org.locationtech.jts.geom.GeometryFilter {
      override def filter(geom: Geometry): Unit = geom match {
        case _: Polygon => hasPoly = true
        case _ => ()
      }
    })
    if (hasPoly) return dense.intersects(GeomOps.factory.toGeometry(env))
    val rli = new org.locationtech.jts.algorithm.RectangleLineIntersector(env)
    def seqHits(cs: Array[Coordinate]): Boolean = {
      var i = 1
      while (i < cs.length) {
        val p = cs(i - 1); val q = cs(i)
        if (math.abs(q.x - p.x) > 180.0) {
          val shift = if (q.x < p.x) 360.0 else -360.0
          if (rli.intersects(p, new Coordinate(q.x + shift, q.y)) ||
              rli.intersects(new Coordinate(p.x - shift, p.y), q)) return true
        } else if (rli.intersects(p, q)) return true
        i += 1
      }
      false
    }
    var hit = false
    def rec(geom: Geometry): Unit = if (!hit) geom match {
      case p: Point =>
        if (!p.isEmpty && env.covers(p.getCoordinate)) hit = true
      case gc: GeometryCollection =>
        var i = 0
        while (i < gc.getNumGeometries && !hit) { rec(gc.getGeometryN(i)); i += 1 }
      case other =>
        val cs = other.getCoordinates
        if (cs.length == 1) { if (env.covers(cs(0))) hit = true }
        else if (seqHits(cs)) hit = true
    }
    rec(dense)
    hit
  }

  /** Point at geodesic `frac` ∈ [0, 1] of a LineString's total GEODESIC
    * length — the geography twin of the planar line_interpolate_point:
    * hop lengths are Karney distances and the landing point is an exact
    * direct-problem waypoint inside its segment.
    * SQL: ST_LineInterpolatePointGeodesic(line, frac). */
  def lineInterpolatePointGeodesic(b: Array[Byte], frac: Double): Array[Byte] = {
    require(frac >= 0.0 && frac <= 1.0,
      s"ST_LineInterpolatePointGeodesic: fraction $frac outside [0, 1]")
    val g = GeomOps.read(b)
    val line = g match {
      case l: org.locationtech.jts.geom.LineString => l
      case other => throw new IllegalArgumentException(
        s"ST_LineInterpolatePointGeodesic: expected LineString, got ${other.getGeometryType}")
    }
    val cs = line.getCoordinates
    require(cs.length >= 2, "ST_LineInterpolatePointGeodesic: empty/degenerate line")
    val hops = Array.tabulate(cs.length - 1) { i =>
      KarneyGeodesic.distance(cs(i).y, cs(i).x, cs(i + 1).y, cs(i + 1).x)
    }
    val total = hops.sum
    if (total == 0.0 || frac == 0.0) return GeomOps.point(cs(0).x, cs(0).y)
    var target = frac * total
    var i = 0
    while (i < hops.length && target > hops(i)) { target -= hops(i); i += 1 }
    if (i == hops.length) { // frac == 1 (or accumulated rounding): the far end
      val last = cs(cs.length - 1)
      return GeomOps.point(last.x, last.y)
    }
    val p = cs(i); val q = cs(i + 1)
    val (s, azi1, _) = KarneyGeodesic.inverseAzimuth(p.y, p.x, q.y, q.x)
    val (la, lo, _) = KarneyGeodesic.direct(p.y, p.x, azi1, math.min(target, s))
    GeomOps.point(lo, la)
  }

  // ── geodesic bounding (round 20: the last operation the edges contract
  //    names — rust/geoarrow-schema/src/edges.rs:3-8 "does affect …
  //    bounding") ──────────────────────────────────────────────────────

  /** ~1.1 cm of latitude: absorbs the Karney series truncation so the
    * bound is strictly conservative over every supported edge model. */
  private val LatPadEps = 1e-7

  /** Latitude range of the ARC p→q traced as a geodesic (endpoints
    * included). Along a shortest geodesic sin α keeps its sign (Clairaut),
    * so LONGITUDE is monotonic and needs no extension — but latitude bows
    * poleward to the vertex latitude φv whenever the azimuth crosses
    * 90°/270° inside the segment. φv is closed-form: Clairaut on the
    * auxiliary sphere gives cos βv = |sin α₁ · cos β₁| with the reduced
    * latitude β = atan((1−f)·tan φ). Both the spheroid (Karney azimuths —
    * covers karney/andoyer/thomas/vincenty, all WGS84-geodesic paths) and
    * the sphere (haversine-model azimuths, f = 0) are evaluated and the
    * more poleward extension wins, so one bound is conservative for every
    * recognized edge model. */
  private def segmentLatRange(lat1: Double, lon1: Double,
                              lat2: Double, lon2: Double): (Double, Double) = {
    var lo = math.min(lat1, lat2)
    var hi = math.max(lat1, lat2)
    // spheroid: Karney azimuths + reduced-latitude Clairaut
    val (s, azi1, azi2) = KarneyGeodesic.inverseAzimuth(lat1, lon1, lat2, lon2)
    if (s > 0.0) {
      val c1 = math.cos(math.toRadians(azi1))
      val c2 = math.cos(math.toRadians(azi2))
      lazy val phiV = {
        val b1 = math.atan((1.0 - KarneyGeodesic.f) * math.tan(math.toRadians(lat1)))
        val bv = math.acos(math.min(1.0,
          math.abs(math.sin(math.toRadians(azi1)) * math.cos(b1))))
        math.toDegrees(math.atan(math.tan(bv) / (1.0 - KarneyGeodesic.f)))
      }
      if (c1 >= 0.0 && c2 <= 0.0) hi = math.max(hi, phiV + LatPadEps)
      if (c1 <= 0.0 && c2 >= 0.0) lo = math.min(lo, -phiV - LatPadEps)
      // sphere: same construction at f = 0 with great-circle azimuths
      val f1 = math.toRadians(lat1); val f2 = math.toRadians(lat2)
      val dl = math.toRadians(lon2 - lon1)
      val a1 = math.atan2(math.sin(dl) * math.cos(f2),
        math.cos(f1) * math.sin(f2) - math.sin(f1) * math.cos(f2) * math.cos(dl))
      // forward azimuth at q is the reverse bearing + 180°, so cos flips
      val cRev = math.cos(math.atan2(math.sin(-dl) * math.cos(f1),
        math.cos(f2) * math.sin(f1) - math.sin(f2) * math.cos(f1) * math.cos(dl)))
      val c1s = math.cos(a1)
      val c2s = -cRev
      lazy val phiVs = math.toDegrees(math.acos(math.min(1.0,
        math.abs(math.sin(a1) * math.cos(f1)))))
      if (c1s >= 0.0 && c2s <= 0.0) hi = math.max(hi, phiVs + LatPadEps)
      if (c1s <= 0.0 && c2s >= 0.0) lo = math.min(lo, -phiVs - LatPadEps)
    }
    (math.max(-90.0, lo), math.min(90.0, hi))
  }

  /** lon/lat envelope of `g` with its edges traced as GEODESICS instead of
    * chords — the chord (vertex) envelope extended poleward by the exact
    * per-segment vertex latitude ([[segmentLatRange]]). Strictly contains
    * the vertex envelope, the true arcs of every supported edge model, and
    * any [[segmentizeGeodesic]] densification of them (waypoints lie ON
    * the geodesic; chords between waypoints interpolate within their
    * endpoints' range). Polygons walk ALL rings (a geodesic-traced hole
    * edge may bow past the shell's chord box).
    *
    * Antimeridian: a SHORTEST geodesic between vertices whose raw
    * longitudes differ by more than 180° runs the short way round —
    * through ±180, OUTSIDE the vertex longitude interval (lon 170 → −170
    * passes lon 180, not lon 0). Longitude is monotone along the geodesic
    * only modulo 360, so for such seam-crossing segments the single-box
    * envelope is widened to the full [−180, 180] longitude span (an
    * Envelope cannot represent a split range; conservative containment is
    * the contract here — this box feeds covering columns, extent
    * aggregates, and bbox pruning, all of which require ⊇, never ⊆). */
  def geodesicEnvelope(g: Geometry): Envelope = {
    val env = new Envelope()
    def walk(coords: Array[Coordinate]): Unit = {
      var i = 0
      while (i < coords.length) {
        val c = coords(i)
        val cOk = !c.x.isNaN && !c.y.isNaN
        if (cOk) env.expandToInclude(c.x, c.y)
        if (i > 0) {
          val p = coords(i - 1)
          if (cOk && !p.x.isNaN && !p.y.isNaN && (p.x != c.x || p.y != c.y)) {
            val (lo, hi) = segmentLatRange(p.y, p.x, c.y, c.x)
            env.expandToInclude(p.x, lo)
            env.expandToInclude(p.x, hi)
            if (math.abs(c.x - p.x) >= 180.0) {
              // shortest path crosses ±180 (or is ambiguous at exactly
              // 180°) — the arc's longitudes lie outside [min,max] of the
              // vertices; widen to the full span at the segment's lats
              env.expandToInclude(-180.0, lo)
              env.expandToInclude(180.0, hi)
            }
          }
        }
        i += 1
      }
    }
    def rec(geom: Geometry): Unit = geom match {
      case p: Point =>
        if (!p.isEmpty) {
          val c = p.getCoordinate
          if (!c.x.isNaN && !c.y.isNaN) env.expandToInclude(c.x, c.y)
        }
      case l: LineString => walk(l.getCoordinates)
      case pl: Polygon =>
        if (!pl.isEmpty) {
          walk(pl.getExteriorRing.getCoordinates)
          var r = 0
          while (r < pl.getNumInteriorRing) {
            walk(pl.getInteriorRingN(r).getCoordinates); r += 1
          }
        }
      case coll: GeometryCollection =>
        var i = 0
        while (i < coll.getNumGeometries) { rec(coll.getGeometryN(i)); i += 1 }
      case other => walk(other.getCoordinates)
    }
    rec(g)
    env
  }

  /** Geodesic covering bbox — [[GeomOps.bbox]]'s struct shape over
    * [[geodesicEnvelope]] (empty reads the JTS null-envelope 0/-1
    * sentinel, same as the planar kernel). SQL: ST_BboxGeodesic. */
  def bboxGeodesic(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val e = geodesicEnvelope(GeomOps.read(b))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))
  }

  /** Geodesic envelope as a geometry (rectangle; degenerate inputs follow
    * JTS toGeometry: point/line for zero-extent envelopes). SQL:
    * ST_EnvelopeGeodesic — also what ST_Envelope/ST_Extent_Agg dispatch
    * to over edges-stamped columns. */
  def envelopeGeodesic(b: Array[Byte]): Array[Byte] =
    GeomOps.write(GeomOps.factory.toGeometry(geodesicEnvelope(GeomOps.read(b))))

  /** Geodesic overlays on the shared local AEQD plane
    * ([[Aeqd.overlayGeodesic]]) — closes the edges-contract half both
    * engines previously left planar. SQL: ST_IntersectionGeodesic /
    * ST_UnionGeodesic / ST_DifferenceGeodesic / ST_SymDifferenceGeodesic. */
  def intersectionGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.overlayGeodesic(a, b, 0)
  def unionGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.overlayGeodesic(a, b, 1)
  def differenceGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.overlayGeodesic(a, b, 2)
  def symDifferenceGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.overlayGeodesic(a, b, 3)

  /** Geodesic closest-point pair on the shared AEQD plane. SQL:
    * ST_ClosestPointGeodesic / ST_ShortestLineGeodesic. */
  def closestPointGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.closestGeodesic(a, b)
  def shortestLineGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Aeqd.shortestLineGeodesic(a, b)

  /** Geodesic fractional sub-line (the geography twin of the planar
    * ST_LineSubstring): the piece of `line` between geodesic-length
    * fractions `from` and `to` — cut points are exact direct-problem
    * waypoints inside their segments, original vertices in between are
    * preserved. A zero-length slice (from == to, or a zero-length input)
    * yields a POINT — the PostGIS ST_LineSubstring convention; the
    * 2-vertex degenerate line it previously produced fails ST_IsValid
    * ('too few points') and is rejected by downstream overlay/buffer.
    * SQL: ST_LineSubstringGeodesic(line, from, to). */
  def lineSubstringGeodesic(b: Array[Byte], from: Double, to: Double): Array[Byte] = {
    require(from >= 0.0 && to <= 1.0 && from <= to,
      s"ST_LineSubstringGeodesic: fractions ($from, $to) must satisfy 0 <= from <= to <= 1")
    val g = GeomOps.read(b)
    val line = g match {
      case l: org.locationtech.jts.geom.LineString => l
      case other => throw new IllegalArgumentException(
        s"ST_LineSubstringGeodesic: expected LineString, got ${other.getGeometryType}")
    }
    val cs = line.getCoordinates
    require(cs.length >= 2, "ST_LineSubstringGeodesic: empty/degenerate line")
    val hops = Array.tabulate(cs.length - 1) { i =>
      KarneyGeodesic.distance(cs(i).y, cs(i).x, cs(i + 1).y, cs(i + 1).x)
    }
    val total = hops.sum
    def pointAt(target0: Double): (Coordinate, Int) = {
      // (coordinate at geodesic range target0 from the start, index of the
      // vertex FOLLOWING it)
      var target = target0
      var i = 0
      while (i < hops.length && target > hops(i)) { target -= hops(i); i += 1 }
      if (i == hops.length) (cs(cs.length - 1), cs.length)
      else if (target <= 0.0) (cs(i), i + 1)
      else {
        val p = cs(i); val q = cs(i + 1)
        val (s, azi1, _) = KarneyGeodesic.inverseAzimuth(p.y, p.x, q.y, q.x)
        val (la, lo, _) = KarneyGeodesic.direct(p.y, p.x, azi1, math.min(target, s))
        (new Coordinate(lo, la), i + 1)
      }
    }
    if (total == 0.0)
      return GeomOps.write(GeomOps.factory.createPoint(cs(0)))
    val (start, iAfterStart) = pointAt(from * total)
    val (end, iAfterEnd) = pointAt(to * total)
    val mid = cs.slice(iAfterStart, iAfterEnd)
    val outRaw = (start +: mid) :+ end
    // collapse exact duplicates the slicing can produce at vertex-aligned
    // fractions; a slice that collapses to one coordinate is a POINT
    val out = outRaw.foldLeft(Vector.empty[Coordinate]) {
      case (acc, c) if acc.nonEmpty && acc.last.equals2D(c) => acc
      case (acc, c) => acc :+ c
    }
    if (out.length < 2) GeomOps.write(GeomOps.factory.createPoint(out.head))
    else GeomOps.write(GeomOps.factory.createLineString(out.toArray))
  }

  /** Parameterized ellipsoidal AEQD about (lon0, lat0) — WGS84-exact via
    * the Karney geodesic problems ([[Aeqd]]); other datums compose through
    * the NatCrs datum hops like every projection here. No constants to
    * derive, so no cache entry needed. SQL: ST_TransformAeqd(+Inv). */
  def transformAeqd(b: Array[Byte], lon0: Double, lat0: Double): Array[Byte] =
    mapCoords(b, c => { checkGeodetic(c)
      val (x, y) = Aeqd.forward(lon0, lat0, c.x, c.y); new Coordinate(x, y) })
  def transformAeqdInv(b: Array[Byte], lon0: Double, lat0: Double): Array[Byte] =
    mapCoords(b, c => {
      val (lo, la) = Aeqd.reverse(lon0, lat0, c.x, c.y); new Coordinate(lo, la) })

  /** ITRF2014 geographic coordinates observed at `epochYears` (decimal
    * years) → GDA2020 — the time-dependent 14-param half of the GDA pair
    * ([[Datum.Itrf2014ToGda2020]], EPSG 8447: identity at 2020.0, pure
    * Australian-plate rotation rates). The static CRS route
    * (`ST_Transform(g, 4326, 7844)`) treats the input as GDA94≈WGS84;
    * THIS function is for epoch-tagged ITRF/WGS84-G2139 observations,
    * where the epoch is data, not registry. SQL:
    * ST_TransformGda2020Epoch(g, epochYears) (+Inv). */
  def transformGda2020Epoch(b: Array[Byte], epochYears: Double): Array[Byte] = {
    require(epochYears >= 1980.0 && epochYears <= 2100.0,
      s"ST_TransformGda2020Epoch: epoch $epochYears outside [1980, 2100] decimal years")
    val h = Datum.Itrf2014ToGda2020.at(epochYears)
    mapCoords(b, c => { checkGeodetic(c)
      val (lo, la) = Datum.shift(Datum.Grs80, Datum.Grs80, h, c.x, c.y)
      new Coordinate(lo, la) })
  }
  def transformGda2020EpochInv(b: Array[Byte], epochYears: Double): Array[Byte] = {
    require(epochYears >= 1980.0 && epochYears <= 2100.0,
      s"ST_TransformGda2020EpochInv: epoch $epochYears outside [1980, 2100] decimal years")
    val h = Datum.Itrf2014ToGda2020.at(epochYears).reversed
    mapCoords(b, c => { checkGeodetic(c)
      val (lo, la) = Datum.shift(Datum.Grs80, Datum.Grs80, h, c.x, c.y)
      new Coordinate(lo, la) })
  }

  /** Meter-true geodesic buffer of a lon/lat geometry (local AEQD plane,
    * [[Aeqd.bufferGeodesic]]); default JTS quadrant segments (8), matching
    * the planar ST_Buffer default. SQL: ST_BufferGeodesic(g, meters[, quadSegs]). */
  def bufferGeodesic(b: Array[Byte], radiusM: Double): Array[Byte] =
    Aeqd.bufferGeodesic(b, radiusM, 8)
  def bufferGeodesicSegs(b: Array[Byte], radiusM: Double, quadSegs: Int): Array[Byte] =
    Aeqd.bufferGeodesic(b, radiusM, quadSegs)

  private def conicFns(albers: Boolean, a: Double, invF: Double, lat1: Double,
                       lat2: Double, lat0: Double, lon0: Double, fe: Double, fn: Double) = {
    val kind = if (albers) "albers" else "lcc"
    cached(kind, Seq(a, invF, lat1, lat2, lat0, lon0, fe, fn)) {
      val c = ConicProjections.Conic(a, invF, lat1, lat2, lat0, lon0, fe, fn)
      if (albers) (ConicProjections.albersForwardFn(c), ConicProjections.albersInverseFn(c))
      else (ConicProjections.lccForwardFn(c), ConicProjections.lccInverseFn(c))
    }
  }
  def transformAlbers(b: Array[Byte], a: Double, invF: Double, lat1: Double, lat2: Double,
                      lat0: Double, lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val (fwd, _) = conicFns(albers = true, a, invF, lat1, lat2, lat0, lon0, fe, fn)
    mapCoords(b, c => { checkGeodetic(c); require(math.abs(c.y) < 90.0,
      "parameterized Albers: pole not representable")
      val (x, y) = fwd(c.x, c.y); new Coordinate(x, y) })
  }
  def transformAlbersInv(b: Array[Byte], a: Double, invF: Double, lat1: Double, lat2: Double,
                         lat0: Double, lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val (_, inv) = conicFns(albers = true, a, invF, lat1, lat2, lat0, lon0, fe, fn)
    mapCoords(b, c => { val (lo, la) = inv(c.x, c.y); new Coordinate(lo, la) })
  }
  def transformLcc(b: Array[Byte], a: Double, invF: Double, lat1: Double, lat2: Double,
                   lat0: Double, lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val (fwd, _) = conicFns(albers = false, a, invF, lat1, lat2, lat0, lon0, fe, fn)
    mapCoords(b, c => { checkGeodetic(c); require(math.abs(c.y) < 90.0,
      "parameterized LCC: pole not representable")
      val (x, y) = fwd(c.x, c.y); new Coordinate(x, y) })
  }
  def transformLccInv(b: Array[Byte], a: Double, invF: Double, lat1: Double, lat2: Double,
                      lat0: Double, lon0: Double, fe: Double, fn: Double): Array[Byte] = {
    val (_, inv) = conicFns(albers = false, a, invF, lat1, lat2, lat0, lon0, fe, fn)
    mapCoords(b, c => { val (lo, la) = inv(c.x, c.y); new Coordinate(lo, la) })
  }

  // ── slippy-map (XYZ / OSM) tile math ──────────────────────────────────

  /** Tile column of a longitude at zoom `z` — the standard slippy-map
    * formula floor((lon+180)/360 · 2^z), clamped so lon = 180 lands in
    * the last column. SQL: `ST_TileX(lon, z)`. */
  def tileX(lon: Double, z: Int): Long = {
    require(z >= 0 && z <= 30, s"ST_TileX: zoom $z outside [0, 30]")
    val n = 1L << z
    val t = math.floor((lon + 180.0) / 360.0 * n).toLong
    math.min(math.max(t, 0L), n - 1)
  }

  /** Tile row of a latitude at zoom `z` (y grows southward):
    * floor((1 − ln(tan φ + 1/cos φ)/π)/2 · 2^z), the OSM wiki formula,
    * clamped to [0, 2^z−1] at the mercator cutoff. The IEEE steps are
    * written out exactly as an oracle replays them (ln(tan + sec), not
    * asinh(tan)). SQL: `ST_TileY(lat, z)`. */
  def tileY(lat: Double, z: Int): Long = {
    require(z >= 0 && z <= 30, s"ST_TileY: zoom $z outside [0, 30]")
    // NaN would fall through both pole guards and floor to row 0 — a
    // plausible-looking tile for garbage input. Likewise a latitude far
    // outside [-90, 90] is corrupt data, not a pole overshoot: only a
    // small epsilon past the poles (projection round-trip error) clamps.
    require(!lat.isNaN && lat >= -90.5 && lat <= 90.5,
      s"ST_TileY: latitude $lat outside [-90, 90]")
    val n = 1L << z
    // poles clamp to the edge rows rather than aborting the job — the same
    // silent-clamp convention tileX applies at lon = ±180 (tan/sec blow up
    // past the mercator cutoff, but the min/max below bounds the result;
    // a ±90 input lands exactly on row 0 / 2^z−1)
    if (lat >= 90.0) return 0L
    if (lat <= -90.0) return n - 1
    val r = lat * math.Pi / 180.0
    val t = math.floor(
      (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0 * n).toLong
    math.min(math.max(t, 0L), n - 1)
  }

  /** PostGIS `ST_GeoHash(pt, prec)`: standard geohash of a lon/lat point
    * to `prec` base-32 characters. Pure bit math — the cell indices are
    * the same floor-scaled fractions as [[tileX]]/[[tileY]]
    * (cx = floor((lon+180)/360·2^lonBits), cy latitude-linear — geohash
    * bisects LATITUDE DEGREES, not mercator), interleaved lon-first into
    * 5·prec bits — so an oracle replays it with arithmetic plus the
    * public base-32 alphabet. Anchored to the geohash.org reference
    * value for (-5.6, 42.6) = "ezs42" in the spec. */
  private val GeoHashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  def geoHash(b: Array[Byte], prec: Int): UTF8String = {
    require(prec >= 1 && prec <= 12, s"ST_GeoHash: precision $prec outside [1, 12]")
    val c = GeomOps.read(b).getCoordinate
    require(c.x >= -180.0 && c.x <= 180.0 && c.y >= -90.0 && c.y <= 90.0,
      s"ST_GeoHash: (${c.x}, ${c.y}) outside lon/lat domain")
    val totalBits = 5 * prec
    val lonBits = (totalBits + 1) / 2  // even positions (from the left) are longitude
    val latBits = totalBits / 2
    def cell(v: Double, lo: Double, hi: Double, bits: Int): Long = {
      val n = 1L << bits
      val t = math.floor((v - lo) / (hi - lo) * n).toLong
      math.min(math.max(t, 0L), n - 1)
    }
    val cx = cell(c.x, -180.0, 180.0, lonBits)
    val cy = cell(c.y, -90.0, 90.0, latBits)
    // interleave, longitude first: bit k of the code (from the MSB) comes
    // from lon when k is even, lat when k is odd
    var code = 0L
    var k = 0
    while (k < totalBits) {
      val bit =
        if (k % 2 == 0) (cx >> (lonBits - 1 - k / 2)) & 1L
        else (cy >> (latBits - 1 - k / 2)) & 1L
      code = (code << 1) | bit
      k += 1
    }
    val sb = new java.lang.StringBuilder(prec)
    var i = prec - 1
    while (i >= 0) {
      sb.append(GeoHashAlphabet.charAt(((code >> (5 * i)) & 31L).toInt))
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Decode a geohash string to its lon/lat cell bounds — the inverse
    * of [[geoHash]]'s bit interleave (lon-first, latitude-linear). */
  private def geoHashBounds(hash: String): (Double, Double, Double, Double) = {
    require(hash.nonEmpty && hash.length <= 12,
      s"geohash '$hash' must be 1-12 characters")
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var even = true // even bit positions (from the MSB) are longitude
    hash.foreach { ch =>
      val v = GeoHashAlphabet.indexOf(ch.toLower)
      require(v >= 0, s"geohash '$hash': invalid character '$ch'")
      var bit = 4
      while (bit >= 0) {
        val set = ((v >> bit) & 1) == 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (set) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (set) latLo = mid else latHi = mid
        }
        even = !even
        bit -= 1
      }
    }
    (lonLo, lonHi, latLo, latHi)
  }

  /** PostGIS `ST_GeomFromGeoHash(hash[, prec])`: the geohash cell as its
    * bounding POLYGON; `prec` truncates the hash first (≤ 0 or ≥ length
    * → full hash, the PostGIS contract). */
  def geomFromGeoHash(hash: UTF8String): Array[Byte] =
    geomFromGeoHashPrec(hash, -1)
  def geomFromGeoHashPrec(hash: UTF8String, prec: Int): Array[Byte] = {
    val s0 = hash.toString
    val s = if (prec >= 1 && prec < s0.length) s0.substring(0, prec) else s0
    val (lonLo, lonHi, latLo, latHi) = geoHashBounds(s)
    GeomOps.write(GeomOps.factory.toGeometry(
      new org.locationtech.jts.geom.Envelope(lonLo, lonHi, latLo, latHi)))
  }

  /** PostGIS `ST_PointFromGeoHash(hash[, prec])`: the cell's center. */
  def pointFromGeoHash(hash: UTF8String): Array[Byte] =
    pointFromGeoHashPrec(hash, -1)
  def pointFromGeoHashPrec(hash: UTF8String, prec: Int): Array[Byte] = {
    val s0 = hash.toString
    val s = if (prec >= 1 && prec < s0.length) s0.substring(0, prec) else s0
    val (lonLo, lonHi, latLo, latHi) = geoHashBounds(s)
    GeomOps.write(GeomOps.factory.createPoint(
      new org.locationtech.jts.geom.Coordinate((lonLo + lonHi) / 2, (latLo + latHi) / 2)))
  }

  /** PostGIS `ST_TileEnvelope(z, x, y)`: the EPSG:3857 bounding polygon
    * of an XYZ tile over the default web-mercator extent ±π·a. Pure
    * arithmetic — each zoom-z tile is an exact (2πa/2^z)-sided square —
    * so tile geometry replays with no transcendentals once (z, x, y) are
    * known. Ring is CCW from the southwest corner. */
  def tileEnvelope(z: Int, x: Long, y: Long): Array[Byte] = {
    require(z >= 0 && z <= 30, s"ST_TileEnvelope: zoom $z outside [0, 30]")
    val n = 1L << z
    require(x >= 0 && x < n && y >= 0 && y < n,
      s"ST_TileEnvelope: tile ($x, $y) outside zoom-$z range [0, ${n - 1}]")
    // Edges as OS·(2k/n − 1), NOT -OS + k·side: the fraction 2k/n is
    // dyadic-exact, so a point whose longitude lands exactly on a tile
    // boundary (45° multiples) projects to the IDENTICAL double as the
    // envelope edge — accumulated -OS + k·side is 1 ulp off and breaks
    // ST_Covers for edge points.
    val west = OriginShift * (2.0 * x / n - 1.0)
    val east = OriginShift * (2.0 * (x + 1) / n - 1.0)
    val north = OriginShift * (1.0 - 2.0 * y / n)
    val south = OriginShift * (1.0 - 2.0 * (y + 1) / n)
    val ring = Array(
      new Coordinate(west, south), new Coordinate(east, south),
      new Coordinate(east, north), new Coordinate(west, north),
      new Coordinate(west, south))
    GeomOps.write(GeomOps.factory.createPolygon(ring))
  }

  // ── spherical length (haversine) ──────────────────────────────────────

  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Cross-track distance on the IAU sphere: signed distance from point
    * `p` to the great circle through `a` → `b` (the navigation "how far
    * off the route am I" number; sign encodes the side — positive when
    * the point lies right of the track direction). Standard
    * spherical formula d_xt = asin(sin(δ13) · sin(θ13 − θ12)) · R with
    * δ13 the angular distance a→p and θ13/θ12 the initial bearings
    * a→p / a→b — every step a plain libm call, so an oracle replays the
    * identical IEEE chain (the g24/g62 precedent).
    * SQL: `ST_CrossTrackDistance(p, a, b)`. */
  def crossTrackMeters(p: Array[Byte], a: Array[Byte], b: Array[Byte]): Double = {
    val cp = GeomOps.read(p).getCoordinate
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    def bearing(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val dl = math.toRadians(lon2 - lon1)
      val f1 = math.toRadians(lat1); val f2 = math.toRadians(lat2)
      math.atan2(math.sin(dl) * math.cos(f2),
        math.cos(f1) * math.sin(f2) - math.sin(f1) * math.cos(f2) * math.cos(dl))
    }
    val d13 = haversineMeters(ca.x, ca.y, cp.x, cp.y) / EarthRadiusM
    val t13 = bearing(ca.x, ca.y, cp.x, cp.y)
    val t12 = bearing(ca.x, ca.y, cb.x, cb.y)
    math.asin(math.sin(d13) * math.sin(t13 - t12)) * EarthRadiusM
  }

  /** Great-circle forward problem on the IAU sphere (PostGIS ST_Project's
    * shape): destination of travelling `distM` meters from the point at
    * initial bearing `azRad` (radians clockwise from north). Standard
    * spherical direct formulas — lat2 = asin(sin φ1 cos δ + cos φ1 sin δ
    * cos θ), lon2 = λ1 + atan2(sin θ sin δ cos φ1, cos δ − sin φ1 sin φ2),
    * δ = d/R — with the longitude normalized to (−180, 180]. */
  def projectSphere(b: Array[Byte], distM: Double, azRad: Double): Array[Byte] = {
    val c = GeomOps.read(b).getCoordinate
    val lat1 = math.toRadians(c.y)
    val lon1 = math.toRadians(c.x)
    val delta = distM / EarthRadiusM
    val sinLat2 = math.sin(lat1) * math.cos(delta) +
      math.cos(lat1) * math.sin(delta) * math.cos(azRad)
    val lat2 = math.asin(sinLat2)
    val lon2 = lon1 + math.atan2(
      math.sin(azRad) * math.sin(delta) * math.cos(lat1),
      math.cos(delta) - math.sin(lat1) * sinLat2)
    var lonDeg = math.toDegrees(lon2)
    if (lonDeg > 180.0) lonDeg -= 360.0
    if (lonDeg <= -180.0) lonDeg += 360.0
    GeomOps.point(lonDeg, math.toDegrees(lat2))
  }

  def distanceSphere(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    haversineMeters(ca.x, ca.y, cb.x, cb.y)
  }

  /** Haversine length of a (multi)linestring with lon/lat coordinates.
    * ref: rust/geoarrow-old/src/algorithm/geo/haversine_length.rs:18 */
  def lengthSphere(b: Array[Byte]): Double = {
    val g = GeomOps.read(b)
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case l: LineString =>
          val cs = l.getCoordinates
          var j = 1
          while (j < cs.length) {
            total += haversineMeters(cs(j - 1).x, cs(j - 1).y, cs(j).x, cs(j).y)
            j += 1
          }
        case _ =>
      }
      i += 1
    }
    total
  }

  // ── ellipsoidal (spheroid) measures ───────────────────────────────────
  // The reference's Edges enum names andoyer|karney|vincenty interpretations
  // (rust/geoarrow-schema/src/edges.rs:35-70) and ships geodesic length/area
  // (rust/geoarrow-old/src/algorithm/geo/geodesic_length.rs:18,
  // geodesic_area.rs:17). We implement the Andoyer–Lambert first-order
  // flattening correction: closed-form (so the DuckDB oracle can replicate it
  // term-by-term), and within ~10 m of Karney over continental distances.

  /** Andoyer–Lambert ellipsoidal distance (m), WGS84. */
  def andoyerMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val f1 = math.toRadians(lat1)
    val f2 = math.toRadians(lat2)
    val fm = (f1 + f2) / 2.0
    val gm = (f1 - f2) / 2.0
    val lm = (math.toRadians(lon1) - math.toRadians(lon2)) / 2.0
    val s = math.pow(math.sin(gm), 2) * math.pow(math.cos(lm), 2) +
      math.pow(math.cos(fm), 2) * math.pow(math.sin(lm), 2)
    val c = math.pow(math.cos(gm), 2) * math.pow(math.cos(lm), 2) +
      math.pow(math.sin(fm), 2) * math.pow(math.sin(lm), 2)
    if (s == 0.0 || c == 0.0) return 0.0
    val omega = math.atan(math.sqrt(s / c))
    if (omega == 0.0) return 0.0
    val r = math.sqrt(s * c) / omega
    val d = 2.0 * omega * Wgs84A
    val h1 = (3.0 * r - 1.0) / (2.0 * c)
    val h2 = (3.0 * r + 1.0) / (2.0 * s)
    d * (1.0 + Wgs84F * (h1 * math.pow(math.sin(fm), 2) * math.pow(math.cos(gm), 2) -
      h2 * math.pow(math.cos(fm), 2) * math.pow(math.sin(gm), 2)))
  }

  def distanceSpheroid(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    andoyerMeters(ca.x, ca.y, cb.x, cb.y)
  }

  /** Ellipsoidal length of a (multi)linestring, Andoyer per segment.
    * ref: rust/geoarrow-old/src/algorithm/geo/geodesic_length.rs:18 */
  def lengthSpheroid(b: Array[Byte]): Double = {
    val g = GeomOps.read(b)
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case l: LineString =>
          val cs = l.getCoordinates
          var j = 1
          while (j < cs.length) {
            total += andoyerMeters(cs(j - 1).x, cs(j - 1).y, cs(j).x, cs(j).y)
            j += 1
          }
        case _ =>
      }
      i += 1
    }
    total
  }

  // ── Karney-exact geodesic measures (KarneyGeodesic; replaces the round-2
  //    authalic-sphere approximation — now matches the reference's
  //    geodesic_area.rs:17 / geodesic_length.rs:18 exactly) ────────────────

  /** (lats, lons) of a ring, closing point dropped. */
  private def ringLatLon(r: LineString): (Array[Double], Array[Double]) = {
    val cs = r.getCoordinates
    val m = if (cs.length > 1 && cs(0).equals2D(cs(cs.length - 1))) cs.length - 1 else cs.length
    (Array.tabulate(m)(i => cs(i).y), Array.tabulate(m)(i => cs(i).x))
  }

  /** Karney signed geodesic area: CCW exterior positive, rings summed as
    * wound (holes wound CW subtract). Reference:
    * geodesic_area.rs `geodesic_area_signed`. */
  def areaSpheroidSigned(b: Array[Byte]): Double =
    signedKarney(GeomOps.read(b))

  private def signedKarney(g: Geometry): Double = g match {
    case p: Polygon =>
      val rings = p.getExteriorRing +:
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      rings.map { r => val (la, lo) = ringLatLon(r); KarneyGeodesic.ringAreaSigned(la, lo) }.sum
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(i => signedKarney(gc.getGeometryN(i))).sum
    case _ => 0.0
  }

  /** Karney unsigned geodesic area: supports rings enclosing more than half
    * the earth (a CW-wound ring means "everything but"); hole areas
    * subtract. Reference: geodesic_area.rs `geodesic_area_unsigned`. */
  def areaSpheroid(b: Array[Byte]): Double =
    unsignedKarney(GeomOps.read(b))

  private def unsignedKarney(g: Geometry): Double = g match {
    case p: Polygon =>
      val (extLa, extLo) = ringLatLon(p.getExteriorRing)
      val ext = {
        val s = KarneyGeodesic.ringAreaSigned(extLa, extLo)
        if (s < 0) s + KarneyGeodesic.area0 else s
      }
      ext - (0 until p.getNumInteriorRing).map { i =>
        val (la, lo) = ringLatLon(p.getInteriorRingN(i))
        math.abs(KarneyGeodesic.ringAreaSigned(la, lo))
      }.sum
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(i => unsignedKarney(gc.getGeometryN(i))).sum
    case _ => 0.0
  }

  // ── Vincenty inverse (named legacy variant) ───────────────────────────
  // The reference ships VincentyLength as a NAMED algorithm
  // (rust/geoarrow-old/src/algorithm/geo/vincenty_length.rs:16; the Edges
  // enum also names vincenty, rust/geoarrow-schema/src/edges.rs:35-70).
  // Karney supersedes it numerically (exact vs Vincenty's ~0.5 mm and
  // antipodal non-convergence), but users porting code expect the name —
  // so this is the real Vincenty 1975 inverse iteration, falling back to
  // Karney on the documented non-convergence region (nearly antipodal),
  // where the two agree to Vincenty's own error bound anyway.

  /** Vincenty inverse distance (m), WGS84 — Vincenty 1975 eq. 1-13.
    * Falls back to Karney when the λ iteration does not converge. */
  def vincentyMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    if (lon1 == lon2 && lat1 == lat2) return 0.0
    val f = Wgs84F
    val a = Wgs84A
    val bAx = a * (1.0 - f) // semi-minor axis
    val u1 = math.atan((1.0 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1.0 - f) * math.tan(math.toRadians(lat2)))
    val lCap = math.toRadians(lon2 - lon1)
    val (sinU1, cosU1) = (math.sin(u1), math.cos(u1))
    val (sinU2, cosU2) = (math.sin(u2), math.cos(u2))
    var lambda = lCap
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2Sm = 0.0
    while (iter < 200) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.hypot(cosU2 * sinL, cosU1 * sinU2 - sinU1 * cosU2 * cosL)
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2Sm = if (cosSqAlpha == 0.0) 0.0 // equatorial line
               else cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha
      val c = f / 16.0 * cosSqAlpha * (4.0 + f * (4.0 - 3.0 * cosSqAlpha))
      val prev = lambda
      lambda = lCap + (1.0 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2Sm + c * cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm)))
      if (math.abs(lambda - prev) < 1e-12) {
        val uSq = cosSqAlpha * (a * a - bAx * bAx) / (bAx * bAx)
        val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
        val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
        val dSigma = bigB * sinSigma * (cos2Sm + bigB / 4.0 *
          (cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm) -
           bigB / 6.0 * cos2Sm * (-3.0 + 4.0 * sinSigma * sinSigma) * (-3.0 + 4.0 * cos2Sm * cos2Sm)))
        return bAx * bigA * (sigma - dSigma)
      }
      iter += 1
    }
    KarneyGeodesic.distance(lat1, lon1, lat2, lon2) // antipodal fallback
  }

  def distanceVincenty(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    vincentyMeters(ca.x, ca.y, cb.x, cb.y)
  }

  /** Vincenty length of a (multi)linestring (m) — named parity with
    * vincenty_length.rs:16. */
  def lengthVincenty(b: Array[Byte]): Double = {
    val g = GeomOps.read(b)
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case l: LineString =>
          val cs = l.getCoordinates
          var j = 1
          while (j < cs.length) {
            total += vincentyMeters(cs(j - 1).x, cs(j - 1).y, cs(j).x, cs(j).y)
            j += 1
          }
        case _ =>
      }
      i += 1
    }
    total
  }

  /** Karney-exact inverse distance between two points (m). */
  def distanceGeodesic(a: Array[Byte], b: Array[Byte]): Double = {
    val ca = GeomOps.read(a).getCoordinate
    val cb = GeomOps.read(b).getCoordinate
    KarneyGeodesic.distance(ca.y, ca.x, cb.y, cb.x)
  }

  /** Karney-exact geodesic length of a (multi)linestring (m).
    * ref: geodesic_length.rs:18 (doctest NYC→London→Osaka = 15,109,158). */
  def lengthGeodesic(b: Array[Byte]): Double = {
    val g = GeomOps.read(b)
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case l: LineString =>
          val cs = l.getCoordinates
          var j = 1
          while (j < cs.length) {
            total += KarneyGeodesic.distance(cs(j - 1).y, cs(j - 1).x, cs(j).y, cs(j).x)
            j += 1
          }
        case _ =>
      }
      i += 1
    }
    total
  }

  // ── geodesic perimeter ────────────────────────────────────────────────
  // The reference ships geodesic_perimeter as a first-class compute
  // function (python/geoarrow-compute/python/geoarrow/rust/compute/
  // _compute.pyi:272, backed by geodesic_length.rs applied to polygon
  // rings). lengthSpheroid above deliberately walks only LineString
  // components (length is a lineal measure, matching the planar
  // GeomOps.length/perimeter split), so polygons answer 0 there; these
  // walk the RINGS — exterior plus holes, holes ADD (a perimeter is total
  // boundary walked, the PostGIS ST_Perimeter convention).

  private def perimeterOf(g: Geometry,
      seg: (Double, Double, Double, Double) => Double): Double = g match {
    case p: Polygon =>
      var total = ringPerim(p.getExteriorRing, seg)
      var i = 0
      while (i < p.getNumInteriorRing) {
        total += ringPerim(p.getInteriorRingN(i), seg)
        i += 1
      }
      total
    case gc: GeometryCollection =>
      (0 until gc.getNumGeometries).map(i => perimeterOf(gc.getGeometryN(i), seg)).sum
    case _ => 0.0
  }

  private def ringPerim(l: LineString,
      seg: (Double, Double, Double, Double) => Double): Double = {
    val cs = l.getCoordinates
    var total = 0.0
    var j = 1
    while (j < cs.length) {
      total += seg(cs(j - 1).x, cs(j - 1).y, cs(j).x, cs(j).y)
      j += 1
    }
    total
  }

  /** Ellipsoidal (multi)polygon perimeter (m), Andoyer per segment —
    * consistent with lengthSpheroid / DuckDB's ST_Perimeter_Spheroid. */
  def perimeterSpheroid(b: Array[Byte]): Double =
    perimeterOf(GeomOps.read(b), andoyerMeters)

  /** Karney-exact (multi)polygon perimeter (m) — named parity with the
    * st_*geodesic family (the reference's geodesic_perimeter). */
  def perimeterGeodesic(b: Array[Byte]): Double =
    perimeterOf(GeomOps.read(b),
      (lon1, lat1, lon2, lat2) => KarneyGeodesic.distance(lat1, lon1, lat2, lon2))

  /** Chamberlain–Duquette spherical polygon area (m², absolute value).
    * ref: rust/geoarrow-old/src/algorithm/geo/chamberlain_duquette_area.rs:61 */
  def areaSphere(b: Array[Byte]): Double = {
    val g = GeomOps.read(b)
    math.abs(sphericalArea(g))
  }

  private def sphericalArea(g: Geometry): Double = g match {
    case p: Polygon =>
      var a = ringArea(p.getExteriorRing.getCoordinates)
      var i = 0
      while (i < p.getNumInteriorRing) {
        a -= ringArea(p.getInteriorRingN(i).getCoordinates)
        i += 1
      }
      a
    case mp: GeometryCollection =>
      (0 until mp.getNumGeometries).map(i => sphericalArea(mp.getGeometryN(i))).sum
    case _ => 0.0
  }

  // Chamberlain & Duquette (2007), "Some algorithms for polygons on a sphere"
  private def ringArea(cs: Array[Coordinate]): Double = {
    if (cs.length < 3) return 0.0
    var total = 0.0
    var i = 0
    val n = cs.length - 1 // closed ring; last == first
    while (i < n) {
      val lo = cs(i)
      val hi = cs((i + 1) % n)
      val nx = cs((i + 2) % n)
      total += (math.toRadians(nx.x) - math.toRadians(lo.x)) *
        math.sin(math.toRadians(hi.y))
      i += 1
    }
    math.abs(total * EarthRadiusM * EarthRadiusM / 2.0)
  }
}
