package graft.core

import org.locationtech.jts.geom.{Coordinate, Geometry}

/** Ellipsoidal Azimuthal Equidistant (AEQD) on WGS84 — the fifth
  * projection family, built directly on the exact geodesic problems
  * ([[KarneyGeodesic]]): forward is (x, y) = (s·sin α₁, s·cos α₁) from
  * the inverse geodesic between the projection origin and the point,
  * reverse solves the DIRECT problem from the recovered azimuth and
  * range. This is the "geodesic" AEQD construction (Snyder 1987 p. 197;
  * PROJ's `aeqd` ellipsoidal mode uses the identical geodesic-problem
  * formulation) — distance and azimuth FROM THE ORIGIN are exact by
  * construction, which is the projection's defining property and the
  * reason it backs the meter-true geodesic buffer
  * ([[Aeqd.bufferGeodesic]]).
  *
  * The reference's reprojection support is the geodesy crate's
  * 4326↔3857 subset (rust/geoarrow-old/src/algorithm/geodesy/
  * reproject.rs:105); AEQD and the geodesic buffer exceed it — they are
  * what a user reaches for on "everything within X meters of a site"
  * workloads where a planar degree buffer is wrong by cos(latitude).
  *
  * Singularities handled loudly: the origin's ANTIPODE has every azimuth
  * at range π·R — forward refuses within ~10 m of it; reverse refuses
  * ranges beyond half the meridian circumference (no unique preimage). */
object Aeqd {

  /** half the meridian circumference, m — the reverse range limit */
  private val MaxRange: Double = {
    // meridian quadrant via the exact inverse (pole to equator) × 2
    KarneyGeodesic.distance(0.0, 0.0, 90.0, 0.0) * 2.0
  }

  /** geodetic (lon°, lat°) → AEQD (x, y) meters about (lon0°, lat0°) */
  def forward(lon0: Double, lat0: Double, lon: Double, lat: Double): (Double, Double) = {
    val (s, azi1, _) = KarneyGeodesic.inverseAzimuth(lat0, lon0, lat, lon)
    if (s == 0.0) return (0.0, 0.0)
    require(MaxRange - s > 10.0,
      f"AEQD: point ($lon%.6f, $lat%.6f) is within 10 m of the antipode of the " +
        f"origin ($lon0%.4f, $lat0%.4f) — its azimuth (and image) is undefined")
    val az = math.toRadians(azi1)
    (s * math.sin(az), s * math.cos(az))
  }

  /** AEQD (x, y) meters about (lon0°, lat0°) → geodetic (lon°, lat°) */
  def reverse(lon0: Double, lat0: Double, x: Double, y: Double): (Double, Double) = {
    val s = math.hypot(x, y)
    if (s == 0.0) return (lon0, lat0)
    require(s <= MaxRange,
      f"AEQD: range $s%.1f m exceeds the half-circumference $MaxRange%.1f m — " +
        "no geodetic preimage")
    val azi1 = math.toDegrees(math.atan2(x, y))
    val (lat2, lon2, _) = KarneyGeodesic.direct(lat0, lon0, azi1, s)
    (lon2, lat2)
  }

  // ── geodesic buffer ─────────────────────────────────────────────────────

  /** Distance beyond which the local-AEQD buffer approximation is refused:
    * the azimuthal distance distortion at range s from the anchor scales
    * as (s/R)²/3 along circles of constant range, so at 1500 km the
    * buffer-width error is bounded by ~1.9% of the radius — past that the
    * construction stops being honest. Split the geometry first. */
  private val MaxAnchorRange = 1.5e6

  private def projectTo(lon0: Double, lat0: Double, g: Geometry): (Geometry, Double) = {
    var maxRange = 0.0
    val proj = new org.locationtech.jts.geom.util.GeometryEditor(GeomOps.factory).edit(g,
      new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
        override def edit(coords: Array[Coordinate], geom: Geometry): Array[Coordinate] =
          coords.map { cc =>
            val (x, y) = forward(lon0, lat0, cc.x, cc.y)
            val r = math.hypot(x, y)
            if (r > maxRange) maxRange = r
            new Coordinate(x, y)
          }
      })
    (proj, maxRange)
  }

  private def inverseFrom(lon0: Double, lat0: Double, g: Geometry): Geometry =
    new org.locationtech.jts.geom.util.GeometryEditor(GeomOps.factory).edit(g,
      new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
        override def edit(coords: Array[Coordinate], geom: Geometry): Array[Coordinate] =
          coords.map { cc =>
            val (lon, lat) = reverse(lon0, lat0, cc.x, cc.y)
            new Coordinate(lon, lat)
          }
      })

  /** Geodesic overlay (round 19 — the divergence BOTH engines left open:
    * the reference's edges.rs names intersection/overlay among the
    * operations an edges declaration "affects", but its compute layer
    * runs overlays planar; so did graft until now). Both inputs project
    * to ONE local AEQD anchored at their combined centroid, the JTS
    * overlay runs on that meter-true plane, and the result's vertices
    * invert through the exact direct problem. Segments are straight on
    * the LOCAL PLANE — densify with [[graft.core.Geodesy.segmentizeGeodesic]]
    * first when chord-vs-geodesic error matters at your extent (the same
    * contract PostGIS geography users live with). op: 0 = intersection,
    * 1 = union, 2 = difference, 3 = symmetric difference. */
  def overlayGeodesic(a: Array[Byte], b: Array[Byte], op: Int): Array[Byte] = {
    val ga = GeomOps.read(a)
    val gb = GeomOps.read(b)
    def planarOp(x: Geometry, y: Geometry): Geometry = op match {
      case 0 => x.intersection(y)
      case 1 => x.union(y)
      case 2 => x.difference(y)
      case _ => x.symDifference(y)
    }
    if (ga.isEmpty && gb.isEmpty) return GeomOps.write(planarOp(ga, gb))
    val anchor = GeomOps.factory.createGeometryCollection(Array(ga, gb)).getCentroid
    val (lon0, lat0) = (anchor.getX, anchor.getY)
    // near-antipodal inputs hit forward()'s antipode require deep in the
    // projection — rewrap so the error names the OVERLAY and its opt-outs
    def proj(g: Geometry): (Geometry, Double) =
      try projectTo(lon0, lat0, g)
      catch {
        case e: IllegalArgumentException if e.getMessage != null &&
            e.getMessage.contains("antipode") =>
          throw new IllegalArgumentException(
            "geodesic overlay: an input vertex is near-antipodal to the inputs' " +
              s"joint centroid, so it has no AEQD image (${e.getMessage}). Split " +
              "the inputs (ST_Dump / ST_Subdivide), or set " +
              "spark.graft.edges.dispatch.overlay=false to keep planar overlays " +
              "over edges-stamped columns", e)
      }
    val (pa, ra) = proj(ga)
    val (pb, rb) = proj(gb)
    val maxRange = math.max(ra, rb)
    require(maxRange <= MaxAnchorRange,
      f"geodesic overlay: inputs extend $maxRange%.0f m from their joint centroid — " +
        f"beyond ${MaxAnchorRange}%.0f m the local-plane error exceeds ~2%%. " +
        "Split the inputs (ST_Dump / ST_Subdivide) and overlay the parts, or set " +
        "spark.graft.edges.dispatch.overlay=false to keep planar overlays")
    val back = inverseFrom(lon0, lat0, planarOp(pa, pb))
    // same near-tangent inversion guard as the buffer (fuzz-found there)
    GeomOps.write(
      if (back.isValid) back
      else new org.locationtech.jts.geom.util.GeometryFixer(back).getResult)
  }

  /** Geodesic closest-point / shortest-line (round 19): both inputs on
    * the shared local-AEQD plane (meter-true ranges), JTS nearestPoints
    * there, endpoints inverted exactly. Returns the 2-point line from
    * `a`'s closest point to `b`'s; [[closestGeodesic]] returns just the
    * point on `a`. Same chord contract and extent guard as the overlay.
    * Accuracy contract (spec-pinned): the plane's lateral distortion can
    * shift the foot ALONG the target by ~(s/R)²·s/3 (hundreds of meters
    * at 500-km anchor ranges), but the returned pair's EXCESS DISTANCE
    * over the true minimum is second-order in that shift — sub-meter at
    * those ranges, mm at city scale. */
  def shortestLineGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ga = GeomOps.read(a)
    val gb = GeomOps.read(b)
    require(!ga.isEmpty && !gb.isEmpty,
      "geodesic shortest line: both inputs must be non-empty")
    val anchor = GeomOps.factory.createGeometryCollection(Array(ga, gb)).getCentroid
    val (lon0, lat0) = (anchor.getX, anchor.getY)
    val (pa, ra) = projectTo(lon0, lat0, ga)
    val (pb, rb) = projectTo(lon0, lat0, gb)
    require(math.max(ra, rb) <= MaxAnchorRange,
      f"geodesic shortest line: inputs extend ${math.max(ra, rb)}%.0f m from their " +
        f"joint centroid — beyond ${MaxAnchorRange}%.0f m the local-plane error " +
        "exceeds ~2%. Split the inputs and take the minimum")
    val np = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(pa, pb)
    val (lo1, la1) = reverse(lon0, lat0, np(0).x, np(0).y)
    val (lo2, la2) = reverse(lon0, lat0, np(1).x, np(1).y)
    GeomOps.write(GeomOps.factory.createLineString(Array(
      new Coordinate(lo1, la1), new Coordinate(lo2, la2))))
  }

  def closestGeodesic(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val line = GeomOps.read(shortestLineGeodesic(a, b))
    GeomOps.write(GeomOps.factory.createPoint(line.getCoordinates()(0)))
  }

  /** Meter-true buffer of a lon/lat geometry: project to a local AEQD
    * anchored at the geometry's centroid (exact geodesic ranges from the
    * anchor), JTS-buffer in meters on that plane, and invert each output
    * vertex through the exact direct problem. For a POINT input the
    * result's boundary vertices lie on the true geodesic circle to
    * sub-millimeter by construction; for extended geometries the width
    * error is bounded by the anchor-range distortion (≤(s/R)²/3,
    * enforced ≤ ~1.9% via [[MaxAnchorRange]]; ≲0.01% for a 100 km-scale
    * geometry). JTS `quadrantSegments` semantics apply unchanged
    * (negative radius shrinks polygons, styles via the planar API). */
  def bufferGeodesic(b: Array[Byte], radiusM: Double, quadSegs: Int): Array[Byte] = {
    val g = GeomOps.read(b)
    if (g.isEmpty) return GeomOps.write(g.getFactory.createPolygon())
    val c = g.getCentroid
    val (lon0, lat0) = (c.getX, c.getY)
    require(math.abs(lat0) <= 90.0 && math.abs(lon0) <= 180.0,
      s"ST_BufferGeodesic: geometry centroid ($lon0, $lat0) outside the geodetic " +
        "domain — input must be lon/lat degrees (EPSG:4326)")
    val (proj, maxRange) = projectTo(lon0, lat0, g)
    require(maxRange <= MaxAnchorRange,
      f"ST_BufferGeodesic: geometry extends $maxRange%.0f m from its centroid — " +
        f"beyond ${MaxAnchorRange}%.0f m the local-plane width error exceeds ~2%%. " +
        "Split the geometry (e.g. ST_Dump / ST_Subdivide) and buffer the parts")
    val back = inverseFrom(lon0, lat0, proj.buffer(radiusM, quadSegs))
    // a buffer of a self-crossing input can come back from the plane with
    // NEAR-TANGENT vertices; the inversion's sub-meter nudge can push such
    // a pair across into a micro self-intersection (fuzz-found on zigzag
    // linestrings). Repair with the same GeometryFixer ST_MakeValid uses —
    // the check is cheap and the fix fires only on those degenerate shapes.
    GeomOps.write(
      if (back.isValid) back
      else new org.locationtech.jts.geom.util.GeometryFixer(back).getResult)
  }
}
