package graft.core

import org.locationtech.jts.geom._

/** Topology-preserving Visvalingam–Whyatt simplification.
  *
  * Reference surface: rust/geoarrow-expr-geo/src/simplify_vw_preserve.rs:19
  * (which delegates to the georust `geo` crate's `SimplifyVwPreserve`). The
  * algorithm is public knowledge — Visvalingam & Whyatt 1993 ("Line
  * generalisation by repeated elimination of points") plus the topology
  * guard popularised by Bloch/Bostock: vertices are eliminated in order of
  * smallest effective triangle area, but a vertex is kept when the shortcut
  * segment joining its two neighbours would intersect any other current
  * segment of the same ring/linestring — that is what prevents the
  * self-intersections plain VW can introduce. This is an independent
  * re-derivation, not a transcription.
  *
  * Semantics (each matching the reference's documented behaviour):
  *  - Points, MultiPoints and GeometryCollections pass through unchanged
  *    (simplify_vw_preserve.rs:25-27).
  *  - LineString endpoints are always kept; a closed ring keeps its anchor
  *    (first == last) vertex fixed.
  *  - A vertex is removed iff its effective area < epsilon AND the shortcut
  *    does not intersect any current segment that shares no endpoint with
  *    the shortcut (segments sharing an endpoint legitimately touch).
  *  - A ring never drops below 4 coordinates (3 distinct + closure); an
  *    open line never below its 2 endpoints.
  *  - Each ring / linestring component is guarded independently.
  *
  * Documented conservative divergence from the geo crate: a vertex whose
  * removal is BLOCKED by an intersecting segment leaves the queue and is
  * re-scored only when one of its immediate neighbours is removed. If the
  * unrelated blocking segment is itself eliminated later, the vertex is
  * not re-examined, so the output can RETAIN more vertices than the
  * reference on such inputs (never fewer, and topology is still
  * preserved — the divergence is only ever toward less simplification).
  * Re-enqueueing would need an envelope→blocked-vertex index maintained
  * across removals; the guard's correctness doesn't depend on it.
  */
object VwPreserve {

  def simplify(g: Geometry, epsilon: Double): Geometry = {
    if (epsilon <= 0) return g
    g match {
      case _: Point | _: MultiPoint => g
      case gc: GeometryCollection if gc.getGeometryType == Geometry.TYPENAME_GEOMETRYCOLLECTION => g
      case _ =>
        val ed = new org.locationtech.jts.geom.util.GeometryEditor(g.getFactory)
        ed.edit(g, new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
          override def edit(coords: Array[Coordinate], geometry: Geometry): Array[Coordinate] =
            geometry match {
              case _: LinearRing => simplifyCoords(coords, epsilon, minCoords = 4)
              case _: LineString => simplifyCoords(coords, epsilon, minCoords = 2)
              case _ => coords
            }
        })
    }
  }

  /** One vertex-elimination pass over a single coordinate array (open line
    * or closed ring — the closure duplicate is coords(n-1) and is never a
    * removal candidate, so it needs no special casing). */
  private def simplifyCoords(coords: Array[Coordinate], eps: Double, minCoords: Int): Array[Coordinate] = {
    val n = coords.length
    if (n <= minCoords) return coords

    val alive = Array.fill(n)(true)
    val prev = Array.tabulate(n)(_ - 1)
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    var remaining = n

    def area(l: Int, c: Int, r: Int): Double = {
      val a = coords(l); val b = coords(c); val d = coords(r)
      math.abs((b.x - a.x) * (d.y - a.y) - (d.x - a.x) * (b.y - a.y)) / 2.0
    }

    // min-heap of (effective area, vertex, neighbours at push time);
    // stale entries are detected by comparing the recorded neighbours with
    // the live linked list at pop time (lazy invalidation)
    case class Cand(a: Double, i: Int, l: Int, r: Int)
    implicit val ord: Ordering[Cand] = Ordering.by[Cand, Double](_.a).reverse
    val pq = scala.collection.mutable.PriorityQueue.empty[Cand]
    var i = 1
    while (i < n - 1) { pq.enqueue(Cand(area(i - 1, i, i + 1), i, i - 1, i + 1)); i += 1 }

    // current segments of this component, bbox-indexed for the topology
    // probe; Quadtree supports the remove/insert churn elimination causes
    val tree = new org.locationtech.jts.index.quadtree.Quadtree()
    final class Seg(val i1: Int, val i2: Int) {
      val env = new Envelope(coords(i1), coords(i2))
    }
    val segOf = new java.util.HashMap[Long, Seg]()
    def segKey(a: Int, b: Int): Long = a.toLong * n + b
    def addSeg(a: Int, b: Int): Unit = {
      val s = new Seg(a, b); segOf.put(segKey(a, b), s); tree.insert(s.env, s)
    }
    def rmSeg(a: Int, b: Int): Unit = {
      val s = segOf.remove(segKey(a, b)); if (s != null) tree.remove(s.env, s)
    }
    i = 0
    while (i < n - 1) { addSeg(i, i + 1); i += 1 }

    val li = new org.locationtech.jts.algorithm.RobustLineIntersector()
    /** true iff some current segment sharing NO endpoint with the shortcut
      * (l,r) intersects it — the geo-crate guard: segments that share an
      * endpoint touch legitimately and never block. */
    def blocked(l: Int, r: Int): Boolean = {
      val p0 = coords(l); val p1 = coords(r)
      val env = new Envelope(p0, p1)
      val it = tree.query(env).iterator()
      while (it.hasNext) {
        val s = it.next().asInstanceOf[Seg]
        val q0 = coords(s.i1); val q1 = coords(s.i2)
        val shares = q0.equals2D(p0) || q0.equals2D(p1) || q1.equals2D(p0) || q1.equals2D(p1)
        if (!shares) {
          li.computeIntersection(p0, p1, q0, q1)
          if (li.hasIntersection) return true
        }
      }
      false
    }

    while (pq.nonEmpty && remaining > minCoords) {
      val c = pq.dequeue()
      if (alive(c.i) && prev(c.i) == c.l && next(c.i) == c.r) {
        if (c.a >= eps) {
          // smallest live effective area already at/over the threshold
          return collect(coords, alive, remaining)
        }
        if (!blocked(c.l, c.r)) {
          alive(c.i) = false
          remaining -= 1
          next(c.l) = c.r
          prev(c.r) = c.l
          rmSeg(c.l, c.i); rmSeg(c.i, c.r); addSeg(c.l, c.r)
          // neighbours' triangles changed: push fresh scores
          if (prev(c.l) >= 0) pq.enqueue(Cand(area(prev(c.l), c.l, c.r), c.l, prev(c.l), c.r))
          if (next(c.r) >= 0) pq.enqueue(Cand(area(c.l, c.r, next(c.r)), c.r, c.l, next(c.r)))
        }
        // blocked: vertex stays; it is reconsidered only via a fresh score
        // pushed when one of its neighbours is later removed
      }
    }
    collect(coords, alive, remaining)
  }

  private def collect(coords: Array[Coordinate], alive: Array[Boolean], remaining: Int): Array[Coordinate] = {
    val out = new Array[Coordinate](remaining)
    var i = 0; var j = 0
    while (i < coords.length) { if (alive(i)) { out(j) = coords(i); j += 1 }; i += 1 }
    out
  }
}
