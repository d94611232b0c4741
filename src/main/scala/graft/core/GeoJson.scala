package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom._

/** GeoJSON (RFC 7946) geometry codec, hand-rolled on Jackson (jts-core has no
  * GeoJSON IO and the io-common jar is not on the classpath).
  *
  * Mirrors the reference's encoder crate (rust/geoarrow-geojson/src/encoder/)
  * and the legacy reader (rust/geoarrow-old/src/io/geojson/reader.rs:12):
  * all seven geometry types, optional Z, and `parse` also accepts a Feature
  * (extracts its `geometry` member) the way the reference's feature reader
  * does.
  */
object GeoJson {

  private val mapper = new ObjectMapper()
  private def f = GeomOps.factory

  // ── encode ────────────────────────────────────────────────────────────

  def encode(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    enc(g, sb)
    sb.toString
  }

  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite)
      throw new IllegalArgumentException(s"non-finite ordinate not representable in GeoJSON: $d")
    // integral-double fast path only where Long holds the value exactly
    else if (d == math.rint(d) && math.abs(d) < 9.007199254740992E15) d.toLong.toString
    else d.toString

  private def coord(c: Coordinate, sb: java.lang.StringBuilder): Unit = {
    sb.append('[').append(num(c.x)).append(',').append(num(c.y))
    if (!java.lang.Double.isNaN(c.getZ)) sb.append(',').append(num(c.getZ))
    sb.append(']')
  }

  private def coords(cs: Array[Coordinate], sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      coord(cs(i), sb); i += 1
    }
    sb.append(']')
  }

  private def polyCoords(p: Polygon, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    coords(p.getExteriorRing.getCoordinates, sb)
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(',')
      coords(p.getInteriorRingN(i).getCoordinates, sb); i += 1
    }
    sb.append(']')
  }

  private def members(g: Geometry, sb: java.lang.StringBuilder)(each: Geometry => Unit): Unit = {
    sb.append('[')
    var i = 0
    while (i < g.getNumGeometries) {
      if (i > 0) sb.append(',')
      each(g.getGeometryN(i)); i += 1
    }
    sb.append(']')
  }

  private def enc(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]") else coord(p.getCoordinate, sb)
      sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      coords(l.getCoordinates, sb); sb.append('}')
    case p: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]") else polyCoords(p, sb)
      sb.append('}')
    case m: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":")
      members(m, sb)(part => coord(part.getCoordinate, sb)); sb.append('}')
    case m: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":")
      members(m, sb)(part => coords(part.getCoordinates, sb)); sb.append('}')
    case m: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":")
      members(m, sb)(part => polyCoords(part.asInstanceOf[Polygon], sb)); sb.append('}')
    case gc: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":")
      members(gc, sb)(part => enc(part, sb)); sb.append('}')
  }

  // ── parse ─────────────────────────────────────────────────────────────

  def parse(json: String): Geometry = fromNode(mapper.readTree(json))

  private def fromNode(n0: JsonNode): Geometry = {
    // Feature → its geometry member (null geometry → empty collection)
    val n = if (n0.path("type").asText() == "Feature") n0.path("geometry") else n0
    if (n.isNull || n.isMissingNode) return f.createGeometryCollection()
    n.path("type").asText() match {
      case "Point" =>
        val c = n.path("coordinates")
        if (c.size() == 0) f.createPoint() else f.createPoint(pc(c))
      case "LineString" => f.createLineString(ring(n.path("coordinates")))
      case "Polygon" => polygon(n.path("coordinates"))
      case "MultiPoint" =>
        f.createMultiPoint(parts(n.path("coordinates"))(c => f.createPoint(pc(c))).toArray[Point])
      case "MultiLineString" =>
        f.createMultiLineString(parts(n.path("coordinates"))(c => f.createLineString(ring(c))).toArray[LineString])
      case "MultiPolygon" =>
        f.createMultiPolygon(parts(n.path("coordinates"))(polygon).toArray[Polygon])
      case "GeometryCollection" =>
        f.createGeometryCollection(parts(n.path("geometries"))(fromNode).toArray[Geometry])
      case other => throw new IllegalArgumentException(s"unknown GeoJSON type: $other")
    }
  }

  private def pc(c: JsonNode): Coordinate =
    if (c.size() >= 3) new Coordinate(c.get(0).asDouble(), c.get(1).asDouble(), c.get(2).asDouble())
    else new Coordinate(c.get(0).asDouble(), c.get(1).asDouble())

  private def ring(c: JsonNode): Array[Coordinate] = {
    val out = new Array[Coordinate](c.size())
    var i = 0
    while (i < c.size()) { out(i) = pc(c.get(i)); i += 1 }
    out
  }

  private def polygon(c: JsonNode): Polygon = {
    if (c.size() == 0) return f.createPolygon()
    val shell = f.createLinearRing(ring(c.get(0)))
    val holes = (1 until c.size()).map(i => f.createLinearRing(ring(c.get(i)))).toArray
    f.createPolygon(shell, holes)
  }

  private def parts[T](c: JsonNode)(make: JsonNode => T): Seq[T] =
    (0 until c.size()).map(i => make(c.get(i)))
}
