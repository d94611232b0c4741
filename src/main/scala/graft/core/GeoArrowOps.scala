package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.locationtech.jts.geom._

/** GeoArrow (native) coordinate-layout → WKB transcoding kernels.
  *
  * GeoParquet 1.1 native encoding stores geometry as nested
  * list/struct columns in the GeoArrow separated-coordinate layout
  * (ref: rust/geoparquet/src/reader/parse.rs:30 `infer_geoarrow_schema`;
  * fixture fixtures/geoparquet/nybb_geoarrow.parquet):
  *
  *   point              struct<x,y[,z][,m]>
  *   linestring         list<struct>
  *   multipoint         list<struct>
  *   polygon            list<list<struct>>     (ring 0 = shell)
  *   multilinestring    list<list<struct>>
  *   multipolygon       list<list<list<struct>>>
  *
  * Each method is a `StaticInvoke` target taking the Catalyst value classes
  * directly (`ArrayData`/`InternalRow` — no Row conversion, inlines into
  * whole-stage codegen) plus z/m flags the reader derives from the parquet
  * schema's struct field names. Output is the engine's native WKB, so a
  * native-encoded file is indistinguishable from a WKB one past the scan —
  * the Spark-shaped equivalent of the reference's per-batch
  * `parse_to_native` conversion. */
object GeoArrowOps {

  private val factory = new GeometryFactory()

  private def width(hasZ: Boolean, hasM: Boolean): Int =
    2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

  /** GeoArrow field order is x, y[, z][, m]. */
  private def coord(r: InternalRow, hasZ: Boolean, hasM: Boolean): Coordinate =
    if (hasZ && hasM) new CoordinateXYZM(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    else if (hasM) new CoordinateXYM(r.getDouble(0), r.getDouble(1), r.getDouble(2))
    else if (hasZ) new Coordinate(r.getDouble(0), r.getDouble(1), r.getDouble(2))
    else new Coordinate(r.getDouble(0), r.getDouble(1))

  private def coords(a: ArrayData, z: Boolean, m: Boolean): Array[Coordinate] = {
    val w = width(z, m)
    Array.tabulate(a.numElements())(i => coord(a.getStruct(i, w), z, m))
  }

  private def line(a: ArrayData, z: Boolean, m: Boolean): LineString =
    factory.createLineString(coords(a, z, m))

  private def ring(a: ArrayData, z: Boolean, m: Boolean): LinearRing =
    factory.createLinearRing(coords(a, z, m))

  private def poly(a: ArrayData, z: Boolean, m: Boolean): Polygon = {
    val n = a.numElements()
    if (n == 0) factory.createPolygon()
    else factory.createPolygon(ring(a.getArray(0), z, m),
      Array.tabulate(n - 1)(i => ring(a.getArray(i + 1), z, m)))
  }

  // ── StaticInvoke targets (one per GeoParquet 1.1 native encoding) ──────

  def gaPoint(r: InternalRow, z: Boolean, m: Boolean): Array[Byte] = {
    val c = coord(r, z, m)
    // GeoArrow encodes POINT EMPTY as all-NaN ordinates (the null slot means
    // SQL NULL — reference trait_.rs:157-198 logical nulls)
    if (java.lang.Double.isNaN(c.x) && java.lang.Double.isNaN(c.y))
      GeomOps.write(factory.createPoint())
    else GeomOps.write(factory.createPoint(c))
  }

  def gaLineString(a: ArrayData, z: Boolean, m: Boolean): Array[Byte] =
    GeomOps.write(line(a, z, m))

  def gaMultiPoint(a: ArrayData, z: Boolean, m: Boolean): Array[Byte] =
    // an all-NaN member decodes to POINT EMPTY — the element-count-preserving
    // encoding [[mpCoords]] writes for MULTIPOINT (..., EMPTY)
    GeomOps.write(factory.createMultiPoint(coords(a, z, m).map(c =>
      if (nanEmptyPoint(c)) factory.createPoint() else factory.createPoint(c))))

  def gaPolygon(a: ArrayData, z: Boolean, m: Boolean): Array[Byte] =
    GeomOps.write(poly(a, z, m))

  def gaMultiLineString(a: ArrayData, z: Boolean, m: Boolean): Array[Byte] =
    GeomOps.write(factory.createMultiLineString(
      Array.tabulate(a.numElements())(i => line(a.getArray(i), z, m))))

  def gaMultiPolygon(a: ArrayData, z: Boolean, m: Boolean): Array[Byte] =
    GeomOps.write(factory.createMultiPolygon(
      Array.tabulate(a.numElements())(i => poly(a.getArray(i), z, m))))

  // ── WKB → GeoArrow export (the interop direction: native-encoded
  //    GeoParquet write / Arrow interchange; XY layout) ───────────────────

  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** The export layout is XY-only; silently dropping Z/M would corrupt
    * 3D/measured data on write, so lossy input fails loudly instead. */
  private def requireXY(g: Geometry, kernel: String): Geometry = {
    if (GeomOps.hasZ(g) || GeomOps.hasM(g))
      throw new IllegalArgumentException(
        s"$kernel: GeoArrow export emits XY only but the input geometry has Z/M " +
        "coordinates, which would be silently dropped. Strip them first with " +
        "ST_Force2D, or write with encoding=WKB (Z/M-preserving).")
    g
  }

  private def readXY(wkb: Array[Byte], kernel: String): Geometry =
    requireXY(GeomOps.read(wkb), kernel)

  private def coordRow(c: Coordinate): InternalRow =
    new GenericInternalRow(Array[Any](c.x, c.y))

  private def coordArr(cs: Array[Coordinate]): ArrayData =
    new GenericArrayData(cs.map(coordRow(_): Any))

  private def polyArr(p: Polygon): ArrayData =
    new GenericArrayData(
      ((p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => coordArr(r.getCoordinates): Any)).toArray)

  def toPoint(wkb: Array[Byte]): InternalRow = {
    val g = readXY(wkb, "ga_to_point")
    // POINT EMPTY exports as the spec's NaN pair (getCoordinate is null for
    // an empty point — a bare NPE here was round-16's defect)
    if (g.isEmpty) new GenericInternalRow(Array[Any](Double.NaN, Double.NaN))
    else coordRow(g.getCoordinate)
  }

  def toLineString(wkb: Array[Byte]): ArrayData =
    coordArr(readXY(wkb, "ga_to_linestring").getCoordinates)

  /** THE empty-member sentinel, defined once: an all-NaN x/y coordinate
    * ⇔ POINT EMPTY inside a multipoint (the GeoArrow empty-point
    * convention, element-count-preserving). Both directions of both hops
    * (ga_to_multipoint* here, the Arrow IPC union writer/reader) share
    * these two helpers so the convention cannot silently fork. */
  private[graft] def nanEmptyPoint(c: Coordinate): Boolean =
    java.lang.Double.isNaN(c.x) && java.lang.Double.isNaN(c.y)

  /** Per-member multipoint coords: JTS's flattening getCoordinates SKIPS
    * empty point members, silently changing the element count on roundtrip
    * (round-18 ADVICE). An EMPTY member rides the all-NaN coordinate; base
    * Coordinate reports NaN for getZ/getM, covering every dims family.
    * Non-point members fail with the kernel-named contract error the
    * sibling readers use, not a bare ClassCastException. */
  private[graft] def mpCoords(g: Geometry, kernel: String): Array[Coordinate] =
    Array.tabulate(g.getNumGeometries) { i =>
      g.getGeometryN(i) match {
        case p: Point =>
          if (p.isEmpty) new Coordinate(Double.NaN, Double.NaN) else p.getCoordinate
        case other => throw new IllegalArgumentException(
          s"$kernel: member $i is ${other.getGeometryType}, not Point")
      }
    }

  def toMultiPoint(wkb: Array[Byte]): ArrayData =
    coordArr(mpCoords(readXY(wkb, "ga_to_multipoint"), "ga_to_multipoint"))

  def toPolygon(wkb: Array[Byte]): ArrayData =
    polyArr(readXY(wkb, "ga_to_polygon").asInstanceOf[Polygon])

  def toMultiLineString(wkb: Array[Byte]): ArrayData = {
    val g = readXY(wkb, "ga_to_multilinestring")
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      coordArr(g.getGeometryN(i).getCoordinates)))
  }

  def toMultiPolygon(wkb: Array[Byte]): ArrayData = {
    val g = readXY(wkb, "ga_to_multipolygon")
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      polyArr(g.getGeometryN(i) match {
        case p: Polygon => p
        case other => throw new IllegalArgumentException(
          s"ga_to_multipolygon: component is ${other.getGeometryType}, not Polygon")
      })))
  }

  // ── XYZ export twins (round 16): the reference emits Dimension::XYZ
  //    native arrays; a separate kernel family because a SQL function's
  //    return struct is fixed — {x,y,z} is a different type than {x,y}.
  //    Input must actually CARRY Z (and no M — GeoParquet 1.1 native has
  //    no measured encoding): half-fidelity would silently fabricate or
  //    drop an ordinate, so both directions fail loudly. ──────────────────

  private def readXYZ(wkb: Array[Byte], kernel: String): Geometry = {
    val g = GeomOps.read(wkb)
    // an EMPTY has no coordinates to contradict the declared dimensions —
    // it exports as the natural empty shape (NaN point / zero-length lists)
    if (g.isEmpty) return g
    if (!GeomOps.hasZ(g))
      throw new IllegalArgumentException(
        s"$kernel: XYZ export requires Z coordinates but the input geometry is 2D — " +
        "use the XY kernel (drop the _z suffix) instead")
    if (GeomOps.hasM(g))
      throw new IllegalArgumentException(
        s"$kernel: XYZ export cannot carry the input's M measures — strip them " +
        "first or write with encoding=WKB (Z/M-preserving)")
    g
  }

  private def coordRowZ(c: Coordinate): InternalRow =
    new GenericInternalRow(Array[Any](c.x, c.y, c.getZ))

  private def coordArrZ(cs: Array[Coordinate]): ArrayData =
    new GenericArrayData(cs.map(coordRowZ(_): Any))

  private def polyArrZ(p: Polygon): ArrayData =
    new GenericArrayData(
      ((p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => coordArrZ(r.getCoordinates): Any)).toArray)

  def toPointZ(wkb: Array[Byte]): InternalRow = {
    val g = readXYZ(wkb, "ga_to_point_z")
    if (g.isEmpty) new GenericInternalRow(Array[Any](Double.NaN, Double.NaN, Double.NaN))
    else coordRowZ(g.getCoordinate)
  }

  def toLineStringZ(wkb: Array[Byte]): ArrayData =
    coordArrZ(readXYZ(wkb, "ga_to_linestring_z").getCoordinates)

  def toMultiPointZ(wkb: Array[Byte]): ArrayData =
    coordArrZ(mpCoords(readXYZ(wkb, "ga_to_multipoint_z"), "ga_to_multipoint_z"))

  def toPolygonZ(wkb: Array[Byte]): ArrayData =
    polyArrZ(readXYZ(wkb, "ga_to_polygon_z").asInstanceOf[Polygon])

  def toMultiLineStringZ(wkb: Array[Byte]): ArrayData = {
    val g = readXYZ(wkb, "ga_to_multilinestring_z")
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      coordArrZ(g.getGeometryN(i).getCoordinates)))
  }

  def toMultiPolygonZ(wkb: Array[Byte]): ArrayData = {
    val g = readXYZ(wkb, "ga_to_multipolygon_z")
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      polyArrZ(g.getGeometryN(i) match {
        case p: Polygon => p
        case other => throw new IllegalArgumentException(
          s"ga_to_multipolygon_z: component is ${other.getGeometryType}, not Polygon")
      })))
  }

  // ── XYM / XYZM export twins (round 17): completes the reference's
  //    all-dims native write coverage (rust/geoparquet/src/writer/
  //    encode.rs:21-74 encodes any GeoArrowType dimension). Same exact-
  //    fidelity contract as the Z family: the input must carry EXACTLY the
  //    kernel's dimensions — fabricating or dropping an ordinate fails
  //    loudly in both directions. ───────────────────────────────────────────

  private def readDims(wkb: Array[Byte], kernel: String,
                       wantZ: Boolean, wantM: Boolean): Geometry = {
    val g = GeomOps.read(wkb)
    // an EMPTY has no coordinates to contradict the declared dimensions —
    // it exports as the natural empty shape (NaN point / zero-length lists)
    if (g.isEmpty) return g
    val z = GeomOps.hasZ(g); val m = GeomOps.hasM(g)
    if (z != wantZ || m != wantM) {
      def dims(hz: Boolean, hm: Boolean) =
        "XY" + (if (hz) "Z" else "") + (if (hm) "M" else "")
      throw new IllegalArgumentException(
        s"$kernel: ${dims(wantZ, wantM)} export requires ${dims(wantZ, wantM)} input but the " +
        s"geometry is ${dims(z, m)} — use the matching kernel, or write with " +
        "encoding=WKB (Z/M-preserving)")
    }
    g
  }

  /** GeoArrow separated order is x, y[, z][, m]. */
  private def coordRowD(c: Coordinate, z: Boolean, m: Boolean): InternalRow =
    new GenericInternalRow(
      (Seq(c.x, c.y) ++ (if (z) Seq(c.getZ) else Nil) ++ (if (m) Seq(c.getM) else Nil))
        .map(_.asInstanceOf[Any]).toArray)

  private def coordArrD(cs: Array[Coordinate], z: Boolean, m: Boolean): ArrayData =
    new GenericArrayData(cs.map(coordRowD(_, z, m): Any))

  private def polyArrD(p: Polygon, z: Boolean, m: Boolean): ArrayData =
    new GenericArrayData(
      ((p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => coordArrD(r.getCoordinates, z, m): Any)).toArray)

  private def mlsArrD(g: Geometry, z: Boolean, m: Boolean): ArrayData =
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      coordArrD(g.getGeometryN(i).getCoordinates, z, m)))

  private def mpolyArrD(g: Geometry, kernel: String, z: Boolean, m: Boolean): ArrayData =
    new GenericArrayData(Array.tabulate[Any](g.getNumGeometries)(i =>
      polyArrD(g.getGeometryN(i) match {
        case p: Polygon => p
        case other => throw new IllegalArgumentException(
          s"$kernel: component is ${other.getGeometryType}, not Polygon")
      }, z, m)))

  private def nanRow(width: Int): InternalRow =
    new GenericInternalRow(Array.fill[Any](width)(Double.NaN))

  def toPointM(wkb: Array[Byte]): InternalRow = {
    val g = readDims(wkb, "ga_to_point_m", wantZ = false, wantM = true)
    if (g.isEmpty) nanRow(3) else coordRowD(g.getCoordinate, z = false, m = true)
  }
  def toLineStringM(wkb: Array[Byte]): ArrayData =
    coordArrD(readDims(wkb, "ga_to_linestring_m", wantZ = false, wantM = true).getCoordinates,
      z = false, m = true)
  def toMultiPointM(wkb: Array[Byte]): ArrayData =
    coordArrD(mpCoords(readDims(wkb, "ga_to_multipoint_m", wantZ = false, wantM = true),
      "ga_to_multipoint_m"),
      z = false, m = true)
  def toPolygonM(wkb: Array[Byte]): ArrayData =
    polyArrD(readDims(wkb, "ga_to_polygon_m", wantZ = false, wantM = true).asInstanceOf[Polygon],
      z = false, m = true)
  def toMultiLineStringM(wkb: Array[Byte]): ArrayData =
    mlsArrD(readDims(wkb, "ga_to_multilinestring_m", wantZ = false, wantM = true),
      z = false, m = true)
  def toMultiPolygonM(wkb: Array[Byte]): ArrayData =
    mpolyArrD(readDims(wkb, "ga_to_multipolygon_m", wantZ = false, wantM = true),
      "ga_to_multipolygon_m", z = false, m = true)

  def toPointZM(wkb: Array[Byte]): InternalRow = {
    val g = readDims(wkb, "ga_to_point_zm", wantZ = true, wantM = true)
    if (g.isEmpty) nanRow(4) else coordRowD(g.getCoordinate, z = true, m = true)
  }
  def toLineStringZM(wkb: Array[Byte]): ArrayData =
    coordArrD(readDims(wkb, "ga_to_linestring_zm", wantZ = true, wantM = true).getCoordinates,
      z = true, m = true)
  def toMultiPointZM(wkb: Array[Byte]): ArrayData =
    coordArrD(mpCoords(readDims(wkb, "ga_to_multipoint_zm", wantZ = true, wantM = true),
      "ga_to_multipoint_zm"),
      z = true, m = true)
  def toPolygonZM(wkb: Array[Byte]): ArrayData =
    polyArrD(readDims(wkb, "ga_to_polygon_zm", wantZ = true, wantM = true).asInstanceOf[Polygon],
      z = true, m = true)
  def toMultiLineStringZM(wkb: Array[Byte]): ArrayData =
    mlsArrD(readDims(wkb, "ga_to_multilinestring_zm", wantZ = true, wantM = true),
      z = true, m = true)
  def toMultiPolygonZM(wkb: Array[Byte]): ArrayData =
    mpolyArrD(readDims(wkb, "ga_to_multipolygon_zm", wantZ = true, wantM = true),
      "ga_to_multipolygon_zm", z = true, m = true)
}
