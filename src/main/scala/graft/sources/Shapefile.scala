package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}

import graft.core.GeomOps

/** Shapefile (.shp + .dbf) reader — re-expression of the reference's legacy
  * driver (rust/geoarrow-old/src/io/shapefile/reader.rs:34): sequential
  * record decode of the ESRI shapefile pair, dBase III properties zipped
  * with geometry by record order.
  *
  * Format layout is the public ESRI whitepaper: .shp = 100-byte header +
  * [record# BE, length BE, shape] records; .dbf = 32-byte header + 32-byte
  * field descriptors + fixed-width ASCII records.
  *
  * Distribution model: like [[FlatGeobuf.read]], one file pair = one task
  * (records are variable-length with no sync markers; the .shx offset index
  * could split large files — not needed while shapefiles cap at 2 GB by
  * spec). Many files parallelize across executors.
  */
object Shapefile {

  // ── .shp decode ───────────────────────────────────────────────────────

  private def decodeShape(bb: ByteBuffer, pos0: Int): Geometry = {
    val f = GeomOps.factory
    var p = pos0
    def d(): Double = { val v = bb.getDouble(p); p += 8; v }
    def i(): Int = { val v = bb.getInt(p); p += 4; v }
    val shapeType = i()
    // M/Z variants share the XY layout prefix; trailing Z/M bands are skipped
    // (shapefile Z/M fidelity is not in the reference's reader either)
    shapeType match {
      case 0 => f.createGeometryCollection() // null shape
      case 1 | 11 | 21 => // Point / PointZ / PointM
        val x = d(); val y = d()
        if (shapeType == 11) f.createPoint(new Coordinate(x, y, bb.getDouble(p)))
        else f.createPoint(new Coordinate(x, y))
      case 8 | 18 | 28 => // MultiPoint (+Z/M)
        p += 32 // bbox
        val n = i()
        f.createMultiPointFromCoords(Array.fill(n) { new Coordinate(d(), d()) })
      case 3 | 13 | 23 => // PolyLine (+Z/M)
        p += 32
        val numParts = i(); val numPoints = i()
        val parts = Array.fill(numParts)(i())
        val pts = Array.fill(numPoints) { new Coordinate(d(), d()) }
        val lines = partsToSlices(parts, numPoints).map { case (a, b) =>
          f.createLineString(pts.slice(a, b)) }
        if (lines.length == 1) lines.head else f.createMultiLineString(lines)
      case 5 | 15 | 25 => // Polygon (+Z/M): CW rings = shells, CCW = holes
        p += 32
        val numParts = i(); val numPoints = i()
        val parts = Array.fill(numParts)(i())
        val pts = Array.fill(numPoints) { new Coordinate(d(), d()) }
        val rings = partsToSlices(parts, numPoints).map { case (a, b) =>
          f.createLinearRing(pts.slice(a, b)) }
        assemblePolygons(rings)
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  private def partsToSlices(parts: Array[Int], total: Int): Array[(Int, Int)] =
    parts.zipWithIndex.map { case (start, k) =>
      (start, if (k + 1 < parts.length) parts(k + 1) else total) }

  /** Ring assembly per the spec: clockwise rings are shells, counter-
    * clockwise rings are holes of the shell that contains them. */
  private def assemblePolygons(rings: Array[LinearRing]): Geometry = {
    val f = GeomOps.factory
    if (rings.length == 1) return f.createPolygon(rings.head)
    val isShell = rings.map(r => !org.locationtech.jts.algorithm.Orientation
      .isCCW(r.getCoordinateSequence))
    val shells = rings.zip(isShell).filter(_._2).map(_._1)
    val holes = rings.zip(isShell).filterNot(_._2).map(_._1)
    if (shells.isEmpty) return f.createPolygon(rings.head) // degenerate: treat first as shell
    val polys = shells.map { shell =>
      val shellPoly = f.createPolygon(shell)
      val mine = holes.filter(h => shellPoly.contains(f.createPoint(h.getCoordinateN(0))))
      f.createPolygon(shell, mine)
    }
    if (polys.length == 1) polys.head else f.createMultiPolygon(polys)
  }

  /** With `decode = false` the iterator walks record headers only and
    * yields nulls — a pruned-out geometry column costs a pointer walk, not
    * a JTS build (the dominant per-record cost on geometry-heavy files). */
  private def shpGeometries(bytes: Array[Byte], decode: Boolean = true): Iterator[Geometry] = {
    // record headers are big-endian, shape payloads little-endian: two views
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLenBytes = be.getInt(24) * 2 // length in 16-bit words
    var p = 100
    new Iterator[Geometry] {
      def hasNext: Boolean = p + 8 <= math.min(fileLenBytes, bytes.length)
      def next(): Geometry = {
        val contentLen = be.getInt(p + 4) * 2
        val g = if (decode) { decodedGeoms.increment(); decodeShape(le, p + 8) } else null
        p += 8 + contentLen
        g
      }
    }
  }

  // ── .dbf decode ───────────────────────────────────────────────────────

  private case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def dbfFields(bytes: Array[Byte]): (Seq[DbfField], Int, Int, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recordSize = bb.getShort(10) & 0xFFFF
    val fields = ((32 until headerSize - 1 by 32).takeWhile(bytes(_) != 0x0D)).map { off =>
      val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
      DbfField(new String(nameBytes, "ASCII").trim, bytes(off + 11).toChar,
        bytes(off + 16) & 0xFF, bytes(off + 17) & 0xFF)
    }
    (fields, numRecords, headerSize, recordSize)
  }

  private def dbfType(f: DbfField): DataType = f.typ match {
    case 'C' | 'D' => StringType
    case 'N' => if (f.dec == 0 && f.len < 10) IntegerType
                else if (f.dec == 0) LongType else DoubleType
    case 'F' => DoubleType
    case 'L' => BooleanType
    case other => StringType
  }

  // diagnostics (spec-proof of decode-level pruning; LongAdder — task
  // threads write contention-free, the test sums; same device as
  // FlatGeobuf.decodedPropValues)
  private[graft] val decodedPropValues = new java.util.concurrent.atomic.LongAdder
  private[graft] val decodedGeoms = new java.util.concurrent.atomic.LongAdder

  /** DBF records are fixed-width, so skipping a pruned-out column is free:
    * `wanted(i) = false` advances the offset without the String alloc +
    * numeric parse that dominate DBF decode. `wanted = null` decodes all. */
  private def dbfRecords(bytes: Array[Byte],
                         wanted: Array[Boolean] = null): Iterator[Array[Any]] = {
    val (fields, numRecords, headerSize, recordSize) = dbfFields(bytes)
    (0 until numRecords).iterator.map { r =>
      val base = headerSize + r * recordSize
      var off = base + 1 // skip deletion flag
      fields.zipWithIndex.map { case (f, fi) =>
        if (wanted != null && !wanted(fi)) { off += f.len; null }
        else {
          val raw = new String(bytes, off, f.len, "ASCII").trim
          off += f.len
          decodedPropValues.increment()
          if (raw.isEmpty) null
          else f.typ match {
            case 'C' | 'D' => raw
            case 'N' if f.dec == 0 && f.len < 10 => raw.toInt
            case 'N' if f.dec == 0 => raw.toLong
            case 'N' | 'F' => raw.toDouble
            case 'L' => "YyTt".contains(raw.head)
            case _ => raw
          }
        }
      }.toArray[Any]
    }
  }

  // ── public API ────────────────────────────────────────────────────────

  /** List .shp files under `path` (a single file or a directory). */
  private[sources] def resolveFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".shp"))
          .map(_.toString).toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .shp files under $path")
    files
  }

  /** Schema = DBF property columns (file order) + `geometry` WKB. */
  private[sources] def schemaOf(fs: org.apache.hadoop.fs.FileSystem,
                                shpFile: String): StructType = {
    val dbp = new org.apache.hadoop.fs.Path(shpFile.stripSuffix(".shp") + ".dbf")
    StructType(
      (if (fs.exists(dbp)) dbfFields(readAll(fs, dbp))._1
        .map(f => StructField(f.name, dbfType(f)))
      else Seq.empty) :+ StructField("geometry", BinaryType))
  }

  /** Decode one .shp(+.dbf) pair to full-width rows. `wanted` indexes the
    * full schema (properties in file order, geometry LAST); pruned-out
    * slots stay null: DBF values skip their parse, a pruned geometry skips
    * the JTS build entirely. `wanted = null` decodes everything. Runs
    * task-side — opens its own FileSystem. */
  private[sources] def fileRows(f: String, wanted: Array[Boolean],
      conf: org.apache.hadoop.conf.Configuration): Iterator[Row] = {
    val fp = new org.apache.hadoop.fs.Path(f)
    // conf is REQUIRED (the session hadoop conf, shipped via
    // SerializableConfiguration): a bare new Configuration() here would
    // drop spark.hadoop.* overrides and credentials on s3a/hdfs
    val fsw = fp.getFileSystem(conf)
    val wantGeom = wanted == null || wanted(wanted.length - 1)
    val geoms = shpGeometries(readAll(fsw, fp), decode = wantGeom)
    val dbp = new org.apache.hadoop.fs.Path(f.stripSuffix(".shp") + ".dbf")
    val props: Iterator[Array[Any]] =
      if (fsw.exists(dbp))
        dbfRecords(readAll(fsw, dbp), if (wanted == null) null else wanted.dropRight(1))
      else Iterator.continually(Array.empty[Any])
    geoms.zip(props).map { case (g, pr) =>
      Row.fromSeq(pr.toIndexedSeq :+ (if (g == null) null else GeomOps.write(g)))
    }
  }

  /** Read .shp(+.dbf) file(s) into a DataFrame (property columns +
    * `geometry` WKB). `path` may be a single .shp or a directory of them.
    * For Catalyst-driven column pruning use the DSv2 face,
    * `spark.read.format("shapefile")` ([[ShapefileSource]]). */
  def read(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val files = resolveFiles(spark, path)
    // schema from the first .dbf (driver side)
    val p0 = new org.apache.hadoop.fs.Path(files.head)
    val schema = schemaOf(p0.getFileSystem(spark.sessionState.newHadoopConf()), files.head)
    val confSer = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
    val rdd = spark.sparkContext.parallelize(files.toIndexedSeq, files.length)
      .flatMap(f => fileRows(f, null, confSer.value.value))
    spark.createDataFrame(rdd, schema)
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val out = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, out) finally in.close()
    out
  }
}
