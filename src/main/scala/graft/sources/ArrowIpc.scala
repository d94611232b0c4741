package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import graft.core.GeomOps

/** Arrow IPC (Feather v2 / .arrow) reader with GeoArrow geometry support —
  * closes the reference's Arrow interchange row (`fixtures/nybb.arrow`,
  * bench input of rust/geoarrow-old/benches/nybb.rs:10-30) using the
  * arrow-vector runtime Spark already ships.
  *
  * Geometry columns are recognized by their `ARROW:extension:name` field
  * metadata (`geoarrow.point` … `geoarrow.multipolygon`) and decoded to the
  * engine's WKB from EITHER GeoArrow coordinate layout: interleaved
  * (`fixed_size_list<xy>[2]`, what GDAL/GeoPandas emit to .arrow) or
  * separated (`struct<x,y>`). Everything else maps by Arrow type.
  *
  * Distribution model: one file = one task (IPC batches aren't splittable
  * without the footer); directories of .arrow files parallelize, same as
  * the FlatGeobuf/Shapefile sources.
  */
object ArrowIpc {

  // ── arrow field → spark type ──────────────────────────────────────────

  private def isGeo(md: java.util.Map[String, String]): Boolean =
    Option(md.get("ARROW:extension:name")).exists(_.startsWith("geoarrow."))

  private def sparkType(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    if (isGeo(f.getMetadata)) BinaryType
    else f.getType match {
      case t: ArrowType.Int =>
        (t.getBitWidth, t.getIsSigned) match {
          case (8, _) => ByteType
          case (16, _) => ShortType
          case (32, _) => IntegerType
          case _ => LongType
        }
      case t: ArrowType.FloatingPoint =>
        if (t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE) FloatType
        else DoubleType
      case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
      case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
      case _: ArrowType.Date => DateType
      case _: ArrowType.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported arrow type $other for column ${f.getName}")
    }
  }

  /** Public schema of an .arrow file (geometry columns as WKB binary). */
  def schemaOf(spark: SparkSession, path: String): StructType =
    withFirstFile(spark, path) { reader =>
      StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => StructField(f.getName, sparkType(f))))
    }

  // ── GeoArrow nested-value decode (both coordinate layouts) ────────────

  private def coordOf(v: Any): Coordinate = v match {
    case l: java.util.List[_] => // interleaved fixed_size_list
      val d = l.asScala.map(_.asInstanceOf[Number].doubleValue())
      if (d.length >= 3) new Coordinate(d(0), d(1), d(2)) else new Coordinate(d(0), d(1))
    case m: java.util.Map[_, _] => // separated struct
      val mm = m.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
        case (k, value) => k.toString -> value.asInstanceOf[Number].doubleValue()
      }
      if (mm.contains("z")) new Coordinate(mm("x"), mm("y"), mm("z"))
      else new Coordinate(mm("x"), mm("y"))
    case other => throw new IllegalArgumentException(s"ArrowIpc: unexpected coord $other")
  }

  private def coords(v: Any): Array[Coordinate] =
    v.asInstanceOf[java.util.List[_]].asScala.map(coordOf).toArray

  private def polygon(v: Any): org.locationtech.jts.geom.Polygon = {
    val rings = v.asInstanceOf[java.util.List[_]].asScala.map(r => GeomOps.factory.createLinearRing(coords(r)))
    if (rings.isEmpty) GeomOps.factory.createPolygon()
    else GeomOps.factory.createPolygon(rings.head, rings.tail.toArray)
  }

  private def decodeGeo(extName: String, v: Any): Geometry = {
    val f = GeomOps.factory
    extName.stripPrefix("geoarrow.") match {
      case "point" => f.createPoint(coordOf(v))
      case "linestring" => f.createLineString(coords(v))
      case "multipoint" => f.createMultiPointFromCoords(coords(v))
      case "polygon" => polygon(v)
      case "multilinestring" =>
        f.createMultiLineString(
          v.asInstanceOf[java.util.List[_]].asScala.map(l => f.createLineString(coords(l))).toArray)
      case "multipolygon" =>
        f.createMultiPolygon(v.asInstanceOf[java.util.List[_]].asScala.map(polygon).toArray)
      case "wkb" => GeomOps.read(v.asInstanceOf[Array[Byte]])
      case other => throw new IllegalArgumentException(s"ArrowIpc: unsupported geoarrow type $other")
    }
  }

  // ── read ──────────────────────────────────────────────────────────────

  private def withFirstFile[T](spark: SparkSession, path: String)(f: ArrowFileReader => T): T = {
    val files = listFiles(spark, path)
    val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(
      new org.apache.hadoop.fs.Path(files.head).toUri.getPath))
    val allocator = new RootAllocator()
    val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel], allocator)
    try f(reader)
    finally { reader.close(); allocator.close(); ch.close() }
  }

  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".arrow")).map(_.toString).toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .arrow files under $path")
    files
  }

  private def decodeFile(path: String, schema: StructType): Iterator[Row] = {
    val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(
      new org.apache.hadoop.fs.Path(path).toUri.getPath))
    val allocator = new RootAllocator()
    val reader = new ArrowFileReader(ch.asInstanceOf[java.nio.channels.SeekableByteChannel], allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toArray
      val geoExt = fields.map(f => Option(f.getMetadata.get("ARROW:extension:name"))
        .filter(_.startsWith("geoarrow.")))
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        var i = 0
        while (i < root.getRowCount) {
          val vals = new Array[Any](fields.length)
          var c = 0
          while (c < fields.length) {
            val raw = root.getVector(c).getObject(i)
            vals(c) =
              if (raw == null) null
              else geoExt(c) match {
                case Some(ext) => GeomOps.write(decodeGeo(ext, raw))
                case None => raw match {
                  case t: org.apache.arrow.vector.util.Text => t.toString
                  case other => other
                }
              }
            c += 1
          }
          out += Row.fromSeq(vals.toIndexedSeq)
          i += 1
        }
      }
      out.iterator
    } finally { reader.close(); allocator.close(); ch.close() }
  }

  /** Read .arrow file(s) into a DataFrame; geometry columns become WKB. */
  def read(spark: SparkSession, path: String): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    val files = listFiles(spark, path)
    val schema = schemaOf(spark, files.head)
    val rdd = spark.sparkContext.parallelize(files.toIndexedSeq, files.length)
      .flatMap(f => decodeFile(f, schema))
    spark.createDataFrame(rdd, schema)
  }

  // ── write ─────────────────────────────────────────────────────────────

  /** Write `df` as a directory of .arrow files, one per partition (same
    * distribution model as the FlatGeobuf writer — no driver collect). The
    * geometry column is written as a binary vector tagged
    * `ARROW:extension:name = geoarrow.wkb`, which GeoPandas/pyarrow and
    * [[read]] both recognize. Property types: int/long/float/double/
    * string/boolean/binary. */
  def write(df: DataFrame, path: String, geometryCol: String = "geometry"): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    import org.apache.arrow.vector.types.FloatingPointPrecision

    val sparkSchema = df.schema
    val dir = new org.apache.hadoop.fs.Path(path)
    dir.getFileSystem(df.sparkSession.sessionState.newHadoopConf()).mkdirs(dir)
    val geomName = geometryCol

    df.rdd.foreachPartition { rows =>
      val allocator = new RootAllocator()
      try {
        val fields = sparkSchema.fields.map { f =>
          val at: ArrowType = f.dataType match {
            case IntegerType => new ArrowType.Int(32, true)
            case LongType => new ArrowType.Int(64, true)
            case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
            case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
            case StringType => new ArrowType.Utf8()
            case BooleanType => new ArrowType.Bool()
            case BinaryType => new ArrowType.Binary()
            case other => throw new IllegalArgumentException(
              s"ArrowIpc.write: unsupported type $other for column ${f.name}")
          }
          val md = if (f.name == geomName && f.dataType == BinaryType)
            java.util.Map.of("ARROW:extension:name", "geoarrow.wkb")
          else java.util.Map.of[String, String]()
          new Field(f.name, new FieldType(f.nullable, at, null, md), java.util.List.of[Field]())
        }
        val root = VectorSchemaRoot.create(new Schema(java.util.List.of(fields: _*)), allocator)
        val buffered = rows.toArray
        root.allocateNew()
        var c = 0
        while (c < fields.length) {
          val vec = root.getVector(c)
          var i = 0
          while (i < buffered.length) {
            val row = buffered(i)
            if (row.isNullAt(c)) vec.asInstanceOf[FieldVector] match {
              case v: BaseFixedWidthVector => v.setNull(i)
              case v: BaseVariableWidthVector => v.setNull(i)
              case v => throw new IllegalStateException(s"unexpected vector $v")
            } else vec match {
              case v: IntVector => v.setSafe(i, row.getInt(c))
              case v: BigIntVector => v.setSafe(i, row.getLong(c))
              case v: Float4Vector => v.setSafe(i, row.getFloat(c))
              case v: Float8Vector => v.setSafe(i, row.getDouble(c))
              case v: VarCharVector => v.setSafe(i, row.getString(c).getBytes("UTF-8"))
              case v: BitVector => v.setSafe(i, if (row.getBoolean(c)) 1 else 0)
              case v: VarBinaryVector => v.setSafe(i, row.getAs[Array[Byte]](c))
              case v => throw new IllegalStateException(s"unexpected vector $v")
            }
            i += 1
          }
          c += 1
        }
        root.setRowCount(buffered.length)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.arrow"), true)
        val ch = java.nio.channels.Channels.newChannel(out)
        val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        try { writer.start(); writer.writeBatch(); writer.end() }
        finally { writer.close(); out.close(); root.close() }
      } finally allocator.close()
    }
  }
}
