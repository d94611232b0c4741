package graft.sources

import java.util


import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("flatgeobuf")` — DataSource V2 face of
  * [[FlatGeobuf]], adding what the function-style `read()` cannot express:
  * Catalyst-driven column pruning that reaches the DECODE level
  * ([[SupportsPushDownRequiredColumns]] → the `wanted` mask in
  * `FlatGeobuf.rowOf`): unwanted property values are cursor-skipped
  * without materializing, and an unwanted geometry is never decoded —
  * on a wide-schema corpus the dominant per-feature cost. Split planning
  * is shared with `read()` (one task per file; large indexed files split
  * into maxPartitionBytes ranges via the packed Hilbert index).
  *
  * The reference gains the same effect by mapping only requested columns
  * into arrays (rust/geoarrow-flatgeobuf/src/reader/common.rs property
  * schema selection); here it rides Spark's own required-columns pushdown.
  */
class FlatGeobufSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "flatgeobuf"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // Spark puts a single .load(p) into "path" and multiple into a JSON
    // array under "paths". Split on the `","` QUOTE boundary, not bare
    // commas — a comma is legal inside a filesystem path; only a literal
    // `","` sequence inside a path (not legal JSON here anyway) could
    // confuse this, vs every comma-bearing path under the naive split.
    val multi = Option(options.get("paths")).toSeq.flatMap {
      _.stripPrefix("[").stripSuffix("]").split("\"\\s*,\\s*\"").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "flatgeobuf: no path given (use .load(path))")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val head = FlatGeobufSource.resolveFiles(paths(options)).head._1
    val p = new Path(head)
    val fs = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    FlatGeobuf.schemaOf(FlatGeobuf.parseHeader(FlatGeobuf.readHeaderBytes(fs, p)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FlatGeobufTable(schema,
      paths(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] object FlatGeobufSource {
  def resolveFiles(roots: Seq[String],
                   session: SparkSession = SparkSession.active): Seq[(String, Long, Long)] = {
    val conf = session.sessionState.newHadoopConf()
    val files = roots.flatMap { r =>
      val p = new Path(r)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".fgb"))
          .map(s => (s.getPath.toString, s.getLen, s.getModificationTime)).toSeq
      else {
        val st = fs.getFileStatus(p)
        Seq((p.toString, st.getLen, st.getModificationTime))
      }
    }
    require(files.nonEmpty, s"no .fgb files under ${roots.mkString(",")}")
    files
  }

}

private[sources] class FlatGeobufTable(dataSchema: StructType, roots: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"flatgeobuf(${roots.mkString(",")})"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // pin the session that plans the scan — SparkSession.active at
    // execution time could be a DIFFERENT session sharing the context,
    // with different spark.hadoop.* overrides/credentials
    new FlatGeobufScanBuilder(dataSchema, roots, SparkSession.active)
}

private[sources] class FlatGeobufScanBuilder(dataSchema: StructType, roots: Seq[String],
                                             session: SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = dataSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep file field order; Catalyst projects to its own order above
    required = StructType(dataSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new FlatGeobufScan(dataSchema, required, roots, session)
}

private[sources] case class FgbPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] class FlatGeobufScan(dataSchema: StructType,
                                      required: StructType,
                                      roots: Seq[String],
                                      session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FlatGeobufScan(required=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val statuses = FlatGeobufSource.resolveFiles(roots, session)
    // shared split planner — sizing must not diverge from FlatGeobuf.read
    FlatGeobuf.planSplits(session, statuses.toIndexedSeq,
        session.sessionState.conf.filesMaxPartitionBytes)
      .map { case (f, s, e) => FgbPartition(f, s, e) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // indices of required fields within the full-width decoded row, and the
    // decode mask (length = columns + 1; last slot = geometry)
    val outIdx = required.fieldNames.map(dataSchema.fieldIndex)
    val wanted = Array.fill(dataSchema.length)(false)
    outIdx.foreach(wanted(_) = true)
    // session hadoop conf captured DRIVER-side: a bare executor-side
    // `new Configuration()` would drop spark.hadoop.* overrides and
    // credentials (s3a/hdfs clusters)
    FlatGeobufReaderFactory(required, outIdx, wanted,
      new org.apache.spark.util.SerializableConfiguration(
        session.sessionState.newHadoopConf()))
  }
}

private[sources] case class FlatGeobufReaderFactory(required: StructType,
                                                    outIdx: Array[Int],
                                                    wanted: Array[Boolean],
                                                    confSer: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val FgbPartition(path, start, end) = partition: @unchecked
    val p = new Path(path)
    val fs = p.getFileSystem(confSer.value)
    val rows =
      if (start < 0) FlatGeobuf.decodeFeatures(FlatGeobuf.readAll(fs, p), None, wanted)
      else FlatGeobuf.decodeRange(fs, p, start, end, wanted)
    new RowPartitionReader(rows, outIdx, required)
  }
}
