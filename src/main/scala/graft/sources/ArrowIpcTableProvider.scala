package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("arrowipc")` — DataSource V2 face of [[ArrowIpc]],
  * completing the pruning story across the binary sources (GeoParquet →
  * FlatGeobuf → Shapefile → Arrow IPC): Catalyst's required-columns
  * pushdown now prunes at BOTH levels. Byte level: when a proper subset
  * of columns is required, [[ArrowIpc.decodeFilePruned]] reads only each
  * batch's header plus the wanted columns' buffer byte ranges — a
  * pruned column's buffers are never fetched from storage (the columnar
  * projection discipline of the reference's readers,
  * rust/geoarrow-old/benches/wkb.rs:20-21). Decode level: per-cell
  * materialization — Arrow getObject boxing, Text→String copies and,
  * decisively, the JTS geometry build + WKB serialization — runs only
  * for required columns. One .arrow file = one task, as in the
  * function-style `read()`.
  */
class ArrowIpcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrowipc"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path"))
    require(p.nonEmpty, "arrowipc: no path given (use .load(path))")
    p.get
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowIpc.schemaOf(SparkSession.active, path(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArrowIpcTable(schema, path(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class ArrowIpcTable(dataSchema: StructType, root: String)
    extends Table with SupportsRead {
  override def name(): String = s"arrowipc($root)"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // pin the session that plans the scan — SparkSession.active at
    // execution time could be a DIFFERENT session sharing the context,
    // with different spark.hadoop.* overrides/credentials
    new ArrowIpcScanBuilder(dataSchema, root, SparkSession.active)
}

private[sources] class ArrowIpcScanBuilder(dataSchema: StructType, root: String,
                                           session: SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = dataSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep file field order; Catalyst projects to its own order above
    required = StructType(dataSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ArrowIpcScan(dataSchema, required, root, session)
}

private[sources] case class ArrowIpcPartition(path: String, blockStart: Int, blockEnd: Int,
                                               fileFormat: Boolean)
    extends InputPartition

private[sources] class ArrowIpcScan(dataSchema: StructType,
                                    required: StructType,
                                    root: String,
                                    session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ArrowIpcScan(required=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] =
    // big files split into batch ranges sized to maxPartitionBytes (the
    // footer lists every record-batch block); small files = one task
    ArrowIpc.planSplits(session, ArrowIpc.listFileStatuses(session, root))
      .map { case (f, s, e, fmt) => ArrowIpcPartition(f, s, e, fmt) }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val outIdx = required.fieldNames.map(dataSchema.fieldIndex)
    val wanted = Array.fill(dataSchema.length)(false)
    outIdx.foreach(wanted(_) = true)
    // session hadoop conf captured DRIVER-side: a bare executor-side
    // `new Configuration()` would drop spark.hadoop.* overrides and
    // credentials (s3a/hdfs clusters)
    ArrowIpcReaderFactory(required, outIdx, wanted,
      new org.apache.spark.util.SerializableConfiguration(
        session.sessionState.newHadoopConf()))
  }
}

private[sources] case class ArrowIpcReaderFactory(required: StructType,
                                                  outIdx: Array[Int],
                                                  wanted: Array[Boolean],
                                                  confSer: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ArrowIpcPartition(path, blockStart, blockEnd, fileFormat) = partition: @unchecked
    new RowPartitionReader(
      ArrowIpc.decodeFileAuto(path, confSer.value, wanted, blockStart, blockEnd,
        Some(fileFormat)),
      outIdx, required)
  }
}
