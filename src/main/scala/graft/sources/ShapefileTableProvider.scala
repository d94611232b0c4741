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

/** `spark.read.format("shapefile")` — DataSource V2 face of [[Shapefile]],
  * mirroring [[FlatGeobufSource]]: Catalyst's required-columns pushdown
  * reaches the DECODE level, so a pruned-out DBF column skips its
  * fixed-width parse (offset hop only) and a pruned-out geometry skips the
  * JTS build entirely — on attribute-only queries over geometry-heavy
  * files that is most of the per-record cost. Partitioning: big files
  * split into .shx-indexed record ranges sized to maxPartitionBytes,
  * small pairs stay one task, many files fan out across executors — same
  * as the function-style `read()`.
  *
  * The reference's legacy driver reads all columns unconditionally
  * (rust/geoarrow-old/src/io/shapefile/reader.rs:34); column selection is
  * the host engine's job there too — here it rides Spark's own pushdown.
  */
class ShapefileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shapefile"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path"))
    require(p.nonEmpty, "shapefile: no path given (use .load(path))")
    p.get
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val head = Shapefile.resolveFiles(spark, path(options)).head
    val fs = new Path(head).getFileSystem(spark.sessionState.newHadoopConf())
    Shapefile.schemaOf(fs, head)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShapefileTable(schema, path(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class ShapefileTable(dataSchema: StructType, root: String)
    extends Table with SupportsRead {
  override def name(): String = s"shapefile($root)"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // pin the session that plans the scan — SparkSession.active at
    // execution time could be a DIFFERENT session sharing the context,
    // with different spark.hadoop.* overrides/credentials
    new ShapefileScanBuilder(dataSchema, root, SparkSession.active)
}

private[sources] class ShapefileScanBuilder(dataSchema: StructType, root: String,
                                            session: SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = dataSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep file field order; Catalyst projects to its own order above
    required = StructType(dataSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ShapefileScan(dataSchema, required, root, session)
}

private[sources] case class ShpPartition(path: String, recStart: Int, nRecs: Int,
                                          shpStart: Long, shpEnd: Long)
    extends InputPartition

private[sources] class ShapefileScan(dataSchema: StructType,
                                     required: StructType,
                                     root: String,
                                     session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ShapefileScan(required=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] =
    // a big .shp splits into .shx-indexed record ranges sized to
    // maxPartitionBytes; small files (or no .shx) stay one pair = one task
    Shapefile.planSplits(session, Shapefile.resolveStatuses(session, root))
      .map { case (f, rs, nr, bs, be) => ShpPartition(f, rs, nr, bs, be) }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // indices of required fields within the full-width decoded row, and the
    // decode mask (full schema order, geometry last)
    val outIdx = required.fieldNames.map(dataSchema.fieldIndex)
    val wanted = Array.fill(dataSchema.length)(false)
    outIdx.foreach(wanted(_) = true)
    // session hadoop conf captured DRIVER-side: a bare executor-side
    // `new Configuration()` would drop spark.hadoop.* overrides and
    // credentials (s3a/hdfs clusters)
    ShapefileReaderFactory(required, outIdx, wanted,
      new org.apache.spark.util.SerializableConfiguration(
        session.sessionState.newHadoopConf()))
  }
}

private[sources] case class ShapefileReaderFactory(required: StructType,
                                                   outIdx: Array[Int],
                                                   wanted: Array[Boolean],
                                                   confSer: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ShpPartition(path, rs, nr, bs, be) = partition: @unchecked
    new RowPartitionReader(
      Shapefile.fileRowsRange(path, rs, nr, bs, be, wanted, confSer.value), outIdx, required)
  }
}
