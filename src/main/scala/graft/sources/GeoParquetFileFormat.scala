package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.io.api.RecordConsumer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType

/** Parquet file format that finalizes the GeoParquet `geo` footer KV AT
  * FILE CLOSE, inside each writing task — the reference's single-pass
  * writer model (rust/geoparquet/src/writer/encode.rs:21-74, metadata
  * assembled while rows stream and attached when the file ends). Compared
  * to write-then-rewrite, a 100 TB dataset's bytes move exactly once, and
  * every part-file footer carries ITS OWN observed bbox and geometry_types
  * (the GeoParquet 1.1 per-file metadata model) instead of a stamped
  * dataset-level superset.
  *
  * Mechanics: Spark's stock parquet write path is reused wholesale; the
  * only change is the registered `WriteSupport`, a thin wrapper around
  * Spark's own row shredder that additionally tracks the covering bbox
  * min/max and the WKB type tags it sees, then emits the `geo` JSON from
  * `finalizeWrite()` (parquet-mr merges it into the footer KV at close).
  */
class GeoParquetFileFormat extends ParquetFileFormat with DataSourceRegister {

  override def shortName(): String = "geoparquet"

  override def toString: String = "GeoParquet"

  /** Read-side row-group pruning from NATIVE separated-coordinate column
    * statistics — the reference's second pruning path
    * (rust/geoparquet/src/reader/spatial_filter.rs:59-181): a native
    * (GeoArrow-encoded) geometry column's x/y leaf columns carry ordinary
    * parquet min/max stats, and the same leaf serves as both the minx and
    * maxx source (min stat = minx, max stat = maxx). Spark's stock reader
    * cannot push predicates on REPEATED leaves (parquet-mr rejects them),
    * so a covering-less native file would otherwise full-scan; this
    * override plans row groups by hand and drives the stock vectorized
    * reader over exactly the surviving byte ranges.
    *
    * Mechanics: with the [[GeoParquetFileFormat.BboxFilterKey]] option set
    * ("gcol;xmin,ymin,xmax,ymax"), each task reads its split's FOOTER
    * (KB-scale IO), takes the row groups whose byte midpoints fall in the
    * split (parquet-mr's own ownership rule, so no row group is read twice
    * across splits), drops those whose x/y-leaf stats bbox misses the
    * query rect, merges surviving neighbors into contiguous runs, and
    * invokes the parent ParquetFileFormat reader once per run with a
    * sub-range `PartitionedFile` — full whole-stage-codegen'd vectorized
    * decode on exactly the surviving groups. A fully-pruned split returns
    * empty after footer-only IO; at 100 TB against spatially-sorted data
    * this is the difference between a full scan and reading the query
    * window. Row groups with absent/non-double stats are conservatively
    * kept. */
  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String],
      hadoopConf: Configuration)
      : org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow] = {
    val parent = super.buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters, options, hadoopConf)
    options.get(GeoParquetFileFormat.BboxFilterKey) match {
      case None =>
        options.get(GeoParquetFileFormat.RowWindowKey) match {
          case None => parent
          case Some(spec) =>
            // "<start>\t<end>\t<path>=<globalFirstRow>…" — see
            // GeoParquet.read(limit, offset)
            val parts = spec.split("\t", 3)
            val (winStart, winEnd) = (parts(0).toLong, parts(1).toLong)
            val fileStarts: Map[String, Long] = parts(2).split('\u0001')
              .map { kv => val i = kv.lastIndexOf('='); (kv.take(i), kv.drop(i + 1).toLong) }
              .toMap
            val confBc = sparkSession.sparkContext.broadcast(
              new org.apache.spark.util.SerializableConfiguration(hadoopConf))
            file => GeoParquetFileFormat.rowWindowRead(
              parent, file, confBc.value.value, winStart, winEnd, fileStarts)
        }
      case Some(spec) =>
        val Array(gcol, nums) = spec.split(";", 2)
        val Array(qxmin, qymin, qxmax, qymax) = nums.split(",").map(_.toDouble)
        val confBc = sparkSession.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(hadoopConf))
        file => GeoParquetFileFormat.statsPrunedRead(
          parent, file, confBc.value.value, gcol, qxmin, qymin, qxmax, qymax)
    }
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    val conf = job.getConfiguration
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS, classOf[GeoParquetWriteSupport].getName)
    val geomCol = options.getOrElse(GeoParquetFileFormat.GeomColKey, "geometry")
    conf.set(GeoParquetFileFormat.GeomColKey, geomCol)
    conf.setInt(GeoParquetFileFormat.GeomIdxKey, dataSchema.fieldNames.indexOf(geomCol))
    val covering = options.getOrElse(GeoParquetFileFormat.CoveringKey, "")
    conf.set(GeoParquetFileFormat.CoveringKey, covering)
    conf.setInt(GeoParquetFileFormat.BboxIdxKey,
      if (covering.nonEmpty) dataSchema.fieldNames.indexOf(covering) else -1)
    conf.set(GeoParquetFileFormat.EncodingKey,
      options.getOrElse(GeoParquetFileFormat.EncodingKey, "WKB"))
    options.get(GeoParquetFileFormat.CrsKey).foreach(conf.set(GeoParquetFileFormat.CrsKey, _))
    options.get(GeoParquetFileFormat.EdgesKey).foreach(conf.set(GeoParquetFileFormat.EdgesKey, _))
    options.get(GeoParquetFileFormat.CoveringGeodesicKey)
      .foreach(conf.set(GeoParquetFileFormat.CoveringGeodesicKey, _))
    // secondary geometry columns: names, ordinals, per-column CRS
    options.get(GeoParquetFileFormat.SecondaryKey).filter(_.nonEmpty).foreach { joined =>
      conf.set(GeoParquetFileFormat.SecondaryKey, joined)
      conf.set(GeoParquetFileFormat.SecondaryIdxKey,
        joined.split('\t').map(dataSchema.fieldNames.indexOf(_)).mkString(","))
      joined.split('\t').foreach { name =>
        options.get(GeoParquetFileFormat.CrsKey + "." + name)
          .foreach(conf.set(GeoParquetFileFormat.CrsKey + "." + name, _))
      }
    }
    factory
  }
}

object GeoParquetFileFormat {
  val GeomColKey = "graft.geo.column"
  /** Read option enabling native-stats row-group pruning:
    * "geometryCol;xmin,ymin,xmax,ymax". */
  val BboxFilterKey = "graft.geo.bboxfilter"

  /** Read option enabling reader-level offset/limit short-circuit:
    * "winStart\twinEnd\tpath=firstGlobalRow␁path=firstGlobalRow…" —
    * the half-open GLOBAL row window [winStart, winEnd) over the
    * dataset's stable row order (files sorted by path, row groups in
    * file order, rows in group order). Set by
    * [[GeoParquet.read]]'s `limit`/`offset` parameters. */
  val RowWindowKey = "graft.geo.rowwindow"

  /** Reader-level offset/limit — the short-circuit-decode twin of the
    * reference's `limit`/`offset` reader options
    * (python/geoarrow-io/.../_parquet.pyi:134-135,153-154): each split
    * reads its footer (cached digest, KB-scale), maps its owned row
    * groups to GLOBAL row positions via the driver-computed per-file
    * first-row index, and decodes ONLY the groups overlapping the
    * window (single merged byte run — the window is contiguous, so
    * surviving groups are consecutive in file order). Group-granular by
    * design: the iterator may carry ColumnarBatches (vectorized path),
    * so the row-exact boundary trim lives in [[GeoParquet.read]] as a
    * codegen'd filter on `_metadata.row_index` — only the ≤ 2 boundary
    * files pay a per-row comparison. A fully-outside split answers
    * empty after footer-only IO — `offset`-skipped terabytes are never
    * decoded. */
  private[sources] def rowWindowRead(
      parent: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow],
      file: org.apache.spark.sql.execution.datasources.PartitionedFile,
      conf: Configuration,
      winStart: Long, winEnd: Long,
      fileStarts: Map[String, Long]): Iterator[InternalRow] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    // normalize to Hadoop Path's canonical string ("file:/x", never
    // "file:///x") — PartitionedFile.filePath and the driver's listing
    // render the same file differently
    val normPath = new org.apache.hadoop.fs.Path(file.filePath.toUri).toString
    val fStart = fileStarts.getOrElse(normPath, return Iterator.empty)
    val key = (file.filePath.toString, file.fileSize, file.modificationTime, "")
    if (footerDigestCache.size > 1024) footerDigestCache.clear()
    val groups = footerDigestCache.computeIfAbsent(key, _ => {
      prunedFooterOpens.increment()
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.filePath.toUri), conf))
      try reader.getFooter.getBlocks.asScala.map { b =>
        GroupDigest(b.getStartingPos, b.getCompressedSize, b.getRowCount,
          None, None, None)
      }.toIndexedSeq
      finally reader.close()
    })
    val ordered = groups.sortBy(_.start)
    // (group, its first global row)
    val withPos = ordered.zip(
      ordered.scanLeft(fStart)((acc, g) => acc + g.rowCount))
    val owned = withPos.filter { case (g, _) =>
      val mid = g.start + g.compressedSize / 2
      mid >= file.start && mid < file.start + file.length
    }
    val surviving = owned.filter { case (g, s) =>
      s < winEnd && s + g.rowCount > winStart
    }
    if (surviving.isEmpty) return Iterator.empty
    // the window is a contiguous row range and global rows increase with
    // file position, so surviving groups are CONSECUTIVE: one byte run
    val runStart = surviving.head._1.start
    val runEnd = surviving.last._1.start + surviving.last._1.compressedSize
    parent(file.copy(start = runStart, length = runEnd - runStart))
  }

  /** Per-executor footer digest cache for [[statsPrunedRead]]: a file split
    * into thousands of tasks would otherwise re-open and re-parse the same
    * footer once PER SPLIT — repeated KB-scale ranged IO that object-store
    * latency turns into the dominant cost. Keyed by (path, size, mtime,
    * gcol) — all from the `PartitionedFile` Spark already planned with, so
    * a hit does ZERO filesystem calls; an overwritten file changes
    * size/mtime and misses. Values are compact per-row-group digests
    * (offset, size, stats bbox), not parquet footer objects. */
  private case class GroupDigest(start: Long, compressedSize: Long, rowCount: Long,
                                 bbox: Option[(Double, Double, Double, Double)],
                                 xPages: Option[LeafPages], yPages: Option[LeafPages])
  private val footerDigestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, String), IndexedSeq[GroupDigest]]
  /** Test gauge: actual footer opens by the pruned reader. */
  private[graft] val prunedFooterOpens = new java.util.concurrent.atomic.LongAdder
  /** Test gauge: row groups whose AGGREGATE stats intersect the window but
    * whose page-level x/y row ranges prove no row can match. */
  private[graft] val pageRefinePrunedGroups = new java.util.concurrent.atomic.LongAdder

  /** Per-page stats of one double leaf: page row spans (offset index) +
    * min/max (column index). parquet-mr emits BOTH indexes for repeated
    * leaves too (pages break at record boundaries, so first_row_index is a
    * top-level row index even under nested list layouts) — which is what
    * makes page-level evidence available where page-level FILTERING isn't
    * (parquet-mr rejects predicates on repeated columns). `conservative`
    * marks pages whose stats are unusable (all-null or non-8-byte): they
    * count as hits. */
  private case class LeafPages(firstRow: Array[Long], min: Array[Double],
                               max: Array[Double], conservative: Array[Boolean])

  private def leafPages(reader: org.apache.parquet.hadoop.ParquetFileReader,
                        c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[LeafPages] =
    try {
      val ci = reader.readColumnIndex(c)
      val oi = reader.readOffsetIndex(c)
      if (ci == null || oi == null) None
      else {
        val n = oi.getPageCount
        val first = Array.tabulate(n)(i => oi.getFirstRowIndex(i))
        val mins = new Array[Double](n)
        val maxs = new Array[Double](n)
        val cons = new Array[Boolean](n)
        val nulls = ci.getNullPages
        val minBufs = ci.getMinValues
        val maxBufs = ci.getMaxValues
        var i = 0
        while (i < n) {
          if (nulls.get(i)) cons(i) = true
          else {
            val mn = minBufs.get(i).duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val mx = maxBufs.get(i).duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
            if (mn.remaining() >= 8 && mx.remaining() >= 8) {
              mins(i) = mn.getDouble(mn.position())
              maxs(i) = mx.getDouble(mx.position())
            } else cons(i) = true
          }
          i += 1
        }
        Some(LeafPages(first, mins, maxs, cons))
      }
    } catch { case _: Exception => None }

  /** Row spans (merged, ordered) of the pages whose [min,max] intersects
    * [lo,hi] — page i covers rows [firstRow(i), firstRow(i+1)). */
  private def pageHitRanges(lp: LeafPages, rowCount: Long,
                            lo: Double, hi: Double): IndexedSeq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    val n = lp.firstRow.length
    while (i < n) {
      val hit = lp.conservative(i) || !(lp.max(i) < lo || lp.min(i) > hi)
      if (hit) {
        val s = lp.firstRow(i)
        val e = if (i + 1 < n) lp.firstRow(i + 1) else rowCount
        out.lastOption match {
          case Some((ps, pe)) if s <= pe => out(out.length - 1) = (ps, math.max(pe, e))
          case _ => out += ((s, e))
        }
      }
      i += 1
    }
    out.toIndexedSeq
  }

  /** Two ordered disjoint range lists share at least one row? */
  private def rangesOverlap(a: IndexedSeq[(Long, Long)], b: IndexedSeq[(Long, Long)]): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val (as, ae) = a(i)
      val (bs, be) = b(j)
      if (as < be && bs < ae) return true
      if (ae <= bs) i += 1 else j += 1
    }
    false
  }

  /** Task-side planner for [[GeoParquetFileFormat.buildReaderWithPartitionValues]]:
    * footer (cached per executor) → owned row groups → stats-bbox prune →
    * parent reader over surviving contiguous runs. Separated from the
    * closure for testability. */
  private[sources] def statsPrunedRead(
      parent: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow],
      file: org.apache.spark.sql.execution.datasources.PartitionedFile,
      conf: Configuration, gcol: String,
      qxmin: Double, qymin: Double, qxmax: Double, qymax: Double): Iterator[InternalRow] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val key = (file.filePath.toString, file.fileSize, file.modificationTime, gcol)
    if (footerDigestCache.size > 1024) footerDigestCache.clear() // bound per executor
    // computeIfAbsent: concurrent splits of one file block on a single
    // footer parse instead of racing N parses past a plain get/put
    val groups = footerDigestCache.computeIfAbsent(key, _ => {
      prunedFooterOpens.increment()
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.filePath.toUri), conf))
      try reader.getFooter.getBlocks.asScala.map { b =>
        // page-level evidence for the geometry's x/y leaves rides the
        // digest (column+offset index: a near-footer KB-scale read, cached
        // with the rest) so partially-matching groups can be re-judged at
        // page granularity per query window
        val xCol = b.getColumns.asScala.find { c =>
          val p = c.getPath.toArray
          p.length >= 2 && p(0) == gcol && p(p.length - 1) == "x"
        }
        val yCol = b.getColumns.asScala.find { c =>
          val p = c.getPath.toArray
          p.length >= 2 && p(0) == gcol && p(p.length - 1) == "y"
        }
        GroupDigest(b.getStartingPos, b.getCompressedSize, b.getRowCount,
          rowGroupBbox(b, gcol),
          xCol.flatMap(leafPages(reader, _)), yCol.flatMap(leafPages(reader, _)))
      }.toIndexedSeq
      finally reader.close()
    })
    // split ownership = parquet-mr's midpoint rule (filterFileMetaDataByMidpoint):
    // a row group belongs to the split containing startingPos + compressedSize/2
    val owned = groups.filter { b =>
      val mid = b.start + b.compressedSize / 2
      mid >= file.start && mid < file.start + file.length
    }
    val surviving = owned.filter { b =>
      b.bbox match {
        case Some((bxmin, bymin, bxmax, bymax)) =>
          val aggHit = bxmin <= qxmax && bxmax >= qxmin && bymin <= qymax && bymax >= qymin
          // page-level re-judge of partially-matching groups: the window
          // hits the group's AGGREGATE box, but if the rows whose x pages
          // reach the x window never overlap the rows whose y pages reach
          // the y window, no row can match — prune the group. This is the
          // page-granular stance the reference's ArrowPredicate takes
          // (spatial_filter.rs:183-258) re-expressed on the IO plan: for
          // nested list layouts parquet-mr refuses page FILTERS on
          // repeated leaves, but its page STATS are still evidence.
          aggHit && ((b.xPages, b.yPages) match {
            case (Some(xp), Some(yp)) =>
              val keep = rangesOverlap(
                pageHitRanges(xp, b.rowCount, qxmin, qxmax),
                pageHitRanges(yp, b.rowCount, qymin, qymax))
              if (!keep) pageRefinePrunedGroups.increment()
              keep
            case _ => true
          })
        case None => true // no usable stats → cannot prune safely
      }
    }
    // merge row groups adjacent IN FILE ORDER into one byte range per
    // run: the range [first.startingPos, last.end) contains exactly the
    // run's midpoints — a pruned group between runs keeps its midpoint
    // outside both, so the parent reader never decodes it
    val ordered = surviving.sortBy(_.start)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ordered.foreach { b =>
      val end = b.start + b.compressedSize
      merged.lastOption match {
        case Some((s, e)) if b.start <= e => merged(merged.length - 1) = (s, end)
        case _ => merged += ((b.start, end))
      }
    }
    merged.iterator.flatMap { case (s, e) => parent(file.copy(start = s, length = e - s)) }
  }

  /** Bbox of one row group from the geometry column's x/y LEAF statistics —
    * the same-leaf minx/maxx trick of spatial_filter.rs:167-181. Matches
    * both the point struct layout (path [gcol, x]) and nested list layouts
    * (path [gcol, list, element, …, x]); returns None unless both an x and
    * a y leaf under `gcol` carry non-null double stats. */
  private[sources] def rowGroupBbox(
      b: org.apache.parquet.hadoop.metadata.BlockMetaData,
      gcol: String): Option[(Double, Double, Double, Double)] = {
    var xmin, ymin = Double.NaN
    var xmax, ymax = Double.NaN
    b.getColumns.asScala.foreach { c =>
      val path = c.getPath.toArray
      if (path.length >= 2 && path(0) == gcol) {
        val leaf = path(path.length - 1)
        if (leaf == "x" || leaf == "y") {
          c.getStatistics match {
            case st: org.apache.parquet.column.statistics.DoubleStatistics
                if st != null && st.hasNonNullValue =>
              if (leaf == "x") { xmin = st.getMin; xmax = st.getMax }
              else { ymin = st.getMin; ymax = st.getMax }
            case _ => // absent or non-double stats → leave NaN
          }
        }
      }
    }
    if (xmin.isNaN || ymin.isNaN) None else Some((xmin, ymin, xmax, ymax))
  }
  val GeomIdxKey = "graft.geo.geomidx"
  val BboxIdxKey = "graft.geo.bboxidx"
  val CoveringKey = "graft.geo.covering"
  val EncodingKey = "graft.geo.encoding"
  val CrsKey = "graft.geo.crs"
  val EdgesKey = "graft.geo.edges"
  val CoveringGeodesicKey = "graft.geo.covering.geodesic"
  val SecondaryKey = "graft.geo.secondary"
  val SecondaryIdxKey = "graft.geo.secondaryidx"

  /** (GeoParquet type name, hasZ) from the first bytes of a WKB blob —
    * handles both EWKB flag bits (JTS `WKBWriter(_, includeSRID = true)`:
    * Z = 0x80000000, M = 0x40000000, SRID = 0x20000000) and ISO 1000-block
    * offsets, without parsing coordinates. */
  private[graft] def wkbTypeTag(b: Array[Byte]): Option[(String, Boolean)] = {
    if (b == null || b.length < 5) return None
    val little = b(0) == 1
    val code: Long =
      if (little)
        (b(1) & 0xFFL) | ((b(2) & 0xFFL) << 8) | ((b(3) & 0xFFL) << 16) | ((b(4) & 0xFFL) << 24)
      else
        ((b(1) & 0xFFL) << 24) | ((b(2) & 0xFFL) << 16) | ((b(3) & 0xFFL) << 8) | (b(4) & 0xFFL)
    val iso = code & 0x0FFFFFFFL // strip EWKB Z/M/SRID flag bits
    val zFromIso = (iso / 1000) % 4 // ISO: 1 = Z, 2 = M, 3 = ZM
    val hasZ = (code & 0x80000000L) != 0 || zFromIso == 1 || zFromIso == 3
    ((iso % 1000).toInt match {
      case 1 => Some("Point")
      case 2 => Some("LineString")
      case 3 => Some("Polygon")
      case 4 => Some("MultiPoint")
      case 5 => Some("MultiLineString")
      case 6 => Some("MultiPolygon")
      case 7 => Some("GeometryCollection")
      case _ => None
    }).map(name => (name, hasZ))
  }
}

/** Per-file write support: delegates row shredding to Spark's own parquet
  * WriteSupport and accumulates the file's geo metadata on the side. One
  * instance per part-file (instantiated reflectively by ParquetOutputFormat
  * in the writing task), so the tracked state IS the per-file truth. */
class GeoParquetWriteSupport extends WriteSupport[InternalRow] {
  import GeoParquetFileFormat._

  // Spark's shredder is Scala-package-private; parquet-mr's public
  // WriteSupport supertype is the contract, so instantiate by name
  private val delegate =
    Class.forName("org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport")
      .getDeclaredConstructor().newInstance().asInstanceOf[WriteSupport[InternalRow]]

  private var geomCol = "geometry"
  private var geomIdx = -1
  private var bboxIdx = -1
  private var covering: Option[String] = None
  private var crs: Option[String] = None
  private var edges: Option[String] = None
  private var coveringGeodesic = false
  private var encoding = "WKB"
  private var minX = Double.PositiveInfinity
  private var minY = Double.PositiveInfinity
  private var maxX = Double.NegativeInfinity
  private var maxY = Double.NegativeInfinity
  private val types = scala.collection.mutable.SortedSet.empty[String]
  // secondary geometry columns (multi-column footer model): name, ordinal,
  // crs, observed types — always WKB, no covering
  private var secondary: Array[(String, Int, Option[String],
    scala.collection.mutable.SortedSet[String])] = Array.empty

  override def init(conf: Configuration): WriteSupport.WriteContext = {
    geomCol = conf.get(GeomColKey, "geometry")
    geomIdx = conf.getInt(GeomIdxKey, -1)
    bboxIdx = conf.getInt(BboxIdxKey, -1)
    covering = Option(conf.get(CoveringKey)).filter(_.nonEmpty)
    crs = Option(conf.get(CrsKey))
    edges = Option(conf.get(EdgesKey)).filter(_.nonEmpty)
    coveringGeodesic = conf.getBoolean(CoveringGeodesicKey, false)
    encoding = conf.get(EncodingKey, "WKB")
    secondary = (Option(conf.get(SecondaryKey)).filter(_.nonEmpty),
                 Option(conf.get(SecondaryIdxKey)).filter(_.nonEmpty)) match {
      case (Some(names), Some(idxs)) =>
        names.split('\t').zip(idxs.split(',').map(_.toInt)).map { case (n, i) =>
          (n, i, Option(conf.get(CrsKey + "." + n)),
            scala.collection.mutable.SortedSet.empty[String])
        }
      case _ => Array.empty
    }
    delegate.init(conf)
  }

  override def prepareForWrite(recordConsumer: RecordConsumer): Unit =
    delegate.prepareForWrite(recordConsumer)

  override def write(row: InternalRow): Unit = {
    if (bboxIdx >= 0 && !row.isNullAt(bboxIdx)) {
      val s = row.getStruct(bboxIdx, 4)
      if (!s.isNullAt(0)) {
        minX = math.min(minX, s.getDouble(0)); minY = math.min(minY, s.getDouble(1))
        maxX = math.max(maxX, s.getDouble(2)); maxY = math.max(maxY, s.getDouble(3))
      }
    }
    if (encoding == "WKB" && geomIdx >= 0 && !row.isNullAt(geomIdx))
      wkbTypeTag(row.getBinary(geomIdx)).foreach { case (name, hasZ) =>
        types += (if (hasZ) name + " Z" else name)
      }
    var i = 0
    while (i < secondary.length) {
      val (_, idx, _, ts) = secondary(i)
      if (idx >= 0 && !row.isNullAt(idx))
        wkbTypeTag(row.getBinary(idx)).foreach { case (name, hasZ) =>
          ts += (if (hasZ) name + " Z" else name)
        }
      i += 1
    }
    delegate.write(row)
  }

  override def finalizeWrite(): WriteSupport.FinalizedWriteContext = {
    val bounds =
      if (minX.isInfinity) None else Some((minX, minY, maxX, maxY))
    val cols = GeoParquet.GeoColJson(geomCol, encoding, crs, covering, bounds, types.toSeq, edges,
      coveringGeodesic = coveringGeodesic && covering.isDefined) +:
      secondary.toSeq.map { case (name, _, colCrs, ts) =>
        GeoParquet.GeoColJson(name, "WKB", colCrs, None, None, ts.toSeq)
      }
    val geo = GeoParquet.geoJsonMulti(geomCol, cols)
    new WriteSupport.FinalizedWriteContext(Map("geo" -> geo).asJava)
  }
}
