package graft

import org.apache.spark.sql.functions._
import graft.sources.{FlatGeobuf, FlatGeobufWriter}

/** Exercised against the reference repo's public FGB fixtures
  * (read-only test data; behavior parity with the reference reader). */
class FlatGeobufSpec extends SparkTestBase {

  private val fixtures = "/root/reference/fixtures/flatgeobuf"

  test("countries.fgb: header, count, property + geometry decode") {
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    assert(df.columns.toSeq == Seq("id", "name", "geometry"))
    val n = df.count()
    assert(n == 179, s"countries.fgb should have 179 features, got $n")
    // well-known member, decoded through the full stack
    assert(df.where("name = 'Canada'").count() == 1)
    // every geometry decodes to a valid multi/polygon with positive area
    val stats = df.select(
      sum(when(call_function("st_geometrytype", col("geometry"))
        .isin("ST_Polygon", "ST_MultiPolygon"), 1).otherwise(0)).as("polys"),
      min(call_function("st_area", col("geometry"))).as("min_area")).head()
    assert(stats.getLong(0) == n)
    assert(stats.getDouble(1) > 0.0)
  }

  test("countries.fgb: world envelope matches header envelope") {
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    val hdrEnv = {
      val fs = new org.apache.hadoop.fs.Path(s"$fixtures/countries.fgb")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$fixtures/countries.fgb"))
      val bytes = new Array[Byte](4096)
      in.readFully(0, bytes); in.close()
      FlatGeobuf.parseHeader(bytes).envelope
    }
    val ext = df.agg(
      min(call_function("st_xmin", col("geometry"))),
      min(call_function("st_ymin", col("geometry"))),
      max(call_function("st_xmax", col("geometry"))),
      max(call_function("st_ymax", col("geometry")))).head()
    assert(math.abs(ext.getDouble(0) - hdrEnv(0)) < 1e-6)
    assert(math.abs(ext.getDouble(1) - hdrEnv(1)) < 1e-6)
    assert(math.abs(ext.getDouble(2) - hdrEnv(2)) < 1e-6)
    assert(math.abs(ext.getDouble(3) - hdrEnv(3)) < 1e-6)
  }

  test("bbox read selects the features intersecting the rect") {
    // roughly western Europe
    val sub = FlatGeobuf.readBbox(spark, s"$fixtures/countries.fgb", -10, 35, 20, 60)
    val names = sub.select("name").collect().map(_.getString(0)).toSet
    assert(names.contains("France") && names.contains("Germany") && names.contains("Spain"))
    assert(!names.contains("Australia"))
    assert(sub.count() < 179)
  }

  test("property decode survives 0-3 trailing pad bytes without phantom entries") {
    import java.nio.{ByteBuffer, ByteOrder}
    // one Int column (type 5): entry = u16 idx + i32 value = 6 bytes
    val types = Array(5)
    for (pads <- 0 to 3) {
      val body = ByteBuffer.allocate(6 + pads + 8).order(ByteOrder.LITTLE_ENDIAN)
      body.putShort(0, 0.toShort)    // column index 0
      body.putInt(2, 42)             // value
      // pad bytes stay zero; 8 trailing "next message" bytes are nonzero
      // garbage a phantom entry would read into column 0
      for (i <- 0 until 8) body.put(6 + pads + i, 0x7F.toByte)
      val out = new Array[Any](1)
      graft.sources.FlatGeobuf.decodeProperties(body, 0, 6 + pads, types, out)
      assert(out(0) == 42, s"pads=$pads corrupted column 0: ${out(0)}")
    }
  }

  test("alldatatypes.fgb: every property type decodes") {
    val df = FlatGeobuf.read(spark, s"$fixtures/alldatatypes.fgb")
    assert(df.count() >= 1)
    val row = df.head()
    // all columns non-null on the sample feature (the fixture populates all)
    val nulls = df.schema.fieldNames.dropRight(1).count(f => row.isNullAt(row.fieldIndex(f)))
    assert(nulls == 0, s"unexpected nulls in $row with schema ${df.schema}")
  }

  test("poly00.fgb: single polygon file") {
    val df = FlatGeobuf.read(spark, s"$fixtures/poly00.fgb")
    assert(df.count() >= 1)
    assert(df.select(call_function("st_area", col("geometry"))).head().getDouble(0) > 0)
  }

  test("alldatatypes.fgb: full typed-property matrix with pinned values") {
    // reference fixture exercising every FGB column type
    // (rust/geoarrow-flatgeobuf/src/reader/common.rs:95-110 maps them);
    // expected values independently confirmed by a byte-level parse of the
    // property section (not by this reader)
    val df = FlatGeobuf.read(spark, s"$fixtures/alldatatypes.fgb")
    assert(df.columns.toSeq == Seq("byte", "ubyte", "bool", "short", "ushort",
      "int", "uint", "long", "ulong", "float", "double", "string", "json",
      "datetime", "binary", "geometry"))
    import org.apache.spark.sql.types._
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("byte") == ByteType && types("ubyte") == ShortType
      && types("bool") == BooleanType && types("short") == ShortType
      && types("ushort") == IntegerType && types("int") == IntegerType
      && types("uint") == LongType && types("long") == LongType
      && types("float") == FloatType && types("double") == DoubleType
      && types("string") == StringType && types("json") == StringType
      && types("datetime") == StringType && types("binary") == BinaryType)
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Byte]("byte") == -1 && r.getAs[Short]("ubyte") == 255
      && r.getAs[Boolean]("bool") && r.getAs[Short]("short") == -1
      && r.getAs[Int]("ushort") == 65535 && r.getAs[Int]("int") == -1
      && r.getAs[Long]("uint") == 4294967295L && r.getAs[Long]("long") == -1L)
    // documented fallback: ULong maps to LongType; 2^64-1 reads as the raw
    // two's-complement bits (-1), not a throw
    assert(r.getAs[Long]("ulong") == -1L)
    assert(r.getAs[Float]("float") == 0.0f && r.getAs[Double]("double") == 0.0)
    assert(r.getAs[String]("string") == "X" && r.getAs[String]("json") == "X"
      && r.getAs[String]("datetime") == "2020-02-29T12:34:56Z")
    assert(r.getAs[Array[Byte]]("binary").toSeq == Seq('X'.toByte))
    assert(graft.core.GeomOps.read(r.getAs[Array[Byte]]("geometry")) != null)
  }

  test("writer roundtrip: synthetic mixed types + typed properties") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbw").toString
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id, CONCAT('row-', id) AS label,
             CAST(id * 1.5 AS DOUBLE) AS score, id % 2 = 0 AS flag,
             ST_GeomFromText(CASE CAST(id % 4 AS INT)
               WHEN 0 THEN CONCAT('POINT (', id, ' 2)')
               WHEN 1 THEN 'LINESTRING (0 0, 3 4)'
               WHEN 2 THEN 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))'
               ELSE 'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))'
             END) AS geometry
      FROM range(40)""").repartition(3)
    FlatGeobufWriter.write(df, out)
    val back = FlatGeobuf.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "label", "score", "flag", "geometry"))
    assert(back.count() == 40)
    // typed properties survive
    val r7 = back.where("id = 7").head()
    assert(r7.getAs[String]("label") == "row-7" && r7.getAs[Double]("score") == 10.5
      && !r7.getAs[Boolean]("flag"))
    // geometry fidelity: every row's WKT matches the source exactly
    val src = df.selectExpr("id", "ST_AsText(geometry) AS w")
    val dst = back.selectExpr("id", "ST_AsText(geometry) AS w")
    assert(src.except(dst).isEmpty && dst.except(src).isEmpty)
  }

  test("writeSingle: ONE globally-indexed .fgb file, read + index traversal work") {
    import graft.sources.FlatGeobufWriter
    val dir = java.nio.file.Files.createTempDirectory("fgbsingle").toString
    val out = dir + "/dataset.fgb"
    val n = 4000
    // MULTI-partition source: the single-file writer must merge them in
    // global Hilbert order, unlike write()'s one-file-per-partition shape
    val df = spark.sql(
      s"""SELECT CAST(id AS BIGINT) AS fid,
                 CONCAT('r', CAST(id AS STRING)) AS tag,
                 ST_Point(CAST(id % 200 AS DOUBLE), CAST(id DIV 200 AS DOUBLE)) AS geometry
          FROM range($n)""").repartition(8)
    FlatGeobufWriter.writeSingle(df, out)
    // artifact shape: exactly one FILE (the reference's writer.rs emits one)
    val f = new java.io.File(out)
    assert(f.isFile && f.length() > 0, "writeSingle must produce a single .fgb file")
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".fgb")) == 1)
    // full roundtrip through the stock reader
    val back = FlatGeobuf.read(spark, out)
    assert(back.count() == n)
    val src = df.selectExpr("fid", "tag", "ST_AsText(geometry) AS w")
    val dst = back.selectExpr("fid", "tag", "ST_AsText(geometry) AS w")
    assert(src.except(dst).isEmpty && dst.except(src).isEmpty)
    // the packed index is present and the traversal returns the exact window
    val win = FlatGeobuf.readBbox(spark, out, 10.5, 4.5, 20.5, 9.5)
      .select("fid").collect().map(_.getLong(0)).toSet
    val expected = (for (y <- 5 to 9; x <- 11 to 20) yield (y * 200 + x).toLong).toSet
    assert(win == expected, s"index window mismatch: got ${win.size}, want ${expected.size}")
    // global Hilbert order: file feature order must NOT be source order
    // (a concat of partitions would be), and consecutive features must be
    // spatially local — checked via the header-declared index presence plus
    // the split reader seeing every feature exactly once
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val split = FlatGeobuf.read(spark, out)
      assert(split.rdd.getNumPartitions > 1, "single file must still split across tasks")
      assert(split.select("fid").collect().map(_.getLong(0)).sorted.toSeq == (0L until n))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    // indexless single file: still one file, still readable
    val out2 = dir + "/noindex.fgb"
    FlatGeobufWriter.writeSingle(df, out2, index = false)
    assert(new java.io.File(out2).isFile)
    assert(FlatGeobuf.read(spark, out2).count() == n)
  }

  test("one large indexed file splits across tasks via the packed index") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbsplit").toString
    val n = 4000
    val df = spark.sql(
      s"""SELECT CAST(id AS BIGINT) AS fid,
                 ST_Point(CAST(id % 200 AS DOUBLE), CAST(id DIV 200 AS DOUBLE)) AS geometry
          FROM range($n)""").coalesce(1)
    FlatGeobufWriter.write(df, out) // one partition -> ONE indexed .fgb
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val split = FlatGeobuf.read(spark, out)
      // >1 task over the single file — the round-9 "one file = one core" gap
      assert(split.rdd.getNumPartitions > 1,
        s"expected multiple splits, got ${split.rdd.getNumPartitions}")
      val gotIds = split.select("fid").collect().map(_.getLong(0)).sorted
      assert(gotIds.toSeq == (0L until n), "split read must see every feature exactly once")
      // identical rows (geometry included) to the single-task read
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val whole = FlatGeobuf.read(spark, out)
      assert(whole.rdd.getNumPartitions == 1)
      val sp = split.selectExpr("fid", "ST_AsText(geometry) AS w")
      val wh = whole.selectExpr("fid", "ST_AsText(geometry) AS w")
      assert(sp.except(wh).isEmpty && wh.except(sp).isEmpty)
      // split-plan cache: a second read of the unchanged file launches
      // ZERO index-probe jobs (plan keyed by path/size/mtime)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      graft.sources.FlatGeobuf.splitProbeJobs.reset()
      assert(FlatGeobuf.read(spark, out).count() == n)
      assert(graft.sources.FlatGeobuf.splitProbeJobs.sum() == 0,
        "repeated split planning over an unchanged file must hit the cache")
      // rewriting the file (new size/mtime) re-probes
      FlatGeobufWriter.write(df.where("fid < 2000"), out)
      graft.sources.FlatGeobuf.splitProbeJobs.reset()
      assert(FlatGeobuf.read(spark, out).count() == 2000)
      assert(graft.sources.FlatGeobuf.splitProbeJobs.sum() == 1,
        "changed file must re-probe")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("DSv2 format(\"flatgeobuf\"): column pruning reaches the decoder") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbdsv2").toString
    val n = 500
    val df = spark.sql(
      s"""SELECT CAST(id AS INT) AS id, CONCAT('label-', id) AS label,
                 CAST(id * 0.5 AS DOUBLE) AS score,
                 ST_Point(CAST(id AS DOUBLE), 1.0D) AS geometry
          FROM range($n)""").coalesce(1)
    FlatGeobufWriter.write(df, out)
    // full read through the DSv2 path matches the function-style read
    val v2 = spark.read.format("flatgeobuf").load(out)
    assert(v2.columns.toSeq == Seq("id", "label", "score", "geometry"))
    assert(v2.count() == n)
    val fn = FlatGeobuf.read(spark, out)
    assert(v2.selectExpr("id", "label", "score", "ST_AsText(geometry) AS w")
      .except(fn.selectExpr("id", "label", "score", "ST_AsText(geometry) AS w")).isEmpty)
    // projection is pushed into the scan (visible in the plan) ...
    val pruned = spark.read.format("flatgeobuf").load(out).select("id")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("required=[id]"), s"pushdown missing in:\n$planStr")
    // ... and reaches the DECODE level: only n property values materialize
    // (id), not 3n (id+label+score); local mode shares the JVM so the
    // diagnostics adder sees task-side work
    graft.sources.FlatGeobuf.decodedPropValues.reset()
    val ids = pruned.collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (0 until n))
    val materialized = graft.sources.FlatGeobuf.decodedPropValues.sum()
    assert(materialized == n, s"expected $n decoded property values, got $materialized")
  }

  test("header annotations: title/description/metadata roundtrip; absent stays None") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbann").toString
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id,
             ST_Point(CAST(id AS DOUBLE), CAST(id % 5 AS DOUBLE)) AS geometry
      FROM range(64)""").coalesce(1)
    FlatGeobufWriter.write(df, out, name = "annotated",
      title = Some("Test Layer"), description = Some("free-form long text"),
      metadata = Some("""{"app":"graft"}"""))
    val file = new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head
    val hdr = FlatGeobuf.parseHeader(readAllBytes(file.getAbsolutePath))
    assert(hdr.name == "annotated")
    assert(hdr.title.contains("Test Layer"))
    assert(hdr.description.contains("free-form long text"))
    assert(hdr.metadata.contains("""{"app":"graft"}"""))
    // annotations must not disturb the layout: count, index, data and the
    // index-seek path all still work on the same file
    assert(hdr.featuresCount == 64 && hdr.indexNodeSize == 16)
    assert(FlatGeobuf.read(spark, out).count() == 64)
    assert(FlatGeobuf.readBbox(spark, out, 10.0, 0.0, 20.0, 9.0)
      .selectExpr("id").count() == 11) // ids 10..20 inclusive
    // a write without annotations parses to None (fields absent, not "")
    val out2 = java.nio.file.Files.createTempDirectory("fgbann2").toString
    FlatGeobufWriter.write(df, out2)
    val file2 = new java.io.File(out2).listFiles().filter(_.getName.endsWith(".fgb")).head
    val hdr2 = FlatGeobuf.parseHeader(readAllBytes(file2.getAbsolutePath))
    assert(hdr2.title.isEmpty && hdr2.description.isEmpty && hdr2.metadata.isEmpty)
  }

  // ── packed Hilbert R-tree (writer emits, reader seeks) ─────────────────

  private def readAllBytes(path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p); in.readFully(0, bytes); in.close()
    bytes
  }

  test("writer emits a packed Hilbert R-tree; readBbox seeks through it") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbidx").toString
    // 1000 points on a 100×10 grid, single partition → one indexed file
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id,
             ST_Point(CAST(id % 100 AS DOUBLE), CAST(CAST(id / 100 AS INT) AS DOUBLE)) AS geometry
      FROM range(1000)""").coalesce(1)
    FlatGeobufWriter.write(df, out)
    val file = new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head
    val bytes = readAllBytes(file.toString)
    val hdr = FlatGeobuf.parseHeader(bytes)
    assert(hdr.indexNodeSize == 16, "indexed write must declare index_node_size=16")
    assert(hdr.featuresCount == 1000)
    // the tree is selective: candidates for a 10×10 rect << total count
    val hits = FlatGeobuf.searchIndex(bytes, 20.0, 2.0, 29.0, 5.0)
    assert(hits.nonEmpty && hits.size < hdr.featuresCount,
      s"index search must touch < full feature count (got ${hits.size})")
    assert(hits.size == 40, s"exact-envelope leaves: expected 40 candidates, got ${hits.size}")
    // and the index-seek read returns exactly the right features
    val sel = FlatGeobuf.readBbox(spark, file.toString, 20.0, 2.0, 29.0, 5.0)
    val ids = sel.select("id").collect().map(_.getInt(0)).toSet
    val expected = (0 until 1000).filter(i => (i % 100) >= 20 && (i % 100) <= 29 &&
      (i / 100) >= 2 && (i / 100) <= 5).toSet
    assert(ids == expected)
  }

  test("index roundtrip matches indexless read on identical data") {
    import graft.sources.FlatGeobufWriter
    val outIdx = java.nio.file.Files.createTempDirectory("fgbidx2").toString
    val outNo = java.nio.file.Files.createTempDirectory("fgbnoidx").toString
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb").coalesce(1)
    FlatGeobufWriter.write(df, outIdx, index = true)
    FlatGeobufWriter.write(df, outNo, index = false)
    val a = FlatGeobuf.readBbox(spark, outIdx, -10, 35, 20, 60)
      .selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    val b = FlatGeobuf.readBbox(spark, outNo, -10, 35, 20, 60)
      .selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    assert(a.count() > 0)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val noIdxHdr = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(outNo).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    assert(noIdxHdr.indexNodeSize == 0)
  }

  test("CRS: official fixture exposes name+wkt; writer roundtrips wkt") {
    import graft.sources.FlatGeobufWriter
    val hdr = FlatGeobuf.parseHeader(readAllBytes(s"$fixtures/countries.fgb"))
    assert(hdr.crsName.contains("WGS 84"))
    assert(hdr.crsWkt.exists(_.contains("WGS")), s"wkt = ${hdr.crsWkt.map(_.take(60))}")
    val out = java.nio.file.Files.createTempDirectory("fgbcrs").toString
    val df = spark.sql("SELECT CAST(id AS INT) AS id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(5)")
      .coalesce(1)
    FlatGeobufWriter.write(df, out, crsWkt = Some("""GEOGCS["WGS 84",DATUM["WGS_1984"]]"""))
    val back = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    assert(back.crsWkt.contains("""GEOGCS["WGS 84",DATUM["WGS_1984"]]"""))
  }

  // ── Z/M dimension fidelity ─────────────────────────────────────────────

  test("XYZ write → read roundtrip preserves Z (g30-style fidelity)") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbz").toString
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id,
             ST_PointZ(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE), CAST(id * 3 AS DOUBLE)) AS geometry
      FROM range(25)""").coalesce(1)
    FlatGeobufWriter.write(df, out)
    val hdr = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    assert(hdr.hasZ && !hdr.hasM, "header must declare has_z")
    val back = FlatGeobuf.read(spark, out)
    assert(back.count() == 25)
    val r = back.selectExpr("id",
      "ST_X(geometry) AS x", "ST_Y(geometry) AS y", "ST_Z(geometry) AS z",
      "ST_HasZ(geometry) AS hz", "ST_HasM(geometry) AS hm")
      .where("id = 7").head()
    assert(r.getDouble(1) == 7.0 && r.getDouble(2) == 14.0 && r.getDouble(3) == 21.0)
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }

  test("XYZM linestrings roundtrip with both ordinates intact") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbzm").toString
    val df = spark.sql("""
      SELECT CAST(id AS INT) AS id,
             ST_GeomFromText(CONCAT('LINESTRING ZM (0 0 ', id, ' 1, 5 5 ', id + 1, ' 2)')) AS geometry
      FROM range(10)""").coalesce(1)
    FlatGeobufWriter.write(df, out)
    val hdr = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    assert(hdr.hasZ && hdr.hasM)
    val back = FlatGeobuf.read(spark, out)
    // exact WKT fidelity both ways (writer → reader → EWKB → WKT)
    val src = df.selectExpr("id", "ST_AsText(geometry) AS w")
    val dst = back.selectExpr("id", "ST_AsText(geometry) AS w")
    assert(src.except(dst).isEmpty && dst.except(src).isEmpty)
    assert(back.selectExpr("ST_AsText(geometry)").head().getString(0).contains("ZM"))
  }

  test("2D write stays 2D: no z vector, header flags unset") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgb2d").toString
    val df = spark.sql("SELECT CAST(id AS INT) AS id, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(5)")
      .coalesce(1)
    FlatGeobufWriter.write(df, out)
    val hdr = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    assert(!hdr.hasZ && !hdr.hasM)
    val back = FlatGeobuf.read(spark, out)
    assert(back.selectExpr("SUM(CASE WHEN ST_HasZ(geometry) THEN 1 ELSE 0 END)").head().getLong(0) == 0)
  }

  test("writer roundtrip: countries.fgb through write → read preserves all geometry") {
    import graft.sources.FlatGeobufWriter
    val out = java.nio.file.Files.createTempDirectory("fgbw2").toString
    val df = FlatGeobuf.read(spark, s"$fixtures/countries.fgb")
    FlatGeobufWriter.write(df.repartition(4), out)
    val back = FlatGeobuf.read(spark, out)
    assert(back.count() == 179)
    // areas and names survive the full circle
    val a = df.selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    val b = back.selectExpr("name", "ROUND(ST_Area(geometry), 9) AS area")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("promoteToMulti: mixed Polygon/MultiPolygon header declares MultiPolygon (6)") {
    import graft.sources.FlatGeobufWriter
    def headerOf(out: String) = FlatGeobuf.parseHeader(readAllBytes(
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".fgb")).head.toString))
    val mixed = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             CASE WHEN id % 2 = 0
               THEN ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0, CAST(id AS DOUBLE) + 0.5, 1.0)
               ELSE ST_Union(
                 ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0, CAST(id AS DOUBLE) + 0.5, 1.0),
                 ST_MakeEnvelope(CAST(id AS DOUBLE), 2.0, CAST(id AS DOUBLE) + 0.5, 3.0))
             END AS geometry
      FROM range(20)""").coalesce(1)
    // promotion on: homogeneous MultiPolygon file, header code 6
    val outP = java.nio.file.Files.createTempDirectory("fgbpromote").toString
    FlatGeobufWriter.write(mixed, outP, promoteToMulti = true)
    assert(headerOf(outP).geometryType == 6, "promoted header must declare MultiPolygon")
    val back = FlatGeobuf.read(spark, outP)
    assert(back.selectExpr("ST_GeometryType(geometry) AS t").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("ST_MultiPolygon"))
    // part structure survives promotion: singles wrap (1 part), multis keep 2
    val parts = back.selectExpr("fid", "ST_NumGeometries(geometry) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert((0 until 20).forall(i => parts(i.toLong) == (if (i % 2 == 0) 1 else 2)))
    // promotion off: mixed frame → header stays Unknown (0), types preserved
    val outM = java.nio.file.Files.createTempDirectory("fgbmixed").toString
    FlatGeobufWriter.write(mixed, outM)
    assert(headerOf(outM).geometryType == 0, "mixed unpromoted header must stay Unknown")
    val types = FlatGeobuf.read(spark, outM)
      .selectExpr("ST_GeometryType(geometry) AS t").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("ST_Polygon", "ST_MultiPolygon"))
    // detect_type semantics: a uniform unpromoted frame declares its type
    val outU = java.nio.file.Files.createTempDirectory("fgbuniform").toString
    FlatGeobufWriter.write(spark.sql(
      "SELECT CAST(id AS BIGINT) AS fid, ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(5)")
      .coalesce(1), outU)
    assert(headerOf(outU).geometryType == 1, "uniform point file must declare Point")
  }

  test("edges stamp survives write AND writeSingle; read-back dispatches geodesic") {
    // FGB has no native edges field — the model rides the header metadata
    // JSON (graft:edges), and the header's concrete geometry type supplies
    // the point evidence the edges DISTANCE dispatch requires
    val base = java.nio.file.Files.createTempDirectory("fgbedges").toString
    val pts = spark.sql("""
      SELECT CAST(id AS BIGINT) AS fid,
             ST_Point(CAST(id AS DOUBLE), 0.0) AS geometry FROM range(3)""")
    graft.sources.GeoParquet.write(pts, base + "/gp", edges = Some("spherical"))
    val stamped = graft.sources.GeoParquet.read(spark, base + "/gp")
      .select("fid", "geometry")
    val oneDeg = 6371008.8 * math.Pi / 180.0
    FlatGeobufWriter.write(stamped, base + "/dir")
    FlatGeobufWriter.writeSingle(stamped, base + "/one.fgb")
    for ((label, back) <- Seq(
        ("write", FlatGeobuf.read(spark, base + "/dir")),
        ("writeSingle", FlatGeobuf.read(spark, base + "/one.fgb")))) {
      val md = back.schema("geometry").metadata
      assert(md.getString("geoparquet.edges") == "spherical", s"$label: $md")
      assert(md.getString("geoparquet.geometry_types") == "Point", s"$label: $md")
      back.createOrReplaceTempView("fgb_edges_back")
      val d = sql(
        "SELECT ST_Distance(geometry, ST_Point(0.0, 0.0)) AS d FROM fgb_edges_back WHERE fid = 1")
        .head().getDouble(0)
      assert(math.abs(d - oneDeg) < 1e-6, s"$label read-back must measure haversine: $d")
    }
    // caller-supplied metadata JSON is merged, not clobbered
    FlatGeobufWriter.writeSingle(stamped, base + "/meta.fgb",
      metadata = Some("""{"source":"unit-test"}"""))
    val hdr = FlatGeobuf.parseHeader(readAllBytes(base + "/meta.fgb"))
    val metaJson = hdr.metadata.get
    assert(metaJson.contains("unit-test") && metaJson.contains("graft:edges"), metaJson)
    // an unstamped frame writes NO edges key and reads back planar
    FlatGeobufWriter.writeSingle(pts, base + "/plain.fgb")
    val plain = FlatGeobuf.read(spark, base + "/plain.fgb")
    assert(!plain.schema("geometry").metadata.contains("geoparquet.edges"))
    plain.createOrReplaceTempView("fgb_edges_plain")
    assert(sql("SELECT ST_Distance(geometry, ST_Point(0.0, 0.0)) AS d FROM fgb_edges_plain WHERE fid = 1")
      .head().getDouble(0) == 1.0)
  }
}
