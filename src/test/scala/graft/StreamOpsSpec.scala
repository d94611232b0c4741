package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamOpsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("windowedCounts: tumbling event-time windows with late-row drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.windowedCounts(mem.toDF(), watermark = "5 minutes", window = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    mem.addData(
      Event(1, ts(0), 1, "view", 1.0), Event(2, ts(2), 1, "view", 2.0),
      Event(3, ts(6), 2, "click", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close both windows
    mem.addData(Event(9, ts(30), 3, "view", 0.0))
    q.processAllAvailable()
    // a late row behind the watermark must be dropped
    mem.addData(Event(10, ts(1), 9, "view", 100.0))
    q.processAllAvailable()
    mem.addData(Event(11, ts(59), 3, "view", 0.0))
    runToCompletion(q)
    val rows = s.sql("SELECT event_type, n, total FROM wc ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(rows.contains(("view", 2L, 3.0)))   // 10:00 window, late row NOT counted
    assert(rows.contains(("click", 1L, 5.0)))  // 10:05 window
  }

  test("intervalJoin: cross-batch state pairs in-window clicks, drops out-of-window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val joined = StreamOps.intervalJoin(views.toDF(), clicks.toDF(), "user_id",
        maxLag = "10 minutes", watermark = "30 minutes")
      .selectExpr("l.event_id AS view_id", "r.event_id AS click_id")
    val q = joined.writeStream.format("memory").queryName("ij").outputMode("append").start()
    // batch 1: view for user 1 plus one in-window click; a click BEFORE the
    // view and a click for another user must not pair
    views.addData(Event(100, ts(10), 1, "view", 0.0))
    clicks.addData(
      Event(200, ts(12), 1, "click", 0.0),  // in window
      Event(201, ts(5), 1, "click", 0.0),   // before the view → no pair
      Event(202, ts(12), 2, "click", 0.0))  // other user → no pair
    q.processAllAvailable()
    // batch 2: the view is only in batch-1 state — a second in-window click
    // must still pair (cross-batch), an out-of-window click must not
    clicks.addData(
      Event(203, ts(19), 1, "click", 0.0),  // 9 min lag → in window
      Event(204, ts(25), 1, "click", 0.0))  // 15 min lag → beyond maxLag
    q.processAllAvailable()
    runToCompletion(q)
    val pairs = s.sql("SELECT view_id, click_id FROM ij ORDER BY click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(pairs === List((100L, 200L), (100L, 203L)))
  }

  test("zoneTransitions: cross-batch state, no spurious re-ENTER, in-batch ordering") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.streaming.StreamOps.{PosEvent, Transition}
    val mem = MemoryStream[PosEvent]
    val q = StreamOps.zoneTransitions(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("zt").outputMode("append").start()
    // batch 1, deliberately out of order: device 1 visits A (t1), A (t3),
    // B (t5) — delivered as t5, t1, t3 to prove per-batch event-time sort
    mem.addData(PosEvent(1, ts(5), "B"), PosEvent(1, ts(1), "A"), PosEvent(1, ts(3), "A"))
    q.processAllAvailable()
    // batch 2: device 1 stays in B (must emit NOTHING — a state loss would
    // re-ENTER null→B) then moves to C; device 2 appears for the first time
    mem.addData(PosEvent(1, ts(7), "B"), PosEvent(1, ts(9), "C"), PosEvent(2, ts(8), "A"))
    q.processAllAvailable()
    runToCompletion(q)
    val got = s.sql("SELECT device_id, ts, from_zone, to_zone FROM zt ORDER BY device_id, ts")
      .as[Transition].collect().toList
    assert(got === List(
      Transition(1, ts(1), null, "A"),   // first sighting: ENTER
      Transition(1, ts(5), "A", "B"),    // in-batch transition (after sort)
      Transition(1, ts(9), "B", "C"),    // cross-batch: B carried from batch 1
      Transition(2, ts(8), null, "A")),
      s"got $got")
  }

  test("geofence: stream-static spatial join plans through SpatialJoinExec per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val zones = s.sql("""
      SELECT zid, ST_MakeEnvelope(x, y, x + 10.0, y + 10.0) AS zone
      FROM VALUES (1, 0.0, 0.0), (2, 20.0, 20.0) AS t(zid, x, y)""")
    val mem = MemoryStream[(Long, Double, Double)]
    val pts = mem.toDF().toDF("id", "x", "y")
      .selectExpr("id", "ST_Point(x, y) AS geom")
    val q = StreamOps.geofence(pts, zones).selectExpr("id", "zid")
      .writeStream.format("memory").queryName("gf").outputMode("append").start()
    mem.addData((1L, 5.0, 5.0), (2L, 25.0, 25.0), (3L, 50.0, 50.0))
    q.processAllAvailable()
    mem.addData((4L, 1.0, 9.0))
    q.processAllAvailable()
    val lastPlan = s.streams.active.find(_.name == "gf")
      .map(_.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString)
    runToCompletion(q)
    val rows = s.sql("SELECT id, zid FROM gf ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(rows == List((1L, 1), (2L, 2), (4L, 1))) // point 3 in no zone
    lastPlan.foreach(p => assert(p.contains("SpatialJoin"),
      s"micro-batch must plan the spatial join, got:\n$p"))
    assert(lastPlan.isDefined)
  }

  test("dedupe drops repeated event ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.dedupe(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    mem.addData(
      Event(1, ts(0), 1, "view", 1.0), Event(1, ts(1), 1, "view", 1.0),
      Event(2, ts(2), 2, "view", 2.0), Event(1, ts(3), 1, "view", 1.0))
    runToCompletion(q)
    assert(s.sql("SELECT COUNT(*) FROM dd").head().getLong(0) == 2)
  }

  test("sessionize: gap splits sessions, timeout closes them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L, watermark = "1 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 1: events at 10:00,10:05 (one session), then 10:30 (gap > 10 min → new)
    mem.addData(
      Event(1, ts(0), 1, "view", 1.0), Event(2, ts(5), 1, "view", 2.0),
      Event(3, ts(30), 1, "view", 4.0))
    q.processAllAvailable()
    // push the watermark past all timeouts so every session closes
    mem.addData(Event(99, ts(59), 2, "view", 0.0))
    q.processAllAvailable()
    mem.addData(Event(100, Timestamp.valueOf("2026-01-01 12:00:00"), 2, "view", 0.0))
    runToCompletion(q)
    val sess = s.sql("SELECT user_id, n_events, total FROM sess WHERE user_id = 1 ORDER BY total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(sess == List((1L, 2L, 3.0), (1L, 1L, 4.0)),
      s"expected two closed sessions for user 1, got $sess")
  }

  test("file sink is exactly-once across checkpoint restarts (no dup, no loss)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_eos").toString
    val src = new java.io.File(tmp, "src"); src.mkdirs()
    def stage(i: Int, lo: Int, hi: Int): Unit = {
      val st = new java.io.File(tmp, s"stage$i")
      (lo until hi).map(_.toLong).toDF("v").coalesce(1).write.parquet(st.getPath)
      val part = st.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(src, s"f$i.parquet").toPath)
    }
    stage(0, 0, 50); stage(1, 50, 100)
    def runOnce(): Unit = {
      val q = s.readStream.schema("v LONG").option("maxFilesPerTrigger", 1)
        .parquet(src.getPath)
        .writeStream.format("parquet")
        .option("path", tmp + "/out")
        .option("checkpointLocation", tmp + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(s.read.parquet(tmp + "/out").count() == 100)
    // restart with NO new input: the checkpoint + file-sink log must make
    // this a no-op — rerunning may not duplicate a single row
    runOnce()
    assert(s.read.parquet(tmp + "/out").count() == 100)
    // a new source file after restart lands exactly once
    stage(2, 100, 130)
    runOnce()
    val out = s.read.parquet(tmp + "/out")
    assert(out.count() == 130)
    assert(out.distinct().count() == 130) // and every value exactly once
  }

  test("neardupSuppress: band state persists across batches; partial overlap caught") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // hand-built simhashes: bands are 8-bit slices [b0 b1 b2 b3] low→high
    def sim(b0: Long, b1: Long, b2: Long, b3: Long): Long =
      b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    val mem = MemoryStream[(Long, Long)]
    val verdicts = StreamOps.neardupSuppress(
      mem.toDS().toDF("doc_id", "sim"))
    val q = verdicts.toDF().writeStream.format("memory").queryName("nds")
      .outputMode("append").start()
    // batch 1: doc 0 registers its 4 bands; doc 1 disjoint in every band;
    // doc 2 (same batch, higher id) collides with doc 0 on band 2 only
    mem.addData((0L, sim(1, 2, 3, 4)), (1L, sim(9, 9, 9, 9)), (2L, sim(7, 7, 3, 7)))
    q.processAllAvailable()
    // batch 2: doc 3 shares ONE band with doc 0 (near-dup, must drop);
    // doc 4 all-fresh (kept)
    mem.addData((3L, sim(1, 8, 8, 8)), (4L, sim(20, 21, 22, 23)))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val kept = s.sql(
      "SELECT doc_id FROM nds GROUP BY doc_id HAVING every(first) ORDER BY doc_id")
      .as[Long].collect().toList
    assert(kept == List(0L, 1L, 4L), s"kept $kept")
  }

  test("s-suite harness runs the RocksDB state store provider") {
    // The runStream harness pins spark.sql.streaming.stateStore.providerClass
    // to RocksDBStateStoreProvider on its forked session — the provider a
    // production cluster needs at 100-TB key cardinality (the default
    // HDFS-backed store keeps all state in executor heap). This drives the
    // REAL s03 pipeline end-to-end and then checks the query's progress
    // JSON: a stateful dedup under RocksDB reports rocksdb* custom metrics
    // in its stateOperators block; the in-heap provider reports none.
    val out = SparkEntry.queries("s03_stream_dedup")(spark, "/unused")
    assert(out.count() == 3, "s03 must still produce its 3 event-type rows")
    val progress = SparkEntry.lastStreamProgress
    assert(progress.contains("stateOperators"), s"no state operators in: $progress")
    assert(progress.toLowerCase.contains("rocksdb"),
      s"RocksDB provider not active — progress: $progress")
  }

  test("GeoParquet streaming sink: per-file geo footers finalize under the file sink") {
    // the single-pass writer's file-close footer model is sink-agnostic:
    // writeStream.format(GeoParquetFileFormat) produces part-files whose
    // geo KV carries the batch's OWN observed bbox/types — streaming geo
    // ETL lands queryable GeoParquet with no post-pass
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_geostream").toString
    val src = new java.io.File(tmp, "src"); src.mkdirs()
    def stage(i: Int, lo: Int, hi: Int): Unit = {
      val st = new java.io.File(tmp, s"stage$i")
      s.sql(s"""SELECT CAST(id AS BIGINT) AS fid,
                       ST_AsBinary(ST_Point(CAST(id AS DOUBLE), CAST(id % 7 AS DOUBLE))) AS geometry
                FROM range($lo, $hi)""").coalesce(1).write.parquet(st.getPath)
      val part = new java.io.File(st.getPath).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, new java.io.File(src, s"f$i.parquet").toPath)
    }
    stage(0, 0, 40); stage(1, 40, 100)
    val q = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fid", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("geometry", org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", 1).parquet(src.getPath)
      .withColumn("bbox", call_function("st_bbox", col("geometry")))
      .writeStream.format(classOf[graft.sources.GeoParquetFileFormat].getName)
      .option(graft.sources.GeoParquetFileFormat.GeomColKey, "geometry")
      .option(graft.sources.GeoParquetFileFormat.CoveringKey, "bbox")
      .option(graft.sources.GeoParquetFileFormat.EncodingKey, "WKB")
      .option("path", tmp + "/out")
      .option("checkpointLocation", tmp + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every value landed exactly once and the dataset reads back AS GeoParquet
    val back = graft.sources.GeoParquet.read(s, tmp + "/out")
    assert(back.count() == 100 && back.select("fid").distinct().count() == 100)
    val meta = graft.sources.GeoParquet.metadata(s, tmp + "/out").get
    val gc = meta.columns.find(_.name == "geometry").get
    assert(gc.encoding == "WKB" && gc.geometryTypes == Seq("Point"))
    // per-file footers carry each micro-batch file's OWN bounds; the
    // reconciled dataset bbox is their union = the full staged extent
    assert(gc.bbox.contains((0.0, 0.0, 99.0, 6.0)), s"unioned bbox: ${gc.bbox}")
    // and the geometry is live: a spatial filter works directly on the sink output
    assert(back.where(call_function("st_x", col("geometry")) < 40.0).count() == 40)
    // same hygiene bar as runStream: no temp tree left behind per sweep
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(tmp))
  }

  test("runStream deletes its staging + checkpoint temp dirs (round-11 hygiene)") {
    // repeated verify/bench sweeps used to leak one parquet-staging +
    // checkpoint dir per streaming query; the harness now deletes the
    // whole tree once the query terminates
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    def dirs = tmpRoot.listFiles().filter(_.getName.startsWith("graft_s02")).map(_.getName).toSet
    val before = dirs
    assert(SparkEntry.queries("s02_stream_windowed")(spark, "/unused").count() > 0)
    val leaked = dirs -- before
    assert(leaked.isEmpty, s"leaked temp dirs: $leaked")
  }
}
