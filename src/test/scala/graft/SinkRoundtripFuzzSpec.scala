package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-sink roundtrip fuzz (round 18): the 1200-geometry [[WktFuzzGen]]
  * corpus through every writable source — GeoParquet (WKB), FlatGeobuf,
  * GeoJSON lines, CSV+WKT, Arrow IPC — must come back COORDINATE-EXACT.
  * The per-format specs pin fixed fixtures and the Arrow/Shapefile fuzzers
  * pin byte-level layouts; this sweep pins the end-to-end write→read loop
  * of every format against the same seeded corpus the kernel fuzz uses,
  * so a lossy coordinate path (precision-truncating text writer, float
  * downcast, ring reordering) in ANY sink fails loudly.
  *
  * Equality is canonical-WKT equality (`ST_AsText`): every reader emits
  * WKB through the same JTS writer, and Java double→text→double
  * roundtrips exactly, so anything weaker than exact equality here would
  * be hiding a real loss. FlatGeobuf files are written per WKT kind (the
  * format's header declares one geometry type per file). */
class SinkRoundtripFuzzSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(tag: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"sink_fuzz_${tag}_" + java.util.UUID.randomUUID().toString.take(8)).getAbsolutePath

  private lazy val corpus: DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    WktFuzzGen.all.zipWithIndex.map { case (w, i) => (i.toLong, i % 6, w) }
      .toDF("id", "kind", "wkt")
      .selectExpr("id", "kind", "ST_GeomFromText(wkt) AS geometry")
      .cache()
  }

  /** joins read-back rows to the corpus by id and requires canonical-WKT
    * equality on every one of the expected ids */
  private def assertExact(back: DataFrame, expectedIds: Seq[Long], format: String): Unit = {
    val got = back.selectExpr("id", "geometry AS g2")
    val joined = corpus.join(got, "id")
      .selectExpr("id", "ST_AsText(geometry) AS a", "ST_AsText(g2) AS b")
      .collect()
    assert(joined.length == expectedIds.length,
      s"$format: ${joined.length} rows back, expected ${expectedIds.length}")
    val bad = joined.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty,
      s"$format: ${bad.length} coordinate-inexact roundtrips, first: " +
        bad.take(3).map(r => s"id=${r.getLong(0)} ${r.getString(1).take(60)} vs ${r.getString(2).take(60)}").mkString("; "))
  }

  private val allIds = (0L until WktFuzzGen.N.toLong)

  test("GeoParquet (WKB encoding) roundtrips the full corpus exactly") {
    val out = tmp("gpq")
    graft.sources.GeoParquet.write(corpus, out, covering = false)
    assertExact(graft.sources.GeoParquet.read(spark, out), allIds, "geoparquet")
  }

  test("Arrow IPC roundtrips the full corpus exactly") {
    val out = tmp("arrow")
    graft.sources.ArrowIpc.write(corpus.coalesce(2), out)
    assertExact(graft.sources.ArrowIpc.read(spark, out), allIds, "arrowipc")
  }

  test("GeoJSON lines roundtrip the full corpus exactly") {
    val out = tmp("gjl")
    graft.sources.GeoJsonSource.writeLines(corpus, out)
    assertExact(graft.sources.GeoJsonSource.readLines(spark, out), allIds, "geojson-lines")
  }

  test("CSV+WKT roundtrips the full corpus exactly") {
    val out = tmp("csv")
    graft.sources.GeoCsv.write(corpus, out)
    assertExact(graft.sources.GeoCsv.read(spark, out), allIds, "geocsv")
  }

  test("FlatGeobuf roundtrips the corpus exactly, one file set per geometry kind") {
    (0 until 6).foreach { kind =>
      val out = tmp(s"fgb$kind")
      val slice = corpus.where(col("kind") === kind).coalesce(1)
      graft.sources.FlatGeobufWriter.write(slice, out)
      val ids = allIds.filter(_ % 6 == kind)
      assertExact(graft.sources.FlatGeobuf.read(spark, out), ids, s"flatgeobuf(kind=$kind)")
    }
  }
}
