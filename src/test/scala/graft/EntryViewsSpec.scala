package graft

class EntryViewsSpec extends SparkTestBase {

  test("views registration leaves the nanosAsLong session conf at its default") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    // a01 reads the events view (TIMESTAMP(NANOS) parquet) — the conf must
    // be needed only during schema inference, never left set on the session
    val rows = SparkEntry.queries("a01_asof_join")(spark, "/root/testdata/sf0.001").count()
    assert(rows > 0)
    assert(spark.conf.getOption(key) === before)
    assert(!spark.conf.get(key, "false").toBoolean,
      "nanosAsLong must not leak into the session: later reads of other " +
        "nanos parquet would silently inherit the legacy behavior")
  }

  test("events view stays executable after the conf is restored") {
    // execution (not just planning) of the nanos-backed view must work with
    // the session conf at default strictness
    val df = SparkEntry.queries("q07_hourly_events")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }

  test("events view adapts to both ts generations: long nanos and native timestamp") {
    // The driver has shipped events.ts as TIMESTAMP(NANOS)-read-as-long
    // (rounds 1-9) and as native timestamp[us] (round 10). views() switches
    // on the read schema; both generations must register and agree. Build a
    // long-nanos twin of the current testdata and compare q07 through both.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsgen").toString
    val src = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").write.parquet(s"$dir/$t.parquet")
    spark.read.parquet(s"$src/events.parquet")
      .select(col("event_id"),
        // micros -> nanos long, the exact wire value the legacy branch DIVs
        (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    val legacy = SparkEntry.queries("q07_hourly_events")(spark, dir)
      .collect().map(_.toString).toList
    val native = SparkEntry.queries("q07_hourly_events")(spark, src)
      .collect().map(_.toString).toList
    assert(legacy.nonEmpty && legacy == native,
      s"generations must agree: legacy=${legacy.take(2)} native=${native.take(2)}")
  }
}
