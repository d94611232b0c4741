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
}
