package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("keyless interval join matches exactly the rows in [lo, hi], ends inclusive") {
    val left = Seq((1L, 1000L), (2L, 5000L)).toDF("lid", "lts")
    val right = Seq((10L, 900L), (11L, 1000L), (12L, 1100L), (13L, 1500L),
      (14L, 1501L), (15L, 4500L), (16L, 6000L)).toDF("rid", "rts")
    // window [l.ts, l.ts + 500]
    val out = RangeJoin.interval(left, right, Nil, "lts", "rts", 0L, 500L,
      Seq("rid"), prefix = "m_")
      .select("lid", "m_rid").as[(Long, Long)].collect().toSet
    // l=1000: rts 1000 (lo end), 1100, 1500 (hi end); 1501 excluded
    // l=5000: rts none (4500 before window, 6000 after)
    assert(out == Set((1L, 10L + 1), (1L, 12L), (1L, 13L)))
  }

  test("negative lo window (lookback) and keyed join") {
    val left = Seq(("a", 10_000L, 1), ("a", 20_000L, 2), ("b", 10_000L, 3))
      .toDF("k", "lts", "lid")
    val right = Seq(("a", 9_000L, 100.0), ("a", 10_000L, 200.0),
      ("a", 19_000L, 300.0), ("b", 8_000L, 400.0), ("c", 9_500L, 500.0))
      .toDF("k", "rts", "v")
    // lookback [l.ts - 2000, l.ts] per key
    val out = RangeJoin.interval(left, right, Seq("k"), "lts", "rts",
      -2000L, 0L, Seq("v"))
      .groupBy("lid").agg(sum("r_v").as("sv"), count(lit(1)).as("n"))
      .as[(Int, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((300.0, 2L))) // 9000 and 10000 match; c-keyed 9500 doesn't
    assert(out(2) == ((300.0, 1L))) // only 19000 within [18000, 20000]
    assert(out(3) == ((400.0, 1L))) // b's 8000 sits exactly on the lo end (inclusive)
  }

  test("timestamp-typed columns go through unix_micros") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00")))
      .toDF("lid", "lts")
    val right = Seq(
      (20L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")),
      (21L, java.sql.Timestamp.valueOf("2024-01-01 00:09:59")),
      (22L, java.sql.Timestamp.valueOf("2024-01-01 00:10:01"))).toDF("rid", "rts")
    // 10-minute lookback
    val out = RangeJoin.interval(left, right, Nil, "lts", "rts",
      -600000000L, 0L, Seq("rid"), prefix = "m_")
      .select("m_rid").as[Long].collect().toSet
    assert(out == Set(20L, 21L))
  }

  test("plans as a shuffle join: no BNLJ / cartesian product") {
    val left = Seq((1L, 1000L)).toDF("lid", "lts")
    val right = Seq((10L, 900L)).toDF("rid", "rts")
    val out = RangeJoin.interval(left, right, Nil, "lts", "rts", 0L, 500L, Seq("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("each (left, right) pair appears at most once despite the two probe buckets") {
    // dense right side across several buckets
    val left = (0L until 50L).map(i => (i, i * 100L)).toDF("lid", "lts")
    val right = (0L until 500L).map(i => (i, i * 10L)).toDF("rid", "rts")
    val out = RangeJoin.interval(left, right, Nil, "lts", "rts", -250L, 250L, Seq("rid"))
    val dups = out.groupBy("lid", "r_rid").count().where(col("count") > 1).count()
    assert(dups == 0)
  }

  test("degenerate window rejected") {
    val df = Seq((1L, 1L)).toDF("a", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.interval(df, df, Nil, "ts", "ts", 5L, 5L, Seq("a"))
    }
  }
}
