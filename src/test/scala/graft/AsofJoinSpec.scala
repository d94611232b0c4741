package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def mk() = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(5), "l-a"), (1L, ts(10), "l-b"), (1L, ts(2), "l-early"),
      (2L, ts(7), "l-c"),
      (3L, ts(1), "l-nomatch")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(3), 30.0), (1L, ts(5), 50.0), (1L, ts(9), 90.0),
      (2L, ts(6), 60.0)).toDF("k", "ts", "rv")
    (left, right)
  }

  test("backward: latest right with r.ts <= l.ts, inclusive, left outer") {
    val (l, r) = mk()
    val out = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"))
      .orderBy("k", "ts").collect()
      .map(x => (x.getLong(0), x.getString(2), Option(x.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, "l-early", None),        // before every right row
      (1L, "l-a", Some(50.0)),      // equal-ts right row matches (inclusive)
      (1L, "l-b", Some(90.0)),      // latest of 3/5/9 that is <= 10
      (2L, "l-c", Some(60.0)),
      (3L, "l-nomatch", None)))     // key with no right rows at all
  }

  test("forward: earliest right with r.ts >= l.ts") {
    val (l, r) = mk()
    val out = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"), direction = "forward")
      .orderBy("k", "ts").collect()
      .map(x => (x.getString(2), Option(x.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("l-early", Some(30.0)), ("l-a", Some(50.0)), ("l-b", None),
      ("l-c", None), ("l-nomatch", None)))
  }

  test("tolerance nulls out stale matches") {
    val (l, r) = mk()
    // l-b at 10:10 matches right at 10:09 (60s); with 30s tolerance it must drop
    val out = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"),
        toleranceMicros = Some(30L * 1000000))
      .orderBy("k", "ts").collect()
      .map(x => (x.getString(2), Option(x.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("l-early", None), ("l-a", Some(50.0)), ("l-b", None),
      ("l-c", None),                // 60s lag > 30s
      ("l-nomatch", None)))
  }

  test("plan has exactly one shuffle (window exchange), no cross join") {
    val (l, r) = mk()
    val plan = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // one Exchange for the union'd window; local-table scans add no shuffles
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }

  test("nearest: closer of the two candidates wins; exact tie goes backward") {
    val (l, r) = mk()
    val out = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"), direction = "nearest")
      .orderBy("k", "ts").collect()
      .map(x => (x.getString(2), Option(x.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("l-early", Some(30.0)),  // 10:02: backward none, forward 10:03 (60s)
      ("l-a", Some(50.0)),      // exact-ts match, lag 0 both ways -> same row
      ("l-b", Some(90.0)),      // 10:10: backward 10:09 (60s) only
      ("l-c", Some(60.0)),      // 10:07: backward 10:06 (60s) ties forward none
      ("l-nomatch", None)))
  }

  test("nearest: tie at equal |lag| picks the backward candidate") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, ts(6), "mid")).toDF("k", "ts", "lv")
    val r = Seq((1L, ts(4), 40.0), (1L, ts(8), 80.0)).toDF("k", "ts", "rv") // both 120s away
    val out = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"), direction = "nearest")
      .collect().map(x => x.get(4).asInstanceOf[Double])
    assert(out.toSeq == Seq(40.0))
  }

  test("nearest: tolerance applies per candidate before the choice") {
    val s = spark
    import s.implicits._
    // both candidates sit 60s away — outside a 30s tolerance BOTH must drop
    val l = Seq((1L, ts(6), "x")).toDF("k", "ts", "lv")
    val r1 = Seq((1L, ts(5), 50.0), (1L, ts(7), 70.0)).toDF("k", "ts", "rv")
    val out1 = AsofJoin.asof(l, r1, Seq("k"), "ts", "ts", Seq("rv"),
        direction = "nearest", toleranceMicros = Some(30L * 1000000))
      .collect().map(x => Option(x.get(4)))
    assert(out1.toSeq == Seq(None))
    // backward 180s out of tolerance, forward 60s inside -> forward wins even
    // though backward is nearer to the raw window scan
    val r2 = Seq((1L, ts(3), 30.0), (1L, ts(7), 70.0)).toDF("k", "ts", "rv")
    val out2 = AsofJoin.asof(l, r2, Seq("k"), "ts", "ts", Seq("rv"),
        direction = "nearest", toleranceMicros = Some(90L * 1000000))
      .collect().map(x => Option(x.get(4)).map(_.asInstanceOf[Double]))
    assert(out2.toSeq == Seq(Some(70.0)))
  }

  test("interpolate: linear between brackets, hold-last, backfill, exact hit") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, ts(0), "before"), (1L, ts(4), "mid"), (1L, ts(5), "hit"),
                (1L, ts(20), "after"), (2L, ts(1), "nokey"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, ts(2), 10.0), (1L, ts(5), 40.0), (1L, ts(10), 90.0))
      .toDF("k", "ts", "value")
    val out = AsofJoin.interpolate(l, r, Seq("k"), "ts", "ts", "value")
      .orderBy("k", "ts").collect()
      .map(x => (x.getString(2), Option(x.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("before", Some(10.0)),   // backfill to the first right value
      ("mid", Some(30.0)),      // 2/3 of the way from 10 (t=2) to 40 (t=5)
      ("hit", Some(40.0)),      // exact-timestamp hit
      ("after", Some(90.0)),    // hold-last beyond the final right row
      ("nokey", None)))         // no right rows for the key
  }

  test("nearest: still exactly one shuffle — both windows share the partitioning") {
    val (l, r) = mk()
    val plan = AsofJoin.asof(l, r, Seq("k"), "ts", "ts", Seq("rv"), direction = "nearest")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"nearest grew a second shuffle:\n$plan")
  }
}
