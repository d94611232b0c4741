package graft

/** Scale-behavior pins: proofs that the engine's configuration actually
  * engages Spark's runtime defenses, not just that they exist. These are
  * the behaviors a 100 TB run depends on; asserting them at test scale
  * (with thresholds lowered so the machinery fires on kilobytes) keeps a
  * config regression from silently disabling them.
  */
class ScaleSpec extends SparkTestBase {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    val s = spark
    import s.implicits._
    // one pathological key carrying ~99% of the rows + a uniform tail —
    // the shape that serializes a naive shuffle join onto one task
    (1 to 60000).map(i => (if (i <= 59000) 0L else i.toLong, i))
      .toDF("k", "v").createOrReplaceTempView("scale_big")
    (0 to 500).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
      .createOrReplaceTempView("scale_dim")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
      val joined = sql(
        "SELECT b.k, b.v, d.name FROM scale_big b JOIN scale_dim d ON d.k = b.k")
      // materialize so AQE replans with runtime stats, then read the FINAL plan
      // hot key 0 matches dim once each; the 1000 tail keys (> 59000) have
      // no dim row — the skewed partition carries essentially all output.
      // collect() executes THIS DataFrame's plan (count() would spin up a
      // separate query execution and leave `joined`'s AQE plan unfinalized)
      assert(joined.collect().length == 59000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    }
  }

  test("partial aggregation absorbs a hot grouping key map-side") {
    val s = spark
    import s.implicits._
    (1 to 50000).map(i => (if (i % 100 != 0) 7L else i.toLong, 1L))
      .toDF("k", "one").createOrReplaceTempView("scale_hot")
    val agg = sql("SELECT k, SUM(one) AS n FROM scale_hot GROUP BY k")
    val plan = agg.queryExecution.executedPlan.toString
    // two-phase hash aggregate: partial (map-side) + final — the partial
    // pass is what keeps a hot key from shipping 49 500 rows to one reducer
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation in:\n$plan")
    assert(agg.where("k = 7").head().getLong(1) == 49500L)
  }
}
