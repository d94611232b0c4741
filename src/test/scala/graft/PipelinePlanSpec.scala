package graft

/** Plan-shape pins for the round-10 pipeline queries: the properties that
  * make them survive 100 TB are structural (what the plan does NOT contain),
  * so they are asserted here rather than trusted to stay true. sf0.001
  * keeps the runs cheap — plan shape does not depend on row count.
  */
class PipelinePlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("e07 PQ-ADC: never cartesian; codebook/dtable sides broadcast") {
    val plan = planOf("e07_pq_adc")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"ADC join fell to SMJ in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("e08 PQ recall: never cartesian on the ANN side") {
    val plan = planOf("e08_pq_recall")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("t17 mixture sampling: zero joins — sampling is a map-side decision") {
    val plan = planOf("t17_mixture_sample")
    assert(!plan.contains("Join"), s"join appeared in sampling plan:\n$plan")
    // shuffles: REPARTITION hint + the bounded report aggregate (count
    // distinct expands to two) — nothing keyed by data content
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 4, s"unexpected shuffle count $shuffles in:\n$plan")
  }

  test("t18 chunking: zero joins — chunk explode is map-side") {
    val plan = planOf("t18_chunking")
    assert(!plan.contains("Join"), s"join appeared in chunking plan:\n$plan")
  }
}
