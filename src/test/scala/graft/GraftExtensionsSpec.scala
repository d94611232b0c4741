package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The `spark.sql.extensions` entry point (round 19): function
  * descriptors, planner strategy, and optimizer rules injected with NO
  * `GeoFunctions.register` call. The true config-only path (spark-shell
  * with `--conf spark.sql.extensions=graft.GraftExtensions`) is
  * exercised end-to-end by the verify drive — scalar SQL, spatial-join
  * planning, the aggregate, the geodesic extent dispatch, and the
  * native-point fast path all fire through the injected wiring; this
  * spec pins the injection inventory and that the injected BUILDERS
  * produce working expressions on a genuinely unregistered session. */
class GraftExtensionsSpec extends SparkTestBase {

  private def built[A](method: String, ext: SparkSessionExtensions,
                       s: org.apache.spark.sql.SparkSession): Seq[A] =
    // build* methods are private[sql] in Scala, bytecode-public — the
    // GraftInternal reflection-shim discipline
    classOf[SparkSessionExtensions]
      .getMethod(method, classOf[org.apache.spark.sql.SparkSession])
      .invoke(ext, s).asInstanceOf[Seq[A]]

  test("injection inventory: strategy present, rules ordered, functions complete") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = built[org.apache.spark.sql.execution.SparkStrategy](
      "buildPlannerStrategies", ext, spark)
    assert(strategies.contains(graft.plans.SpatialJoinStrategy), strategies.toString)
    val rules = built[org.apache.spark.sql.catalyst.rules.Rule[_]](
      "buildOptimizerRules", ext, spark)
    val names = rules.map(_.getClass.getSimpleName.stripSuffix("$"))
    assert(names.contains("SpatialCountFoldRule") &&
      names.contains("GeodesicExtentRule") && names.contains("NativePointFastPath"),
      names.toString)
    // the stamped-extent wrap must get its chance before the planar
    // leaf-stats rewrite within the shared fixed-point batch
    assert(names.indexOf("GeodesicExtentRule") < names.indexOf("NativePointFastPath"))
    // descriptor census: every registered scalar name + the two aggregates
    val descs = graft.functions.GeoFunctions.functionDescriptors
    val descNames = descs.map(_._1.funcName).toSet
    val sigNames = graft.functions.GeoFunctions.kernelMatrix.map(_._1).toSet
    assert(sigNames.subsetOf(descNames), (sigNames -- descNames).toString)
    assert(descNames.contains("st_extent_agg") && descNames.contains("st_union_agg"))
  }

  test("injected builders work on an unregistered session (scalar + aggregate)") {
    val fresh = spark.newSession() // fresh SessionState: no temp ST_* functions
    assert(intercept[Exception](fresh.sql("SELECT ST_Point(1.0, 2.0)").collect())
      .getMessage.toLowerCase.contains("routine"),
      "fresh session must NOT have ST_* before injection")
    // install the descriptors' builders directly — exactly what the
    // analyzer does with injectFunction entries at session build
    graft.functions.GeoFunctions.functionDescriptors.foreach { case (id, _, builder) =>
      fresh.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
    val r = fresh.sql(
      "SELECT ST_AsText(ST_Point(3.0, 4.0)) AS w, ST_Area(ST_MakeEnvelope(0D,0D,2D,3D)) AS a")
      .head()
    assert(r.getString(0) == "POINT (3 4)" && r.getDouble(1) == 6.0)
    val agg = fresh.sql("SELECT ST_Extent_Agg(g).xmax AS x, ST_Extent_Agg(g).ymin AS y " +
      "FROM (SELECT ST_Point(CAST(id AS DOUBLE), CAST(id AS DOUBLE) * 2.0) AS g FROM range(5))")
      .head()
    assert(agg.getDouble(0) == 4.0 && agg.getDouble(1) == 0.0, agg.toString)
    val un = fresh.sql("SELECT ST_Area(ST_Union_Agg(g)) AS a FROM (SELECT " +
      "ST_MakeEnvelope(CAST(id AS DOUBLE), 0D, CAST(id AS DOUBLE) + 1.0, 1D) AS g FROM range(3))")
      .head().getDouble(0)
    assert(un == 3.0, s"union agg through the injected builder: $un")
  }
}
