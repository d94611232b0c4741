package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point — the standard zero-code library
  * integration: set
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * in spark-defaults (or `SparkSession.builder.withExtensions(new
  * GraftExtensions()(_))`) and every session gets the full surface with
  * no `GeoFunctions.register(spark)` call: all ST_* scalar functions and
  * the two aggregates (injected at the registry level, so they resolve
  * for the session's very FIRST query — Spark 4 raises
  * UNRESOLVED_ROUTINE during resolution, which rules out any
  * post-resolution registration hook), the spatial-join planner
  * strategy, and the optimizer rules.
  *
  * The builders are the SAME objects `register` installs — one audited
  * code path, two wiring mechanisms. Placement note: extension-injected
  * optimizer rules run inside the main operator-optimization batch
  * rather than `experimental.extraOptimizations` (after it) where
  * `register` puts them. All three rules are shape-driven, idempotent
  * accelerators whose non-firing leaves plans correct (the WKB path /
  * unfolded count / planar-refused-then-wrapped extents), and
  * GeodesicExtentRule still precedes NativePointFastPath in injection
  * order — the end-to-end equivalence of both wirings is pinned by the
  * extensions drive (native fast path + geodesic extent + spatial
  * strategy through a config-only spark-shell). Calling `register`
  * on an extensions-built session stays safe: the temp-function
  * re-registration replaces identical builders and the
  * `extraOptimizations` appends are idempotent re-runs. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GeoFunctions.functionDescriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.SpatialJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.SpatialCountFoldRule)
    ext.injectOptimizerRule(_ => graft.plans.GeodesicExtentRule)
    ext.injectOptimizerRule(_ => graft.plans.NativePointFastPath)
  }
}
