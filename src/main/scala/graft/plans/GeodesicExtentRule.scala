package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.BinaryType

/** `ST_Extent_Agg` over an edges-stamped column must aggregate the
  * GEODESIC per-row bounds, not the chord (vertex) envelopes: a geodesic
  * edge bows poleward past its chord bbox (to the exact Clairaut vertex
  * latitude — [[graft.core.Geodesy.geodesicEnvelope]]), so the planar
  * reduce under-reports the extent of stamped data. Bounding is the last
  * operation the edges contract names (reference:
  * rust/geoarrow-schema/src/edges.rs:3-8 "does affect distance,
  * intersection, bounding, overlay, length, and area").
  *
  * The aggregate function itself stays [[graft.functions.GeoAggregates.ExtentAgg]];
  * this rule wraps its input with `envelopeGeodesic` — a geometry whose
  * PLANAR envelope IS the geodesic bound — so partial aggregation,
  * merge, and the NULL-group contract are untouched. The scalar twin
  * (`ST_Envelope`/`ST_BBox` dispatch) lives in
  * [[graft.functions.GeoFunctions]]'s edgesDispatch; aggregates resolve
  * through `ScalaAggregator`, which the scalar builder never sees, hence
  * this rule. Runs in `experimental.extraOptimizations` BEFORE
  * [[NativePointFastPath]] (which additionally refuses its planar
  * leaf-stats extent rewrite on stamped columns). Honors the global
  * `spark.graft.edges.dispatch` kill switch. */
object GeodesicExtentRule extends Rule[LogicalPlan] {

  private val geodesy = Class.forName("graft.core.Geodesy")
  private val models = Set("spherical", "karney", "andoyer", "thomas", "vincenty")

  private def stamped(e: Expression): Boolean = e match {
    case a: AttributeReference if a.resolved && a.metadata.contains("geoparquet.edges") =>
      models(a.metadata.getString("geoparquet.edges").toLowerCase)
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.edges.dispatch", "true").toBoolean)
      return plan
    plan.transformUp {
      case agg: Aggregate => agg.transformExpressionsUp {
        case sa: ScalaAggregator[_, _, _]
            if (sa.agg eq graft.functions.GeoAggregates.ExtentAgg) &&
              sa.children.length == 1 && stamped(sa.children.head) =>
          sa.withNewChildren(Seq(StaticInvoke(geodesy, BinaryType,
            "envelopeGeodesic", Seq(sa.children.head), Nil,
            propagateNull = true, returnNullable = false)))
      }
    }
  }
}
