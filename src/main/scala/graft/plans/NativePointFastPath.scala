package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Max, Min}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.optimizer.{CollapseProject, ColumnPruning}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructType}

/** Columnar fast path for NATIVE-encoded GeoParquet point columns.
  *
  * [[graft.sources.GeoParquet.read]] transcodes native (GeoArrow struct)
  * geometry columns to WKB at scan time (`ga_point(col, z, m)`) so every
  * ST_* kernel accepts them. For coordinate-only consumers that is pure
  * waste: `ST_X(ga_point(s))` serializes the struct into WKB bytes, parses
  * them back into a JTS Point, and reads the X it already had as a codegen'd
  * column leaf. The reference computes such accessors directly on the
  * separated coordinate arrays (rust/geoarrow-array/src/trait_.rs:251);
  * this rule is the Spark-shaped equivalent — rewrite the composed
  * expression so the plan touches only the struct leaves and the WKB/JTS
  * stage disappears entirely:
  *
  *  - `ST_X/ST_Y/ST_XMin/ST_YMin/ST_XMax/ST_YMax(ga_point(s))` → `s.x`/`s.y`
  *    (a point's envelope IS its coordinate)
  *  - `ST_IsEmpty(ga_point(s))` → `s IS NULL ? NULL : isnan(s.x)` (the
  *    GeoArrow all-NaN empty-point sentinel)
  *  - `ST_Extent_Agg(ga_point(s))` → min/max over the leaves with NaN
  *    (EMPTY) rows nulled out — the same skip ExtentAgg's envelope-isNull
  *    check performs — rebuilt into the aggregator's xmin/ymin/xmax/ymax
  *    struct, NULL when no valid row contributed
  *
  * Two plan shapes are covered: the FUSED form where CollapseProject
  * already composed consumer and transcode into one expression, and the
  * LAYERED form (Aggregate/Project/Filter directly above the transcode
  * Project) where the consumer references the transcode through an
  * attribute — there the rule inlines through the alias, adds the raw
  * struct column as a passthrough, and lets ColumnPruning drop the
  * now-dead `ga_point` alias.
  *
  * Runs in `experimental.extraOptimizations` (after the main batches).
  * EMPTY-point divergence, documented: the WKB path NPEs on
  * `ST_X(POINT EMPTY)` and reports JTS's 0-width null envelope for
  * `ST_XMin`; the fast path yields NaN (the sentinel the column stores) —
  * strictly more useful, and unreachable for the non-degenerate data the
  * WKB path already handled. */
object NativePointFastPath extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other => other
  }

  /** the struct argument of a `ga_point` scan transcode, if `e` is one */
  private def gaPointArg(e: Expression): Option[Expression] = strip(e) match {
    case si: StaticInvoke if si.functionName == "gaPoint" &&
        si.staticObject.getName == "graft.core.GeoArrowOps" =>
      Some(si.arguments.head)
    case _ => None
  }

  private def leaf(s: Expression, name: String): Option[Expression] = s.dataType match {
    case st: StructType =>
      val i = st.fieldNames.indexOf(name)
      if (i < 0) None else Some(GetStructField(s, i, Some(name)))
    case _ => None
  }

  private def nanToNull(e: Expression): Expression =
    If(IsNaN(e), Literal(null, DoubleType), e)

  // a point's envelope is its coordinate: min and max both read the leaf
  private val coordKernels = Map(
    "stX" -> "x", "xMin" -> "x", "xMax" -> "x",
    "stY" -> "y", "yMin" -> "y", "yMax" -> "y")

  private def isGeomOp(si: StaticInvoke, name: String): Boolean =
    si.staticObject.getName == "graft.core.GeomOps" && si.functionName == name

  private def isGeodesyOp(si: StaticInvoke, name: String): Boolean =
    si.staticObject.getName == "graft.core.Geodesy" && si.functionName == name

  /** (x, y) of a FOLDABLE point argument (e.g. `ST_Point(2.35, 48.85)`
    * folded to a WKB literal) — evaluated once at optimization time.
    * Non-point / EMPTY / unparseable literals refuse the rewrite. */
  private def litPointCoords(arg: Expression): Option[(Expression, Expression)] = {
    val e = strip(arg)
    if (!e.foldable || e.dataType != org.apache.spark.sql.types.BinaryType) return None
    try {
      val wkb = e.eval().asInstanceOf[Array[Byte]]
      if (wkb == null) return None
      graft.core.GeomOps.read(wkb) match {
        case p: org.locationtech.jts.geom.Point if !p.isEmpty =>
          Some((Literal(p.getX), Literal(p.getY)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** planar point distance, the exact JTS IEEE chain:
    * sqrt(dx·dx + dy·dy). NaN (EMPTY sentinel) flows through naturally. */
  private def planarDist(x1: Expression, y1: Expression,
                         x2: Expression, y2: Expression): Expression = {
    val dx = Subtract(x1, x2)
    val dy = Subtract(y1, y2)
    Sqrt(Add(Multiply(dx, dx), Multiply(dy, dy)))
  }

  /** haversine meters, the exact [[graft.core.Geodesy.haversineMeters]]
    * IEEE chain via codegen'd trig built-ins (every step is the same
    * java.lang.Math call). EMPTY's NaN sentinel must yield NaN like the
    * kernel — `Least` would swallow it (Spark orders NaN last), so the
    * NaN case is guarded explicitly. */
  private def sphereDist(x1: Expression, y1: Expression,
                         x2: Expression, y2: Expression): Expression = {
    val dLat = ToRadians(Subtract(y2, y1))
    val dLon = ToRadians(Subtract(x2, x1))
    val a = Add(
      Pow(Sin(Divide(dLat, Literal(2.0))), Literal(2.0)),
      Multiply(Multiply(Cos(ToRadians(y1)), Cos(ToRadians(y2))),
        Pow(Sin(Divide(dLon, Literal(2.0))), Literal(2.0))))
    val root = Sqrt(a)
    // Least SKIPS null and orders NaN last — both must pass through as
    // themselves (NULL input stays NULL, the EMPTY NaN sentinel stays NaN)
    val clamped = If(Or(IsNull(root), IsNaN(root)), root,
      Least(Seq(Literal(1.0), root)))
    Multiply(Literal(2.0 * graft.core.Geodesy.EarthRadiusM), Asin(clamped))
  }

  private def isExtentAgg(ae: AggregateExpression): Boolean = ae.aggregateFunction match {
    case sa: org.apache.spark.sql.execution.aggregate.ScalaAggregator[_, _, _] =>
      (sa.agg eq graft.functions.GeoAggregates.ExtentAgg) && sa.children.length == 1
    case _ => false
  }

  private def extentChild(ae: AggregateExpression): Expression =
    ae.aggregateFunction
      .asInstanceOf[org.apache.spark.sql.execution.aggregate.ScalaAggregator[_, _, _]]
      .children.head

  private def extentRewrite(ae: AggregateExpression, s: Expression): Option[Expression] =
    (leaf(s, "x"), leaf(s, "y"), ae.dataType) match {
      case (Some(x), Some(y), st: StructType) if st.length == 4 =>
        def agg(fn: Expression => AggregateFunction, e: Expression): Expression =
          AggregateExpression(fn(nanToNull(e)), ae.mode, isDistinct = false,
            ae.filter, NamedExpression.newExprId)
        val xmin = agg(Min(_), x); val ymin = agg(Min(_), y)
        val xmax = agg(Max(_), x); val ymax = agg(Max(_), y)
        // all-null/EMPTY group → NULL struct, matching ExtentAgg.finish
        Some(If(IsNull(xmin), Literal(null, st),
          CreateNamedStruct(Seq(
            Literal(st.fieldNames(0)), xmin, Literal(st.fieldNames(1)), ymin,
            Literal(st.fieldNames(2)), xmax, Literal(st.fieldNames(3)), ymax))))
      case _ => None
    }

  private def rewriteNode(node: LogicalPlan): LogicalPlan = {
    // transcode aliases exposed by direct Project children whose struct
    // source is a plain column (the shape GeoParquet.read emits)
    val entries: Map[ExprId, Attribute] = node.children.flatMap {
      case p: Project => p.projectList.collect {
        case a @ Alias(e, _) if gaPointArg(e).exists(_.isInstanceOf[AttributeReference]) =>
          a.exprId -> gaPointArg(e).get.asInstanceOf[AttributeReference]
      }
      case _ => Nil
    }.toMap
    val used = mutable.Set.empty[ExprId]
    // the struct behind a consumer's argument: fused call or aliased attr
    def resolveStruct(arg: Expression): Option[Expression] =
      gaPointArg(arg).orElse(strip(arg) match {
        case ar: AttributeReference if entries.contains(ar.exprId) =>
          used += ar.exprId
          Some(entries(ar.exprId))
        case _ => None
      })
    // (x, y) of a distance-kernel argument: struct leaves (native column)
    // or a foldable point literal. The rewrite needs ≥1 struct side —
    // literal-literal pairs are constant folding's job.
    def coordsOf(arg: Expression): Option[(Expression, Expression, Boolean)] =
      resolveStruct(arg).flatMap(s =>
        for { x <- leaf(s, "x"); y <- leaf(s, "y") } yield (x, y, true))
        .orElse(litPointCoords(arg).map { case (x, y) => (x, y, false) })
    // NEVER rewrite inside a Join node: SpatialJoinStrategy and the count
    // fold match the StaticInvoke shape in join conditions — a rewritten
    // condition would silently degrade the join to BroadcastNestedLoopJoin
    def binCoords(si: StaticInvoke)
        : Option[((Expression, Expression), (Expression, Expression))] =
      if (node.isInstanceOf[Join]) None
      else for {
        a <- coordsOf(si.arguments(0))
        b <- coordsOf(si.arguments(1))
        if a._3 || b._3
      } yield ((a._1, a._2), (b._1, b._2))
    val newNode = node.transformExpressions {
      case si: StaticInvoke if coordKernels.contains(si.functionName) &&
          si.staticObject.getName == "graft.core.GeomOps" =>
        resolveStruct(si.arguments.head)
          .flatMap(s => leaf(s, coordKernels(si.functionName))).getOrElse(si)
      case si: StaticInvoke if isGeomOp(si, "isEmpty") =>
        (for {
          s <- resolveStruct(si.arguments.head)
          x <- leaf(s, "x")
        } yield If(IsNull(s), Literal(null, BooleanType), IsNaN(x))).getOrElse(si)
      // distance kernels against a native point column (round 18): the
      // point-radius scan shape — `WHERE ST_DWithin(g, ST_Point(…), r)` /
      // `ST_Distance(g, lit)` / `ST_DistanceSphere(g, lit)` — runs as
      // codegen'd leaf arithmetic (the exact kernel IEEE chains) instead
      // of per-row WKB serialize + JTS parse
      case si: StaticInvoke if isGeomOp(si, "distance") && si.arguments.length == 2 =>
        binCoords(si).map { case ((x1, y1), (x2, y2)) =>
          planarDist(x1, y1, x2, y2) }.getOrElse(si)
      case si: StaticInvoke if isGeodesyOp(si, "distanceSphere") && si.arguments.length == 2 =>
        binCoords(si).map { case ((x1, y1), (x2, y2)) =>
          sphereDist(x1, y1, x2, y2) }.getOrElse(si)
      case si: StaticInvoke if isGeomOp(si, "dWithin") && si.arguments.length == 3 &&
          strip(si.arguments(2)).foldable =>
        binCoords(si).map { case ((x1, y1), (x2, y2)) =>
          LessThanOrEqual(planarDist(x1, y1, x2, y2), strip(si.arguments(2)))
        }.getOrElse(si)
      case ae: AggregateExpression if !ae.isDistinct && isExtentAgg(ae) =>
        resolveStruct(extentChild(ae)).flatMap(extentRewrite(ae, _)).getOrElse(ae)
    }
    val usedNow = used.toSet
    if (usedNow.isEmpty) newNode
    else newNode.withNewChildren(newNode.children.map {
      case p: Project =>
        // pass the raw struct column through so the inlined leaf reads
        // resolve above this Project; the dead ga_point alias goes to
        // ColumnPruning afterwards
        val need = p.projectList.collect {
          case a: Alias if usedNow.contains(a.exprId) => entries(a.exprId)
        }.distinct.filterNot(att => p.projectList.exists(_.toAttribute.exprId == att.exprId))
        if (need.isEmpty) p else p.copy(projectList = p.projectList ++ need)
      case other => other
    })
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    // escape hatch (also how the before/after benchmark isolates the WKB
    // path — GeoParquet.read re-registers the rule, so de-registration
    // alone cannot hold it off)
    if (!conf.getConfString("spark.graft.nativePointFastPath", "true").toBoolean)
      return plan
    val rewritten = plan.transformUp { case node => rewriteNode(node) }
    if (rewritten.fastEquals(plan)) plan
    else {
      // clean up what the rewrite orphaned: the unused ga_point alias (and
      // the passthrough, where nothing ended up needing it)
      val cleaned = CollapseProject(ColumnPruning(rewritten))
      // an optimizer rule must NEVER change the plan's output schema: the
      // passthrough column added to the transcode Project propagates
      // through schema-transparent parents (Sort/Filter at the root —
      // e.g. `SELECT * FROM pts ORDER BY ST_X(geometry)`), where
      // ColumnPruning has no consumer to prune against. Restore the
      // analyzed output with a trimming Project when that happens.
      if (cleaned.output.map(_.exprId) == plan.output.map(_.exprId)) cleaned
      else Project(plan.output, cleaned)
    }
  }
}
