package graft

import org.apache.spark.sql.functions.{call_function, lit}

import graft.core.GeomOps
import graft.functions.GeoFunctions

/** Registry-driven SQL coverage fuzz (round 20): EVERY registered
  * signature — all of [[GeoFunctions.kernelMatrix]] — is driven through
  * the SQL surface with type-appropriate literals. Three gates per
  * signature:
  *
  *  1. RESOLUTION: `call_function(name, typed args)` must analyze — a
  *     Sig row whose name/arity/types drifted from the kernel method
  *     fails here (the builder-wiring drift the per-function specs
  *     can't see, because they call the kernels they know about).
  *  2. NULL CONTRACT: all-null inputs answer null, never throw — every
  *     kernel is a null-intolerant StaticInvoke, so the null must
  *     short-circuit BEFORE the kernel.
  *  3. EXECUTION: for each geometry-typed signature, at least one of
  *     the candidate WKT shapes (point / line / polygon / multi /
  *     measured trajectory / EMPTY) must evaluate without error, and
  *     whatever throws must be a KERNEL-CONTRACT error (require /
  *     unsupported-type style), surfaced through Spark's execution
  *     wrapper — never an analysis error and never a raw NPE.
  */
class RegistryCoverageSpec extends SparkTestBase {

  private def wkb(w: String): Array[Byte] =
    GeomOps.write(new org.locationtech.jts.io.WKTReader(GeomOps.factory).read(w))

  import org.apache.spark.sql.types._

  // candidate literal per parameter type; geometry candidates rotate
  private val geomCandidates = Seq(
    "POINT (3 4)",
    "LINESTRING (0 0, 8 0, 8 6)",
    "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))",
    "MULTIPOINT ((0 0), (2 3))",
    "LINESTRING M (0 0 0, 10 0 10)",
    "POINT EMPTY")

  private def scalarArg(dt: DataType, geomWkt: String): org.apache.spark.sql.Column =
    dt match {
      case BinaryType => lit(wkb(geomWkt))
      case DoubleType => lit(0.5)
      case IntegerType => lit(1)
      case LongType => lit(1L)
      case BooleanType => lit(true)
      case StringType => lit("POINT (1 2)")
      case other => lit(null).cast(other) // nested/struct params: typed null
    }

  private def rootCauses(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12).toSeq

  test("resolution + null contract: every signature analyzes and nulls out") {
    GeoFunctions.register(spark)
    var checked = 0
    GeoFunctions.kernelMatrix.foreach { case (name, _, _, params, _) =>
      val nullArgs = params.map(dt => lit(null).cast(dt))
      val df = spark.range(1).select(call_function(name, nullArgs: _*).as("v"))
      // analysis happens here; an unresolvable signature throws AnalysisException
      val row =
        try df.head()
        catch {
          case e: Throwable => fail(s"$name/${params.length}: null-input call " +
            s"failed (${e.getClass.getSimpleName}: ${e.getMessage})")
        }
      assert(row.isNullAt(0), s"$name/${params.length}: null inputs must answer null")
      checked += 1
    }
    assert(checked >= 230, s"registry shrank? $checked signatures")
  }

  test("execution: geometry signatures run on at least one candidate shape") {
    GeoFunctions.register(spark)
    var geomSigs = 0
    GeoFunctions.kernelMatrix.foreach { case (name, _, _, params, _) =>
      if (params.contains(BinaryType)) {
        geomSigs += 1
        val outcomes = geomCandidates.map { w =>
          val args = params.map(dt => scalarArg(dt, w))
          try { spark.range(1).select(call_function(name, args: _*)).collect(); None }
          catch { case e: Throwable => Some(w -> e) }
        }
        if (!outcomes.contains(None)) {
          // every shape threw: each must be a kernel-contract rejection
          // (require/unsupported input), never analysis drift or an NPE
          outcomes.flatten.foreach { case (w, e) =>
            val causes = rootCauses(e)
            assert(!causes.exists(_.isInstanceOf[org.apache.spark.sql.AnalysisException]),
              s"$name on $w: analysis error — registry wiring drift: ${e.getMessage}")
            assert(!causes.exists(_.isInstanceOf[NullPointerException]),
              s"$name on $w: NPE escaped the kernel: ${e.getMessage}")
            assert(causes.exists { c =>
              c.isInstanceOf[IllegalArgumentException] ||
              c.isInstanceOf[UnsupportedOperationException] ||
              c.isInstanceOf[IllegalStateException] ||
              // the internal ga_* converters reject wrong-typed geometry
              // with an unchecked JTS downcast — a type-contract error
              c.isInstanceOf[ClassCastException] ||
              c.getClass.getName.startsWith("org.locationtech.jts")
            }, s"$name on $w: unexpected failure class " +
               s"${causes.map(_.getClass.getSimpleName).mkString("<-")}: ${e.getMessage}")
          }
        }
      }
    }
    assert(geomSigs >= 190, s"geometry signature census shrank? $geomSigs")
  }
}
