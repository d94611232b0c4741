package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Embedding-vector kernels as JVM statics for `StaticInvoke` registration
  * (see graft.functions.TextFunctions).
  *
  * Originally these were SQL-macro higher-order functions
  * (`aggregate`/`zip_with` lambdas). Those evaluate one boxed lambda call
  * per element and expand to large generated code — per-query janino
  * compilation dominated the small-scale profile and per-element boxing the
  * large-scale one. A static over `ArrayData` is one call site in the
  * generated code and an unboxed primitive loop inside.
  *
  * FP contract: `dot` accumulates left-to-right exactly like the SQL
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D, (acc,v) -> acc+v)` macro
  * and DuckDB's `list_reduce(list_prepend(0.0, …))` — bit-identical results,
  * so the DuckDB oracles keep hash-matching.
  *
  * Null elements inside vectors are not supported (embeddings are dense);
  * whole-null inputs are handled by `propagateNull` at the call site.
  */
object VecOps {

  /** float[] → double[] (deterministic widening; mirrors DuckDB x::DOUBLE). */
  def toDouble(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
    new GenericArrayData(out)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** 8-bit sign bucket of the leading dims — the LSH partition key for ANN. */
  def bucket8(a: ArrayData): Long = {
    val n = math.min(8, a.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { if (a.getDouble(i) > 0.0) acc |= (1L << i); i += 1 }
    acc
  }
}
