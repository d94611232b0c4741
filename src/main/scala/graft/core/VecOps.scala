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

  /** Squared euclidean distance, accumulated left-to-right with the term
    * written as `(a_i - b_i) * (a_i - b_i)` — the exact sequence of FP ops
    * the DuckDB oracle replays via
    * `list_reduce(list_prepend(0.0, list_transform(range(1, len+1),
    * i -> (a[i]-b[i])*(a[i]-b[i]))), (x,y) -> x+y)`, keeping results
    * bit-identical across engines (same contract as [[dot]]). Used by the
    * PQ-ADC path (e07): codebook training-free assignment, per-subspace
    * ADC distance tables, and the exact re-rank. */
  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }

  /** `bits`-bit random-hyperplane (sign) LSH bucket — the partition key for
    * ANN bucketing and embedding near-dup candidate generation (SimHash for
    * cosine, Charikar 2002 §3: bit j = sign(v · r_j) for a pseudo-random
    * hyperplane r_j).
    *
    * Replaces the earlier sign-of-first-8-coords `bucket8`, which was
    * data-DEPENDENT (a post-ReLU / all-positive corpus collapsed into one
    * bucket → one quadratic task at scale) and hard-capped at 256 buckets.
    * Here the hyperplanes are seeded pseudo-random, so bucket occupancy is
    * balanced regardless of the corpus sign structure, and `bits` scales the
    * key cardinality with the data (2^bits buckets); multiple seeds give
    * independent tables for multi-band recall (the t07 minhash-band
    * pattern).
    *
    * Hyperplane weights are INTEGER-valued (symmetric uniform in
    * [-2^30, 2^30), via a multiply–xor-shift hash mod 2^31) rather than
    * float Gaussians: every step is exact in 64-bit integer arithmetic, so
    * an SQL oracle (DuckDB) regenerates bit-identical weights — a
    * transcendental PRNG (sin/ln/Box–Muller) would risk cross-engine 1-ulp
    * differences flipping the sign on near-zero dots. Uniform (vs Gaussian)
    * components trade the exact 1−θ/π angular collision probability for a
    * still-monotone-in-angle approximation — recall is gated empirically
    * (e05). The dot accumulates left-to-right like [[dot]], preserving the
    * bit-identical-with-DuckDB FP contract above.
    *
    * Contract: `bits` in [1, 63], `seed` >= 0 (both engines' `%` agree on
    * non-negative operands).
    */
  def bucketk(a: ArrayData, bits: Int, seed: Long): Long = {
    require(bits >= 1 && bits <= 63, s"bucketk: bits must be in [1, 63], got $bits")
    require(seed >= 0, s"bucketk: seed must be >= 0 (oracle % parity), got $seed")
    val n = a.numElements()
    var acc = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * weight(seed, j, i); i += 1 }
      if (s > 0.0) acc |= (1L << j)
      j += 1
    }
    acc
  }

  /** Multi-probe LSH probe sequence (Lv et al. 2007, VLDB): the base
    * [[bucketk]] bucket followed by the buckets reached by flipping the
    * sign bits whose hyperplane margin |v·r_j| is SMALLEST — the bits most
    * likely to disagree between two near-identical vectors. Probing
    * `nprobe` buckets per query recovers most of the recall of `nprobe`
    * independent hash tables while the CORPUS side stays bucketed exactly
    * once — at 100 TB that is the difference between re-shuffling the
    * corpus per table and shipping only the (tiny) probe side `nprobe`×.
    *
    * Determinism contract: margins are the same left-to-right ordered-fold
    * dots as [[bucketk]] (bit-identical in DuckDB — see the integer-weight
    * rationale there), and the probe order sorts by (|margin| ASC, j ASC),
    * so an exact |margin| tie (possible: two planes can both score 0 on a
    * sparse vector) breaks on the plane index identically in both engines.
    * Returned buckets are pairwise distinct by construction (base +
    * distinct single-bit flips), so a corpus vector — which lives in
    * exactly one bucket — matches at most one probe: no candidate dedup
    * step is needed downstream.
    *
    * Contract: `bits` in [1, 63], `seed` >= 0, `nprobe` in [1, bits+1].
    */
  def bucketProbes(a: ArrayData, bits: Int, seed: Long, nprobe: Int): ArrayData = {
    require(nprobe >= 1 && nprobe <= bits + 1,
      s"bucketProbes: nprobe must be in [1, bits+1], got $nprobe (bits=$bits)")
    require(bits >= 1 && bits <= 63, s"bucketProbes: bits must be in [1, 63], got $bits")
    require(seed >= 0, s"bucketProbes: seed must be >= 0, got $seed")
    val n = a.numElements()
    val margin = new Array[Double](bits)
    var base = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * weight(seed, j, i); i += 1 }
      if (s > 0.0) base |= (1L << j)
      margin(j) = math.abs(s)
      j += 1
    }
    val order = Array.range(0, bits).sortBy(j => (margin(j), j))
    val out = new Array[Long](nprobe)
    out(0) = base
    var t = 1
    while (t < nprobe) { out(t) = base ^ (1L << order(t - 1)); t += 1 }
    new GenericArrayData(out)
  }

  /** Pseudo-random integer weight for hyperplane `j`, coordinate `i`:
    * multiply–xor-shift mod 2^31 (Knuth/xxHash multipliers), centered to
    * [-2^30, 2^30). All intermediates < 2^63 (no overflow) and all steps
    * are plain BIGINT ops (`%`, `*`, `xor`, `>>`) an SQL engine replays
    * exactly — see the e02/e03 oracle SQL `planes` CTE in SparkEntry.
    */
  private def weight(seed: Long, j: Int, i: Int): Double = {
    val M = 2147483648L // 2^31
    var h = (seed * 1000003L + j.toLong * 4099L + i.toLong) % M
    h = (h * 2654435761L) % M
    h ^= (h >> 15)
    h = (h * 2246822519L) % M
    h ^= (h >> 13)
    (h - 1073741824L).toDouble
  }
}
