package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Distributed interval (range/band) join: match left row `l` to every right
  * row `r` with `r.ts ∈ [l.ts + lo, l.ts + hi]` (both ends inclusive),
  * optionally under equi-keys — the "events within a time window of other
  * events" join. Spark plans a bare range predicate as
  * BroadcastNestedLoopJoin — O(|L|·|R|) — unless one side is broadcastable;
  * this operator makes it a single hash-shuffle join instead.
  *
  * Topology (the 100 TB shape): band-bucket both sides with bucket width
  * `w = hi - lo`. A right row lands in exactly ONE bucket
  * (`floorDiv(r.ts, w)`); a left row probes exactly TWO consecutive buckets
  * (`floorDiv(l.ts + lo, w)` and that + 1 — the window can span at most one
  * bucket boundary because its length equals the bucket width). Equi-join on
  * (keys…, bucket), then refine with the exact range predicate. Cost = one
  * shuffle of |R| + 2|L| rows keyed by (keys, bucket); no row is matched
  * twice (the right row's single bucket makes candidate pairs unique), so no
  * dedup pass. Skew: with empty `keys` a burst of events inside one
  * window-width becomes one hot bucket — pass keys (or salt upstream) when
  * the timeline is concentrated, exactly like any keyed shuffle.
  *
  * Bucket arithmetic is exact integer math: `x - pmod(x, w)` is divisible by
  * `w`, so SQL `div` introduces no floating-point rounding (micros since
  * epoch ≈ 1.7e18 exceeds a double's 2^53 mantissa — `floor(x / w)` would
  * mis-bucket).
  */
object RangeJoin {

  /** @param left      probe side (each row opens a window)
    * @param right     match side (each row has a point timestamp)
    * @param keys      equi-join key column names present in both inputs
    *                  (empty = pure time-band join)
    * @param leftTs    left timestamp column (TimestampType, or integral)
    * @param rightTs   right timestamp column
    * @param loMicros  window start offset from l.ts, microseconds (≤ hi)
    * @param hiMicros  window end offset from l.ts, microseconds
    * @param rightCols right payload columns to surface on matches
    * @param prefix    prefix for the surfaced right ts + payload columns
    * @return inner-join rows: all left columns, then `prefix+rightTs`,
    *         then prefixed payload columns
    */
  def interval(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               loMicros: Long, hiMicros: Long,
               rightCols: Seq[String], prefix: String = "r_"): DataFrame = {
    require(hiMicros > loMicros,
      s"window must have positive length, got [$loMicros, $hiMicros]")
    val w = hiMicros - loMicros

    def micros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast(LongType)
    }
    // exact floorDiv(x, w) on longs: x - pmod(x, w) is a multiple of w
    def bucketOf(c: String): Column = expr(s"($c - pmod($c, ${w}L)) div ${w}L")

    val l2 = left
      .withColumn("__lus", micros(left, leftTs))
      .withColumn("__wlo", col("__lus") + lit(loMicros))
      .withColumn("__b0", bucketOf("__wlo"))
      // window length == bucket width → candidates live in __b0 or __b0+1
      .withColumn("__b", explode(array(col("__b0"), col("__b0") + lit(1L))))

    val r2 = right.select(
      keys.map(col) ++ Seq(
        micros(right, rightTs).as("__rus"),
        col(rightTs).as("__rts"),
        struct(rightCols.map(col): _*).as("__rv")): _*)
      .withColumn("__b", bucketOf("__rus"))

    val cond = (keys.map(k => l2(k) === r2(k)) :+ (l2("__b") === r2("__b")))
      .reduce(_ && _)
    val joined = l2.join(r2, cond, "inner")
      .where(col("__rus").between(col("__wlo"), col("__lus") + lit(hiMicros)))

    joined.select(
      left.columns.map(c => l2(c).as(c)) ++
        (col("__rts").as(s"$prefix$rightTs") +:
          rightCols.map(c => col(s"__rv.$c").as(s"$prefix$c"))): _*)
  }
}
