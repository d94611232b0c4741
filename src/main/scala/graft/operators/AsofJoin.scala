package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: match each left row to the nearest right row in
  * time, per key — the time-series join Spark lacks natively (pandas
  * `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Topology (the part that matters at 100 TB): tag both inputs, union, and
  * shuffle ONCE on the join keys; within each hash partition a window sorted
  * by (ts, side) carries the most recent right-row payload forward with
  * `last_value(ignoreNulls)`. Cost = one shuffle of |L| + |R| rows plus a
  * per-partition sort — no range-condition cross join (Spark would otherwise
  * plan `t1.ts >= t2.ts` as BNLJ), no per-key `collect_list`. Key skew is
  * the same hazard as any keyed window: salt the hot key upstream if one key
  * dominates a partition.
  *
  * Semantics:
  *  - backward (default): latest right row with `r.ts <= l.ts` (inclusive;
  *    DuckDB `ASOF LEFT JOIN … ON l.ts >= r.ts` and pandas default)
  *  - forward: earliest right row with `r.ts >= l.ts`
  *  - nearest: whichever of the backward/forward candidates is closer in
  *    absolute time (pandas `direction='nearest'`); an exact tie goes to
  *    the backward candidate. Tolerance applies per candidate BEFORE the
  *    choice, so an out-of-tolerance backward match never shadows an
  *    in-tolerance forward one. Still ONE shuffle: both scans are windows
  *    over the same hash partitioning (two per-partition sorts, zero extra
  *    exchanges).
  *  - left outer: unmatched left rows keep NULL right columns
  *  - tolerance: optional max |l.ts − r.ts| in microseconds; matches farther
  *    than that are nulled out (pandas `tolerance=`)
  *  - ties: right rows sort before left rows at an equal timestamp, so an
  *    equal-ts right row IS visible to the left row; among several right
  *    rows with identical (key, ts) the payload struct's natural ordering
  *    decides deterministically.
  */
object AsofJoin {

  /** @param keys       equi-join key column names (present in both inputs)
    * @param leftTs     left timestamp column (TimestampType or any ordered type)
    * @param rightTs    right timestamp column
    * @param rightCols  right payload columns to surface on matches
    * @param prefix     prefix for surfaced right columns (payload + its ts)
    * @param direction  "backward" | "forward"
    * @param toleranceMicros max |l.ts − r.ts| for a match to stand (None = ∞)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           prefix: String = "r_", direction: String = "backward",
           toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward" || direction == "nearest",
      s"direction must be backward|forward|nearest, got $direction")
    val backward = direction == "backward"

    // right payload travels as one struct (ts first: it also breaks ties
    // between identical-(key, ts) right rows deterministically)
    val payload = struct((col(rightTs).as("__rts") +: rightCols.map(col)): _*)

    // build with matching schemas: (keys, __ts, __side, __lrow, __rv)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val rvSchema = right.select(payload.as("__rv")).schema("__rv").dataType
    val lrowSchema = l2.schema("__lrow").dataType
    val lFull = l2.withColumn("__rv", lit(null).cast(rvSchema))
    val rFull = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lrowSchema).as("__lrow"), payload.as("__rv")): _*)

    val unioned = lFull.unionByName(rFull)

    // one shuffle: hash-partition by keys, sort by time (right before left at
    // equal ts — in backward order ascending side 0 first; in forward we scan
    // time-descending so side 0 must STILL precede left rows at equal ts)
    val bOrd: Seq[Column] = Seq(col("__ts").asc, col("__side").asc, col("__rv").asc)
    val fOrd: Seq[Column] = Seq(col("__ts").desc, col("__side").asc, col("__rv").desc)
    def win(ord: Seq[Column]) = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def tolerated(m: Column, lagMicros: Column): Column = toleranceMicros match {
      case Some(tol) => when(m.isNotNull && lagMicros <= tol, m)
      case None      => m
    }
    def bLag(m: Column) = unix_micros(col("__ts")) - unix_micros(m.getField("__rts"))
    def fLag(m: Column) = unix_micros(m.getField("__rts")) - unix_micros(col("__ts"))

    val withTol =
      if (direction == "nearest") {
        // both candidate scans ride the SAME hash partitioning — Spark plans
        // one Exchange with two per-partition sorts, not two shuffles
        val m = unioned
          .withColumn("__bm", last(col("__rv"), ignoreNulls = true).over(win(bOrd)))
          .withColumn("__fm", last(col("__rv"), ignoreNulls = true).over(win(fOrd)))
          .where(col("__side") === 1)
          .withColumn("__bm", tolerated(col("__bm"), bLag(col("__bm"))))
          .withColumn("__fm", tolerated(col("__fm"), fLag(col("__fm"))))
        m.withColumn("__match",
          when(col("__bm").isNotNull &&
               (col("__fm").isNull || bLag(col("__bm")) <= fLag(col("__fm"))),
            col("__bm")).otherwise(col("__fm")))
      } else {
        val matched = unioned
          .withColumn("__match",
            last(col("__rv"), ignoreNulls = true).over(win(if (backward) bOrd else fOrd)))
          .where(col("__side") === 1)
        val lagMicros = if (backward) bLag(col("__match")) else fLag(col("__match"))
        matched.withColumn("__match", tolerated(col("__match"), lagMicros))
      }

    // unpack: left.* then prefixed right ts + payload columns
    val out = withTol.select(
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        (col("__match.__rts").as(s"$prefix$rightTs") +:
          rightCols.map(c => col(s"__match.$c").as(s"$prefix$c"))): _*)
    out
  }

  /** Time-weighted as-of INTERPOLATION: each left row gets the right
    * side's `valueCol` linearly interpolated between its bracketing right
    * rows — v_b + (v_f − v_b) · (t − t_b)/(t_f − t_b) — the sensor/market
    * "sample a continuous signal at these timestamps" join
    * (pandas `DataFrame.interpolate` meets merge_asof). Edge semantics:
    * only a backward row → its value (hold-last); only a forward row →
    * its value (backfill); neither → NULL; an exact-timestamp hit
    * interpolates to that row's value (fraction 0). Same ONE-shuffle
    * topology as the nearest direction: two windows over one hash
    * partitioning. Output: left columns + `{prefix}value` (double). */
  def interpolate(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, valueCol: String,
                  prefix: String = "r_"): DataFrame = {
    val payload = struct(col(rightTs).as("__rts"), col(valueCol).cast("double").as("__v"))
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val rvSchema = right.select(payload.as("__rv")).schema("__rv").dataType
    val lrowSchema = l2.schema("__lrow").dataType
    val lFull = l2.withColumn("__rv", lit(null).cast(rvSchema))
    val rFull = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lrowSchema).as("__lrow"), payload.as("__rv")): _*)
    val unioned = lFull.unionByName(rFull)
    val bOrd: Seq[Column] = Seq(col("__ts").asc, col("__side").asc, col("__rv").asc)
    val fOrd: Seq[Column] = Seq(col("__ts").desc, col("__side").asc, col("__rv").desc)
    def win(ord: Seq[Column]) = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = unioned
      .withColumn("__bm", last(col("__rv"), ignoreNulls = true).over(win(bOrd)))
      .withColumn("__fm", last(col("__rv"), ignoreNulls = true).over(win(fOrd)))
      .where(col("__side") === 1)
    val tb = unix_micros(col("__bm.__rts")).cast("double")
    val tf = unix_micros(col("__fm.__rts")).cast("double")
    val t = unix_micros(col("__ts")).cast("double")
    val vb = col("__bm.__v")
    val vf = col("__fm.__v")
    val interp =
      when(col("__bm").isNotNull && col("__fm").isNotNull && tf =!= tb,
        vb + (vf - vb) * ((t - tb) / (tf - tb)))
      .when(col("__bm").isNotNull && col("__fm").isNotNull, vb) // tf == tb: exact hit
      .when(col("__bm").isNotNull, vb)   // hold-last beyond the final right row
      .when(col("__fm").isNotNull, vf)   // backfill before the first right row
    m.select(left.columns.map(c => col(s"__lrow.$c").as(c)) :+
      interp.as(s"${prefix}value"): _*)
  }
}
