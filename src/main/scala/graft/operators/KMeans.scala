package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

import graft.core.Blocks

/** Distributed k-means over geometry centroids (the PostGIS
  * `ST_ClusterKMeans` capability as a DataFrame transform), built
  * DETERMINISTIC over adaptive:
  *
  *  - seeding: the k smallest-id rows' coordinates (no RNG — stable
  *    across runs, partitionings, and engines);
  *  - fixed iteration count (no convergence test whose float epsilon
  *    could flip between engines);
  *  - re-centroiding sums FLOOR(coord·1e6) as DECIMAL(38,0) (the
  *    e13/SemDeDup discipline, widened past Long so ~5e10-row clusters
  *    cannot wrap): integer sums are order-independent, so the centroid
  *    doubles — and therefore every assignment — are bit-reproducible
  *    and DuckDB can replay the whole unrolled recursion (oracle g122);
  *  - argmin ties break toward the smallest cluster index (strict `<`
  *    scan), mirrored by the oracle's ORDER BY dist, cid.
  *
  * Scale shape at 100 TB: per iteration ONE map-side-combined aggregate
  * over the points (k·3 longs of partial state per task) and a k-row
  * collect + broadcast — the PageRank-style unrolled driver loop; the
  * points never shuffle. k is driver-bounded (≤ 65,536).
  */
object KMeans {

  /** argmin over the broadcast centroid arrays — a codegen'd StaticInvoke
    * (registered as `graft_nearest_centroid`), strict `<` so ties keep
    * the smallest index. */
  def nearestCentroid(x: Double, y: Double, xs: ArrayData, ys: ArrayData): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      val dx = x - xs.getDouble(i)
      val dy = y - ys.getDouble(i)
      val d = dx * dx + dy * dy
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Append `cluster_id` (int in [0, k); null for null/EMPTY geometry) to
    * `df`. Non-point geometries cluster by their centroid, the PostGIS
    * convention for areal/lineal inputs. */
  def cluster(df: DataFrame, idCol: String, geomCol: String,
              k: Int, iters: Int = 10): DataFrame = {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
    require(iters >= 0 && iters <= 1000, s"iters must be in [0, 1000], got $iters")
    val spark = df.sparkSession
    graft.functions.GeoFunctions.register(spark)
    val (pts, _) = Blocks.checkpoint(
      df.select(col(idCol).cast("long").as("__km_id"), col(geomCol).as("__km_g"))
        .where(col("__km_g").isNotNull && !call_function("st_isempty", col("__km_g")))
        .select(col("__km_id"),
          call_function("st_x", call_function("st_centroid", col("__km_g"))).as("__km_x"),
          call_function("st_y", call_function("st_centroid", col("__km_g"))).as("__km_y"))
        // a NaN centroid ordinate (degenerate geometry) would become a null
        // addend that SUM skips while count() still counts the row, skewing
        // the mean — exclude it up front like null/EMPTY
        .where(!isnan(col("__km_x")) && !isnan(col("__km_y"))))

    var cents: Array[(Double, Double)] =
      pts.orderBy("__km_id").limit(k).collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))
    require(cents.nonEmpty, "ST_ClusterKMeans: no non-empty geometries to seed from")

    def assigned = {
      val xs = lit(cents.map(_._1))
      val ys = lit(cents.map(_._2))
      pts.withColumn("__km_c",
        call_function("graft_nearest_centroid",
          col("__km_x"), col("__km_y"), xs, ys))
    }

    var it = 0
    while (it < iters) {
      // integer-exact partial sums: order-independent across tasks, so
      // the division below yields the same doubles on every run/engine.
      // DECIMAL(38,0), not BIGINT: a cluster of ~5e10 rows at |coord|~180
      // (well inside 100-TB scale) would silently wrap a non-ANSI Long sum
      val sums = assigned.groupBy("__km_c").agg(
        sum(floor(col("__km_x") * 1e6).cast("decimal(38,0)")).as("sx"),
        sum(floor(col("__km_y") * 1e6).cast("decimal(38,0)")).as("sy"),
        count(lit(1)).as("n")).collect()
      val next = cents.clone()
      sums.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(3)
        next(c) = ((r.getDecimal(1).doubleValue() / n) / 1e6,
                   (r.getDecimal(2).doubleValue() / n) / 1e6)
      }
      cents = next // empty clusters keep their previous centroid
      it += 1
    }

    val labels = assigned.select(col("__km_id"), col("__km_c").as("cluster_id"))
    df.join(labels, df(idCol).cast("long") === col("__km_id"), "left")
      .drop("__km_id")
  }
}
