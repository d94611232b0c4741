package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GeoFunctions

/** Driver contract — queries + DuckDB-oracle SQL (see SURVEY.md §7).
  *
  * Every query is written so its result is bit-deterministic across engines:
  *  - money sums go through DECIMAL(18,6) (exact, tie-free rounding)
  *  - integral measures aggregate as BIGINT
  *  - irrational outputs (distances, mercator y) are ROUND()ed with the
  *    rounding margin chosen against the cross-engine libm error (~1 ulp)
  *  - every result has a total ORDER BY
  * DuckDB has no spatial extension in this environment, so geometry oracles
  * are closed-form math over the same synthesized coordinates.
  */
object SparkEntry {

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def views(s: SparkSession, dir: String): Unit = {
    GeoFunctions.register(s)
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    // rejects; read nanos as long and re-expose as microsecond timestamp
    // (DuckDB truncates ns→µs identically).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { n =>
      val df = s.read.parquet(s"$dir/$n.parquet")
      if (n == "events")
        df.selectExpr("event_id", "timestamp_micros(CAST(ts / 1000 AS BIGINT)) AS ts",
          "user_id", "event_type", "value", "props").createOrReplaceTempView(n)
      else df.createOrReplaceTempView(n)
    }
  }

  private def q(sqlText: String): (SparkSession, String) => DataFrame =
    (s, dir) => { views(s, dir); s.sql(sqlText) }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY.md §7 "minimum end-to-end slice": spatial filter → measure →
    * aggregate, over a real table. */
  def entry(spark: SparkSession): DataFrame = {
    views(spark, "/root/testdata/sf0.001")
    spark.sql("""
      SELECT l_returnflag,
             COUNT(*) AS n,
             ROUND(MIN(ST_X(pt)), 6) AS min_x,
             ROUND(MAX(ST_Distance(pt, ST_Point(0, 0))), 6) AS max_d
      FROM (SELECT l_returnflag,
                   ST_Point(CAST(l_partkey % 100 AS DOUBLE),
                            CAST(l_suppkey % 100 AS DOUBLE)) AS pt
            FROM lineitem)
      WHERE ST_Contains(ST_GeomFromText('POLYGON((-1 -1, 120 -1, 120 120, -1 120, -1 -1))'), pt)
      GROUP BY l_returnflag ORDER BY l_returnflag
    """)
  }

  // ── relational floor (Spark built-ins; SURVEY.md §2.8) ────────────────

  private val q01Spark = """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  private val q01Duck = """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)::DOUBLE AS sum_base_price,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)::DOUBLE AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  private val q02Spark = """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                          (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o_orderkey) AS orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  private val q02Duck = """
    SELECT n_name,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)::DOUBLE AS revenue,
           COUNT(DISTINCT o_orderkey)::BIGINT AS orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name"""

  private val q03Spark = """
    SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 3 ORDER BY o_custkey, rnk"""

  private val q03Duck = """
    SELECT o_custkey, o_orderkey, rnk::BIGINT AS rnk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 3 ORDER BY o_custkey, rnk"""

  private val q04Spark = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val q04Duck = """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val q05Spark = """
    SELECT p_brand,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt,
           SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  private val q05Duck = """
    SELECT p_brand,
           COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt,
           SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  // ── geometry kernels over synthesized coordinates ─────────────────────
  // (oracle = closed-form math; DuckDB spatial is unavailable by design)

  private val g01Spark = """
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(MIN(d), 6) AS min_d, ROUND(MAX(d), 6) AS max_d,
           ROUND(AVG(d), 6) AS avg_d
    FROM (SELECT l_returnflag,
                 ST_Distance(ST_Point(CAST(l_partkey % 100 AS DOUBLE),
                                      CAST(l_suppkey % 100 AS DOUBLE)),
                             ST_Point(50.0, 50.0)) AS d
          FROM lineitem) t
    GROUP BY l_returnflag ORDER BY l_returnflag"""

  private val g01Duck = """
    SELECT l_returnflag, COUNT(*)::BIGINT AS n,
           ROUND(MIN(d), 6) AS min_d, ROUND(MAX(d), 6) AS max_d,
           ROUND(AVG(d), 6) AS avg_d
    FROM (SELECT l_returnflag,
                 sqrt((CAST(l_partkey % 100 AS DOUBLE) - 50.0) * (CAST(l_partkey % 100 AS DOUBLE) - 50.0)
                    + (CAST(l_suppkey % 100 AS DOUBLE) - 50.0) * (CAST(l_suppkey % 100 AS DOUBLE) - 50.0)) AS d
          FROM lineitem) t
    GROUP BY l_returnflag ORDER BY l_returnflag"""

  private val g02Spark = """
    SELECT p_brand,
           SUM(CAST(ST_Area(ST_MakeEnvelope(0.0, 0.0,
                 CAST(p_size AS DOUBLE), CAST(p_size + 3 AS DOUBLE))) AS BIGINT)) AS area_sum,
           COUNT(*) AS n
    FROM part GROUP BY p_brand ORDER BY p_brand"""

  private val g02Duck = """
    SELECT p_brand,
           SUM(CAST(p_size * (p_size + 3) AS BIGINT))::BIGINT AS area_sum,
           COUNT(*)::BIGINT AS n
    FROM part GROUP BY p_brand ORDER BY p_brand"""

  private val g03Spark = """
    SELECT /*+ BROADCAST(zones) */ n_name, COUNT(*) AS n
    FROM (SELECT CAST(c_custkey % 100 AS DOUBLE) AS px,
                 CAST((c_custkey * 7) % 100 AS DOUBLE) AS py
          FROM customer) pts
    JOIN (SELECT n_name,
                 (n_nationkey % 5) * 20.0 AS zxmin,
                 FLOOR(n_nationkey / 5) * 20.0 AS zymin
          FROM nation) zones
      ON ST_Covers(ST_MakeEnvelope(zxmin, zymin, zxmin + 20.0, zymin + 20.0),
                   ST_Point(px, py))
    GROUP BY n_name ORDER BY n_name"""

  private val g03Duck = """
    SELECT n_name, COUNT(*)::BIGINT AS n
    FROM (SELECT CAST(c_custkey % 100 AS DOUBLE) AS px,
                 CAST((c_custkey * 7) % 100 AS DOUBLE) AS py
          FROM customer) pts
    JOIN (SELECT n_name,
                 (n_nationkey % 5) * 20.0 AS zxmin,
                 FLOOR(n_nationkey / 5) * 20.0 AS zymin
          FROM nation) zones
      ON px >= zxmin AND px <= zxmin + 20.0 AND py >= zymin AND py <= zymin + 20.0
    GROUP BY n_name ORDER BY n_name"""

  // ── registry ──────────────────────────────────────────────────────────

  private val all: Seq[(String, String, String)] = Seq(
    ("q01_pricing_summary", q01Spark, q01Duck),
    ("q02_revenue_by_nation", q02Spark, q02Duck),
    ("q03_top_orders_per_cust", q03Spark, q03Duck),
    ("q04_priority_exists", q04Spark, q04Duck),
    ("q05_brand_supplier_stats", q05Spark, q05Duck),
    ("g01_point_distance", g01Spark, g01Duck),
    ("g02_rect_area", g02Spark, g02Duck),
    ("g03_zone_contains_join", g03Spark, g03Duck),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, sparkSql, _) => name -> q(sparkSql) }.toMap

  def oracleSql: Map[String, String] =
    all.map { case (name, _, duck) => name -> duck.trim }.toMap
}
