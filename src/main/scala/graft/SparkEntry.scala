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

  private val q06Spark = """
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region, nation"""

  private val q06Duck = """
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)::DOUBLE AS total,
           COUNT(*)::BIGINT AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region, nation"""

  private val q07Spark = """
    SELECT date_format(window.start, 'yyyy-MM-dd HH:mm') AS hour_start, event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
    FROM (SELECT window(ts, '1 hour') AS window, event_type, value FROM events) t
    GROUP BY window, event_type
    ORDER BY hour_start, event_type
    LIMIT 500"""

  private val q07Duck = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start, event_type,
           COUNT(*)::BIGINT AS n,
           ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    LIMIT 500"""

  private val g04Spark = """
    SELECT CAST(1 + s_suppkey % 3 AS DOUBLE) AS r, COUNT(*) AS n,
           ROUND(MIN(a), 6) AS buf_area
    FROM (SELECT s_suppkey,
                 ST_Area(ST_Buffer(ST_Point(CAST(s_suppkey AS DOUBLE), 0.0),
                                   CAST(1 + s_suppkey % 3 AS DOUBLE))) AS a
          FROM supplier) t
    GROUP BY 1 ORDER BY r"""

  private val g04Duck = """
    SELECT CAST(1 + s_suppkey % 3 AS DOUBLE) AS r, COUNT(*)::BIGINT AS n,
           ROUND(MIN(0.5 * 32 * (1 + s_suppkey % 3) * (1 + s_suppkey % 3)
                     * sin(2 * pi() / 32)), 6) AS buf_area
    FROM supplier
    GROUP BY 1 ORDER BY r"""

  private val g05Spark = """
    SELECT o_orderpriority,
           SUM(CAST(2 * ST_X(c) AS BIGINT)) AS sum_2cx,
           SUM(CAST(2 * ST_Y(c) AS BIGINT)) AS sum_2cy,
           COUNT(*) AS n
    FROM (SELECT o_orderpriority,
                 ST_Centroid(ST_MakeEnvelope(
                   CAST(o_orderkey % 50 AS DOUBLE), CAST(o_orderkey % 30 AS DOUBLE),
                   CAST(o_orderkey % 50 + 1 + o_orderkey % 7 AS DOUBLE),
                   CAST(o_orderkey % 30 + 2 + o_orderkey % 5 AS DOUBLE))) AS c
          FROM orders) t
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val g05Duck = """
    SELECT o_orderpriority,
           SUM(CAST(2 * (o_orderkey % 50) + 1 + o_orderkey % 7 AS BIGINT))::BIGINT AS sum_2cx,
           SUM(CAST(2 * (o_orderkey % 30) + 2 + o_orderkey % 5 AS BIGINT))::BIGINT AS sum_2cy,
           COUNT(*)::BIGINT AS n
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val g06Spark = """
    SELECT c_mktsegment,
           MIN(ST_XMin(pt)) AS xmin, MIN(ST_YMin(pt)) AS ymin,
           MAX(ST_XMax(pt)) AS xmax, MAX(ST_YMax(pt)) AS ymax,
           COUNT(*) AS n
    FROM (SELECT c_mktsegment,
                 ST_Point(CAST(c_custkey % 97 AS DOUBLE),
                          CAST((c_custkey * 13) % 89 AS DOUBLE)) AS pt
          FROM customer) t
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  private val g06Duck = """
    SELECT c_mktsegment,
           MIN(CAST(c_custkey % 97 AS DOUBLE)) AS xmin,
           MIN(CAST((c_custkey * 13) % 89 AS DOUBLE)) AS ymin,
           MAX(CAST(c_custkey % 97 AS DOUBLE)) AS xmax,
           MAX(CAST((c_custkey * 13) % 89 AS DOUBLE)) AS ymax,
           COUNT(*)::BIGINT AS n
    FROM customer
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  private val g07Spark = """
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(MIN(len), 6) AS min_len, ROUND(MAX(len), 6) AS max_len,
           ROUND(AVG(len), 6) AS avg_len
    FROM (SELECT o_orderstatus,
                 ST_Length(ST_MakeLine(
                   ST_Point(CAST(o_orderkey % 61 AS DOUBLE), CAST(o_orderkey % 53 AS DOUBLE)),
                   ST_Point(CAST(o_custkey % 47 AS DOUBLE), CAST(o_custkey % 43 AS DOUBLE)))) AS len
          FROM orders) t
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  private val g07Duck = """
    SELECT o_orderstatus, COUNT(*)::BIGINT AS n,
           ROUND(MIN(len), 6) AS min_len, ROUND(MAX(len), 6) AS max_len,
           ROUND(AVG(len), 6) AS avg_len
    FROM (SELECT o_orderstatus,
                 sqrt((CAST(o_custkey % 47 AS DOUBLE) - CAST(o_orderkey % 61 AS DOUBLE))
                    * (CAST(o_custkey % 47 AS DOUBLE) - CAST(o_orderkey % 61 AS DOUBLE))
                    + (CAST(o_custkey % 43 AS DOUBLE) - CAST(o_orderkey % 53 AS DOUBLE))
                    * (CAST(o_custkey % 43 AS DOUBLE) - CAST(o_orderkey % 53 AS DOUBLE))) AS len
          FROM orders) t
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  private val g08Spark = """
    SELECT p_brand,
           SUM(CAST(2 * ST_Area(ST_ConvexHull(ST_Collect(ARRAY(
             ST_Point(0.0, 0.0),
             ST_Point(CAST(p_size AS DOUBLE), 0.0),
             ST_Point(0.0, CAST(p_size + 2 AS DOUBLE)))))) AS BIGINT)) AS sum_2area,
           COUNT(*) AS n
    FROM part GROUP BY p_brand ORDER BY p_brand"""

  private val g08Duck = """
    SELECT p_brand,
           SUM(CAST(p_size * (p_size + 2) AS BIGINT))::BIGINT AS sum_2area,
           COUNT(*)::BIGINT AS n
    FROM part GROUP BY p_brand ORDER BY p_brand"""

  private val g09Spark = """
    SELECT c_custkey, ST_AsText(ST_Point(CAST(c_custkey % 50 AS DOUBLE),
                                         CAST((c_custkey * 3) % 40 AS DOUBLE))) AS wkt
    FROM customer WHERE c_custkey < 50 ORDER BY c_custkey"""

  private val g09Duck = """
    SELECT c_custkey, 'POINT (' || (c_custkey % 50) || ' ' || ((c_custkey * 3) % 40) || ')' AS wkt
    FROM customer WHERE c_custkey < 50 ORDER BY c_custkey"""

  private val g10Spark = """
    SELECT c_nationkey,
           MIN(ST_X(m)) AS min_merc_x,
           ROUND(MIN(ST_Y(m)), 4) AS merc_y,
           COUNT(*) AS n
    FROM (SELECT c_nationkey,
                 ST_Transform(ST_Point(CAST(c_custkey % 360 - 180 AS DOUBLE),
                                       CAST(c_nationkey - 12 AS DOUBLE)),
                              4326, 3857) AS m
          FROM customer) t
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  private val g10Duck = """
    SELECT c_nationkey,
           MIN(CAST(c_custkey % 360 - 180 AS DOUBLE) / 180.0 * (pi() * 6378137.0)) AS min_merc_x,
           ROUND(MIN(ln(tan((90.0 + CAST(c_nationkey - 12 AS DOUBLE)) * pi() / 360.0)) * 6378137.0), 4) AS merc_y,
           COUNT(*)::BIGINT AS n
    FROM customer
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  private val g11Spark = """
    SELECT o_orderpriority, COUNT(*) AS n_parts, SUM(CAST(ST_X(part) AS BIGINT)) AS sum_x
    FROM (SELECT o_orderpriority, explode(ST_Dump(ST_GeomFromText(
            CASE CAST(o_orderkey % 3 AS INT)
              WHEN 0 THEN CONCAT('MULTIPOINT ((', CAST(o_orderkey % 100 AS STRING), ' 0))')
              WHEN 1 THEN CONCAT('MULTIPOINT ((', CAST(o_orderkey % 100 AS STRING), ' 0), (',
                                 CAST(o_orderkey % 100 AS STRING), ' 1))')
              ELSE CONCAT('MULTIPOINT ((', CAST(o_orderkey % 100 AS STRING), ' 0), (',
                          CAST(o_orderkey % 100 AS STRING), ' 1), (',
                          CAST(o_orderkey % 100 AS STRING), ' 2))')
            END))) AS part
          FROM orders) t
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val g11Duck = """
    SELECT o_orderpriority,
           SUM(1 + o_orderkey % 3)::BIGINT AS n_parts,
           SUM((1 + o_orderkey % 3) * (o_orderkey % 100))::BIGINT AS sum_x
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val g12Spark = """
    SELECT CAST(l_linenumber % 2 AS INT) AS parity, COUNT(*) AS n,
           MIN(CAST(ST_NPoints(ST_Simplify(ST_GeomFromText(CONCAT(
             'LINESTRING (0 0, 1 ',
             CASE WHEN l_linenumber % 2 = 1 THEN '0.001' ELSE '0' END,
             ', 2 0)')), 0.0001)) AS BIGINT)) AS npoints
    FROM lineitem GROUP BY 1 ORDER BY parity"""

  private val g12Duck = """
    SELECT CAST(l_linenumber % 2 AS INT) AS parity, COUNT(*)::BIGINT AS n,
           MIN(CASE WHEN l_linenumber % 2 = 1 THEN 3 ELSE 2 END)::BIGINT AS npoints
    FROM lineitem GROUP BY 1 ORDER BY parity"""

  private val g13Spark = """
    SELECT l_linestatus,
           SUM(CAST(ST_Area(ST_Intersection(a, b)) AS BIGINT)) AS inter_area,
           SUM(CAST(ST_Area(ST_Union(a, b)) AS BIGINT)) AS union_area,
           SUM(CAST(ST_Area(ST_Difference(a, b)) AS BIGINT)) AS diff_area,
           SUM(CAST(ST_Area(ST_SymDifference(a, b)) AS BIGINT)) AS symdiff_area
    FROM (SELECT l_linestatus,
                 ST_MakeEnvelope(0.0, 0.0, CAST(10 + l_partkey % 10 AS DOUBLE), 10.0) AS a,
                 ST_MakeEnvelope(CAST(5 + l_suppkey % 10 AS DOUBLE), 0.0, 30.0, 10.0) AS b
          FROM lineitem) t
    GROUP BY l_linestatus ORDER BY l_linestatus"""

  private val g13Duck = """
    SELECT l_linestatus,
           SUM(CAST(GREATEST(0, (10 + l_partkey % 10) - (5 + l_suppkey % 10)) * 10 AS BIGINT))::BIGINT AS inter_area,
           SUM(CAST(((10 + l_partkey % 10) * 10 + (30 - (5 + l_suppkey % 10)) * 10
                     - GREATEST(0, (10 + l_partkey % 10) - (5 + l_suppkey % 10)) * 10) AS BIGINT))::BIGINT AS union_area,
           SUM(CAST(((10 + l_partkey % 10) * 10
                     - GREATEST(0, (10 + l_partkey % 10) - (5 + l_suppkey % 10)) * 10) AS BIGINT))::BIGINT AS diff_area,
           SUM(CAST(((10 + l_partkey % 10) * 10 + (30 - (5 + l_suppkey % 10)) * 10
                     - 2 * GREATEST(0, (10 + l_partkey % 10) - (5 + l_suppkey % 10)) * 10) AS BIGINT))::BIGINT AS symdiff_area
    FROM lineitem
    GROUP BY l_linestatus ORDER BY l_linestatus"""

  private val g14Spark = """
    SELECT o_orderpriority,
           CAST(ST_Area(ST_Union(ST_Collect(collect_list(env)))) AS BIGINT) AS union_area,
           COUNT(*) AS n
    FROM (SELECT o_orderpriority,
                 ST_MakeEnvelope(CAST((o_orderkey % 20) * 10 AS DOUBLE), 0.0,
                                 CAST((o_orderkey % 20) * 10 + 10 AS DOUBLE), 10.0) AS env
          FROM orders) t
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val g14Duck = """
    SELECT o_orderpriority,
           (COUNT(DISTINCT o_orderkey % 20) * 100)::BIGINT AS union_area,
           COUNT(*)::BIGINT AS n
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

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
    ("q06_rollup_revenue", q06Spark, q06Duck),
    ("q07_hourly_events", q07Spark, q07Duck),
    ("g04_buffer_area", g04Spark, g04Duck),
    ("g05_centroid", g05Spark, g05Duck),
    ("g06_extent_agg", g06Spark, g06Duck),
    ("g07_line_length", g07Spark, g07Duck),
    ("g08_convexhull_collect", g08Spark, g08Duck),
    ("g09_wkt_roundtrip", g09Spark, g09Duck),
    ("g10_transform_mercator", g10Spark, g10Duck),
    ("g11_dump_explode", g11Spark, g11Duck),
    ("g12_simplify_npoints", g12Spark, g12Duck),
    ("g13_overlay_areas", g13Spark, g13Duck),
    ("g14_union_agg_tiles", g14Spark, g14Duck),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, sparkSql, _) => name -> q(sparkSql) }.toMap

  def oracleSql: Map[String, String] =
    all.map { case (name, _, duck) => name -> duck.trim }.toMap
}
