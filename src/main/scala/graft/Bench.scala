package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds at the
  * SPARK_GRAFT_SF_DIR scale factor.
  *
  * Queries are materialized through the `noop` sink: a bare `.count()` would
  * let Catalyst prune every projected column (st_* kernels included) and
  * benchmark nothing but the scan. `noop` forces full evaluation of the
  * final plan while writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // keep stdout parseable: the JSON result line must not drown in WARNs

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: JVM + codegen + parquet footer caches
    run(SparkEntry.entry(spark))

    // optional arg: comma-separated query-name filter (local iteration only)
    val only: Set[String] = args.headOption.map(_.split(",").toSet).getOrElse(Set.empty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // cache hygiene between queries: queries that persist intermediates
      // (t03's n-gram cache, t07's signature checkpoint, knn/CC round
      // checkpoints) must not carry pinned blocks into the next measurement
      graft.core.Blocks.scrub(spark)
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
