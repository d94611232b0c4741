package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 scale sanity for the operators whose INTERNALS changed this
  * round (ScaleSlope covers t07/g33/q16/e13, not these): connected
  * components (observed signatures + window stars) and the kNN join
  * (duplicate-aware r0, reference-point dedup, fused round jobs) at
  * inputs 100-1000× the bench fixtures. Prints one line per case with
  * wall seconds and a correctness probe — evidence the reworked shapes
  * hold away from the sf0.1 scale, not just at it.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALECHECK $name wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // ── components: 2M-edge chain forest (40k chains × 50 nodes) through
    // runStars — the t50 topology at 2000× the fixture edges
    locally {
      val edges = spark.range(2000000).toDF("id")
        .where(col("id") % 50 =!= 49)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val comp = timed("runStars_2M_chain_forest") {
        val c = graft.operators.ConnectedComponents.runStars(edges, "src", "dst")
        c.count(); c
      }
      val bad = comp.where(col("component") =!= (col("id") - (col("id") % 50))).count()
      println(s"SCALECHECK runStars_2M correctness: mislabeled=$bad (expect 0)")
      graft.core.Blocks.scrub(spark, blocking = true)
    }

    // ── components: min-label path on 200k quasi-cliques (the near-dup
    // regime run() serves) — 1.8M edges, diameter 2
    locally {
      val edges = spark.range(1800000).toDF("id")
        .select((col("id") / 9).cast("long").as("grp"), (col("id") % 9).as("m"))
        .select((col("grp") * 10).as("src"), (col("grp") * 10 + col("m") + 1).as("dst"))
      val comp = timed("run_minlabel_200k_cliques") {
        val c = graft.operators.ConnectedComponents.run(edges, "src", "dst")
        c.count(); c
      }
      val bad = comp.where(col("component") =!= (col("id") - pmod(col("id"), lit(10)))).count()
      println(s"SCALECHECK run_minlabel correctness: mislabeled=$bad (expect 0)")
      graft.core.Blocks.scrub(spark, blocking = true)
    }

    // ── kNN: 1M right points (with 4× duplication — the ndv path), 20k
    // left, k=3; probe: every left row resolves exactly k neighbors and
    // ranks are 1..k
    locally {
      graft.functions.GeoFunctions.register(spark)
      val right = spark.range(1000000).toDF("rid")
        .withColumn("rg", call_function("st_point",
          (col("rid") % 250000).cast("double") % 500.0,
          floor((col("rid") % 250000) / 500).cast("double")))
      val left = spark.range(20000).toDF("lid")
        .withColumn("lg", call_function("st_point",
          (col("lid") % 500).cast("double") + 0.25,
          (col("lid") % 400).cast("double") + 0.25))
      val out = timed("knn_1M_right_20k_left_k3") {
        val o = graft.operators.SpatialJoin.knn(left, right, "lg", "rg", 3, "lid", "rid")
        o.localCheckpoint(true)
      }
      val perLeft = out.groupBy("lid").agg(count(lit(1)).as("n"), max("knn_rank").as("mr"))
      val bad = perLeft.where(col("n") =!= 3 || col("mr") =!= 3).count()
      println(s"SCALECHECK knn_1M correctness: bad-left-rows=$bad (expect 0)")
    }

    spark.stop()
  }
}
