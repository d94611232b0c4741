package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-scale gate data generator (round 18, committed so the sf1 gate is
  * reproducible — the round-17/18 sf1 run used an uncommitted session
  * script; this is that script, kept).
  *
  * Replicates an existing scale factor N× with KEY-SHIFTED copies:
  * every BIGINT entity key shifts by copy·1e7 (a power-of-ten far above
  * any base key), so FK relationships (orders→customer,
  * lineitem→orders/part/supplier, events→user) stay intact WITHIN each
  * copy and never collide across copies. Dimension tables (region,
  * nation) stay single-copy — their keys are the small FK domain every
  * copy shares. Embedding vectors get a deterministic per-copy
  * ELEMENT-WISE perturbation (direction changes, not just scale — cosine
  * is scale-invariant, so a uniform factor would leave every copy an
  * exact near-duplicate of its original and flood near-dup oracles with
  * pairs their closed forms cannot model).
  *
  * Usage: sbt "Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sf1 10"
  */
object ScaleGen {

  private val Off = 10000000L // key shift per copy; > every base key

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = args match {
      case Array(a, b, c) => (a, b, c.toInt)
      case _ => ("/root/testdata/sf0.1", "/tmp/sf1", 10)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dims: single copy
    write(read("region"), "region")
    write(read("nation"), "nation")

    /** N key-shifted copies; `keys` lists the BIGINT columns to shift. */
    def replicate(t: String, keys: Seq[String]): Unit = {
      val base = read(t)
      val copiesDf = base.crossJoin(
          spark.range(copies.toLong).select(col("id").as("__copy")))
        .select(base.columns.map { c =>
          if (keys.contains(c)) (col(c) + col("__copy") * Off).as(c) else col(c)
        }.toIndexedSeq: _*)
      write(copiesDf, t)
    }

    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"))

    // embeddings: shift vec_id AND perturb each element by a copy- and
    // position-dependent factor so copies are not near-duplicates
    val emb = read("embeddings")
    val embCopies = emb.crossJoin(
        spark.range(copies.toLong).select(col("id").as("__copy")))
      .select(
        (col("vec_id") + col("__copy") * Off).as("vec_id"),
        when(col("__copy") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => i.cast("float")),
            (e, i) => (e * (lit(1.0f) + col("__copy").cast("float") * lit(0.002f) *
              (pmod(i, lit(7.0f)) - lit(3.0f)))).cast("float"))
        ).as("embedding"),
        col("label"))
    write(embCopies, "embeddings")

    println(s"ScaleGen: wrote ${copies}x $src -> $out")
    spark.stop()
  }
}
