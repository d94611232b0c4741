package graft

/** Deterministic WKT corpus for the differential fuzz (round 18, judge
  * item 7): 1200 seeded geometries spanning point / multipoint /
  * linestring / polygon / polygon-with-hole / multipolygon, coordinates
  * snapped to 6 decimals inside the UTM-safe lon/lat box.
  *
  * The corpus is regenerated inside the spec and hash-pinned against the
  * committed DuckDB fixture (`src/test/resources/wkt_fuzz_expected.csv`,
  * produced by `tools/wkt_fuzz_oracle.py` — python parses the WKT text,
  * DuckDB SQL does ALL the math), so generator drift fails loudly instead
  * of silently comparing different inputs.
  *
  * Degenerates are avoided BY CONSTRUCTION (min ring radius, monotone
  * vertex angles, disjoint multipolygon shells): the fuzz gates kernel
  * MATH against an independent engine; robustness on degenerate input is
  * GeoPropertySpec's job.
  */
object WktFuzzGen {

  final val N = 1200

  /** splitmix64 — the published constants; one independent stream per id */
  private final class Rng(seed: Long) {
    private var s: Long = seed
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def range(lo: Double, hi: Double): Double = lo + (hi - lo) * nextDouble()
    def int(lo: Int, hi: Int): Int =
      lo + math.min((nextDouble() * (hi - lo + 1)).toInt, hi - lo)
  }

  private def fmt(v: Double): String = {
    // snap to 6 decimals; plain decimal notation so Scala and python parse
    // the identical double
    val r = math.rint(v * 1e6) / 1e6
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(r))
  }

  private def pt(x: Double, y: Double): String = s"${fmt(x)} ${fmt(y)}"

  /** closed ring around (cx, cy): monotone angles → CCW; `reverse` → CW
    * (holes). Radius jitter stays in [0.6r, r] so 6-dp snapping can never
    * collapse neighbours. */
  private def ring(r0: Rng, cx: Double, cy: Double, radius: Double,
                   nMin: Int, nMax: Int, reverse: Boolean): String = {
    val n = r0.int(nMin, nMax)
    val pts = (0 until n).map { j =>
      val theta = 2.0 * math.Pi * (j + 0.2 + 0.6 * r0.nextDouble()) / n
      val rr = radius * (0.6 + 0.4 * r0.nextDouble())
      (cx + rr * math.cos(theta), cy + rr * math.sin(theta))
    }
    val ordered = if (reverse) pts.reverse else pts
    (ordered :+ ordered.head).map { case (x, y) => pt(x, y) }.mkString("(", ", ", ")")
  }

  def wkt(i: Int): String = {
    val r = new Rng(0x5DEECE66DL * (i + 1))
    val cx = r.range(-160.0, 160.0)
    val cy = r.range(-75.0, 75.0)
    (i % 6) match {
      case 0 => s"POINT (${pt(cx, cy)})"
      case 1 =>
        val n = r.int(1, 5)
        val pts = (0 until n).map(_ => s"(${pt(cx + r.range(-2, 2), cy + r.range(-2, 2))})")
        s"MULTIPOINT (${pts.mkString(", ")})"
      case 2 =>
        val n = r.int(2, 12)
        var x = cx; var y = cy
        val pts = (0 until n).map { _ =>
          val s0 = pt(x, y); x += r.range(-1, 1); y += r.range(-1, 1); s0
        }
        s"LINESTRING (${pts.mkString(", ")})"
      case 3 =>
        s"POLYGON (${ring(r, cx, cy, r.range(0.2, 3.0), 4, 12, reverse = false)})"
      case 4 =>
        val rad = r.range(0.5, 3.0)
        val shell = ring(r, cx, cy, rad, 5, 12, reverse = false)
        val hole = ring(r, cx, cy, rad * 0.2, 4, 8, reverse = true)
        s"POLYGON ($shell, $hole)"
      case _ =>
        val r1 = r.range(0.2, 2.0); val r2 = r.range(0.2, 2.0)
        val dx = r1 + r2 + 1.0
        val a = ring(r, cx, cy, r1, 4, 10, reverse = false)
        val b = ring(r, cx + dx, cy, r2, 4, 10, reverse = false)
        s"MULTIPOLYGON (($a), ($b))"
    }
  }

  def all: Seq[String] = (0 until N).map(wkt)

  def corpusHash: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(all.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }
}

/** `sbt "Test/runMain graft.WktFuzzDump /tmp/wkt_fuzz.txt"` → corpus file
  * for tools/wkt_fuzz_oracle.py. */
object WktFuzzDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/wkt_fuzz.txt")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      WktFuzzGen.all.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${WktFuzzGen.N} wkts, sha256=${WktFuzzGen.corpusHash}")
  }
}
