package graft.core

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch probe for `StaticInvoke` registration
  * (`graft_cms_estimate` — see graft.functions.TextFunctions).
  *
  * The sketch arrives as the serialized BINARY produced by Spark's native
  * `count_min_sketch(col, eps, confidence, seed)` aggregate
  * (CountMinSketchAgg), always via a scalar subquery — so at eval time every
  * row of a partition sees the SAME byte-array instance (the literal the
  * subquery folded into). Deserializing per row would dwarf the query;
  * instead a thread-local one-entry cache keyed by REFERENCE identity (`eq`)
  * re-parses only when the instance changes — exact (no hash-collision
  * false sharing), lock-free, and O(1) per row.
  *
  * Item hashing must mirror the agg side: CountMinSketchAgg adds StringType
  * values as their UTF-8 BYTES (`addBinary(getBytes)`), so the probe calls
  * `estimateCount` on the same bytes — never on a JVM String (whose hash
  * path differs).
  *
  * CMS guarantees estimate >= true count (one-sided error, like Bloom's
  * no-false-negatives): a threshold filter on the estimate keeps every true
  * heavy hitter, and an exact confirm downstream makes the RESULT
  * sketch-independent — which is what lets plain exact SQL oracle t25.
  */
object SketchOps {

  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  def cmsEstimate(sketch: Array[Byte], item: UTF8String): Long = {
    var entry = last.get()
    if (entry == null || !(entry._1 eq sketch)) {
      entry = (sketch,
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch)))
      last.set(entry)
    }
    entry._2.estimateCount(item.getBytes)
  }
}
