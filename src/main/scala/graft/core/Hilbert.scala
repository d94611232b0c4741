package graft.core

import org.apache.spark.sql.catalyst.InternalRow

/** 16-bit Hilbert space-filling curve (flatbush's public-domain bit-twiddle
  * — the same curve the FlatGeobuf packed R-tree uses). Shared by the FGB
  * writer's feature ordering and the `graft_hilbert` SQL kernel that
  * spatially clusters datasets before a GeoParquet write (tight per-row-
  * group bboxes are what make covering-column pushdown actually prune). */
object Hilbert {

  /** Hilbert index of (x, y), both in [0, 0xFFFF]. */
  def index(x: Int, y: Int): Long = {
    var a = x ^ y
    var b = 0xFFFF ^ a
    var c = 0xFFFF ^ (x | y)
    var d = x & (y ^ 0xFFFF)
    var A = a | (b >> 1)
    var B = (a >> 1) ^ a
    var C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    var D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a = A; b = B; c = C; d = D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C ^= (a & (c >> 2)) ^ (b & (d >> 2))
    D ^= (b & (c >> 2)) ^ ((a ^ b) & (d >> 2))
    a = A; b = B; c = C; d = D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C ^= (a & (c >> 4)) ^ (b & (d >> 4))
    D ^= (b & (c >> 4)) ^ ((a ^ b) & (d >> 4))
    a = A; b = B; c = C; d = D
    C ^= (a & (c >> 8)) ^ (b & (d >> 8))
    D ^= (b & (c >> 8)) ^ ((a ^ b) & (d >> 8))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    var i0 = x ^ y
    var i1 = b | (0xFFFF ^ (i0 | a))
    i0 = (i0 | (i0 << 8)) & 0x00FF00FF
    i0 = (i0 | (i0 << 4)) & 0x0F0F0F0F
    i0 = (i0 | (i0 << 2)) & 0x33333333
    i0 = (i0 | (i0 << 1)) & 0x55555555
    i1 = (i1 | (i1 << 8)) & 0x00FF00FF
    i1 = (i1 | (i1 << 4)) & 0x0F0F0F0F
    i1 = (i1 | (i1 << 2)) & 0x33333333
    i1 = (i1 | (i1 << 1)) & 0x55555555
    ((i1 << 1) | i0).toLong & 0xFFFFFFFFL
  }

  private val Max = (1 << 16) - 1

  /** Hilbert index of an envelope's center on a 2^16 grid over the extent. */
  def ofCenter(cx: Double, cy: Double,
               exmin: Double, eymin: Double, exmax: Double, eymax: Double): Long = {
    val w = exmax - exmin
    val h = eymax - eymin
    val x = if (w <= 0) 0 else math.min(Max, (Max * (cx - exmin) / w).toInt)
    val y = if (h <= 0) 0 else math.min(Max, (Max * (cy - eymin) / h).toInt)
    index(math.max(0, x), math.max(0, y))
  }

  /** StaticInvoke target for `graft_hilbert(st_bbox(g), xmin, ymin, xmax,
    * ymax)` — bbox struct is (xmin, ymin, xmax, ymax). */
  def cell(bbox: InternalRow, exmin: Double, eymin: Double,
           exmax: Double, eymax: Double): Long =
    ofCenter((bbox.getDouble(0) + bbox.getDouble(2)) / 2,
      (bbox.getDouble(1) + bbox.getDouble(3)) / 2, exmin, eymin, exmax, eymax)
}
