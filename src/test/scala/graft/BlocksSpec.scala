package graft

import graft.core.Blocks

/** Pins the [[Blocks.checkpointLazy]] contract (round 21, VERDICT item 7):
  * the first action over a lazy checkpoint must compute EVERY partition.
  * With `graft.blocks.assertFullyMaterialized=true`,
  * [[Blocks.releaseSuperseded]] turns a violation (limit/take/isEmpty as
  * the "materializing" action) into a loud failure instead of a
  * later-recompute heisenbug. */
class BlocksSpec extends SparkTestBase {

  test("checkpointLazy: full-partition first action passes the materialization guard") {
    val s = spark
    s.conf.set("graft.blocks.assertFullyMaterialized", "true")
    try {
      val (a, aIds) = Blocks.checkpointLazy(s.range(0, 1000, 1, 8).toDF())
      assert(a.count() == 1000) // full-partition materializer
      val (b, bIds) = Blocks.checkpointLazy(a.selectExpr("id + 1 AS id"))
      assert(b.count() == 1000)
      Blocks.releaseSuperseded(s, aIds, bIds) // must not throw
      Blocks.release(s, bIds)
    } finally s.conf.unset("graft.blocks.assertFullyMaterialized")
  }

  test("checkpointLazy: even a PARTIAL first action leaves the checkpoint fully materialized") {
    // Measured Spark behavior this guard relies on (and the reason the
    // limit/take misuse cannot currently corrupt a loop):
    // LocalRDDCheckpointData.doCheckpoint() runs at the END of the first
    // job touching the marked RDD — whatever partition subset that job
    // computed — and launches a completion job for every missing
    // partition. So after limit(1) the checkpoint is 8/8 cached and the
    // guard passes. If a future Spark stopped completing missing
    // partitions, THIS test flips (numCached < numPartitions) and the
    // releaseSuperseded guard becomes the loud in-operator tripwire.
    val s = spark
    s.conf.set("graft.blocks.assertFullyMaterialized", "true")
    try {
      val (anchor, anchorIds) = Blocks.checkpointLazy(s.range(0, 100, 1, 4).toDF())
      anchor.count()
      val (partial, partialIds) = Blocks.checkpointLazy(s.range(0, 1000, 1, 8).toDF())
      assert(partial.limit(1).collect().length == 1)
      val info = s.sparkContext.getRDDStorageInfo
        .find(i => partialIds.contains(i.id))
      assert(info.exists(i => i.numCachedPartitions == i.numPartitions),
        s"local checkpoint left partial after a subset action: " +
          s"${info.map(i => s"${i.numCachedPartitions}/${i.numPartitions}")}")
      Blocks.releaseSuperseded(s, anchorIds, partialIds) // guard passes
      Blocks.release(s, partialIds)
    } finally s.conf.unset("graft.blocks.assertFullyMaterialized")
  }
}
