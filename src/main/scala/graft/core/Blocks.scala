package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Block hygiene for driver-side iterative operators.
  *
  * `Dataset.localCheckpoint()` pins the materialized RDD in the executors'
  * block store and never releases it — an iterative loop that checkpoints
  * per round would otherwise retain every superseded round's blocks for the
  * lifetime of the session, steadily eating the unified memory pool and
  * pushing later queries into spill/GC. Spark exposes no handle from the
  * checkpointed Dataset back to its RDD, but the persistent-RDD registry
  * (`SparkContext.getPersistentRDDs`) is public: snapshotting it around the
  * checkpoint identifies exactly the blocks the checkpoint pinned, so a loop
  * can release a round's blocks the moment the next round is materialized.
  */
object Blocks {

  /** Eagerly `localCheckpoint`s `ds`; returns the checkpointed frame plus
    * the ids of the RDDs the checkpoint pinned (pass to [[release]] once a
    * newer checkpoint supersedes this one). Eager by construction — the
    * caller may release the inputs' blocks immediately afterwards.
    *
    * ASSUMES A SINGLE DRIVER THREAD: the pinned-id set is a registry diff
    * around the checkpoint call, so an RDD persisted concurrently by another
    * driver thread would land in the returned set and be unpersisted by a
    * later [[release]]. Spark exposes no handle from the checkpointed
    * Dataset back to the RDD it pinned, so the diff is the only public
    * identification; all in-repo callers (KNN join, connected components)
    * run their iteration loops on one thread. */
  def checkpoint[T](ds: Dataset[T]): (Dataset[T], Set[Int]) = {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = ds.localCheckpoint(true)
    (cp, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** LAZY [[checkpoint]] (round 20): marks the plan for local checkpointing
    * but runs no job — the caller's NEXT action over the returned frame
    * materializes the blocks and truncates lineage in the same pass. An
    * iterative loop that previously paid (eager checkpoint job) + (scan for
    * its convergence signal) per round pays ONE job with this variant: the
    * signal scan IS the materializer.
    *
    * CONTRACT: the first action over the returned frame must compute EVERY
    * partition (an aggregate/count/full write — NOT limit/isEmpty/take,
    * which compute a partition subset). In current Spark the contract is
    * additionally self-healing — `LocalRDDCheckpointData.doCheckpoint()`
    * runs at the end of the FIRST job touching the marked RDD and launches
    * a completion job for any missing partitions (pinned by BlocksSpec) —
    * but callers must not lean on that: the completion job is a separate
    * full pass, i.e. exactly the extra work this variant exists to avoid.
    * The pinned-id capture works exactly as in [[checkpoint]] because
    * `localCheckpoint` persists (registers) the RDD immediately even in
    * lazy mode; [[releaseSuperseded]]'s materialization ordering is then
    * the caller's responsibility — run the materializing action BEFORE
    * releasing the superseded round. `graft.blocks.assertFullyMaterialized`
    * turns that ordering into a loud per-round assertion (see
    * [[releaseSuperseded]]). */
  def checkpointLazy[T](ds: Dataset[T]): (Dataset[T], Set[Int]) = {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = ds.localCheckpoint(false)
    (cp, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  /** Unpersist the given RDD ids (non-blocking). Ids already evicted or
    * unpersisted are ignored.
    *
    * CONTRACT: a locally-checkpointed RDD cannot be recomputed once its
    * blocks are gone (Spark WARNs on every such unpersist), so callers must
    * release a round's ids only after nothing reachable still depends on
    * them — in the iterative operators, after the SUPERSEDING round's
    * checkpoint has materialized. Loop bodies should go through
    * [[releaseSuperseded]], which asserts that ordering. */
  def release(spark: SparkSession, ids: Set[Int]): Unit = {
    val reg = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => reg.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** [[release]] for the iterate-and-supersede pattern: frees `prev` only
    * after asserting the superseding checkpoint actually pinned blocks that
    * are still registered. [[checkpoint]] is eager, so a non-empty,
    * registered `next` means the new round's data is materialized and the
    * old round's blocks are genuinely unreachable — the unpersist can never
    * strand a recomputation. A failure here means the checkpoint call above
    * it silently stopped pinning (a Spark behavior change this assert is
    * designed to surface loudly instead of as a data-loss heisenbug). */
  def releaseSuperseded(spark: SparkSession, prev: Set[Int], next: Set[Int]): Unit = {
    val reg = spark.sparkContext.getPersistentRDDs
    require(next.nonEmpty && next.exists(reg.contains),
      s"superseding checkpoint pinned no registered blocks (next=$next) — " +
        "releasing the prior round would make it unrecomputable")
    // [[checkpointLazy]] contract guard (round 21, opt-in): with
    // `graft.blocks.assertFullyMaterialized=true` the release additionally
    // asserts every superseding RDD has ALL partitions in the block store —
    // a loop whose "materializing" first action was a limit/take/isEmpty
    // (computing only a partition subset) fails loudly here instead of
    // surfacing later as an unrecomputable-block heisenbug. Off by default:
    // the storage-status sweep is a per-round driver RPC aggregation, and
    // every in-repo loop's first action is a full-partition aggregate by
    // construction (spec-pinned in BlocksSpec).
    if (spark.conf.get("graft.blocks.assertFullyMaterialized", "false").toBoolean) {
      val infos = spark.sparkContext.getRDDStorageInfo
      next.filter(reg.contains).foreach { id =>
        val info = infos.find(_.id == id)
        require(info.exists(i => i.numCachedPartitions == i.numPartitions),
          s"checkpointLazy contract violated: superseding RDD $id is only " +
            s"${info.map(i => s"${i.numCachedPartitions}/${i.numPartitions}").getOrElse("0")} " +
            "materialized — the first action over a lazy checkpoint must " +
            "compute EVERY partition (full aggregate/count/write, not limit/take/isEmpty)")
      }
    }
    release(spark, prev)
  }

  /** Session-wide scrub: unpersist every registered RDD block and drop the
    * SQL cache. For harness boundaries — between bench queries, after a
    * verify dump — never inside an operator.
    *
    * Order matters for the blocking contract: SQL-cached plans (`.cache()`)
    * materialize their column buffers as persisted RDDs, which land in the
    * same `getPersistentRDDs` registry — so unpersisting the registry FIRST
    * with `blocking = true` awaits eviction of SQL-cache blocks too, where
    * `spark.catalog.clearCache()` alone would evict them non-blocking
    * internally. `clearCache()` afterwards only drops the plan→buffer
    * mappings (its internal unpersist is a no-op on already-released RDDs).
    * Unmaterialized cache entries have no blocks, so nothing is missed. */
  def scrub(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking))
    spark.catalog.clearCache()
  }
}
