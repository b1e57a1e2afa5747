package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Per-thread registry of caches pinned by graft.ext operators
  * ([[Dedup]], [[Relevance]]) that outlive the DataFrames they return —
  * see the cache contract on [[Dedup]].
  *
  * Scoping (ADVICE r7): pins are tracked PER THREAD, so two sessions
  * running dedup operators on separate threads release only their own
  * caches. The corollary contract: call [[release]] on the SAME thread
  * that ran the operators (a pin made on thread A and released on no
  * thread stays until the consumer's global `clearCache()` — which is
  * why [[pin]] also prunes already-gone entries, keeping the registry
  * bounded for consumers that only ever use the global path, e.g.
  * Verify/Bench).
  *
  * Identical-plan sharing (ADVICE r8): Spark's CacheManager
  * deduplicates cached data by canonicalized plan, so two threads
  * pinning semantically identical frames share ONE InMemoryRelation —
  * per-thread bookkeeping alone would let the first release unpersist
  * the other thread's still-in-use cache. Pins are therefore
  * REFCOUNTED globally by canonicalized plan: [[release]] unpersists a
  * shared cache only when the last pinner lets go. */
private[graft] object CachePins {

  /** One pinned frame and the canonicalized-plan key the CacheManager
    * dedupes it under. */
  private final case class Entry(df: DataFrame, key: LogicalPlan)

  /** JVM-wide pin counts per canonicalized plan (all threads), guarded
    * by its own lock. */
  private val refs = scala.collection.mutable.Map[LogicalPlan, Int]()

  private val pins = new ThreadLocal[
      scala.collection.mutable.ArrayBuffer[Entry]] {
    override def initialValue() =
      scala.collection.mutable.ArrayBuffer[Entry]()
  }

  private def keyOf(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed.canonicalized

  /** Decrement `key`; true iff this was the last reference. */
  private def drop(key: LogicalPlan): Boolean = refs.synchronized {
    refs.getOrElse(key, 0) - 1 match {
      case n if n <= 0 => refs.remove(key); true
      case n => refs.update(key, n); false
    }
  }

  /** Cache `df` and track it for the calling thread's next [[release]].
    * Entries whose cache is already gone (released via the global
    * clearCache path) are pruned first — their refcounts too — so the
    * registry cannot grow unboundedly over a long-lived session. */
  def pin(df: DataFrame): DataFrame = {
    val buf = pins.get()
    val gone = buf.filter(_.df.storageLevel == StorageLevel.NONE)
    if (gone.nonEmpty) {
      buf.filterInPlace(_.df.storageLevel != StorageLevel.NONE)
      gone.foreach(e => drop(e.key))
    }
    val key = keyOf(df)
    refs.synchronized { refs.update(key, refs.getOrElse(key, 0) + 1) }
    buf += Entry(df.cache(), key)
    df
  }

  /** Drop every cache the CALLING THREAD pinned since its last release
    * — except those another thread still has pinned under the same
    * canonicalized plan (shared InMemoryRelation; the last pinner
    * releases it). Blocking, so the memory is free on return.
    * Unpersist is idempotent: frames already cleared globally release
    * as a no-op. */
  def release(): Unit = {
    val buf = pins.get()
    buf.foreach(e => if (drop(e.key)) e.df.unpersist(blocking = true))
    buf.clear()
  }

  /** Per-thread registry of `localCheckpoint` block-backed RDDs
    * (ADVICE r11): checkpointed frames are invisible to both the
    * CacheManager (global `clearCache()` skips them) and [[release]],
    * so their MEMORY_AND_DISK blocks otherwise live until the frames
    * become GC-unreachable AND the ContextCleaner's periodic driver GC
    * runs (default every 30 min) — an accumulation window a long-lived
    * driver pays at larger scale factors. Tracked here, a consumer
    * frees them deterministically with [[releaseCheckpoints]]. */
  private val ckpts = new ThreadLocal[
      scala.collection.mutable.ArrayBuffer[RDD[_]]] {
    override def initialValue() =
      scala.collection.mutable.ArrayBuffer[RDD[_]]()
  }

  /** Eagerly `localCheckpoint` `df` (materialize + truncate lineage to
    * a one-node LogicalRDD) and track the checkpointed RDD for the
    * calling thread's next [[releaseCheckpoints]]. No refcounting:
    * unlike [[pin]], every localCheckpoint call produces a DISTINCT
    * RDD (no CacheManager plan-dedup), so per-thread ownership is
    * exact. */
  def pinCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => ckpts.get() += lr.rdd
      case _ => ()
    }
    cp
  }

  /** Free the checkpoint blocks of every frame the CALLING THREAD
    * [[pinCheckpoint]]ed since its last release. A truncated frame is
    * NOT recomputable from lineage, so this is only safe after the
    * final action on every plan derived from those frames — callers
    * (Verify/Bench per query, the streaming maintainer per committed
    * batch) invoke it exactly where their outputs are durable.
    * `blocking = false` posts the removals asynchronously — the right
    * mode inside a streaming batch loop, where stalling the batch on
    * block deletion buys nothing (the blocks are dead either way). */
  def releaseCheckpoints(blocking: Boolean = true): Unit = {
    val buf = ckpts.get()
    buf.foreach(_.unpersist(blocking))
    buf.clear()
  }
}
