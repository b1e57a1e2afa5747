package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-thread registry of caches pinned by graft.ext operators
  * ([[Dedup]], [[Relevance]]) that outlive the DataFrames they return —
  * see the cache contract on [[Dedup]].
  *
  * Scoping (ADVICE r7): pins are tracked PER THREAD, so two sessions
  * running dedup operators on separate threads release only their own
  * caches — one caller's [[release]] can no longer unpersist another
  * caller's still-in-use mid-plan caches. The corollary contract: call
  * [[release]] on the SAME thread that ran the operators (a pin made on
  * thread A and released on no thread stays until the consumer's global
  * `clearCache()` — which is why [[pin]] also prunes already-gone
  * entries, keeping the registry bounded for consumers that only ever
  * use the global path, e.g. Verify/Bench).
  */
private[graft] object CachePins {

  private val pins = new ThreadLocal[
      scala.collection.mutable.ArrayBuffer[DataFrame]] {
    override def initialValue() =
      scala.collection.mutable.ArrayBuffer[DataFrame]()
  }

  /** Cache `df` and track it for the calling thread's next [[release]].
    * Entries whose cache is already gone (released via the global
    * clearCache path) are pruned first, so the registry cannot grow
    * unboundedly over a long-lived session. */
  def pin(df: DataFrame): DataFrame = {
    val buf = pins.get()
    buf.filterInPlace(_.storageLevel != StorageLevel.NONE)
    buf += df.cache()
    df
  }

  /** Drop every cache the CALLING THREAD pinned since its last release.
    * Blocking, so the memory is free on return. Unpersist is
    * idempotent: frames already cleared globally release as a no-op. */
  def release(): Unit = {
    val buf = pins.get()
    buf.foreach(_.unpersist(blocking = true))
    buf.clear()
  }
}
