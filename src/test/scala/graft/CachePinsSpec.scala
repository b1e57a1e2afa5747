package graft

import org.apache.spark.storage.StorageLevel

import graft.ext.CachePins

/** Pins the ADVICE-r7 cache-registry fixes: per-thread scoping (one
  * session's release must not unpersist another thread's still-in-use
  * caches) and self-pruning (entries released via the global
  * clearCache path must not accumulate in the registry forever). */
class CachePinsSpec extends SparkSpec {
  import spark.implicits._

  test("release on one thread leaves another thread's pins cached") {
    spark.sharedState.cacheManager.clearCache()
    val mine = CachePins.pin(Seq(1, 2, 3).toDF("a"))
    mine.count()
    // a concurrent session pins and releases ITS caches on its thread
    val t = new Thread(() => {
      val theirs = CachePins.pin(Seq(4, 5).toDF("b"))
      theirs.count()
      CachePins.release()
      assert(theirs.storageLevel == StorageLevel.NONE,
        "own-thread release should unpersist own pin")
    })
    t.start()
    t.join()
    assert(mine.storageLevel != StorageLevel.NONE,
      "another thread's release must not clobber this thread's cache")
    CachePins.release()
    assert(mine.storageLevel == StorageLevel.NONE)
  }

  test("two threads pinning the SAME plan share the refcount: the " +
    "first release must not clobber the still-pinned cache") {
    spark.sharedState.cacheManager.clearCache()
    // identical plans → CacheManager dedupes to one InMemoryRelation
    def frame = Seq((1, "x"), (2, "y")).toDF("a", "b").filter($"a" > 0)
    val mine = CachePins.pin(frame)
    mine.count()
    val t = new Thread(() => {
      val theirs = CachePins.pin(frame) // same canonicalized plan
      theirs.count()
      CachePins.release() // refcount 2 → 1: must NOT unpersist
    })
    t.start()
    t.join()
    assert(mine.storageLevel != StorageLevel.NONE,
      "first releaser of a shared plan must not unpersist it")
    CachePins.release() // last pinner → actually drops
    assert(mine.storageLevel == StorageLevel.NONE)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("pin prunes entries whose cache was cleared globally") {
    spark.sharedState.cacheManager.clearCache()
    // simulate the Verify/Bench consumer: pin, then global clearCache
    // (never calling release) — repeated pins must not accumulate
    // dead entries (observable: release() stays a no-op for them and
    // the loop leaves no cache behind)
    for (i <- 1 to 5) {
      CachePins.pin(Seq(i).toDF("a")).count()
      spark.sharedState.cacheManager.clearCache()
    }
    val live = CachePins.pin(Seq(9).toDF("a"))
    live.count()
    CachePins.release()
    assert(live.storageLevel == StorageLevel.NONE)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
