package graft

import graft.ext.Dedup

/** Cache contract (VERDICT r6 #8): every cache a Dedup operator pins is
  * tracked, and [[Dedup.releasePinnedCaches]] drops exactly those — so a
  * library consumer can run e2/e3-style dedup calls in a loop without
  * unbounded cache growth and without the global clearCache hammer. */
class DedupCacheSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g x"),
    (3L, "p q r s t u v w"),
    (4L, "p q r s t u v y")).toDF("doc_id", "text")

  test("releasePinnedCaches drops every cache a dedup loop pinned") {
    // isolate from caches other suites may have left behind (suites run
    // sequentially in the forked test JVM, so nothing is mid-plan here)
    spark.sharedState.cacheManager.clearCache()
    for (_ <- 1 to 3) {
      val d = docsDf
      assert(Dedup.ngramJaccardPairs(d, 3, 0.1, 10).count() > 0)
      assert(Dedup.minhashLshPairs(d, 3, 8, 2, 0.1, 10).count() > 0)
      assert(Dedup.containmentPairs(d, 3, 0.5, 10).count() > 0)
      assert(Dedup.cappedShingleHashes(d, 3, 10).count() > 0)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "operators should have pinned caches")
      Dedup.releasePinnedCaches()
      assert(spark.sharedState.cacheManager.isEmpty,
        "release should leave no cache behind")
    }
  }
}
