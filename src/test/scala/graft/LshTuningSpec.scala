package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** The measured-recall → parameter-selection loop (VERDICT r9 #7): the
  * library's LSH defaults (numHashes=16, rowsPerBand=2) must be exactly
  * what [[Dedup.lshParamsFor]] derives from the documented recall floor,
  * and the REALIZED recall on the fixture corpus (e70's measurement
  * against the exact-Jaccard oracle) must meet that floor — so the knobs
  * stop being magic constants and a parameter drift fails here by name.
  */
class LshTuningSpec extends SparkSpec {

  test("defaults (16, 2) = lshParamsFor(recall 0.89 at threshold 0.5)") {
    assert(Dedup.lshParamsFor(0.89, 0.5, rowsPerBand = 2) == (16, 2))
  }

  test("derived hashes meet the floor and are minimal") {
    for (target <- Seq(0.5, 0.89, 0.95, 0.99);
         thr <- Seq(0.3, 0.5, 0.8);
         r <- Seq(1, 2, 4)) {
      // uncapped for the sweep: low thresholds at wide bands need
      // thousands of hashes, which is the cap's point in production
      val (n, _) =
        Dedup.lshParamsFor(target, thr, rowsPerBand = r, maxHashes = 65536)
      assert(Dedup.lshDetectProb(thr, n, r) >= target,
        s"($target,$thr,$r): $n hashes miss the floor")
      if (n > r) // one band fewer must miss the floor (minimality)
        assert(Dedup.lshDetectProb(thr, n - r, r) < target,
          s"($target,$thr,$r): $n hashes is not minimal")
    }
  }

  test("tighter targets and thresholds never need fewer hashes") {
    val n1 = Dedup.lshParamsFor(0.9, 0.5)._1
    assert(Dedup.lshParamsFor(0.99, 0.5)._1 >= n1)
    assert(Dedup.lshParamsFor(0.9, 0.3)._1 >= n1)
  }

  test("an unreachable target fails fast instead of silently capping") {
    intercept[IllegalArgumentException] {
      Dedup.lshParamsFor(0.999999, 0.05, rowsPerBand = 4,
        maxHashes = 64)
    }
  }

  test("measured fixture recall (e70 at sf0.001) meets the derived " +
    "floor the defaults were chosen for") {
    val row = SparkEntry.queries("e70_lsh_dedup_recall")(
      spark, "/root/testdata/sf0.001").collect().head
    try {
      val recall = row.getAs[Double]("recall")
      val floor = Dedup.lshDetectProb(0.5, 16, 2)
      assert(recall >= floor,
        s"measured recall $recall under theoretical floor $floor")
    } finally spark.sharedState.cacheManager.clearCache()
  }
}
