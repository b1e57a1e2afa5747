package graft

import org.apache.spark.sql.functions._

import graft.ext.Curation

/** The e237 curation chain on a hand-built corpus where EVERY stage
  * removes someone: an exact clone (dedup), a punctuation-soup doc
  * (quality cut), and the high-perplexity half of the survivors
  * (median ppl cut) — plus the stage-boundary cache pin. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("each stage removes its target and the KN branches read the " +
    "cache pin, not the raw scan") {
    val d = Seq(
      // quality 0.64 (stopword-rich): survives to the ppl stage
      (0L, "the a of and to in the a of and"),
      // exact clone of doc 0 at a higher id: dedup drops it
      (1L, "the a of and to in the a of and"),
      // punctuation soup, quality ~0.24: the quality cut drops it
      (2L, "zz. qq. rr. ss."),
      // repetitive = most predictable bigrams = lowest perplexity:
      // the median cut keeps exactly this doc
      (3L, "the the the the the the the the the the"))
      .toDF("doc_id", "text")
    val out = Curation.chain(d, qualityMin = 0.5, pplQ = 0.5)
    val got = out.collect()
    // survivors of all three cuts: only the low-ppl doc 3 (the median
    // of two ppls is their midpoint, so only the smaller passes <=)
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got(0).getLong(3) == 9L)               // n_bigrams
    assert(math.abs(got(0).getDouble(2) - 0.64) < 1e-6)  // quality
    // stage-boundary pin: the ppl stage's consumers read the cached
    // quality-surviving corpus, not a re-run of dedup + quality
    assert(out.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"))
    spark.sharedState.cacheManager.clearCache()
  }
}
