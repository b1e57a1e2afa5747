package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.AllPairs

/** Prefix-filtered all-pairs cosine (e93): the filter must be EXACT —
  * candidates are pruned, results are not. Pinned by comparing against
  * the unpruned all-shared-term join on a planted corpus with pairs
  * straddling the threshold, plus a measurable-pruning check so a
  * regression to "index everything" cannot pass silently. */
class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  /** 40 docs: 20 rotations of a 12-word cyclic pool (rotations share
    * most cyclic shingles → a full similarity spectrum, including
    * identical docs at rotation distance 12) plus a one-word mutant of
    * each (near-dup pairs around 0.3-0.6). Validated spread: 190 pairs
    * at τ=0.4, 98 at 0.6, 43 at 0.8 — plenty of mass straddling every
    * tested threshold. */
  private def corpus(): DataFrame = {
    val pool = Vector("lorem", "ipsum", "dolor", "sit", "amet",
      "consectetur", "adipiscing", "elit", "sed", "do", "eiusmod",
      "tempor")
    (0 until 20).flatMap { i =>
      val words = (0 until 12).map(j => pool((i + j) % 12))
      val mut = words.updated(6, s"mut$i")
      Seq((i.toLong, words.mkString(" ")),
        (i + 100L, mut.mkString(" ")))
    }.toDF("doc_id", "text")
  }

  /** The unpruned twin: every pair sharing ANY term, exact cosine. */
  private def brute(docs: DataFrame, tau: Double): Set[(Long, Long)] = {
    val wn = AllPairs.tfidfVectors(docs)
    val va = wn.select(col("doc_id").as("doc_a"), col("h"),
      col("wn").as("wa"))
    val vb = wn.select(col("doc_id").as("doc_b"), col("h"),
      col("wn").as("wb"))
    va.join(vb, Seq("h")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(Rounding.duckRound(sum(col("wa") * col("wb")), 6).as("sim"))
      .filter(col("sim") >= tau)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      .collect().toSet
  }

  private def pruned(docs: DataFrame, tau: Double): Set[(Long, Long)] =
    AllPairs.cosinePairs(docs, tau)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      .collect().toSet

  test("prefix filtering loses no pair at any threshold") {
    val docs = corpus()
    for (tau <- Seq(0.2, 0.4, 0.6, 0.8)) {
      val want = brute(docs, tau)
      val got = pruned(docs, tau)
      assert(got == want, s"tau=$tau: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty || tau > 0.7,
        s"tau=$tau planted corpus should produce pairs")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("the prefix index is measurably smaller than the full index") {
    val docs = corpus()
    val wn = AllPairs.tfidfVectors(docs).cache()
    val full = wn.count()
    // reproduce the operator's index-size decision at tau = 0.6
    val maxw = wn.groupBy(col("h")).agg(max(col("wn")).as("maxw"))
    val suffix = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("maxw").desc, col("h"))
      .rowsBetween(0, Long.MaxValue)
    val prefix = wn.join(maxw, Seq("h"))
      .withColumn("b", sum(col("wn") * col("maxw")).over(suffix))
      .filter(col("b") >= 0.6 - 1e-4).count()
    assert(prefix < full,
      s"prefix index ($prefix) should prune the full posting set ($full)")
    spark.sharedState.cacheManager.clearCache()
  }
}
