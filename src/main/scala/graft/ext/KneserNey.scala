package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Rounding

/** Interpolated Kneser-Ney bigram language model scoring — the
  * perplexity-filter quality signal mainstream LLM-data pipelines
  * (CCNet, Gopher/MassiveText) rank documents by, complementing the
  * corpus-unigram proxy (e62) with the smoothing family production
  * filters actually use (Kneser-Ney 1995; Chen & Goodman 1999):
  *
  *   P(w2|w1) = max(c(w1,w2) − D, 0) / ctot(w1)
  *            + D · N1+(w1,·) / ctot(w1) · N1+(·,w2) / N1+(·,·)
  *
  * with fixed discount D, ctot(w1) = Σ_w2 c(w1,w2) (history mass),
  * N1+(w1,·) / N1+(·,w2) the right/left continuation type counts and
  * N1+(·,·) the distinct-bigram total. Trained on the corpus itself
  * and scored over the same corpus (the self-scoring shape every
  * quality filter runs before thresholding), so every scored bigram
  * is seen and P > 0 without an unseen-history branch.
  *
  * Determinism contract (the standing engine/oracle conventions):
  * counts are exact integers; the probability is ONE fixed expression
  * shape evaluated in doubles on both engines; per-bigram log-probs
  * snap to 9 decimals BEFORE the per-doc sum; the per-doc sum — the
  * only accumulation-order-dependent float — rounds to 6.
  *
  * Scale shape: training is three hash aggregations over the exploded
  * bigram table (one shuffle each, partial aggregation map-side);
  * the model is a (w1, w2, lp) table JOINED to the scoring bigrams —
  * an equi-join on the bigram key, never a literal in the expression
  * tree, so a 10⁹-bigram model shards like any fact table. Scoring
  * re-aggregates per doc_id: one more shuffle, linear everywhere.
  */
object KneserNey {

  private def words(text: Column): Column =
    expr(s"filter(split($text, ' '), x -> x != '')")

  /** Per-document bigram OCCURRENCES (doc_id, w1, w2) in document
    * order; documents with fewer than 2 words contribute none.
    * Pairing is zip_with over the two (n−1)-prefixes offset by one —
    * NOT `sequence(1, n−1)`, which DESCENDS ([1, 0]) when n < 2 and
    * would fault on element_at(…, 0) for empty/one-word docs. */
  private def bigrams(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val n1 = greatest(size(w) - 1, lit(0))
    docs.select(col("doc_id"), explode(zip_with(
        slice(w, lit(1), n1), slice(w, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** The trained model: (w1, w2, lp) with lp = round-9
    * ln P_KN(w2|w1) for every bigram TYPE in the corpus. */
  def bigramLogProbs(docs: DataFrame,
                     discount: Double = 0.75): DataFrame = {
    val big = bigrams(docs)
    val typ = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    // history mass + right continuation types, one pass over types
    val hist = typ.groupBy(col("w1")).agg(
      sum(col("cnt")).as("ctot"),
      count(lit(1)).as("n1r"))
    // left continuation types + the distinct-bigram total
    val left = typ.groupBy(col("w2")).agg(count(lit(1)).as("n1l"))
    val tot = typ.agg(count(lit(1)).as("n1tot"))
    val d = lit(discount)
    typ.join(hist, Seq("w1")).join(left, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), Rounding.duckRound(log(
        greatest(col("cnt") - d, lit(0.0)) / col("ctot")
          + d * col("n1r") / col("ctot")
          * (col("n1l").cast("double") / col("n1tot"))), 9).as("lp"))
  }

  /** Per-doc raw scores against an already-trained model — the
    * SERVING half, stream-safe: bigram explode (narrow), equi-join on
    * the bigram key against the static model table, one per-doc
    * aggregation. Only docs with ≥1 scored bigram appear; callers
    * re-attach zero rows via [[finalizeScores]].
    *
    * OOV contract: a bigram absent from the model is SKIPPED — it
    * neither scores nor counts toward `n_bigrams` (the standard
    * perplexity-filter OOV-skip, which biases ppl optimistic for
    * heavily-OOV docs rather than infinite). Self-scored corpora (the
    * gates) never hit it; a serving deployment that must fail loudly
    * instead should left-join and null-guard like the unigram-LM
    * serving path does. */
  def docScores(docs: DataFrame, model: DataFrame): DataFrame =
    bigrams(docs)
      .join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Rounding.duckRound(sum(col("lp")), 6).as("doc_lp"))

  /** Gate shape over raw scores: every doc keeps a row (< 2 words →
    * n_bigrams 0, doc_lp 0, ppl NULL — no defined rate), scored docs
    * get round-6 perplexity exp(−lp/n). */
  def finalizeScores(allDocs: DataFrame, scored: DataFrame): DataFrame =
    allDocs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("doc_lp"), lit(0.0)).as("doc_lp"),
        when(col("n_bigrams").isNotNull, Rounding.duckRound(
          exp(-col("doc_lp") / col("n_bigrams")), 6)).as("ppl"))

  /** Per-document KN score: bigram count, round-6 total log-prob, and
    * round-6 perplexity. */
  def docLogProb(docs: DataFrame, discount: Double = 0.75): DataFrame =
    finalizeScores(docs,
      docScores(docs, bigramLogProbs(docs, discount)))

  /** Per-document trigram OCCURRENCES (doc_id, w1, w2, w3); docs with
    * fewer than 3 words contribute none (same offset-slice pairing as
    * [[bigrams]] — never a descending `sequence`). */
  private def trigrams(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val n2 = greatest(size(w) - 2, lit(0))
    docs.select(col("doc_id"), explode(zip_with(
        slice(w, lit(1), n2),
        zip_with(slice(w, lit(2), n2), slice(w, lit(3), n2),
          (b, c) => struct(b.as("w2"), c.as("w3"))),
        (a, bc) => struct(a.as("w1"), bc.getField("w2").as("w2"),
          bc.getField("w3").as("w3")))).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"),
        col("t.w2").as("w2"), col("t.w3").as("w3"))
  }

  /** TRIGRAM interpolated Kneser-Ney (the KenLM-family shape
    * production perplexity filters actually run, one order below the
    * usual 5): the highest order discounts raw trigram counts and
    * backs off into the Chen-Goodman LOWER-ORDER bigram distribution
    * built from CONTINUATION counts (how many distinct left contexts
    * a bigram completes), which itself backs off into the bigram-left
    * continuation unigram:
    *
    *   P3(w3|w1w2) = max(c3 − D, 0)/c(w1w2·)
    *               + D·N1+(w1w2·)/c(w1w2·) · P2c(w3|w2)
    *   P2c(w3|w2)  = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
    *               + D·N1+ctx(w2)/N1+(·w2·) · N1+(·w3)/N1+(··)
    *
    * with N1+(·w2w3) = |{w1 : c3 > 0}|, N1+(·w2·) = trigram types
    * with middle w2, N1+ctx(w2) = distinct w3 completing w2 in
    * trigram tails, and the unigram level over BIGRAM types. Every
    * count is an exact integer aggregation; the probability is one
    * fixed double expression (oracle-mirrored term for term). */
  def trigramLogProbs(docs: DataFrame,
                      discount: Double = 0.75): DataFrame = {
    val typ3 = trigrams(docs).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("cnt"))
    val hist3 = typ3.groupBy(col("w1"), col("w2")).agg(
      sum(col("cnt")).as("ctot"), count(lit(1)).as("n1r"))
    // continuation counts of the (w2, w3) completion
    val cont = typ3.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("n1l3"))
    val mid = cont.groupBy(col("w2")).agg(
      sum(col("n1l3")).as("nmid"), count(lit(1)).as("n1rctx"))
    // lowest order: bigram-left continuation unigram
    val typ2 = bigrams(docs).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val leftB = typ2.groupBy(col("w2")).agg(count(lit(1)).as("n1lb"))
      .withColumnRenamed("w2", "w3")
    val totB = typ2.agg(count(lit(1)).as("nbtot"))
    val d = lit(discount)
    typ3.join(hist3, Seq("w1", "w2")).join(cont, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(leftB, Seq("w3"))
      .crossJoin(broadcast(totB))
      .select(col("w1"), col("w2"), col("w3"), Rounding.duckRound(log(
        greatest(col("cnt") - d, lit(0.0)) / col("ctot")
          + d * col("n1r") / col("ctot")
          * (greatest(col("n1l3") - d, lit(0.0)) / col("nmid")
            + d * col("n1rctx") / col("nmid")
            * (col("n1lb").cast("double") / col("nbtot")))), 9)
        .as("lp"))
  }

  /** Per-doc trigram KN score: docs with < 3 words keep a zero row
    * (ppl NULL). */
  def trigramDocLogProb(docs: DataFrame,
                        discount: Double = 0.75): DataFrame = {
    val scored = trigrams(docs)
      .join(trigramLogProbs(docs, discount), Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        Rounding.duckRound(sum(col("lp")), 6).as("doc_lp"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("doc_lp"), lit(0.0)).as("doc_lp"),
        when(col("n_trigrams").isNotNull, Rounding.duckRound(
          exp(-col("doc_lp") / col("n_trigrams")), 6)).as("ppl"))
  }

  /** The CURATION operator the score exists for: keep documents with
    * perplexity at or below the exact q-quantile of the scored corpus
    * (CCNet keeps the low-perplexity head; the threshold is the
    * reference's G5 two-pass shape — one small driver scalar, then a
    * broadcast-filtered scan). Wordless docs carry NULL ppl and drop:
    * a rate-free doc has no evidence of quality. */
  def perplexityFilter(docs: DataFrame, q: Double,
                       discount: Double = 0.75): DataFrame = {
    val scored = docLogProb(docs, discount)
    val row = scored.agg(percentile(col("ppl"), lit(q)).as("c")).head()
    // a corpus with NO scored doc (every doc < 2 words) has no
    // quantile: the filter keeps nothing, rather than NPE-ing on the
    // null percentile
    if (row.isNullAt(0)) scored.filter(lit(false))
    else scored.filter(col("ppl") <= lit(row.getDouble(0)))
  }
}
