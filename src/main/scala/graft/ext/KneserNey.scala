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
    * gates) never hit it; a train/serve SPLIT deployment should use
    * [[docScoresOov]], which accounts OOV explicitly and backs off to
    * the continuation unigram (e238). */
  def docScores(docs: DataFrame, model: DataFrame): DataFrame =
    bigrams(docs)
      .join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Rounding.duckRound(sum(col("lp")), 6).as("doc_lp"))

  /** The continuation-unigram backoff table from a TRAIN corpus
    * (VERDICT r16 #3): (w2, clp) with clp = round-9
    * ln(N1+(·,w2) / N1+(·,·)) — the lowest-order Kneser-Ney
    * distribution the trained model already materializes as
    * `n1l/n1tot`, exposed as its own joinable table so serving can
    * back off for model-absent bigrams instead of silently skipping
    * them. Same scale shape as the model: a (word, lp) fact table,
    * one hash agg + a broadcast 1-row total. */
  def continuationUnigram(docs: DataFrame): DataFrame = {
    val typ = bigrams(docs).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val left = typ.groupBy(col("w2")).agg(count(lit(1)).as("n1l"))
    val tot = typ.agg(count(lit(1)).as("n1tot"))
    left.crossJoin(broadcast(tot))
      .select(col("w2"), Rounding.duckRound(
        log(col("n1l").cast("double") / col("n1tot")), 9).as("clp"))
  }

  /** [[docScores]] with EXPLICIT OOV accounting — the train/serve
    * SPLIT shape (VERDICT r16 #3), where serve-corpus bigrams really
    * can be absent from the model and the self-scoring contract's
    * "skip silently" bias becomes wrong. LEFT-joins the model, then
    * the [[continuationUnigram]] backoff:
    *
    *  - model hit        → the bigram's KN log-prob;
    *  - model miss, w2 a known continuation → backoff clp,
    *    counted in `n_oov`;
    *  - w2 never seen as a continuation → nothing to score,
    *    counted in `n_unk` and excluded from the perplexity rate.
    *
    * Plan: two LEFT equi-joins (bigram key, then word key) + one
    * per-doc agg — the backoff adds one join against an
    * O(vocab)-row table, no new shuffle family. */
  def docScoresOov(docs: DataFrame, model: DataFrame,
                   cont: DataFrame): DataFrame =
    bigrams(docs)
      .join(model, Seq("w1", "w2"), "left")
      .join(cont, Seq("w2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("lp").isNull && col("clp").isNotNull, 1))
          .as("n_oov"),
        count(when(col("lp").isNull && col("clp").isNull, 1))
          .as("n_unk"),
        Rounding.duckRound(coalesce(
          sum(coalesce(col("lp"), col("clp"))), lit(0.0)), 6)
          .as("doc_lp"))

  /** Gate shape over [[docScoresOov]] rows: every serve doc keeps a
    * row; ppl's rate denominator is the SCORED bigram count
    * (n_bigrams − n_unk), NULL when nothing scored (< 2 words, or
    * every bigram unk). */
  def finalizeOovScores(allDocs: DataFrame,
                        scored: DataFrame): DataFrame =
    allDocs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"),
        coalesce(col("doc_lp"), lit(0.0)).as("doc_lp"),
        when(col("n_bigrams").isNotNull &&
            col("n_bigrams") - col("n_unk") > 0,
          Rounding.duckRound(exp(-col("doc_lp") /
            (col("n_bigrams") - col("n_unk"))), 6)).as("ppl"))

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

  /** One micro-batch of the streaming model-REFRESH serving loop
    * (e239, VERDICT r16 #5), shaped for `foreachBatch`: land the
    * batch's docs in the corpus store, retrain on the corpus-so-far
    * (inclusive prefix), write the model as version `v<batchId>`, and
    * score the batch against that newest version read back through
    * storage alone. Every write is an overwrite of a per-batch path,
    * so an at-least-once redelivery reproduces identical state
    * instead of doubling it (the e231 idempotence lesson); no driver
    * state carries the model between batches — a restarted query
    * re-reads the same versions. Scoring uses the plain equi-join
    * path ([[docScores]]): under the inclusive protocol every scored
    * bigram is in the model (the train/serve-split OOV story is
    * e238's). */
  def refreshAndScore(spark: org.apache.spark.sql.SparkSession,
                      batch: DataFrame, batchId: Long,
                      store: String): Unit = {
    batch.write.mode("overwrite").parquet(s"$store/corpus/batch_$batchId")
    val parts = new java.io.File(s"$store/corpus").listFiles()
      .map(_.getPath).sorted.toIndexedSeq
    bigramLogProbs(spark.read.parquet(parts: _*))
      .write.mode("overwrite").parquet(s"$store/model/v$batchId")
    val newest = spark.read.parquet(s"$store/model/v$batchId")
    finalizeScores(batch, docScores(batch, newest))
      .withColumn("batch", lit(batchId).cast("int"))
      .write.mode("overwrite").parquet(s"$store/out_$batchId")
    ()
  }

  /** The CURATION operator the score exists for: keep documents with
    * perplexity at or below the exact q-quantile of the scored corpus
    * (CCNet keeps the low-perplexity head; the threshold is the
    * reference's G5 two-pass shape — [[graft.TwoPass]], one small
    * driver scalar, then a broadcast-filtered scan). Wordless docs
    * carry NULL ppl and drop: a rate-free doc has no evidence of
    * quality. */
  def perplexityFilter(docs: DataFrame, q: Double,
                       discount: Double = 0.75): DataFrame = {
    val scored = docLogProb(docs, discount)
    val row = graft.TwoPass.scalar(
      scored.agg(percentile(col("ppl"), lit(q)).as("c")))
    // a corpus with NO scored doc (every doc < 2 words) has no
    // quantile: the filter keeps nothing, rather than NPE-ing on the
    // null percentile
    if (row.isNullAt(0)) scored.filter(lit(false))
    else scored.filter(col("ppl") <= lit(row.getDouble(0)))
  }
}
