package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical LLM-data curation composition (VERDICT r16 #2): the
  * production ordering a 100 TB corpus runs daily, chained from the
  * engine's existing stages rather than re-implemented —
  *
  * {{{
  * documents --exact dedup (e1)--> canonical copies
  *   --quality filter (e7 composite >= min)--> plausible docs
  *   --KN perplexity cut (e234, corpus-q quantile)--> kept corpus
  *   --survivor stats--> (doc_id, n_words, quality, n_bigrams,
  *                        doc_lp, ppl)
  * }}}
  *
  * Stage-boundary contract: everything is ONE lazy plan except the
  * two inherent pauses — the cache pin on the quality-surviving
  * corpus and the perplexity quantile's [[graft.TwoPass]] scalar. The
  * cache is the point, not a convenience: the KN stage consumes its
  * input corpus along FOUR plan branches (bigram-type counts feeding
  * three model aggregations, plus the scoring explode) and the
  * quantile pass adds a fifth — without the pin every branch would
  * re-run dedup + quality from the raw scan. With it, the raw
  * documents scan runs ONCE (CurationSpec pins the consumer plans
  * read InMemoryTableScan). Cache cardinality is the post-filter
  * corpus — strictly smaller than the input, the same
  * candle-bounded-cache argument as Pipeline.run.
  *
  * Scale shape: dedup is one fingerprint shuffle (min-aggregate +
  * left-semi join back); quality is a pure per-row expression; the KN
  * stage is the e233/e234 plan family (hash aggs + equi-joins +
  * broadcast 1-row totals). No new shuffle class, no pair expansion,
  * nothing driver-side beyond the quantile scalar.
  */
object Curation {

  /** Run the chain; returns the per-doc stats of the docs that
    * survive all three cuts.
    *
    * @param qualityMin keep docs with composite quality ≥ this
    *                   (the e7 score: length, punctuation, stopword
    *                   mix — absolute threshold, corpus-independent)
    * @param pplQ       keep docs at or below this quantile of the
    *                   surviving corpus's KN perplexity (the CCNet
    *                   low-ppl head; corpus-relative by design) */
  def chain(docs: DataFrame, qualityMin: Double = 0.5,
            pplQ: Double = 0.5): DataFrame = {
    // stage 1: exact dedup — each content fingerprint keeps its
    // min-doc_id copy (e1 semantics), realized as a left-semi join so
    // the surviving rows keep their text for the later stages
    val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
    // stage 2: absolute quality cut on the e7 composite
    val qual = TextAnalysis.qualityScore(deduped)
      .filter(col("quality") >= qualityMin)
      .select(col("doc_id"), col("n_words"), col("quality"))
    // the stage-boundary pin (see object doc): one materialization
    // feeding every KN branch and the final stats join
    val kept = deduped.join(qual, Seq("doc_id")).cache()
    // stage 3: corpus-relative perplexity cut (trains on and scores
    // the surviving corpus — the e234 self-scoring shape)
    val scored = KneserNey.perplexityFilter(
      kept.select(col("doc_id"), col("text")), pplQ)
    // stage 4: survivor stats
    scored.join(kept.select(col("doc_id"), col("n_words"),
        col("quality")), Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("quality"),
        col("n_bigrams"), col("doc_lp"), col("ppl"))
  }
}
