package graft.ext

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.Rounding

/** Query-relevance scoring over the document corpus — the retrieval-side
  * text operator (training pipelines use it for query-targeted corpus
  * filtering and hard-negative mining).
  *
  * BM25 (Robertson/Spärck Jones, the standard probabilistic ranking
  * function): for query terms q, score(d) = Σ_q idf(q) · tf·(k1+1) /
  * (tf + k1·(1−b+b·|d|/avgdl)) with idf = ln(1 + (N−df+0.5)/(df+0.5)).
  *
  * Plan shape (reworked in r8 — the original lazy formulation rescanned
  * the full token explode once per consumer, ~5 scans, the one measured
  * suite regression): document length AND every term's frequency are
  * computed in ONE pass over the text as array expressions
  * (`size(filter(split(...)))` — no explode, no shuffle, fully inside
  * whole-stage codegen), yielding a per-doc frame of O(n_docs) rows
  * that is pinned once ([[CachePins]] contract, released via
  * [[Dedup.releasePinnedCaches]]). Corpus statistics (N, avgdl) are a
  * 1-row aggregate over that cached frame, cross-joined back in
  * (broadcast), never a collected driver scalar; the per-term
  * document-frequency table is broadcast. Only matches of the (tiny)
  * query-term set survive the projection, so the scoring joins run on
  * |matches|, not |tokens|.
  */
object Relevance {

  /** Per-doc frame (doc_id, dl, tfs: array<struct<tok,tf>>) for the
    * given terms, from a SINGLE scan of `docs`; cached (pin contract
    * above) because corpus stats, term df, and the score join all
    * consume it. `dl` counts all non-empty whitespace tokens; each
    * `tf` counts exact matches of one term — identical values to the
    * explode+groupBy formulation, without materializing the token
    * stream. One row per doc, O(terms) array cells — the cache is
    * n_docs-bounded, not token-bounded. */
  private def perDocFrame(docs: DataFrame,
                          terms: Seq[String]): DataFrame = {
    val tfs = terms.map { t =>
      struct(lit(t).as("tok"),
        size(F.filter(col("w"), x => x === lit(t))).cast("long").as("tf"))
    }
    val perDoc = CachePins.pin(docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        array(tfs: _*).as("tfs"))
      // zero-token docs carry no BM25 signal and are excluded from the
      // corpus statistics (N, avgdl) — the explode+groupBy formulation
      // dropped them implicitly, and the oracle's dl-from-tokens CTE
      // mirrors exactly that population
      .filter(col("dl") > 0))
    perDoc.count() // eager: consumed by stats, df, and the score join
    perDoc
  }

  /** (doc_id, dl, tok, tf) rows with tf > 0, off the cached per-doc
    * frame — the explode is over an O(terms) array per doc. */
  private def matches(perDoc: DataFrame): DataFrame =
    perDoc
      .select(col("doc_id"), col("dl"), explode(col("tfs")).as("m"))
      .select(col("doc_id"), col("dl"), col("m.tok").as("tok"),
        col("m.tf").as("tf"))
      .filter(col("tf") > 0)

  /** 1-row (n_docs, avgdl) corpus statistics off the cached per-doc
    * frame. */
  private def corpusStats(perDoc: DataFrame): DataFrame =
    perDoc.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

  /** BM25 contribution of one (tf, df, dl) row given broadcast corpus
    * stats columns n_docs/avgdl. */
  private def contrib(k1: Double, b: Double): Column = {
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) *
        (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
  }

  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // degenerate inputs the per-term array projection cannot express:
    // zero terms would build array() of no structs (untyped — analysis
    // error downstream), and a repeated term would emit its match rows
    // twice, double-counting df and the score contribution
    val ts = terms.distinct
    if (ts.isEmpty)
      return docs.select(col("doc_id"),
        lit(0L).as("n_terms_matched"),
        lit(null).cast("double").as("bm25")).limit(0)
    val perDoc = perDocFrame(docs, ts)
    val m = matches(perDoc)
    val df = m.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    m.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(corpusStats(perDoc)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        Rounding.duckRound(sum(contrib(k1, b)), 6).as("bm25"))
  }

  /** Multi-query BM25 ranking — the retrieval-eval screen: score every
    * document against a TABLE of queries (query_id, term) and keep each
    * query's top `k` documents. `queries` must be query-set-sized
    * (thousands of rows, not a corpus): its distinct terms are
    * collected as driver model state (bounded by the query vocabulary,
    * the same O(model) justification as KMeans centroids) so the corpus
    * pass stays the single-scan projection of [[bm25]]; the query table
    * itself is broadcast into the per-term match join.
    *
    * Ranking is by the ROUNDED (6-decimal) score, then doc_id — the
    * rounding absorbs the ≤1-ulp ln() divergence across engines, making
    * the rank itself cross-engine-deterministic. Output: (query_id,
    * rnk, doc_id, bm25). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 3,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (terms.isEmpty) // empty query table → empty ranking, not an error
      return docs.select(col("doc_id")).limit(0)
        .select(lit(0L).as("query_id"), lit(0L).as("rnk"),
          col("doc_id"), lit(null).cast("double").as("bm25"))
    val perDoc = perDocFrame(docs, terms)
    val m = matches(perDoc)
    val df = m.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = m
      .join(broadcast(queries.select(col("query_id"),
        col("term").as("tok"))), Seq("tok"))
      .join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(corpusStats(perDoc)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(Rounding.duckRound(sum(contrib(k1, b)), 6).as("bm25"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("bm25"))
  }
}
