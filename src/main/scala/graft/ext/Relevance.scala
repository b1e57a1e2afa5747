package graft.ext

import org.apache.spark.sql.DataFrame
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
  * Everything stays in ONE lazy plan — corpus statistics (N, avgdl) are
  * a 1-row aggregate cross-joined back in (broadcast), never a collected
  * driver scalar; document length and term frequency are hash
  * aggregates; the per-term document-frequency table is broadcast. The
  * only rows that survive past the token scan are matches of the (tiny)
  * query-term set, so the scoring joins run on |matches|, not |tokens|.
  */
object Relevance {

  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        Rounding.duckRound(sum(contrib), 6).as("bm25"))
  }
}
