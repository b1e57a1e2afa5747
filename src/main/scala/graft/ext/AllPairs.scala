package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact sparse all-pairs similarity join with prefix filtering
  * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07)
  * — the SPARSE complement to the dense ANN family in [[Similarity]]:
  * find every document pair whose TF-IDF cosine meets a threshold,
  * WITHOUT the all-pairs join and WITHOUT approximation.
  *
  * Features are word k-shingle hashes (unigrams are useless on a
  * 31-word synthetic vocabulary — and on real corpora stopword mass
  * needs the same treatment), TF-IDF weighted and L2-normalized, so
  * cosine = dot product.
  *
  * The pruning argument, and why the result is still EXACT: fix any
  * global term order. For a doc whose terms are sorted in that order,
  * the suffix bound b(d,i) = Σ_{j≥i} w(d,t_j)·maxw(t_j) dominates the
  * cosine of d with ANY partner whose first shared term sits at
  * position ≥ i (each shared term contributes w·w' ≤ w·maxw). So if
  * cos(d1,d2) ≥ τ and t* is the FIRST shared term in the global
  * order, then b ≥ τ at t*'s position in BOTH docs — meaning both
  * docs still index t*. Indexing only positions with b ≥ τ therefore
  * loses no qualifying pair; everything after the suffix bound drops
  * below τ stays out of the inverted index. High-df boilerplate terms
  * get low idf → low maxw → sorted last → almost never indexed: the
  * prefix filter suppresses exactly the hot posting lists that blow
  * up a naive term join.
  *
  * Scale shape: one shingle scan, two bounded aggregations (df,
  * norms), a per-doc window for the suffix bounds (docs are the
  * natural partition unit), a candidate equi-join on PREFIX terms
  * only, and an exact verify join sized by |candidates| — never
  * |docs|². The index threshold carries a 1e-4 slack under τ so the
  * round-to-6 output contract can never exclude a borderline pair
  * from candidacy.
  */
object AllPairs {

  /** L2-normalized TF-IDF vectors over word k-shingle hashes:
    * (doc_id, h, wn). idf = ln(1 + N/df); docs shorter than k words
    * vanish (no shingles → no vector), mirroring the oracle. */
  def tfidfVectors(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = Dedup.rawShingles(docs, k)
      .select(col("doc_id"), Dedup.md5Long(col("shingle")).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // N as a driver scalar folded into the idf literal (the KMeans
    // bounded-model-state contract) — a crossJoin'd 1-row frame here
    // would thread a nested-loop join through every downstream
    // consumer of the cached vectors
    val n = docs.count().toDouble
    val w = tf.join(dfc, Seq("h"))
      .withColumn("w", col("tf") * log(lit(1.0) + lit(n) / col("df")))
    val nrm = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("s"))
    w.join(nrm, Seq("doc_id"))
      .select(col("doc_id"), col("h"), (col("w") / col("s")).as("wn"))
  }

  /** Every pair with round(cosine, 6) ≥ τ — exact, via prefix-filtered
    * candidates + exact verification. Output (doc_a, doc_b, sim),
    * doc_a < doc_b. */
  def cosinePairs(docs: DataFrame, tau: Double,
                  k: Int = 5): DataFrame = {
    // the vector frame feeds four consumers (maxw, bounds, both verify
    // sides) — materialize once or each consumer re-shingles the corpus
    val wn = CachePins.pin(tfidfVectors(docs, k))
    wn.count()
    val maxw = wn.groupBy(col("h")).agg(max(col("wn")).as("maxw"))
    // global term order (maxw desc, h): high-impact terms first, so
    // suffix bounds sink under τ quickly and prefixes stay short. Any
    // fixed order is CORRECT (see scaladoc); this one prunes best.
    val suffix = Window.partitionBy(col("doc_id"))
      .orderBy(col("maxw").desc, col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val index = wn.join(maxw, Seq("h"))
      .withColumn("b", sum(col("wn") * col("maxw")).over(suffix))
      .filter(col("b") >= tau - 1e-4)
      .select(col("h"), col("doc_id"))
    val cand = index.as("a").join(index.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val va = wn.select(col("doc_id").as("doc_a"), col("h"),
      col("wn").as("wa"))
    val vb = wn.select(col("doc_id").as("doc_b"), col("h"),
      col("wn").as("wb"))
    cand.join(va, Seq("doc_a")).join(vb, Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(graft.Rounding.duckRound(sum(col("wa") * col("wb")), 6)
        .as("sim"))
      .filter(col("sim") >= tau)
  }
}
