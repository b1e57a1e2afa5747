package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Rounding

/** Text-analysis operators for training-data pipelines (SURVEY §7 E-ops):
  * quality scoring, language identification, token counting, and
  * winnowing-style document fingerprinting. All pure Column expressions —
  * codegen'd, no UDFs — and every regex sticks to constructs with
  * identical semantics in Java (Spark) and RE2 (DuckDB) so the oracle
  * twin is exact.
  */
object TextAnalysis {

  private def words(text: Column): Column =
    expr(s"filter(split($text, ' '), x -> x != '')")

  /** Per-document quality statistics and a deterministic composite score:
    * word count, average word length, punctuation ratio, stopword ratio.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nWords = size(w)
    val nChars = length(col("text"))
    val punct = (nChars -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double") /
      nChars
    val stopRatio = expr(
      """size(filter(filter(split(text, ' '), x -> x != ''),
        |  x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))""".stripMargin)
      .cast("double") / nWords
    val avgWlen =
      length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val score = lit(0.4) * least(nWords.cast("double") / 100, lit(1.0)) +
      lit(0.3) * (lit(1.0) - punct) + lit(0.3) * stopRatio
    docs.select(col("doc_id"), nWords.cast("long").as("n_words"),
      Rounding.duckRound(avgWlen, 6).as("avg_word_len"),
      Rounding.duckRound(punct, 6).as("punct_ratio"),
      Rounding.duckRound(stopRatio, 6).as("stopword_ratio"),
      Rounding.duckRound(score, 6).as("quality"))
  }

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "is", "that"),
    "es" -> Seq("el", "y", "los", "que", "de"),
    "fr" -> Seq("le", "et", "les", "que", "des"),
    "zh" -> Seq("的", "了", "是", "在", "我"))

  /** Language-ID heuristic: marker-token counts per language; prediction
    * is the first language (alphabetical) achieving the maximum score —
    * a deterministic argmax identical to the oracle's CASE chain. */
  def languageId(docs: DataFrame): DataFrame = {
    def score(markers: Seq[String]): Column = expr(
      s"""size(filter(filter(split(text, ' '), x -> x != ''),
         |  x -> x IN (${markers.map(m => s"'$m'").mkString(", ")})))"""
        .stripMargin)
    val scored = langMarkers.foldLeft(docs) { case (d, (lang, ms)) =>
      d.withColumn(s"s_$lang", score(ms))
    }
    val scoreCols = langMarkers.map { case (l, _) => col(s"s_$l") }
    val best = greatest(scoreCols: _*)
    // alphabetical first-wins tie-break: de, en, es, fr, zh
    val predAlpha = langMarkers.map(_._1).reverse
      .foldLeft(lit("und"): Column) { case (acc, lang) =>
        when(col(s"s_$lang") === best, lit(lang)).otherwise(acc)
      }
    scored.select((col("doc_id") +: col("lang").as("actual_lang") +:
      langMarkers.map { case (l, _) =>
        col(s"s_$l").cast("long").as(s"s_$l") }) :+
      predAlpha.as("pred_lang"): _*)
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * (letter runs, digit runs, single non-alphanumerics). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
        .as("n_bpe_tokens"))

  /** Winnowing document fingerprints: k-word shingles in document order,
    * md5-derived 60-bit hashes, rolling minimum over windows of `w`
    * consecutive shingles; the distinct window-minima are the
    * fingerprints (Schleimer et al., SIGMOD'03 — standard winnowing). */
  def fingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("wds"))
      .filter(size(col("wds")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(wds) - $k),
           |  i -> array_join(slice(wds, i + 1, $k), ' '))""".stripMargin)))
      .withColumnRenamed("col", "shingle")
      .withColumn("h", Dedup.md5Long(col("shingle")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    sh.withColumn("minh", min(col("h")).over(win))
      .filter(col("pos") >= w - 1)
      .select(col("doc_id"), col("minh").as("fingerprint"))
      .distinct()
  }

  /** Corpus vocabulary: the `n` most frequent whitespace tokens with
    * deterministic ranking (count desc, then token) — the frequency pass
    * a tokenizer-training step starts from.
    *
    * Scale shape: token counting is a partial-aggregated groupBy on the
    * token key; the top-n is `TakeOrderedAndProject` (per-partition
    * heaps, no global sort of the vocabulary). The row_number window
    * after the limit orders <= n rows — single tiny partition by
    * construction. */
  /** Intra-document repetition signals (the Gopher-rule family): the
    * fraction of words that are the document's single most frequent
    * word, and the fraction of 2-gram occurrences that are repeats —
    * the screens that catch boilerplate loops and keyword stuffing.
    *
    * The 2-gram fraction is a pure per-row array expression (no
    * shuffle); the top-word count is the standard explode → per-(doc,
    * word) count → per-doc max, all partial-aggregated. Fractions are
    * single IEEE divisions of exact integer counts — identical across
    * engines with no rounding. Documents under 2 words are dropped (no
    * 2-gram exists, and a 1-word doc's repetition is meaningless). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val gram = base.select(col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      expr("""transform(sequence(1, size(w) - 1),
             |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
             |""".stripMargin).as("grams"))
      .select(col("doc_id"), col("n_words"),
        ((size(col("grams")) - size(array_distinct(col("grams"))))
          .cast("double") / size(col("grams"))).as("dup_2gram_frac"))
    val top = base
      .select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    gram.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"),
        (col("top_c").cast("double") / col("n_words"))
          .as("top_word_frac"),
        col("dup_2gram_frac"))
  }

  def topTokens(docs: DataFrame, n: Int = 100): DataFrame =
    docs.select(explode(words(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(n)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))

  /** Adjacent-pair frequencies — the counting pass of one BPE merge
    * iteration (the merge rule a tokenizer trainer would pick is the
    * top row). Corpus-wide count of each ordered adjacent token pair,
    * top `n` by count with a (tok_a, tok_b) tie-break.
    *
    * Scale shape: pairs explode map-side from each document's token
    * array (one pass, no join — the pair list is a pure projection of
    * the split), partial-aggregate before the exchange, and the top-n
    * is `TakeOrderedAndProject` — per-partition heaps of n, never a
    * global sort of the pair vocabulary. Each BPE training iteration
    * over a 100 TB corpus is one scan + one pair-cardinality exchange;
    * iterations re-run the pass on re-tokenized text (driver-held merge
    * table as a literal `regexp_replace`/`transform` chain, the same
    * model-state topology as k-means). */
  def bpeMergePairs(docs: DataFrame, n: Int = 50): DataFrame =
    docs.select(words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(w) - 2),
          |  i -> struct(w[i] AS a, w[i + 1] AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok_a"), col("tok_b"))
      .limit(n)
}
