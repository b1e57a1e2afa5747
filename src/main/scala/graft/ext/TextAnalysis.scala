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

  /** Per-document average unigram log-probability under the corpus's
    * OWN unigram distribution — the self-contained form of the
    * LM-perplexity quality filter (CCNet-style pipelines score with a
    * trained LM; the corpus-unigram degenerate needs no model and
    * already separates fluent text from token soup). score(d) =
    * avg over tokens t of ln(freq(t) / total_tokens); every token has
    * freq ≥ 1 by construction, so no smoothing term is needed. Low
    * (very negative) scores = documents of rare/garbage tokens; scores
    * near zero = all-boilerplate documents — both ends are the cut
    * candidates.
    *
    * Scale shape: one token scan builds the vocabulary counts
    * (vocab-cardinality exchange), a second joins tokens to their
    * counts on the token key — an equi-join Spark broadcasts at small
    * vocab and shuffle-joins at web-scale vocab (heavy-tailed typo
    * mass), both correct — and the per-doc average is a partial-
    * aggregated groupBy. The corpus total rides along as a broadcast
    * 1-row aggregate, never a driver scalar. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(words(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val total = vocab
      .agg(sum(col("n_tok")).cast("double").as("n_total"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        graft.Rounding.duckRound(
          avg(log(col("n_tok") / col("n_total"))), 6).as("avg_logprob"))
  }

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

  /** MULTI-ITERATION BPE training (VERDICT r12 #3) — the full
    * tokenizer-training loop [[bpeMergePairs]] is one pass of: count
    * adjacent pairs → adopt the top pair (count desc, then (a, b) — a
    * total order, so the argmax is engine-independent) as the next
    * merge rule → RE-SEGMENT every sequence by greedy left-to-right
    * non-overlapping replacement of (a, b) with the fused symbol
    * "a b" → recount. Emits the learned merge table
    * (merge_rank, tok_a, tok_b, cnt-at-adoption), stopping early if
    * the corpus runs out of pairs.
    *
    * Re-segmentation is the codegen'd O(n) native fold
    * ([[graft.functions.BpeMergeFold]]) per sequence: append each
    * symbol unless the last emitted element is `a` and the current is
    * `b`, in which case fuse. The fold equals lookahead-greedy because
    * a fused emission can never itself match `a` ("a b" would have to
    * equal its own strict prefix); runs of a repeated symbol therefore
    * fuse at even offsets exactly like the oracle's island-parity
    * rule. An empty accumulator never matches (the portable twin's
    * `try_element_at` null probe).
    *
    * Scale shape: each merge is ONE corpus scan + one pair-cardinality
    * exchange + one TakeOrdered(1) — the k-means topology: the merge
    * table is O(merges) driver state entering each round's plan as
    * three literals, and per-round [[CachePins.pinCheckpoint]] keeps
    * the re-segmented corpus one plan node deep instead of `merges`
    * folds deep. Real tokenizer training at 100 TB runs this loop on
    * a sampled subcorpus (vocab statistics converge long before the
    * full corpus is seen); the loop body is unchanged either way. */
  /** The greedy one-rule re-segmentation fold (see [[bpeTrain]]'s
    * equivalence argument) — the codegen'd O(n)
    * [[graft.functions.BpeMergeFold]]. The interpreted `aggregate`
    * fold it replaces copied the accumulator array per element (both
    * `concat` branches), i.e. O(n²) per document per rule — the
    * dominant cost of every BPE gate; the native pass is the same
    * fold element for element (equality property-pinned against
    * [[mergeFoldPortable]] in ExtOpsSpec, and every BPE oracle gate
    * is unchanged). */
  private def mergeFold(a: String, b: String) =
    graft.functions.BpeMergeFold(col("w"), a, b)

  /** The built-ins-only fold [[mergeFold]] replaces (reference
    * semantics for the equivalence property; not on any query path). */
  private[graft] def mergeFoldPortable(a: String, b: String) =
    aggregate(col("w"), array().cast("array<string>"),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(lit(a + " " + b))))
        .otherwise(concat(acc, array(x))))

  /** The training loop's DRIVER-HELD output: the learned merge table
    * as (rank, tok_a, tok_b, count-at-adoption) — O(merges) model
    * state, the k-means contract (callers memoize it in `ModelCache`
    * keyed by corpus+merges so train-then-apply pays one training). */
  def bpeTrainRules(docs: DataFrame,
                    merges: Int): Seq[(Long, String, String, Long)] = {
    var seqs = CachePins.pinCheckpoint(
      docs.select(words(col("text")).as("w")))
    val rules =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = seqs.filter(size(col("w")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(w) - 2),
            |  i -> struct(w[i] AS a, w[i + 1] AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((r.toLong, a, b, c))
        seqs = CachePins.pinCheckpoint(
          seqs.select(mergeFold(a, b).as("w")))
        r += 1
      }
    }
    rules.toSeq
  }

  /** The learned merge table as a DataFrame (the e173 gate shape). */
  def bpeTrain(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainRules(docs, merges).toDF("merge_rank", "tok_a", "tok_b", "cnt")
  }

  /** CHARACTER-level BPE trained TO A TARGET VOCAB SIZE (VERDICT r13
    * #3) — the real tokenizer-training contract (Sennrich et al. 2016:
    * run until |vocab| = N), where [[bpeTrainRules]] runs a fixed
    * merge count. Differences, both load-bearing:
    *
    *  - **Distinct-word weighting**: the corpus collapses to the
    *    (word, count) table FIRST and every round's pair statistics
    *    are `Σ word_count` over in-word adjacent pairs. This is the
    *    standard BPE scale topology: after one corpus-sized
    *    aggregation, training state is VOCABULARY-sized — at 100 TB
    *    the word table is a few million rows regardless of corpus
    *    size, so 10k merge rounds iterate on a frame that fits in one
    *    executor's cache. (e173's corpus-resegmenting form is the
    *    within-document generalization; this is what production
    *    training runs.)
    *  - **Vocab-based stopping with an explicit vocab SET**: base
    *    vocab = distinct characters; each adopted merge must produce
    *    a NOVEL symbol (enforced — two merge paths arriving at the
    *    same joined string would make |vocab| grow by less than one
    *    per rule, silently desynchronizing any rank-indexed oracle;
    *    fail loudly instead). Stop at |vocab| ≥ target or pair
    *    exhaustion.
    *  - **Deterministic tie priority**: (count DESC, tok_a, tok_b) —
    *    pinned by a spec tie case.
    *
    * Returns (baseVocab, rules) with rules =
    * (rank, tok_a, tok_b, weighted count, vocab size after adoption).
    * Merged symbols join with a space, so "t"+"h" → "t h" (rank
    * structure visible, and base chars — which never contain spaces —
    * cannot collide with fusions).
    */
  def bpeTrainToVocab(docs: DataFrame, targetVocab: Int,
                      maxMerges: Int = 256)
      : (Long, Seq[(Long, String, String, Long, Long)]) =
    trainToVocab(docs, _ => targetVocab, maxMerges)

  /** [[bpeTrainToVocab]] with the target expressed RELATIVE to the
    * discovered base vocab (base + extra) — the scale-factor-
    * independent gate form: the unrolled oracle can assume exactly
    * `extra` rounds whatever corpus it runs on. */
  def bpeTrainToVocabDelta(docs: DataFrame, extra: Int,
                           maxMerges: Int = 256)
      : (Long, Seq[(Long, String, String, Long, Long)]) =
    trainToVocab(docs, base => base.toInt + extra, maxMerges)

  /** APPLY a char-level merge table (the serving half of
    * [[bpeTrainToVocab]]): rules fold over the DISTINCT word table —
    * the memoized tokenizer-serving shape (tokens-per-word computed
    * once per TYPE, then documents re-expand against the word table
    * with a broadcast join). At 100 TB this is the production
    * topology: the word table is vocabulary-sized, the folds touch
    * only it, and the corpus pays one explode + one broadcast join.
    * Emits per-doc (n_word_chars, n_tokens, n_words); docs with no
    * words keep a zero row. */
  def charBpeApplyStats(docs: DataFrame,
                        rules: Seq[(String, String)]): DataFrame = {
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    var seqs = docs
      .select(explode(words(col("text"))).as("word")).distinct()
      .select(col("word"), chars.as("w"))
    rules.zipWithIndex.foreach { case ((a, b), i) =>
      val folded = seqs.select(col("word"), mergeFold(a, b).as("w"))
      seqs =
        if (i % 3 == 2 || i == rules.size - 1)
          CachePins.pinCheckpoint(folded)
        else folded
    }
    val tokPerWord = seqs.select(col("word"),
      size(col("w")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("wchars"))
    val ag = docs
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .join(broadcast(tokPerWord), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wchars")).as("n_word_chars"),
        sum(col("n_tok")).as("n_tokens"),
        count(lit(1)).as("n_words"))
    docs.select(col("doc_id")).join(ag, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_words"), lit(0L)).as("n_words"))
  }

  private def trainToVocab(docs: DataFrame, targetOf: Long => Int,
                           maxMerges: Int)
      : (Long, Seq[(Long, String, String, Long, Long)]) = {
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    var seqs = CachePins.pinCheckpoint(
      docs.select(explode(words(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wc"))
        .select(col("word"), col("wc"), chars.as("w")))
    val baseVocab = scala.collection.mutable.Set[String]()
    seqs.select(explode(col("w")).as("c")).distinct().collect()
      .foreach(r => baseVocab += r.getString(0))
    val vocab = baseVocab.clone()
    val base = baseVocab.size.toLong
    val targetVocab = targetOf(base)
    val rules = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var r = 1
    var exhausted = false
    while (vocab.size < targetVocab && r <= maxMerges && !exhausted) {
      val top = seqs.filter(size(col("w")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(w) - 2),
            |  i -> struct(w[i] AS a, w[i + 1] AS b))""".stripMargin))
          .as("p"), col("wc"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val fused = a + " " + b
        require(!vocab.contains(fused),
          s"BPE merge #$r produced an existing vocab symbol '$fused' — " +
            "vocab would grow by <1 and rank-indexed oracles desync")
        vocab += fused
        rules += ((r.toLong, a, b, c, vocab.size.toLong))
        seqs = CachePins.pinCheckpoint(
          seqs.select(col("word"), col("wc"), mergeFold(a, b).as("w")))
        r += 1
      }
    }
    (base, rules.toSeq)
  }

  /** APPLY a learned merge table (the tokenizer-SERVING half of
    * [[bpeTrain]] — training composes onto the corpus): re-segment
    * every document by the rules IN RANK ORDER and emit per-document
    * compression stats (token counts before/after, merges applied).
    * Identical folds to training, so applying the rules to the
    * training corpus reproduces the training loop's final state
    * exactly — the oracle reuses the unrolled chain's last stage.
    *
    * Scale shape: `rules.size` chained map-side folds fused into ONE
    * narrow pass (no shuffle at all until the caller aggregates, no
    * materialization at all): the native [[mergeFold]] expressions
    * nest one plan node deep per rule and the optimizer collapses the
    * chained projections, so the whole rule table applies inside one
    * whole-stage-codegen span — the "fused single-pass automaton"
    * this doc used to defer to at higher rule counts. (The former
    * every-3rd-rule localCheckpoint existed to bound the INTERPRETED
    * fold chain's analyzed-plan blowup; with O(n) native folds it was
    * 4 full corpus materializations of pure overhead.) Serving a
    * 100 TB corpus with a trained table is exactly this —
    * embarrassingly parallel, one pass over the corpus. */
  def bpeApply(docs: DataFrame,
               rules: Seq[(String, String)]): DataFrame = {
    var seqs = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_before"),
      words(col("text")).as("w"))
    rules.foreach { case (a, b) =>
      seqs = seqs.select(col("doc_id"), col("n_before"),
        mergeFold(a, b).as("w"))
    }
    seqs.select(col("doc_id"), col("n_before"),
      size(col("w")).cast("long").as("n_after"),
      (col("n_before") - size(col("w")).cast("long")).as("n_merged"))
  }

  /** Per-document top-k terms by TF-IDF with smoothed IDF
    * `ln((N + 1) / (df + 1))` — the keyword-extraction pass used to
    * label or cluster corpus slices. Ranking uses the ROUNDED score
    * (then the token) so the per-doc row_number is deterministic and
    * engine-independent even when two scores agree to 6 decimals.
    *
    * Scale shape: term frequencies partial-aggregate on (doc, tok);
    * document frequencies re-aggregate the same keyed stream (column
    * pruning specializes each branch, so the scan runs twice — at
    * corpus scale, persist the tf frame or derive df from a written tf
    * table to make it one pass); the corpus size joins in as a
    * broadcast 1-row aggregate. The only window partitions by doc_id
    * and carries a rank predicate Spark pushes into WindowGroupLimit —
    * never a corpus-wide sort. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", Rounding.duckRound(
        col("tf").cast("double") *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("tok"), col("tfidf"))
  }

  /** Corpus collocations by pointwise mutual information:
    * `pmi = ln(P(a,b) / (P(a)·P(b)))` with P(a,b) over bigram count
    * `nB` and P(·) over token count `nT`, restricted to bigrams seen
    * at least `minCount` times, top `n` by rounded PMI (then tokens).
    * The division chain is written identically in the oracle so both
    * engines feed `ln` the same IEEE double.
    *
    * `nB` is the UNFILTERED bigram total — Σ over multi-word docs of
    * (len−1), counted directly from token positions rather than by
    * re-aggregating the bigram counts — so P(a,b) is a probability over
    * ALL bigram occurrences (the textbook definition), not just the
    * frequent ones the minCount screen keeps. Normalizing by the
    * filtered total would inflate every PMI by ln(N_all/N_frequent).
    *
    * Scale shape: the bigram and unigram counts are the same map-side
    * explode + partial aggregate as [[bpeMergePairs]]; corpus totals
    * ride along as a broadcast 1-row aggregate; the two unigram joins
    * key on a bounded vocabulary. Top-n is `TakeOrderedAndProject`. */
  def pmiCollocations(docs: DataFrame, n: Int = 50,
                      minCount: Long = 10L): DataFrame = {
    val toks = docs.select(words(col("text")).as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val multi = toks.filter(size(col("w")) >= 2)
    val bi = multi
      .select(explode(expr(
        """transform(sequence(0, size(w) - 2),
          |  i -> struct(w[i] AS a, w[i + 1] AS b))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // n_bi from token positions, not from re-aggregating `bi` — one
    // cheap scan-side aggregate instead of a second consumer branch on
    // the bigram groupBy (the multi-branch rebuild the dedup caches
    // exist to avoid)
    val totals = uni.agg(sum(col("c")).as("n_tok"))
      .crossJoin(multi.agg(
        sum(size(col("w")) - 1).cast("long").as("n_bi")))
    bi.join(uni.select(col("tok").as("tok_a"), col("c").as("c_a")),
        Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("c").as("c_b")),
        Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", Rounding.duckRound(log(
        (col("c_ab").cast("double") / col("n_bi").cast("double")) /
          ((col("c_a").cast("double") / col("n_tok").cast("double")) *
            (col("c_b").cast("double") / col("n_tok").cast("double")))),
        6))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(n)
  }

  /** Sliding-window chunking with overlap — the RAG/context-window
    * export: each document's tokens are cut into chunks of `window`
    * tokens starting every `stride` tokens (stride < window ⇒
    * overlapping chunks), the final chunk truncated at the document
    * end. `chunk_id` is the 0-based window index; `n_tok` the actual
    * chunk length.
    *
    * Scale shape: a pure per-row explode of a computed start-offset
    * sequence — no shuffle, no state, perfectly input-partitioned;
    * exactly the map-side shape a 100 TB chunk export needs. */
  def chunkSliding(docs: DataFrame, window: Int = 32,
                   stride: Int = 24): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1,
          lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(lit(window), size(col("w")) - col("start")).cast("long")
          .as("n_tok"),
        array_join(slice(col("w"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))

  /** Luhn mod-10 validity of a 16-digit string — the VALIDATION
    * stage after [[piiScrub]]'s digit-run detector: any 16-digit run
    * is a card-number CANDIDATE, but only a Luhn-valid one is a real
    * leak (random digit runs pass 1-in-10). For a 16-digit number the
    * doubled positions are the odd ones from the left. Pure
    * substring/CASE arithmetic — the identical expression tree runs
    * in SQL, no regex or UDF. */
  def luhnValid16(num: Column): Column =
    (1 to 16).map { i =>
      val d = substring(num, i, 1).cast("int")
      if (i % 2 == 1) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
      else d
    }.reduce(_ + _) % 10 === 0

  /** PII patterns with identical semantics in Java regex (Spark) and
    * RE2 (DuckDB): character classes, bounded quantifiers, and ASCII
    * word boundaries only — no backreferences or lookarounds (RE2 has
    * neither). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val LongNumRe = "\\b[0-9]{9,}\\b"

  /** PII scrub — the redaction pass a training-data pipeline runs
    * before packing: count and mask emails, URLs, and long digit runs
    * (account/phone-shaped). Counts are measured on the ORIGINAL text;
    * masking applies the three patterns in a fixed order (email → URL
    * → number), each replacing every occurrence with `mask`.
    *
    * Scale shape: pure per-row Column expressions (regexp_count /
    * regexp_replace are codegen'd) — no shuffle, no UDF; a 100 TB
    * scrub is exactly one map-side pass. */
  def piiScrub(docs: DataFrame, mask: String = "<PII>"): DataFrame = {
    val t = col("text")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(t, lit(LongNumRe)).cast("long").as("n_longnums"),
      regexp_replace(
        regexp_replace(regexp_replace(t, lit(EmailRe), lit(mask)),
          lit(UrlRe), lit(mask)),
        lit(LongNumRe), lit(mask)).as("text_clean"))
  }

  /** C4-style boilerplate-line removal: segment every document into
    * consecutive `lineWords`-word "lines", drop each line that occurs
    * in `minDocs`-or-more DISTINCT documents corpus-wide (navigation
    * chrome, cookie banners, licence footers — text repeated across
    * documents is boilerplate, not content), and reassemble the
    * surviving lines in order. Documents whose every line is
    * boilerplate survive with empty text (count them; don't lose
    * them).
    *
    * Scale shape: one explode (map-side), ONE shuffle on the line for
    * the distinct-doc frequency (partial-aggregated), an equi-join of
    * segments against the boilerplate line set (the minority of
    * distinct lines — AQE broadcasts it when small), and one shuffle
    * back on doc_id to reassemble. No windows, no per-doc state: the
    * frequency side scales with DISTINCT lines, the reassembly with
    * surviving segments. */
  def boilerplateLineDedup(docs: DataFrame, lineWords: Int = 8,
                           minDocs: Int = 2): DataFrame = {
    val segs = lineSegments(docs, lineWords)
    val boiler = segs.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select(col("line"))
    rebuildDocs(segs, segs.join(boiler, Seq("line"), "left_anti"))
  }

  /** First-occurrence-keeping exact line dedup — the CANONICAL-COPY
    * twin of [[boilerplateLineDedup]] (Dolma-style duplicate-paragraph
    * removal): a repeated `lineWords`-word line is kept in its first
    * corpus occurrence (smallest (doc_id, pos)) and dropped from every
    * LATER occurrence, so the corpus retains exactly one copy of each
    * distinct span instead of zero copies of frequent ones. The
    * remove-everywhere form deletes boilerplate; this form
    * deduplicates content while preserving corpus coverage.
    *
    * Scale shape: identical to the boilerplate form — one explode,
    * ONE line-key shuffle carrying a min(struct(doc_id, pos))
    * aggregate (partial-aggregated map-side), a self-equi-join on the
    * line key (reusing the aggregation's partitioning), one doc_id
    * shuffle to reassemble. No windows, no per-doc state. */
  def canonicalLineDedup(docs: DataFrame,
                         lineWords: Int = 8): DataFrame = {
    val segs = lineSegments(docs, lineWords)
    val canon = segs.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("c"))
      .select(col("line"), col("c.doc_id").as("c_doc"),
        col("c.pos").as("c_pos"))
    val kept = segs.join(canon, Seq("line"))
      .filter(col("doc_id") === col("c_doc") &&
        col("pos") === col("c_pos"))
      .select(col("doc_id"), col("pos"), col("line"))
    rebuildDocs(segs, kept)
  }

  /** Shared segmentation of [[boilerplateLineDedup]] /
    * [[canonicalLineDedup]]: consecutive `lineWords`-word chunks as
    * (doc_id, pos, line) — one map-side explode. */
  private def lineSegments(docs: DataFrame, lineWords: Int): DataFrame =
    docs
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0,
           |    cast(ceil(size(split(text, ' ')) / ${lineWords}.0)
           |      as int) - 1),
           |  i -> concat_ws(' ',
           |    slice(split(text, ' '), i * $lineWords + 1,
           |      $lineWords)))""".stripMargin)))
      .toDF("doc_id", "pos", "line")

  /** Shared reassembly: surviving segments back to one row per input
    * document (kept/dropped counts + in-order cleaned text; documents
    * losing every line survive with empty text). */
  private def rebuildDocs(segs: DataFrame, kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(expr("transform(" +
        "array_sort(collect_list(struct(pos, line))), x -> x.line)"),
        " ").as("text_clean"))
    val totals = segs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_total"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Zipf's-law fit of the corpus frequency spectrum: least-squares
    * slope of ln(freq) on ln(rank) over the full vocabulary — natural
    * text sits near slope ≈ −1; synthetic/templated corpora (like this
    * one: measured −0.18) and boilerplate floods deviate, which makes
    * the single scalar a cheap corpus-health monitor next to the e49
    * diversity ratios. The vocabulary aggregation is the e24 pass; the
    * rank is one window over the VOCABULARY (size-bounded by Heaps'
    * law, not corpus-bounded — ordering ties break on the token);
    * the regression reuses the round-before-use co-moment discipline
    * of EventAnalytics.trendRegression, so slope/intercept/R² are
    * identical expression trees cross-engine. */
  def zipfFit(docs: DataFrame): DataFrame = {
    val cnt = docs.select(explode(words(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ranked = cnt.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
    val xy = ranked.select(
      log(col("rank").cast("double")).as("x"),
      log(col("cnt").cast("double")).as("y"))
    val a = xy.agg(count(lit(1)).as("n_terms"),
      Rounding.duckRound(avg(col("x")), 6).as("mx"),
      Rounding.duckRound(avg(col("y")), 6).as("my"),
      Rounding.duckRound(covar_pop(col("y"), col("x")), 6).as("cxy"),
      Rounding.duckRound(var_pop(col("x")), 6).as("vx"),
      Rounding.duckRound(var_pop(col("y")), 6).as("vy"))
    a.select(col("n_terms"),
      Rounding.duckRound(col("cxy") / col("vx"), 6).as("slope"),
      Rounding.duckRound(
        col("my") - (col("cxy") / col("vx")) * col("mx"), 6)
        .as("intercept"),
      Rounding.duckRound(
        (col("cxy") * col("cxy")) / (col("vx") * col("vy")), 6)
        .as("r2"))
  }

  /** Exact phrase search over a positional postings list: build
    * (doc, pos, token) rows, anchor on the first term, then one
    * co-partitioned equi-join per remaining term at `pos + i` — the
    * inverted-index adjacency walk (tf alone cannot distinguish
    * "table hash" from "hash table"). Candidates shrink at every
    * join (each step keeps only positions whose next term matches),
    * and every join keys on (doc, position) — co-partitioned, never
    * a cross product. Returns per-doc match count and first match
    * position (1-based). */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val post = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
    val first = post.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (term, i)) =>
        acc.join(post.filter(col("tok") === term)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos")).as("first_pos"))
  }

  /** The hashing trick: every token hashes to one of `buckets` signed
    * feature slots — the fixed-width featurization that needs NO
    * vocabulary pass, no fit state, and no OOV handling (the reason
    * Vowpal-style pipelines scale ingestion linearly). Output is the
    * sparse representation (doc, bucket, count, signed sum); the sign
    * bit comes from the next hash bit up, the standard unbiasing
    * trick (collisions cancel in expectation instead of inflating).
    * Hashing is the md5-derived [[Dedup.md5Long]] (non-negative by
    * construction: 60 hash bits), so bucket and sign are exact
    * cross-engine integer arithmetic — one explode + one
    * partial-aggregated groupBy, nothing collects a vocabulary. */
  def featureHash(docs: DataFrame, buckets: Int = 64): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("tok"))
      .withColumn("hv", Dedup.md5Long(col("tok")))
      .groupBy(col("doc_id"), (col("hv") % buckets).as("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(expr(s"(hv DIV $buckets) % 2") === 0, 1L)
          .otherwise(-1L)).as("signed_sum"))
}
