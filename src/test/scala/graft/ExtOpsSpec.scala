package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Relevance, Similarity, TextAnalysis}

/** E-op unit tests: dedup family, similarity, text analysis, multimodal
  * plumbing — small hand-checkable inputs. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "a b c d e f g h"),            // base
    (2L, "a b c d e f g h"),            // exact duplicate of 1
    (3L, "a b c d e f g x"),            // near-duplicate of 1
    (4L, "p q r s t u v w"))            // unrelated
    .toDF("doc_id", "text")

  test("E1: exact dedup groups identical texts, keeps min doc_id") {
    val d = Dedup.exact(docsDf).collect()
    assert(d.length == 3)
    val dup = d.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("E19: bm25 tolerates empty and duplicate term lists") {
    import spark.implicits._
    val d = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    assert(Relevance.bm25(d, Nil).count() == 0)
    def rowsOf(terms: Seq[String]) =
      Relevance.bm25(d, terms).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // a repeated term must not double-count df or the contribution
    assert(rowsOf(Seq("a", "a")) == rowsOf(Seq("a")))
  }

  test("E63: normalized exact dedup folds case/punct variants that " +
    "raw-text dedup keeps apart") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO\t WORLD"),
      (4L, "a different doc")).toDF("doc_id", "text")
    assert(Dedup.exact(d).count() == 4) // raw: all distinct
    val norm = Dedup.exactNormalized(d).collect()
    assert(norm.length == 2)
    val folded = norm.find(_.getAs[Long]("n_copies") == 3L).get
    assert(folded.getAs[Long]("keep_id") == 1L)
  }

  test("E2: n-gram jaccard — identical docs 1.0; near-dup in (0,1); " +
    "unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docsDf, k = 3, minJaccard = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("E43: containment flags a short doc embedded in a long one " +
    "where jaccard stays low") {
    val d = Seq(
      (1L, "a b c d e f g"),                              // short
      (2L, "a b c d e f g q r s t u v w x y z m n o p"))  // contains 1
      .toDF("doc_id", "text")
    // doc 1's three 5-shingles all occur in doc 2 → containment 1.0
    // from doc 1's side; jaccard is 3/17 ≈ 0.18
    val c = graft.ext.Dedup.containmentPairs(d, k = 5,
      minContainment = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((1L, 2L)) == 1.0)
    assert(!c.contains((2L, 1L))) // the long side is NOT contained
    val j = graft.ext.Dedup.ngramJaccardPairs(d, k = 5,
      minJaccard = 0.5).count()
    assert(j == 0L)
  }

  test("E3: minhash LSH finds identical and near-identical docs") {
    val pairs = Dedup.minhashLshPairs(docsDf, k = 3, numHashes = 16,
      rowsPerBand = 2, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // identical docs share every band → always candidates; verified 1.0
  }

  test("E3: lshBands emits the partial final band when rowsPerBand " +
    "does not divide numHashes (ADVICE r4)") {
    val sh = Dedup.shingleHashes(docsDf, 3)
    val mh = Dedup.minhash(sh, numHashes = 5)
    // 5 hashes, 2 per band → bands 0-1 full, band 2 = the trailing seed;
    // dropping it would silently lower candidate recall
    val bands = Dedup.lshBands(mh, numHashes = 5, rowsPerBand = 2)
    assert(bands.select(col("band")).distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2))
    // every doc carries all 3 bands, and identical docs (1, 2) share
    // every band key — including the partial one
    assert(bands.groupBy(col("doc_id")).count()
      .filter(col("count") =!= 3).isEmpty)
    val byBand = bands.collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(r =>
        r.getLong(0) -> r.getLong(2)).toMap)
    (0 to 2).foreach { b =>
      assert(byBand(b)(1L) == byBand(b)(2L), s"band $b key mismatch")
    }
  }

  test("E4: simhash is identical for identical docs (hamming 0)") {
    val pairs = Dedup.simhashPairs(docsDf, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long](2))
    assert(pairs.exists(_._1 == (1L, 2L)))
  }

  test("E35: edit-distance pairs verify SimHash-bucketed candidates " +
    "with the exact Levenshtein distance") {
    val pairs = Dedup.editDistancePairs(docsDf, prefixLen = 80,
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs((1L, 2L)) == 0L) // exact duplicate
    assert(pairs((1L, 3L)) == 1L) // one substituted character (h -> x)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("E34: BPE merge-pair counts rank the most frequent adjacent " +
    "pair first, with deterministic tie-breaks") {
    val d = Seq(
      (1L, "a b a b a b"), // (a,b)x3, (b,a)x2
      (2L, "a b c"),       // (a,b), (b,c)
      (3L, "x"))           // single token: no pairs
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergePairs(d, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 4L), ("b", "a", 2L), ("b", "c", 1L)))
  }

  test("E173: multi-iteration BPE training matches the hand-computed " +
    "merge order, with greedy non-overlap on repeated-symbol runs") {
    val d = Seq(
      (1L, "a a a a a"), // (a,a)x4 — the overlap-run case
      (2L, "a b a b"),   // (a,b)x2, (b,a)x1
      (3L, "c a b"))     // (c,a), (a,b)
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    // round 1: (a,a)=4 wins; doc 1 greedily fuses to ["a a","a a","a"]
    //   (even offsets of the run — NOT 4 overlapping fusions)
    // round 2: (a,b)=3 wins (the run fusion removed no (a,b) pair)
    // round 3: all pairs tie at 1; ("a a","a") wins the (a,b) order
    assert(got == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "a a", "a", 1L)))
  }

  test("E175: applying the learned merge table reproduces the " +
    "training loop's final segmentation (hand-computed counts)") {
    val d = Seq(
      (1L, "a a a a a"), // r1 (a,a): [aa,aa,a]; r3 (aa,a): [aa,aaa]
      (2L, "a b a b"),   // r2 (a,b): [ab,ab]
      (3L, "c a b"))     // r2: [c,ab]
      .toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrainRules(d, merges = 3)
      .map(r => (r._2, r._3))
    val got = TextAnalysis.bpeApply(d, rules).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((5L, 2L, 3L)),
      2L -> ((4L, 2L, 2L)),
      3L -> ((3L, 2L, 1L))))
  }

  test("E173: BPE training stops early when the corpus runs out of " +
    "pairs") {
    val d = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, merges = 10).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "x" && got(0).getString(2) == "y")
  }

  test("E195: char-level BPE trains to EXACTLY the target vocab, " +
    "weighting pairs by word count, with the (count, a, b) tie rule") {
    // words: "abab" x3, "cd" x2, "ce" x1 → base chars {a,b,c,d,e} = 5
    // round 1: in-word pairs weighted by wc: (a,b)=2·3=6, (b,a)=3,
    //   (c,d)=2, (c,e)=1 → (a,b) wins
    // round 2: abab → [ab,ab]: (ab,ab)=3, (c,d)=2, (c,e)=1
    // round 3 (target 8 reached after): (c,d)=2
    val d = Seq((1L, "abab cd abab"), (2L, "abab cd ce"))
      .toDF("doc_id", "text")
    val (base, rules) = TextAnalysis.bpeTrainToVocab(d, targetVocab = 8)
    assert(base == 5L)
    assert(rules.map(r => (r._1, r._2, r._3, r._4, r._5)) == Seq(
      (1L, "a", "b", 6L, 6L),
      (2L, "a b", "a b", 3L, 7L),
      (3L, "c", "d", 2L, 8L)))
    // tie case: two pairs at equal weighted count — lexicographically
    // smaller (a, then b) wins. "xy" x2 vs "xz" x2 → (x,y) first.
    val t = Seq((1L, "xy xz"), (2L, "xy xz")).toDF("doc_id", "text")
    val (_, tr) = TextAnalysis.bpeTrainToVocab(t, targetVocab = 4)
    assert(tr.head._2 == "x" && tr.head._3 == "y" && tr.head._4 == 2L)
    // delta form: base discovered (3: x,y,z) + extra 1 → one merge
    val (db, dr) = TextAnalysis.bpeTrainToVocabDelta(t, extra = 1)
    assert(db == 3L && dr.length == 1)
  }

  test("E195: vocab-target training stops at pair exhaustion when " +
    "the target is unreachable") {
    val d = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (base, rules) = TextAnalysis.bpeTrainToVocab(d, targetVocab = 99)
    assert(base == 2L)
    // one merge fuses the only word to a single symbol; no pairs left
    assert(rules == Seq((1L, "a", "b", 2L, 3L)))
  }

  test("E185: Luhn validates the classic test number and rejects its " +
    "off-by-one") {
    val d = Seq("4111111111111111", "4111111111111112",
      "4532015112830366").toDF("cc")
    val got = d.select(col("cc"),
        TextAnalysis.luhnValid16(col("cc")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4111111111111111"))
    assert(!got("4111111111111112"))
    assert(got("4532015112830366"))
  }

  test("E184: event trigrams count 3-step patterns a pairwise matrix " +
    "misses") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      (1L, 1L, t(0), "a"), (1L, 2L, t(1), "b"), (1L, 3L, t(2), "c"),
      (1L, 4L, t(3), "a"), (1L, 5L, t(4), "b"), (1L, 6L, t(5), "c"),
      (2L, 7L, t(0), "a"), (2L, 8L, t(1), "b")) // too short for a trigram
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.ext.EventAnalytics.eventTrigrams(ev, 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got(("a", "b", "c")) == 2L)
    assert(got(("b", "c", "a")) == 1L)
    assert(!got.contains(("a", "b", null)))
  }

  test("E38: tf-idf ranks rare terms above common ones per doc") {
    // over docsDf: 'h' appears in docs 1,2 (df=2); a..g in 1,2,3
    // (df=3); doc 4's tokens are unique (df=1). Smoothed idf
    // ln((4+1)/(df+1)) makes 'h' doc 1's top term.
    val top = TextAnalysis.tfidfTopTerms(docsDf, 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("tok"), r.getAs[Double]("tfidf"))).toMap
    assert(top((1L, 1))._1 == "h")
    assert(top((1L, 1))._2 > top((1L, 2))._2)
    // doc 4 ties on score everywhere (all df=1, tf=1) → token order
    assert(top((4L, 1))._1 == "p" && top((4L, 2))._1 == "q")
    assert(math.abs(top((4L, 1))._2 - math.log(5.0 / 2.0)) < 1e-6)
  }

  test("E41: sliding chunks overlap and truncate at the document end") {
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"))
      .toDF("doc_id", "text")
    val ch = TextAnalysis.chunkSliding(d, window = 4, stride = 3)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[String]("chunk_text"))).toMap
    assert(ch.size == 4) // starts 0, 3, 6, 9
    assert(ch(0L) == (4L, "t0 t1 t2 t3"))
    assert(ch(1L) == (4L, "t3 t4 t5 t6"))
    assert(ch(3L) == (1L, "t9")) // final chunk truncated
  }

  test("E49: trigram diversity is distinct over total per source") {
    val d = Seq(
      (1L, "a b c a b c", "A"),  // grams: abc, bca, cab, abc → 4/3
      (2L, "x y z w", "B"))      // grams: xyz, yzw → 2/2
      .toDF("doc_id", "text", "source")
    // pins the trigram construction the e49 composition uses
    val wl = d.select(col("source"),
      expr("filter(split(text, ' '), x -> x != '')").as("w"))
    val tri = wl.filter(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(w) - 3),
          |  i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))"""
          .stripMargin)).as("g"))
    val got = tri.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), count_distinct(col("g")).as("nd"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("nd"))).toMap
    assert(got("A") == ((4L, 3L)) && got("B") == ((2L, 2L)))
  }

  test("E42: PMI scores a bigram against its unigram probabilities") {
    val d = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    // bigrams: (x,y)x3, (y,x)x2 → B=5; unigrams x=3, y=3 → T=6
    // pmi(x,y) = ln((3/5) / ((3/6)·(3/6))) = ln(2.4)
    val got = TextAnalysis.pmiCollocations(d, n = 10, minCount = 1L)
      .collect().map(r => (r.getAs[String]("tok_a"),
        r.getAs[String]("tok_b")) ->
        (r.getAs[Long]("c_ab"), r.getAs[Double]("pmi"))).toMap
    assert(got(("x", "y"))._1 == 3L)
    assert(math.abs(got(("x", "y"))._2 - math.log(2.4)) < 1e-6)
    // pmi(y,x) = ln((2/5) / 0.25) = ln(1.6)
    assert(math.abs(got(("y", "x"))._2 - math.log(1.6)) < 1e-6)
  }

  test("E5: cosine and brute-force knn rank by similarity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(2.0f, 0.0f)),   // parallel → sim 1.0
      (2L, Array(1.0f, 1.0f)),   // 45° → ~0.707
      (3L, Array(0.0f, 1.0f)))   // orthogonal → 0.0
      .toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(vecs.filter($"vec_id" === 0L),
      vecs, 3).orderBy("rank").collect()
    assert(knn.map(_.getAs[Long]("n_id")).toSeq == Seq(1L, 2L, 3L))
    assert(knn(0).getAs[Double]("sim") == 1.0)
    assert(math.abs(knn(1).getAs[Double]("sim") - 0.707107) < 1e-6)
    assert(knn(2).getAs[Double]("sim") == 0.0)
  }

  test("E68: SQ8 quantization hits the range endpoints exactly and " +
    "zeroes constant dimensions") {
    // dim 0 spans [0, 2] → q ∈ {0, 128, 255}; dim 1 is constant → q=0,
    // zero error by the constant-dim guard
    val vecs = Seq(
      (0L, Array(0.0f, 5.0f), 1),
      (1L, Array(1.0f, 5.0f), 1),
      (2L, Array(2.0f, 5.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.scalarQuantizeError(vecs).collect()
      .map(r => r.getInt(0) -> r).toMap
    // label 1: dim0 q = 0 (v=0) + 128 (v=1 → floor(127.5+0.5)), dim1
    // q = 0 twice; label 2: dim0 q = 255, dim1 q = 0
    assert(got(1).getAs[Long]("sum_q") == 128L)
    assert(got(2).getAs[Long]("sum_q") == 255L)
    assert(got(2).getAs[Double]("max_abs_err") == 0.0) // endpoint exact
    assert(got(1).getAs[Long]("n_vals") == 4L)
    // midpoint v=1 dequantizes to 128*2/255 ≈ 1.003922
    assert(math.abs(got(1).getAs[Double]("max_abs_err") - 0.003922)
      < 1e-6)
  }

  test("E6: IVF knn searches only the query's cell") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(1.0f, 0.1f), 7),
      (2L, Array(1.0f, 0.0f), 8)) // same direction, different cell
      .toDF("vec_id", "embedding", "label")
    val knn = Similarity.ivfKnn(vecs.filter($"vec_id" === 0L), vecs, 5)
      .collect()
    assert(knn.map(_.getAs[Long]("n_id")).toSet == Set(1L))
  }

  test("E7/E9: quality stats and token counts are hand-checkable") {
    val d = Seq((1L, "the cat, sat!")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(d).head()
    assert(q.getAs[Long]("n_words") == 3L)
    // "thecat,sat!" = 11 chars / 3 words
    assert(math.abs(q.getAs[Double]("avg_word_len") - 11.0 / 3) < 1e-4)
    // 2 punct chars of 13 total
    assert(math.abs(q.getAs[Double]("punct_ratio") - 2.0 / 13) < 1e-4)
    val t = TextAnalysis.tokenCounts(d).head()
    assert(t.getAs[Long]("n_ws_tokens") == 3L)
    // BPE-ish: the, ' '×0, cat, ',', sat, '!' → [a-z]+ ×3 + punct ×2 = 5
    assert(t.getAs[Long]("n_bpe_tokens") == 5L)
  }

  test("E8: language id picks the marker-richest language, " +
    "alphabetical tie-break") {
    val d = Seq(
      (1L, "the cat and the dog of it", "en"),
      (2L, "der hund und die katze", "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang"))
      .toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
  }

  test("E10: winnowing emits one fingerprint per window position, " +
    "deduplicated") {
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // 10 words, k=5 → 6 shingles; w=4 → positions 3..5 → ≤3 fingerprints
    val fp = TextAnalysis.fingerprints(d, k = 5, w = 4)
    assert(fp.count() <= 3 && fp.count() >= 1)
  }

  test("E66: pii scrub counts on original text and masks sequentially") {
    val d = Seq(
      (1L, "mail a.b@x.org and c@y.co.uk see https://x.org/p?q=1 " +
        "acct 1234567890 short 12345678"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_emails") == 2L)
    assert(got(1L).getAs[Long]("n_urls") == 1L)
    // 10-digit acct matches; the 8-digit run is below the floor
    assert(got(1L).getAs[Long]("n_longnums") == 1L)
    assert(got(1L).getAs[String]("text_clean") ==
      "mail <PII> and <PII> see <PII> acct <PII> short 12345678")
    assert(got(2L).getAs[Long]("n_emails") == 0L)
    assert(got(2L).getAs[String]("text_clean") == "no pii here at all")
  }

  test("E67: boilerplate lines dropped corpus-wide, docs reassembled " +
    "in order, fully-boilerplate docs survive empty") {
    // 4-word lines: "c1 c2 c3 c4" appears in all three docs
    // (boilerplate); each doc keeps its unique line in order
    val d = Seq(
      (1L, "a1 a2 a3 a4 c1 c2 c3 c4"),
      (2L, "c1 c2 c3 c4 b1 b2 b3 b4"),
      (3L, "c1 c2 c3 c4")).toDF("doc_id", "text")
    val got = TextAnalysis
      .boilerplateLineDedup(d, lineWords = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_kept") == 1L)
    assert(got(1L).getAs[Long]("n_dropped") == 1L)
    assert(got(1L).getAs[String]("text_clean") == "a1 a2 a3 a4")
    assert(got(2L).getAs[String]("text_clean") == "b1 b2 b3 b4")
    assert(got(3L).getAs[Long]("n_kept") == 0L)
    assert(got(3L).getAs[String]("text_clean") == "")
  }

  test("E11: multimodal plumbing — byte lengths, frame counts, stub decode") {
    val d = Seq((1L, "x" * 150, "en", "src", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.frameFeatures(Multimodal.asBlobTable(d)).head()
    assert(feats.getAs[Long]("byte_len") == 150L)
    assert(feats.getAs[Long]("n_frames") == 3L)  // ceil(150/64)
    assert(feats.getAs[Long]("mid_frame_len") == 64L) // middle frame full
    val frames = Multimodal.decodeFrames(Multimodal.asBlobTable(d))
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames.map(_.n_bytes).toSeq == Seq(64, 64, 22))
    assert(frames(0).checksum == 64L * 'x'.toInt)
  }
}
