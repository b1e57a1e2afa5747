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

  /** One micro-batch of the STREAMING curation loop (e240) — the
    * [[chain]] semantics re-expressed as a continuous ingest
    * pipeline, shaped for `foreachBatch` and composed from the
    * engine's established streaming patterns:
    *
    *  1. dedup: first-seen-wins across the whole stream — within the
    *     batch each fingerprint keeps its min-doc_id copy, then a
    *     LEFT ANTI join against the fingerprint store-so-far drops
    *     content any earlier batch already carried (the e57
    *     bootstrap-store pattern); the batch's fingerprints land in
    *     the store for later batches.
    *  2. quality: the stateless e7 composite cut (per-row, no state).
    *  3. perplexity: the KN model covers the CURATED corpus-so-far
    *     (quality survivors of batches 0..N), derived INCREMENTALLY —
    *     the batch's kept docs reduce once to a bigram count partial,
    *     version v_N merges the partials of batches 0..N (the
    *     e241 refresh shape: O(batch) raw-doc work, hash-identical
    *     to a full prefix retrain because type counts are additive) —
    *     and scores this batch through storage alone; the cut is the
    *     batch's own median (the per-shard quantile CCNet actually
    *     runs; the corpus-global running-quantile alternative is
    *     [[curateBatchGlobalCut]]).
    *
    * Every write is an overwrite of a per-batch path, and every
    * prefix listing is numerically bounded at this batch's id
    * ([[graft.StoreFs.batchDirs]] — the "prior" view excludes the
    * batch's OWN first-attempt output, ADVICE r17), so an
    * at-least-once redelivery recomputes from exactly the first
    * attempt's inputs and reproduces identical store state (the
    * e231/e239 idempotence contract). No driver state survives
    * between batches; a restarted query re-reads the same stores. */
  def curateBatch(spark: org.apache.spark.sql.SparkSession,
                  batch: DataFrame, batchId: Long, store: String,
                  qualityMin: Double = 0.5,
                  pplQ: Double = 0.5): Unit = {
    import graft.TwoPass
    val (keptStored, scored) =
      curateStages(spark, batch, batchId, store, qualityMin)
    val cut = TwoPass.scalar(
      scored.agg(percentile(col("ppl"), lit(pplQ)).as("c")))
    val low =
      if (cut.isNullAt(0)) scored.filter(lit(false))
      else scored.filter(col("ppl") <= lit(cut.getDouble(0)))
    low.join(keptStored.select(col("doc_id"), col("n_words"),
        col("quality")), Seq("doc_id"))
      .select(lit(batchId).cast("int").as("batch"), col("doc_id"),
        col("n_words"), col("quality"), col("n_bigrams"),
        col("doc_lp"), col("ppl"))
      .write.mode("overwrite").parquet(s"$store/out_$batchId")
    ()
  }

  /** Stages 1–3 shared by the streaming-curation variants: dedup the
    * batch against the STRICTLY-PRIOR fingerprint store, apply the
    * stateless quality cut, land the survivors, derive model v_N from
    * merged per-batch count partials, and score the batch against it
    * through storage. Returns (the batch's kept docs as stored, their
    * finalized KN scores). */
  private def curateStages(spark: org.apache.spark.sql.SparkSession,
                           batch: DataFrame, batchId: Long,
                           store: String,
                           qualityMin: Double): (DataFrame, DataFrame) = {
    // 1. within-batch canonical copy per fingerprint (min doc_id)...
    val canon = batch
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(struct(col("doc_id"), col("text"))).as("m"))
      .select(col("fp"), col("m.doc_id").as("doc_id"),
        col("m.text").as("text"))
    // ...minus content a STRICTLY EARLIER batch already carried — the
    // bound excludes this batch's own directory, so a redelivery does
    // not see its first attempt's fingerprints and drop everything
    val prior = mergedFingerprintDirs(spark, store, upTo = batchId - 1)
    val fresh =
      if (prior.isEmpty) canon
      else canon.join(spark.read.parquet(prior: _*),
        Seq("fp"), "left_anti")
    fresh.select(col("fp")).write.mode("overwrite")
      .parquet(s"$store/fps/batch_$batchId")
    // 2. stateless quality cut; survivors join the curated store
    val kept = fresh.select(col("doc_id"), col("text"))
      .join(TextAnalysis.qualityScore(fresh)
          .filter(col("quality") >= qualityMin)
          .select(col("doc_id"), col("n_words"), col("quality")),
        Seq("doc_id"))
    kept.write.mode("overwrite").parquet(s"$store/curated/batch_$batchId")
    // 3. the batch's kept docs are RE-READ from the store they just
    //    landed in — one materialization feeds the count partial, the
    //    scorer, and the stats join, instead of re-running
    //    dedup+quality per consumer (the e237 cache pin, realized
    //    through storage). The model merges COUNT PARTIALS of kept
    //    batches 0..N (never re-reads earlier batches' documents —
    //    VERDICT r17 #1's incremental form).
    val keptStored = spark.read.parquet(s"$store/curated/batch_$batchId")
    KneserNey.bigramTypeCounts(
        keptStored.select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$store/counts/batch_$batchId")
    // checkpoint-aware merge (same store layout as the e241/e244
    // refresh), so a maintenance job can compactCounts this store too
    KneserNey.modelFromTypeCounts(
        KneserNey.mergedTypeCounts(spark, store, upTo = batchId))
      .write.mode("overwrite").parquet(s"$store/model/v$batchId")
    val model = spark.read.parquet(s"$store/model/v$batchId")
    val scored = KneserNey.finalizeScores(
      keptStored.select(col("doc_id")),
      KneserNey.docScores(
        keptStored.select(col("doc_id"), col("text")), model))
    (keptStored, scored)
  }

  /** SEED the streaming curation stores from an EXISTING corpus
    * (VERDICT r18 #5 — the e57 bootstrap pattern applied to the whole
    * loop): a production restart ingests against yesterday's corpus,
    * not an empty store. The base corpus runs the [[chain]]'s batch
    * stages once — within-corpus exact dedup (min-doc_id canonical
    * copy per fingerprint), then the stateless quality cut — and its
    * state lands as CHECKPOINTS AT HORIZON −1 ("everything before
    * batch 0"): `fps/ckpt_-1` carries every DISTINCT fingerprint the
    * base corpus has seen (pre-quality — the stream's fps contract:
    * even a low-quality base doc suppresses its later clones), and
    * `counts/ckpt_-1` the bigram type-count statistic of its KEPT
    * docs (what the per-batch models must train on).
    *
    * The horizon −1 trick is what makes seeding a PURE store-state
    * bootstrap: [[graft.StoreFs.mergedDirs]] resolves a checkpoint id
    * at or below the horizon, and batch 0's exclusive prior view is
    * `upTo = −1` — so the seed is visible from the very first
    * trigger, every real batch id stays ≥ 0, the loop code is
    * UNCHANGED, and a later [[compactFingerprints]]/compactCounts
    * folds the seed like any other checkpoint. The e250 gate pins the
    * composition: the seeded stream's survivors equal the per-batch
    * oracle over the union corpus with the seed as "batch −1". */
  def seedCurationStore(spark: org.apache.spark.sql.SparkSession,
                        docs: DataFrame, store: String,
                        qualityMin: Double = 0.5): Unit = {
    docs.select(md5(col("text")).as("fp")).distinct()
      .write.mode("overwrite").parquet(s"$store/fps/ckpt_-1")
    val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
    val kept = deduped.join(
      TextAnalysis.qualityScore(deduped)
        .filter(col("quality") >= qualityMin)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    KneserNey.bigramTypeCounts(
        kept.select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$store/counts/ckpt_-1")
  }

  /** The fingerprint store's source list at horizon `upTo` — the
    * generic [[graft.StoreFs.mergedDirs]] view on the dedup store
    * (tombstone-crash residue ignored, never double-read; harmless
    * here regardless, since the consumer is a distinct-semantics
    * anti-join). Empty before the first batch. */
  private def mergedFingerprintDirs(
      spark: org.apache.spark.sql.SparkSession,
      store: String, upTo: Long): Seq[String] =
    graft.StoreFs.mergedDirs(spark, s"$store/fps", upTo)

  /** COMPACT the fingerprint store (VERDICT r17's log-structured
    * pattern, applied to the dedup side the way
    * [[graft.ext.KneserNey.compactCounts]] applies it to the model
    * side): per-batch fingerprint sets accumulate one directory per
    * trigger, so the anti-join's source fan-in grows O(N) with
    * stream age. One [[graft.StoreFs.compact]] with a DISTINCT fold —
    * checkpoint before any delete, repeated compaction never rewrites
    * the checkpoint it reads, non-monotonic horizons refused, and the
    * same horizon contract: only compact at or below the last
    * committed batch. */
  def compactFingerprints(spark: org.apache.spark.sql.SparkSession,
                          store: String, upTo: Long): Unit =
    graft.StoreFs.compact(spark, s"$store/fps", upTo) { dirs =>
      spark.read.parquet(dirs: _*).distinct()
    }

  /** [[curateBatch]] with in-loop maintenance of BOTH growing stores
    * (e247): every `compactEvery` batches the fingerprint sets fold
    * into a distinct checkpoint ([[compactFingerprints]]) and the
    * count partials into a merged one
    * ([[graft.ext.KneserNey.compactCounts]]), so the anti-join and
    * model-merge fan-ins stay bounded forever. Same output contract
    * — the gate shares e240's oracle verbatim: compaction must be
    * invisible in every batch's survivors. */
  def curateBatchCompacting(spark: org.apache.spark.sql.SparkSession,
                            batch: DataFrame, batchId: Long,
                            store: String, qualityMin: Double = 0.5,
                            pplQ: Double = 0.5,
                            compactEvery: Int = 2): Unit = {
    curateBatch(spark, batch, batchId, store, qualityMin, pplQ)
    if ((batchId + 1) % compactEvery == 0) {
      // HORIZON ASYMMETRY, load-bearing: the fps store compacts at
      // batchId − 1, because its consumer is the EXCLUSIVE "prior"
      // view (upTo = N − 1) — a checkpoint at N would be invisible to
      // a redelivered batch N whose own-batch dirs are tombstoned,
      // resurrecting cross-batch duplicates. The counts store's
      // consumer bound is INCLUSIVE (upTo = N), so ckpt_N stays
      // visible on redelivery and folding the current batch is safe.
      compactFingerprints(spark, store, batchId - 1)
      KneserNey.compactCounts(spark, store, batchId)
    }
  }

  /** The FULL store-maintenance curation loop (VERDICT r18 #4):
    * [[curateBatchCompacting]] plus retention of the two
    * forever-growing OUTPUT families — model versions (keep the
    * newest at or below the committed horizon `batchId − 1` plus
    * every `keepEvery`-th, the
    * [[graft.StoreFs.retainVersions]] rollback ladder) and dead
    * curated batches (`curated/batch_<j>` is only ever re-read by its
    * OWN batch's redelivery, so every j strictly below this batch
    * retires). A redelivered batch N rewrites `curated/batch_N` and
    * `model/v<N>` itself before reading them, so GC below N is
    * invisible to it (CurationSpec pins it); the e253 gate shares
    * e240/e247's oracle verbatim — maintenance must be
    * survivor-invisible. */
  def curateBatchMaintained(spark: org.apache.spark.sql.SparkSession,
                            batch: DataFrame, batchId: Long,
                            store: String, qualityMin: Double = 0.5,
                            pplQ: Double = 0.5, compactEvery: Int = 2,
                            keepEvery: Int = 4): Unit = {
    curateBatchCompacting(spark, batch, batchId, store, qualityMin,
      pplQ, compactEvery)
    graft.StoreFs.retainVersions(spark, s"$store/model", prefix = "v",
      committed = batchId - 1, keepEvery = keepEvery)
    graft.StoreFs.retireBelow(spark, s"$store/curated",
      prefix = "batch_", below = batchId)
  }

  /** [[curateBatch]] with the CORPUS-GLOBAL running quantile a
    * long-running ingest wants (VERDICT r17 #5): instead of the
    * batch's own median, batch N is cut at quantile `pplQ` of the
    * MERGED perplexity scores of kept batches 0..N — each batch's
    * scores frozen as recorded against ITS version model v_j, never
    * rescored.
    *
    * The persisted per-batch artifact is the score vector itself,
    * `scores/batch_N` = (doc_id, ppl): count-bounded (~16 B per kept
    * doc — four orders below the corpus), so the exact interpolated
    * prefix quantile is one [[graft.TwoPass]] aggregation over
    * score-cardinality data, and that exact cut is the gate contract.
    * The e23a Greenwald-Khanna machinery rides along as the
    * sketch-path witness: `percentile_approx` over the same merged
    * store, checked in RANK space against its documented bound
    * (`cut_within` — the oracle asserts the constant-1 flag), since
    * Spark exposes no serialized mergeable GK state at the SQL layer
    * to persist per batch directly. Same idempotence contract as
    * [[curateBatch]]: per-batch overwrites, numerically-bounded
    * prefix listings.
    *
    * SCALE GUARD (VERDICT r18 #2): scores are ~unique doubles, so
    * Spark's exact `Percentile` buffer is effectively row-cardinality
    * at the final merge — over a stream's life that is O(all docs
    * ever kept) in ONE task's memory, a genuine 100 TB scale-killer.
    * The exact interpolated quantile is therefore only the OPERATIVE
    * cut while the merged store holds at most `exactCutMax` scores
    * (the gate contract at test scale; the default 10⁷ doubles keeps
    * the Percentile buffer in the low hundreds of MB for one task);
    * past it the already-computed mergeable GK estimate
    * (`percentile_approx`, constant memory per task) takes over as
    * the operative cut, still rank-bound-gated by `cut_within`. The
    * store-size probe is one count — never an unbounded buffer — so
    * NO aggregation on the past-threshold path holds more than the
    * sketch. The score store reads through
    * [[graft.StoreFs.mergedDirs]], so [[compactScores]] can bound its
    * fan-in like the fps and counts stores ([[curateBatchGlobalCutCompacting]]). */
  def curateBatchGlobalCut(spark: org.apache.spark.sql.SparkSession,
                           batch: DataFrame, batchId: Long,
                           store: String, qualityMin: Double = 0.5,
                           pplQ: Double = 0.5,
                           exactCutMax: Long = 10000000L): Unit = {
    import graft.TwoPass
    val (keptStored, scored) =
      curateStages(spark, batch, batchId, store, qualityMin)
    scored.select(col("doc_id"), col("ppl")).write.mode("overwrite")
      .parquet(s"$store/scores/batch_$batchId")
    val pre = spark.read.parquet(graft.StoreFs.mergedDirs(spark,
      s"$store/scores", upTo = batchId): _*)
    // the threshold probe is a ROW count — served from parquet
    // footer metadata, no column scan — and an upper bound on the
    // non-null score count, which is all the exact-vs-sketch branch
    // needs (BENCHNOTES r19: the first guard shape paid a full extra
    // store scan for this decision at test scale)
    val rowCount = TwoPass.scalar(
      pre.agg(count(lit(1)).as("rows"))).getLong(0)
    // the OPERATIVE cut: exact below the threshold, sketch above —
    // either branch computes its estimates in ONE scan (the GK
    // estimate rides along on the exact pass below the threshold;
    // above it, the sketch is the only aggregation and nothing holds
    // more than its constant-memory buffer)
    val est =
      if (rowCount == 0L) None
      else if (rowCount <= exactCutMax) {
        val r = TwoPass.scalar(pre.agg(
          percentile(col("ppl"), lit(pplQ)).as("c"),
          percentile_approx(col("ppl"), lit(pplQ), lit(10000)).as("ap")))
        if (r.isNullAt(0)) None
        else Some((r.getDouble(0), r.getDouble(1)))
      } else {
        val r = TwoPass.scalar(pre.agg(
          percentile_approx(col("ppl"), lit(pplQ), lit(10000)).as("ap")))
        if (r.isNullAt(0)) None
        else Some((r.getDouble(0), r.getDouble(0)))
      }
    val low = est match {
      case None         => scored.filter(lit(false))
      case Some((c, _)) => scored.filter(col("ppl") <= lit(c))
    }
    // the GK ε-flag (e23a's rank-space bound over the merged store):
    // the sketch estimate's rank interval must intersect the target
    // rank ± (10× documented relative rank error + 1 discreteness);
    // the non-null score count the target rank needs rides along on
    // the same scan
    val within = est match {
      case None => 1 // no scored doc anywhere: nothing to bound
      case Some((_, ap)) =>
        val r = TwoPass.scalar(pre.agg(
          count(col("ppl")).as("n"),
          sum(when(col("ppl") < ap, 1L).otherwise(0L)).as("lo"),
          sum(when(col("ppl") <= ap, 1L).otherwise(0L)).as("hi")))
        val n = r.getLong(0)
        val target = pplQ * n
        val tol = 10.0 * n / 10000 + 1.0
        if (r.getLong(1) + 1 <= target + tol &&
          r.getLong(2) >= target - tol) 1 else 0
    }
    low.join(keptStored.select(col("doc_id"), col("n_words"),
        col("quality")), Seq("doc_id"))
      .select(lit(batchId).cast("int").as("batch"), col("doc_id"),
        col("n_words"), col("quality"), col("n_bigrams"),
        col("doc_lp"), col("ppl"),
        lit(within).as("cut_within"))
      .write.mode("overwrite").parquet(s"$store/out_$batchId")
    ()
  }

  /** COMPACT the global-cut score store (VERDICT r18 #2's second
    * half): per-batch score vectors accumulate one directory per
    * trigger, so the prefix quantile's source fan-in grows O(N) with
    * stream age. The fold is a PLAIN CONCATENATION — score rows are
    * per-doc facts, not mergeable partials, so the checkpoint is just
    * the union rewritten as one directory (same
    * checkpoint-before-tombstone / crash-residue / monotonic-horizon
    * contract as the other stores via [[graft.StoreFs.compact]]).
    * Because the fold is a concatenation, each fold REWRITES the
    * whole store — O(total scores) per compaction, amortized but not
    * bounded. That is inherent to keeping raw score rows at all; the
    * form whose maintenance cost is independent of stream lifetime
    * is [[curateBatchHistCut]], which replaces the row store with
    * additive histogram partials (summed fold, O(bins) per
    * compaction) at the documented rank-resolution trade. */
  def compactScores(spark: org.apache.spark.sql.SparkSession,
                    store: String, upTo: Long): Unit =
    graft.StoreFs.compact(spark, s"$store/scores", upTo) { dirs =>
      spark.read.parquet(dirs: _*)
    }

  /** [[curateBatchGlobalCut]] with in-loop maintenance of ALL THREE
    * growing stores (e251): fingerprints fold at batchId − 1 (their
    * consumer is the exclusive prior view — the e247 horizon
    * asymmetry), count partials and score vectors at batchId (both
    * consumers are inclusive-bound, so their checkpoints stay visible
    * to a redelivered batch). Same output contract — the gate shares
    * e243's oracle verbatim: compaction must be survivor- AND
    * cut-invisible. */
  def curateBatchGlobalCutCompacting(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, store: String,
      qualityMin: Double = 0.5, pplQ: Double = 0.5,
      exactCutMax: Long = 10000000L, compactEvery: Int = 2): Unit = {
    curateBatchGlobalCut(spark, batch, batchId, store, qualityMin,
      pplQ, exactCutMax)
    if ((batchId + 1) % compactEvery == 0) {
      compactFingerprints(spark, store, batchId - 1)
      KneserNey.compactCounts(spark, store, batchId)
      compactScores(spark, store, batchId)
    }
  }

  /** The corpus-global quantile cut a 100 TB stream actually runs
    * (e256): the running quantile's state is a LOG-SPACED HISTOGRAM
    * of per-batch partials, not the score rows themselves. The
    * GK-promoted form ([[curateBatchGlobalCut]]) bounds one task's
    * MEMORY, but its quantile pass still READS the whole merged score
    * store every trigger — O(all docs ever kept) rows/trigger over a
    * stream's life — and [[compactScores]]' fold is an O(total)
    * rewrite, because raw score rows are facts, not mergeable
    * partials. Binning ppl at `bin = floor(ln(ppl) · binsPerE)`
    * (relative width e^(1/binsPerE) − 1 ≈ 5% at the default 20)
    * makes the state ADDITIVE: each trigger writes the batch's
    * O(bins)-row histogram partial, the merged view sums partials
    * per bin (value-bounded cardinality — a few hundred bins for any
    * natural corpus, INDEPENDENT of document count), the cut is the
    * smallest bin whose cumulative count reaches the target rank,
    * and survivors are the docs at or below that bin. Per-trigger
    * quantile work: O(batch) histogram build + O(bins × fan-in)
    * merge; compaction folds the same summed-count way as the
    * type-count stores. The trade, stated honestly: the cut is
    * exact in VALUE space to one bin (≤ 1/binsPerE relative in ppl)
    * but its RANK error is the cut bin's own mass — the whole bin
    * keeps. A natural corpus spreads ppl over decades (~100+
    * occupied bins, 1-2% mass each) so the keep rate lands within a
    * few percent of the target; a distribution CONCENTRATED inside
    * one bin width (near-identical synthetic docs —
    * CurationScaleProbe's corpus over-keeps 92% at a 50% target)
    * degrades toward keep-everything, and the mitigations are a
    * larger binsPerE or the GK form ([[curateBatchGlobalCut]]),
    * which is rank-exact but pays the O(corpus) per-trigger read.
    * Runs under FULL
    * maintenance (fps/counts/shist compaction + model and curated-dir
    * retention) — this is the form all three growing inputs of which
    * stay bounded forever. */
  def curateBatchHistCut(spark: org.apache.spark.sql.SparkSession,
                         batch: DataFrame, batchId: Long,
                         store: String, qualityMin: Double = 0.5,
                         pplQ: Double = 0.5, binsPerE: Int = 20,
                         compactEvery: Int = 2,
                         keepEvery: Int = 4): Unit = {
    import graft.TwoPass
    val (keptStored, scored) =
      curateStages(spark, batch, batchId, store, qualityMin)
    val bin = floor(log(col("ppl")) * binsPerE).cast("long")
    scored.filter(col("ppl").isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$store/shist/batch_$batchId")
    val hist = KneserNey.mergedCountsAt(spark, s"$store/shist",
      Seq("bin"), upTo = batchId)
    val tot = TwoPass.scalar(hist.agg(sum(col("cnt")).as("n")))
    val low =
      if (tot.isNullAt(0)) scored.filter(lit(false))
      else {
        // smallest bin whose cumulative count reaches the target
        // rank — the single-partition window WindowExec warns about
        // is the intent: it runs over the value-bounded histogram
        // (a few hundred rows), never over document-cardinality rows
        val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
        val cb = TwoPass.scalar(hist
          .withColumn("cum", sum(col("cnt")).over(w))
          .filter(col("cum") >=
            lit(pplQ) * lit(tot.getLong(0)).cast("double"))
          .agg(min(col("bin")).as("cb")))
        scored.filter(col("ppl").isNotNull &&
          bin <= lit(cb.getLong(0)))
      }
    low.join(keptStored.select(col("doc_id"), col("n_words"),
        col("quality")), Seq("doc_id"))
      .select(lit(batchId).cast("int").as("batch"), col("doc_id"),
        col("n_words"), col("quality"), col("n_bigrams"),
        col("doc_lp"), col("ppl"))
      .write.mode("overwrite").parquet(s"$store/out_$batchId")
    if ((batchId + 1) % compactEvery == 0) {
      compactFingerprints(spark, store, batchId - 1)
      KneserNey.compactCounts(spark, store, batchId)
      KneserNey.compactCountsAt(spark, s"$store/shist",
        Seq("bin"), batchId)
    }
    graft.StoreFs.retainVersions(spark, s"$store/model", prefix = "v",
      committed = batchId - 1, keepEvery = keepEvery)
    graft.StoreFs.retireBelow(spark, s"$store/curated",
      prefix = "batch_", below = batchId)
  }
}
