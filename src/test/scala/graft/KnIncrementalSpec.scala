package graft

import org.apache.spark.sql.DataFrame

import graft.ext.KneserNey

/** The incremental KN refresh's two load-bearing claims (VERDICT r17
  * #1): (a) a model derived by MERGING per-batch count partials is
  * identical to a full retrain on the concatenated raw corpus — while
  * the earlier batches' raw documents are unrecoverable by
  * construction (no corpus store exists, only counts); and (b) an
  * at-least-once redelivery reproduces identical store state. The
  * hash-identity of the full replayed loop against the naive form's
  * oracle is the e241 gate's job; this spec pins the mechanism. */
class KnIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(pairs: (Long, String)*) =
    pairs.toDF("doc_id", "text")

  test("batch N's model derives from count partials alone: batch 0's " +
    "raw docs no longer exist anywhere when batch 1 trains, yet the " +
    "model equals the full-corpus retrain") {
    // overlapping vocabulary so merged counts differ from either
    // batch's own (c(a,b) = 2 only after the merge), plus a bigram
    // type whose continuation sets change across batches
    val b0 = docsOf(0L -> "a b a b", 1L -> "b c")
    val b1 = docsOf(2L -> "a b c a")
    val store = Scratch.fresh("kn_inc_spec", "/root/testdata/sf0.001")

    KneserNey.refreshAndScoreIncremental(spark, b0, 0L, store)
    // the ONLY persisted trace of batch 0 is its count partial — no
    // raw document of batch 0 is reachable from the store
    val stored = new java.io.File(store).listFiles().map(_.getName).toSet
    assert(!stored.contains("corpus"),
      s"incremental refresh must not persist raw docs, found: $stored")
    assert(spark.read.parquet(s"$store/counts/batch_0")
      .columns.toSeq.sorted == Seq("cnt", "w1", "w2"))

    KneserNey.refreshAndScoreIncremental(spark, b1, 1L, store)
    val incremental = rows(spark.read.parquet(s"$store/model/v1")
      .orderBy("w1", "w2"))
    val full = rows(KneserNey.bigramLogProbs(b0.unionByName(b1))
      .orderBy("w1", "w2"))
    assert(incremental == full,
      "merged count partials diverged from the full-corpus retrain")
    // and the batch's recorded scores come from that same model
    val out1 = rows(spark.read.parquet(s"$store/out_1").drop("batch")
      .orderBy("doc_id"))
    val exp1 = rows(KneserNey.finalizeScores(b1,
      KneserNey.docScores(b1, KneserNey.bigramLogProbs(
        b0.unionByName(b1)))).orderBy("doc_id"))
    assert(out1 == exp1)
  }

  test("redelivery of a batch recomputes from its first attempt's " +
    "inputs: identical store state, never doubled counts") {
    val b0 = docsOf(0L -> "a b a b")
    val b1 = docsOf(1L -> "a c b c")
    val store = Scratch.fresh("kn_inc_redeliver",
      "/root/testdata/sf0.001")
    KneserNey.refreshAndScoreIncremental(spark, b0, 0L, store)
    KneserNey.refreshAndScoreIncremental(spark, b1, 1L, store)
    val model1 = rows(spark.read.parquet(s"$store/model/v1")
      .orderBy("w1", "w2"))
    val out1 = rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id"))
    // redeliver batch 1 (at-least-once): the prefix listing is
    // bounded at batchId, the partial is an overwrite — state must
    // be bit-identical, not doubled
    KneserNey.refreshAndScoreIncremental(spark, b1, 1L, store)
    assert(rows(spark.read.parquet(s"$store/model/v1")
      .orderBy("w1", "w2")) == model1)
    assert(rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id")) == out1)
    assert(StoreFs.batchDirs(spark, s"$store/counts").length == 2)
  }

  test("trigram incremental refresh: the PAIR of merged count-partial " +
    "families gives the full-corpus trigram model, with no raw-doc " +
    "store") {
    // shared trigram types across batches so merged counts differ
    // from either batch's own at both count families
    val b0 = docsOf(0L -> "a b c a b c", 1L -> "b c d")
    val b1 = docsOf(2L -> "a b c d a")
    val store = Scratch.fresh("kn3_inc_spec", "/root/testdata/sf0.001")
    KneserNey.refreshAndScoreTrigramIncremental(spark, b0, 0L, store)
    val stored = new java.io.File(store).listFiles().map(_.getName).toSet
    assert(!stored.contains("corpus"),
      s"trigram incremental refresh must not persist raw docs: $stored")
    KneserNey.refreshAndScoreTrigramIncremental(spark, b1, 1L, store)
    assert(rows(spark.read.parquet(s"$store/model/v1")
      .orderBy("w1", "w2", "w3")) ==
      rows(KneserNey.trigramLogProbs(b0.unionByName(b1))
        .orderBy("w1", "w2", "w3")),
      "merged trigram+bigram partials diverged from the full retrain")
    // redelivery reproduces identical state at both count families
    val out1 = rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id"))
    KneserNey.refreshAndScoreTrigramIncremental(spark, b1, 1L, store)
    assert(rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id")) == out1)
    assert(StoreFs.batchDirs(spark, s"$store/counts3").length == 2)
    assert(StoreFs.batchDirs(spark, s"$store/counts2").length == 2)
  }

  test("compaction bounds the store: partials fold into one " +
    "checkpoint, the model is unchanged, and crash residue between " +
    "checkpoint and tombstone is ignored, not double-counted") {
    val batches = Seq("a b a", "b c", "a c a b", "c d b")
    val store = Scratch.fresh("kn_inc_compact",
      "/root/testdata/sf0.001")
    batches.zipWithIndex.foreach { case (t, i) =>
      KneserNey.refreshAndScoreCompacting(spark,
        docsOf(i.toLong -> t), i.toLong, store, compactEvery = 2)
    }
    // after batches 0..3 with compactEvery=2: ckpt_3 subsumed
    // everything (and retired ckpt_1) — the listing no longer grows
    // with stream age
    assert(StoreFs.batchDirs(spark, s"$store/counts").isEmpty,
      "covered partials must be tombstoned")
    assert(StoreFs.batchDirs(spark, s"$store/counts", prefix = "ckpt_")
      .map(_.split("ckpt_").last.toLong) == Seq(3L))
    val all = docsOf(batches.zipWithIndex.map {
      case (t, i) => i.toLong -> t }: _*)
    assert(rows(spark.read.parquet(s"$store/model/v3")
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramLogProbs(all).orderBy("w1", "w2")),
      "compacted model diverged from the full-corpus retrain")

    // crash residue: a covered partial still on disk next to the
    // checkpoint that subsumes it (the crash-between window) must be
    // IGNORED by the merged view...
    KneserNey.bigramTypeCounts(docsOf(1L -> batches(1)))
      .write.mode("overwrite").parquet(s"$store/counts/batch_1")
    assert(rows(KneserNey.mergedTypeCounts(spark, store, 3L)
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramTypeCounts(all).orderBy("w1", "w2")),
      "crash residue double-counted into the merged view")
    // ...and a re-run compaction finishes the tombstone half WITHOUT
    // rewriting the checkpoint it would be reading from
    KneserNey.compactCounts(spark, store, 3L)
    assert(StoreFs.batchDirs(spark, s"$store/counts").isEmpty)
    assert(rows(KneserNey.mergedTypeCounts(spark, store, 3L)
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramTypeCounts(all).orderBy("w1", "w2")))
  }

  test("trigram compaction bounds BOTH count families, the model is " +
    "unchanged, crash residue on the trigram store is ignored, and a " +
    "non-monotonic horizon is refused (VERDICT r18 #1 + ADVICE r18)") {
    val batches = Seq("a b c a b", "b c d b", "a c a b c d", "c d b a c")
    val store = Scratch.fresh("kn3_inc_compact",
      "/root/testdata/sf0.001")
    batches.zipWithIndex.foreach { case (t, i) =>
      KneserNey.refreshAndScoreTrigramCompacting(spark,
        docsOf(i.toLong -> t), i.toLong, store, compactEvery = 2)
    }
    // after batches 0..3 with compactEvery=2: each family holds only
    // ckpt_3 (ckpt_1 retired, partials tombstoned)
    Seq("counts3", "counts2").foreach { sub =>
      assert(StoreFs.batchDirs(spark, s"$store/$sub").isEmpty,
        s"$sub: covered partials must be tombstoned")
      assert(StoreFs.batchDirs(spark, s"$store/$sub", prefix = "ckpt_")
        .map(_.split("ckpt_").last.toLong) == Seq(3L), sub)
    }
    val all = docsOf(batches.zipWithIndex.map {
      case (t, i) => i.toLong -> t }: _*)
    assert(rows(spark.read.parquet(s"$store/model/v3")
      .orderBy("w1", "w2", "w3")) ==
      rows(KneserNey.trigramLogProbs(all).orderBy("w1", "w2", "w3")),
      "compacted trigram model diverged from the full-corpus retrain")
    // crash residue: covered partials back on disk next to the
    // checkpoints that subsume them must be IGNORED at both families
    val resid = docsOf(1L -> batches(1))
    KneserNey.trigramTypeCounts(resid)
      .write.mode("overwrite").parquet(s"$store/counts3/batch_1")
    KneserNey.bigramTypeCounts(resid)
      .write.mode("overwrite").parquet(s"$store/counts2/batch_1")
    assert(rows(KneserNey.mergedCountsAt(spark, s"$store/counts3",
      Seq("w1", "w2", "w3"), 3L).orderBy("w1", "w2", "w3")) ==
      rows(KneserNey.trigramTypeCounts(all).orderBy("w1", "w2", "w3")),
      "trigram crash residue double-counted into the merged view")
    assert(rows(KneserNey.mergedCountsAt(spark, s"$store/counts2",
      Seq("w1", "w2"), 3L).orderBy("w1", "w2")) ==
      rows(KneserNey.bigramTypeCounts(all).orderBy("w1", "w2")))
    // a re-run compaction finishes the tombstone half without
    // rewriting the checkpoints it reads
    KneserNey.compactTrigramCounts(spark, store, 3L)
    assert(StoreFs.batchDirs(spark, s"$store/counts3").isEmpty)
    assert(StoreFs.batchDirs(spark, s"$store/counts2").isEmpty)
    // the monotonic-horizon guard (ADVICE r18): compacting BELOW the
    // existing ckpt_3 would fold residue-only partials into an
    // undercounting ckpt_1 — it must refuse, and leave state intact
    KneserNey.trigramTypeCounts(resid)
      .write.mode("overwrite").parquet(s"$store/counts3/batch_1")
    intercept[IllegalArgumentException] {
      KneserNey.compactCountsAt(spark, s"$store/counts3",
        Seq("w1", "w2", "w3"), 1L)
    }
    assert(StoreFs.batchDirs(spark, s"$store/counts3",
      prefix = "ckpt_").map(_.split("ckpt_").last.toLong) == Seq(3L))
    assert(rows(KneserNey.mergedCountsAt(spark, s"$store/counts3",
      Seq("w1", "w2", "w3"), 3L).orderBy("w1", "w2", "w3")) ==
      rows(KneserNey.trigramTypeCounts(all).orderBy("w1", "w2", "w3")))
  }

  test("maintained refresh retires old model versions on the " +
    "keep-newest-plus-ladder contract, and a redelivered batch still " +
    "finds everything it needs after GC (VERDICT r18 #4)") {
    val batches = Seq("a b a", "b c", "a c a b", "c d b", "d a c", "b d")
    val store = Scratch.fresh("kn_inc_maint", "/root/testdata/sf0.001")
    batches.zipWithIndex.foreach { case (t, i) =>
      KneserNey.refreshAndScoreMaintained(spark,
        docsOf(i.toLong -> t), i.toLong, store,
        compactEvery = 2, keepEvery = 2)
    }
    // after batch 5 (committed horizon 4, keepEvery 2): the ladder
    // keeps v0/v2/v4 (every 2nd), v4 is also the newest committed,
    // v5 is this trigger's own write — v1/v3 retired
    assert(StoreFs.batchDirs(spark, s"$store/model", prefix = "v")
      .map(_.split("/v").last.toLong) == Seq(0L, 2L, 4L, 5L))
    // the serving model is still the full-prefix retrain
    val all = docsOf(batches.zipWithIndex.map {
      case (t, i) => i.toLong -> t }: _*)
    assert(rows(spark.read.parquet(s"$store/model/v5")
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramLogProbs(all).orderBy("w1", "w2")))
    // redelivery AFTER maintenance: batch 5 recomputes from its first
    // attempt's inputs — identical model and scores, nothing it needs
    // was retired
    val out5 = rows(spark.read.parquet(s"$store/out_5")
      .orderBy("doc_id"))
    KneserNey.refreshAndScoreMaintained(spark,
      docsOf(5L -> batches(5)), 5L, store,
      compactEvery = 2, keepEvery = 2)
    assert(rows(spark.read.parquet(s"$store/out_5")
      .orderBy("doc_id")) == out5)
    assert(rows(spark.read.parquet(s"$store/model/v5")
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramLogProbs(all).orderBy("w1", "w2")))
    assert(StoreFs.batchDirs(spark, s"$store/model", prefix = "v")
      .map(_.split("/v").last.toLong) == Seq(0L, 2L, 4L, 5L))
  }

  test("a seeded count store trains batch 0 on seed + batch, the " +
    "seed checkpoint folds under maintenance, and the serving model " +
    "equals the retrain on seed + all batches (e255's mechanism)") {
    val seed = docsOf(10L -> "a b c a b", 11L -> "c a b c")
    val store = Scratch.fresh("kn_inc_seed", "/root/testdata/sf0.001")
    KneserNey.seedCountStore(spark, seed, store)
    assert(StoreFs.batchDirs(spark, s"$store/counts",
      prefix = "ckpt_").map(_.split("ckpt_").last.toLong) == Seq(-1L))
    val batches = Seq("b c d b", "a d c a", "d b a d")
    batches.zipWithIndex.foreach { case (t, i) =>
      KneserNey.refreshAndScoreMaintained(spark,
        docsOf(i.toLong -> t), i.toLong, store,
        compactEvery = 2, keepEvery = 2)
    }
    // the batch-1 compaction folded the seed: ckpt_-1 retired into
    // ckpt_1, and only batch_2 rides above it
    assert(StoreFs.batchDirs(spark, s"$store/counts",
      prefix = "ckpt_").map(_.split("ckpt_").last.toLong) == Seq(1L))
    assert(StoreFs.batchDirs(spark, s"$store/counts")
      .map(_.split("batch_").last.toLong) == Seq(2L))
    // the serving model is the retrain on seed + batches 0..2
    val all = seed.unionByName(docsOf(batches.zipWithIndex.map {
      case (t, i) => i.toLong -> t }: _*))
    assert(rows(spark.read.parquet(s"$store/model/v2")
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramLogProbs(all).orderBy("w1", "w2")),
      "seeded maintained model diverged from the union retrain")
    // batch 0's model already trained on the seed: a seed-only
    // bigram (c,a — absent from batch 0's text) is servable
    assert(spark.read.parquet(s"$store/model/v0")
      .filter("w1 = 'c' AND w2 = 'a'").count() == 1)
  }

  test("prefix listings are numeric with an inclusive bound: " +
    "batch_10 sorts after batch_2 and upTo excludes later batches") {
    val store = Scratch.fresh("kn_inc_order", "/root/testdata/sf0.001")
    // eleven one-doc batches so the string-sort trap (batch_10 <
    // batch_2) is live
    val texts = Seq("a b", "b c", "c d", "d e", "e f", "f g", "g h",
      "h i", "i j", "j k", "k l")
    texts.zipWithIndex.foreach { case (t, i) =>
      KneserNey.refreshAndScoreIncremental(spark,
        docsOf(i.toLong -> t), i.toLong, store)
    }
    val dirs = StoreFs.batchDirs(spark, s"$store/counts")
    assert(dirs.map(_.split("batch_").last.toLong) == (0L to 10L),
      s"listing must be numeric order, got: $dirs")
    assert(StoreFs.batchDirs(spark, s"$store/counts", upTo = 4L)
      .map(_.split("batch_").last.toLong) == (0L to 4L))
    // model v10 (trained through the numeric listing) equals the
    // full retrain on all eleven docs
    val all = docsOf(texts.zipWithIndex.map {
      case (t, i) => i.toLong -> t }: _*)
    assert(rows(spark.read.parquet(s"$store/model/v10")
      .orderBy("w1", "w2")) ==
      rows(KneserNey.bigramLogProbs(all).orderBy("w1", "w2")))
  }
}
