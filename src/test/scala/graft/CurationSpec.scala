package graft

import org.apache.spark.sql.functions._

import graft.ext.Curation

/** The e237 curation chain on a hand-built corpus where EVERY stage
  * removes someone: an exact clone (dedup), a punctuation-soup doc
  * (quality cut), and the high-perplexity half of the survivors
  * (median ppl cut) — plus the stage-boundary cache pin. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("each stage removes its target and the KN branches read the " +
    "cache pin, not the raw scan") {
    val d = Seq(
      // quality 0.64 (stopword-rich): survives to the ppl stage
      (0L, "the a of and to in the a of and"),
      // exact clone of doc 0 at a higher id: dedup drops it
      (1L, "the a of and to in the a of and"),
      // punctuation soup, quality ~0.24: the quality cut drops it
      (2L, "zz. qq. rr. ss."),
      // repetitive = most predictable bigrams = lowest perplexity:
      // the median cut keeps exactly this doc
      (3L, "the the the the the the the the the the"))
      .toDF("doc_id", "text")
    val out = Curation.chain(d, qualityMin = 0.5, pplQ = 0.5)
    val got = out.collect()
    // survivors of all three cuts: only the low-ppl doc 3 (the median
    // of two ppls is their midpoint, so only the smaller passes <=)
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got(0).getLong(3) == 9L)               // n_bigrams
    assert(math.abs(got(0).getDouble(2) - 0.64) < 1e-6)  // quality
    // stage-boundary pin: the ppl stage's consumers read the cached
    // quality-surviving corpus, not a re-run of dedup + quality
    assert(out.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("curateBatch redelivery is idempotent: the batch is " +
    "reproduced, not destroyed (ADVICE r17 high)") {
    // mirror of StreamingKnRefreshSpec's redelivery pin, for the
    // curation loop: an at-least-once redelivery of batch N must see
    // only STRICTLY-PRIOR fingerprints — the first attempt's own
    // fps/batch_N must not anti-join every doc away and overwrite the
    // stores with empty data
    val b0 = Seq(
      (0L, "the a of and to in the a of and"),
      (1L, "the the the the the the the the the the"))
      .toDF("doc_id", "text")
    val b1 = Seq((2L, "the a of and in it is a the of"))
      .toDF("doc_id", "text")
    val store = Scratch.fresh("curation_redeliver",
      "/root/testdata/sf0.001")
    Curation.curateBatch(spark, b0, 0L, store)
    val out0 = rows(spark.read.parquet(s"$store/out_0")
      .orderBy("doc_id"))
    val cur0 = rows(spark.read.parquet(s"$store/curated/batch_0")
      .orderBy("doc_id"))
    assert(out0.nonEmpty && cur0.nonEmpty, "fixture must survive")
    // redeliver batch 0 with its own first-attempt stores on disk
    Curation.curateBatch(spark, b0, 0L, store)
    assert(rows(spark.read.parquet(s"$store/out_0")
      .orderBy("doc_id")) == out0,
      "redelivered batch 0 diverged (its own fps dropped its docs?)")
    assert(rows(spark.read.parquet(s"$store/curated/batch_0")
      .orderBy("doc_id")) == cur0)
    // and mid-stream: run batch 1, then redeliver IT — prior view is
    // exactly batch 0 both times
    Curation.curateBatch(spark, b1, 1L, store)
    val out1 = rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id"))
    Curation.curateBatch(spark, b1, 1L, store)
    assert(rows(spark.read.parquet(s"$store/out_1")
      .orderBy("doc_id")) == out1)
    // cross-batch dedup still does its job on a genuine later clone:
    // batch 0's content redelivered as batch 2 drops entirely
    Curation.curateBatch(spark,
      b0.withColumn("doc_id", col("doc_id") + 100L), 2L, store)
    assert(spark.read.parquet(s"$store/curated/batch_2").count() == 0)
  }

  test("maintained curation retires dead curated batches and old " +
    "model versions, while dedup and redelivery stay exact after GC " +
    "(VERDICT r18 #4)") {
    val b = Seq(
      Seq((0L, "the a of and to in the a of and")),
      Seq((1L, "the the the the the the the the the the")),
      Seq((2L, "the a of and in it is a the of")),
      // batch 3 clones batch 0's content: it must still drop even
      // though batch 0's curated dir and model are GC'd
      Seq((3L, "the a of and to in the a of and"),
        (4L, "it is the a of and the a of and")))
      .map(_.toDF("doc_id", "text"))
    val store = Scratch.fresh("curation_maint_spec",
      "/root/testdata/sf0.001")
    b.zipWithIndex.foreach { case (df, i) =>
      Curation.curateBatchMaintained(spark, df, i.toLong, store,
        compactEvery = 2, keepEvery = 2)
    }
    // dead curated batches retired: only this batch's own remains
    assert(StoreFs.batchDirs(spark, s"$store/curated")
      .map(_.split("batch_").last.toLong) == Seq(3L))
    // model ladder at committed horizon 2, keepEvery 2: v0, v2
    // (newest committed ∧ on-ladder), plus this trigger's v3
    assert(StoreFs.batchDirs(spark, s"$store/model", prefix = "v")
      .map(_.split("/v").last.toLong) == Seq(0L, 2L, 3L))
    // the cross-batch clone dropped despite its original's curated
    // dir being gone (fingerprints live in the fps store, not the
    // curated dirs); the fresh doc survived
    assert(rows(spark.read.parquet(s"$store/curated/batch_3")
      .select(col("doc_id"))) == Seq(Seq(4L)))
    // redelivery after GC reproduces identical state — a redelivered
    // batch rewrites its own curated dir and model before reading them
    val out3 = rows(spark.read.parquet(s"$store/out_3")
      .orderBy("doc_id"))
    Curation.curateBatchMaintained(spark, b(3), 3L, store,
      compactEvery = 2, keepEvery = 2)
    assert(rows(spark.read.parquet(s"$store/out_3")
      .orderBy("doc_id")) == out3,
      "redelivered batch diverged after store GC")
    assert(StoreFs.batchDirs(spark, s"$store/curated")
      .map(_.split("batch_").last.toLong) == Seq(3L))
  }

  test("compacting curation bounds both stores and keeps dedup + " +
    "redelivery exact across the fold (e247's mechanism)") {
    val b = Seq(
      Seq((0L, "the a of and to in the a of and")),
      Seq((1L, "the the the the the the the the the the")),
      Seq((2L, "the a of and in it is a the of")),
      // batch 3 carries a CLONE of batch 0's content: it must drop
      // even though batch 0's fps dir was tombstoned into a ckpt
      Seq((3L, "the a of and to in the a of and"),
        (4L, "it is the a of and the a of and")))
      .map(_.toDF("doc_id", "text"))
    val store = Scratch.fresh("curation_compact_spec",
      "/root/testdata/sf0.001")
    b.zipWithIndex.foreach { case (df, i) =>
      Curation.curateBatchCompacting(spark, df, i.toLong, store,
        compactEvery = 2)
    }
    // fan-in bounded: fps = ckpt_2 (horizon 3-1) + batch_3;
    // counts = ckpt_3 only
    assert(StoreFs.batchDirs(spark, s"$store/fps", prefix = "ckpt_")
      .map(_.split("ckpt_").last.toLong) == Seq(2L))
    assert(StoreFs.batchDirs(spark, s"$store/fps")
      .map(_.split("batch_").last.toLong) == Seq(3L))
    assert(StoreFs.batchDirs(spark, s"$store/counts").isEmpty)
    assert(StoreFs.batchDirs(spark, s"$store/counts",
      prefix = "ckpt_").map(_.split("ckpt_").last.toLong) == Seq(3L))
    // the cross-ckpt clone dropped; the fresh doc survived dedup
    val cur3 = spark.read.parquet(s"$store/curated/batch_3")
    assert(rows(cur3.select(col("doc_id"))) == Seq(Seq(4L)),
      "ckpt-folded fingerprints must still dedup later clones")
    // redelivery of the compacted batch reproduces identical state
    val out3 = rows(spark.read.parquet(s"$store/out_3")
      .orderBy("doc_id"))
    Curation.curateBatchCompacting(spark, b(3), 3L, store,
      compactEvery = 2)
    assert(rows(spark.read.parquet(s"$store/out_3")
      .orderBy("doc_id")) == out3)
    assert(rows(spark.read.parquet(s"$store/curated/batch_3")
      .select(col("doc_id"))) == Seq(Seq(4L)))
  }

  test("past the exactCutMax threshold the mergeable GK estimate is " +
    "the OPERATIVE global cut — survivors are exactly the scored docs " +
    "at or below the sketch value, rank-bound-flagged (VERDICT r18 #2)") {
    val b = Seq(
      Seq((0L, "the a of and to in the a of and"),
        (1L, "the the the the the the the the the the"),
        (2L, "it is the a of and the a of and")),
      Seq((3L, "the a of and in it is a the of"),
        (4L, "a the a the a the a the a the")))
      .map(_.toDF("doc_id", "text"))
    val store = Scratch.fresh("curation_gkcut_spec",
      "/root/testdata/sf0.001")
    // exactCutMax = 0: EVERY batch takes the sketch path (the store
    // is never "small enough" for the exact interpolated percentile)
    b.zipWithIndex.foreach { case (df, i) =>
      Curation.curateBatchGlobalCut(spark, df, i.toLong, store,
        exactCutMax = 0L)
    }
    (0 to 1).foreach { k =>
      // the operative cut, recomputed independently: the GK estimate
      // over the merged score store at this batch's horizon
      val pre = spark.read.parquet(StoreFs.mergedDirs(spark,
        s"$store/scores", upTo = k.toLong): _*)
      val ap = pre.agg(percentile_approx(col("ppl"),
        lit(0.5), lit(10000)).as("ap")).head().getDouble(0)
      val expect = spark.read.parquet(s"$store/scores/batch_$k")
        .filter(col("ppl") <= lit(ap))
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      val out = spark.read.parquet(s"$store/out_$k")
      assert(out.select(col("doc_id")).collect()
        .map(_.getLong(0)).sorted.toSeq == expect,
        s"batch $k: survivors must be cut at the sketch estimate")
      // the rank-bound honesty flag holds on every emitted row
      assert(out.select(col("cut_within")).collect()
        .forall(_.getInt(0) == 1))
    }
  }

  test("a seeded fps/counts store folds into later checkpoints like " +
    "any other source, and still dedups seed clones after the fold " +
    "(e250 + e253 composition)") {
    import org.apache.spark.sql.functions.md5
    val seed = Seq(
      (10L, "the a of and to in the a of and"),
      (11L, "it is the a of and the a of and"))
      .toDF("doc_id", "text")
    val store = Scratch.fresh("curation_seedfold_spec",
      "/root/testdata/sf0.001")
    Curation.seedCurationStore(spark, seed, store)
    assert(StoreFs.batchDirs(spark, s"$store/fps", prefix = "ckpt_")
      .map(_.split("ckpt_").last.toLong) == Seq(-1L),
      "the seed must land as the horizon -1 checkpoint")
    val b = Seq(
      Seq((0L, "the the the the the the the the the the")),
      Seq((1L, "the a of and in it is a the of")),
      // batch 2 clones a SEED doc: the fold at batch 1 has already
      // retired ckpt_-1 into ckpt_0/ckpt_1, so the drop proves the
      // seed's fingerprints survived the fold
      Seq((2L, "the a of and to in the a of and"),
        (3L, "a the a the of and it is to in")))
      .map(_.toDF("doc_id", "text"))
    b.zipWithIndex.foreach { case (df, i) =>
      Curation.curateBatchMaintained(spark, df, i.toLong, store,
        compactEvery = 2, keepEvery = 2)
    }
    // the seed checkpoint is gone — folded, not lingering
    assert(!StoreFs.batchDirs(spark, s"$store/fps", prefix = "ckpt_")
      .map(_.split("ckpt_").last.toLong).contains(-1L))
    assert(!StoreFs.batchDirs(spark, s"$store/counts",
      prefix = "ckpt_").map(_.split("ckpt_").last.toLong)
      .contains(-1L))
    // the seed clone dropped through the folded checkpoint; the
    // fresh doc survived
    assert(rows(spark.read.parquet(s"$store/curated/batch_2")
      .select(col("doc_id"))) == Seq(Seq(3L)))
    // and the folded fps checkpoint still carries the seed prints
    val fps = spark.read.parquet(StoreFs.mergedDirs(spark,
      s"$store/fps", upTo = 2L): _*)
    val seedFp = seed.select(md5(col("text")).as("fp"))
    assert(seedFp.join(fps, Seq("fp"), "left_anti").count() == 0,
      "seed fingerprints must survive the checkpoint fold")
  }
}
