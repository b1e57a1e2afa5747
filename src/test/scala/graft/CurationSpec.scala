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
}
