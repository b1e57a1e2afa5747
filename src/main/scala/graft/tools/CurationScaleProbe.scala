package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, KneserNey, TextAnalysis}

/** Measured per-batch cost of the streaming CURATION loop's forms
  * over a stream's life (VERDICT r18 #6 — the RefreshScaleProbe
  * treatment, applied to the loop the refresh serves): the NAIVE
  * form retrains the KN model from the RE-READ curated prefix docs
  * every trigger (O(prefix) raw-doc work — the r17-weak shape e240
  * abandoned, kept here as the measurement twin); the INCREMENTAL
  * form (e240, `curateBatch`) merges additive count partials
  * (O(batch) raw-doc work, O(N) merge fan-in); the MAINTAINED form
  * (e247/e253, `curateBatchMaintained`) adds periodic
  * checkpoint-folds of both input stores plus model/curated GC, so
  * fan-in AND store footprint stay bounded forever. All three write
  * identical per-batch survivors — checked at the end with an
  * order-independent signature.
  *
  * Section "global" (VERDICT r18 #2's done-criterion) measures the
  * corpus-global quantile loop: `curateBatchGlobalCut` (score store
  * grows one dir per trigger) vs `curateBatchGlobalCutCompacting`
  * (score vectors fold every compactEvery batches) — the per-batch
  * wall should stay flat as the merged score store grows, and the
  * fan-in column shows the compacted store staying bounded.
  *
  * Feed: deterministic synthetic docs (spark.range — no driver
  * arrays, no RNG): doc i carries `wordsPerDoc` tokens
  * `w<hash(key·31+j) % vocab>`; docs with id % 10 == 7 reuse the
  * PREVIOUS batch's key (id − perBatch), planting cross-batch
  * duplicates so the dedup stage genuinely executes.
  *
  * Usage: `sbt "runMain graft.tools.CurationScaleProbe <workDir>
  * [median|global|both] [nBatches] [docsPerBatch] [vocab]
  * [wordsPerDoc] [compactEvery]"` — prints markdown per-batch wall
  * tables for SCALE.md, then survivor-identity checks.
  */
object CurationScaleProbe {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_curation_probe")
    val section = args.lift(1).getOrElse("both")
    val nBatches = args.lift(2).map(_.toInt).getOrElse(12)
    val perBatch = args.lift(3).map(_.toInt).getOrElse(20000)
    val vocab = args.lift(4).map(_.toInt).getOrElse(5000)
    val wordsPerDoc = args.lift(5).map(_.toInt).getOrElse(30)
    val compactEvery = args.lift(6).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.Scratch.deleteRecursively(java.nio.file.Paths.get(work))
    def batchDocs(b: Int) =
      spark.range(b.toLong * perBatch, (b + 1).toLong * perBatch)
        .select(col("id").as("doc_id"),
          // ~10% of each batch reuses the previous batch's text keys
          // (cross-batch duplicates the dedup stage must drop)
          when(col("id") % 10 === 7, col("id") - perBatch)
            .otherwise(col("id")).as("key"))
        .select(col("doc_id"),
          concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
            j => concat(lit("w"),
              pmod(hash(col("key") * 31 + j), lit(vocab)))))
            .as("text"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fanIn(store: String, sub: String): Int =
      graft.StoreFs.batchDirs(spark, s"$store/$sub").length +
        graft.StoreFs.batchDirs(spark, s"$store/$sub",
          prefix = "ckpt_").length
    // order-independent survivor signature over the INTEGER stats
    // (count + summed row hashes of batch/doc_id/n_bigrams).
    // doc_lp/ppl are excluded deliberately: they are float SUMS, and
    // across store layouts the join/aggregation accumulation order
    // differs, so a handful of docs per 10^5 land on a 6-decimal
    // rounding knife-edge — membership and integer stats must be
    // identical, float deltas are quantified separately below
    def sig(store: String) = spark.read
      .parquet(graft.StoreFs.batchDirs(spark, store,
        prefix = "out_"): _*)
      .agg(count(lit(1)), sum(xxhash64(col("batch"), col("doc_id"),
        col("n_bigrams")))).head()
    // the float variance, measured not hidden: max |ppl_a - ppl_b|
    // over the joined survivor sets (expected ~1e-6: last-ulp sums
    // crossing the 6dp rounding boundary)
    def maxPplDelta(a: String, b: String): Double = {
      def outs(s: String) = spark.read.parquet(
        graft.StoreFs.batchDirs(spark, s, prefix = "out_"): _*)
      val d = outs(a).select(col("batch"), col("doc_id"),
          col("ppl").as("pa"))
        .join(outs(b).select(col("batch"), col("doc_id"),
          col("ppl").as("pb")), Seq("batch", "doc_id"))
        .agg(max(abs(col("pa") - col("pb")))).head()
      if (d.isNullAt(0)) 0.0 else d.getDouble(0)
    }

    if (section == "median" || section == "both") {
      println(s"\n### Curation loop forms, per-batch wall s " +
        s"($nBatches batches x $perBatch docs x $wordsPerDoc words, " +
        s"vocab $vocab, compactEvery $compactEvery; ~10% cross-batch " +
        "dupes; qualityMin 0 so the FULL batch reaches the KN stage; " +
        "same-process, in-order)")
      println("| batch | naive (prefix retrain) | incremental " +
        "(e240) | maintained (e247+GC) | incr dirs | maint dirs |")
      println("|---|---|---|---|---|---|")
      (0 until nBatches).foreach { b =>
        val d = batchDocs(b)
        val di = fanIn(s"$work/incr", "fps") +
          fanIn(s"$work/incr", "counts")
        val dm = fanIn(s"$work/maint", "fps") +
          fanIn(s"$work/maint", "counts")
        val tn = timed(naiveBatch(spark, d, b.toLong, s"$work/naive"))
        val ti = timed(Curation.curateBatch(
          spark, d, b.toLong, s"$work/incr", qualityMin = 0.0))
        val tm = timed(Curation.curateBatchMaintained(
          spark, d, b.toLong, s"$work/maint", qualityMin = 0.0,
          compactEvery = compactEvery))
        println(f"| $b%5d | $tn%22.2f | $ti%18.2f | $tm%20.2f | " +
          f"${di + 2}%3d | ${dm + 2}%3d |")
      }
      val (sn, si, sm) =
        (sig(s"$work/naive"), sig(s"$work/incr"), sig(s"$work/maint"))
      println(s"\nsurvivor identity (membership + integer stats): " +
        s"naive=$sn incremental=$si maintained=$sm " +
        (if (sn == si && si == sm) "(IDENTICAL)" else "(MISMATCH!)"))
      println(f"max |ppl delta| naive-vs-incremental " +
        f"${maxPplDelta(s"$work/naive", s"$work/incr")}%.2e, " +
        f"incremental-vs-maintained " +
        f"${maxPplDelta(s"$work/incr", s"$work/maint")}%.2e")
    }

    if (section == "global" || section == "both") {
      println(s"\n### Global-cut curation loop, per-batch wall s " +
        s"(same corpus; exact cut at this scale, GK past 10^7 — " +
        "VERDICT r18 #2; hist = the e256 additive-histogram form, " +
        "whose quantile reads O(bins) rows, not score rows)")
      println("| batch | global cut (e243) | compacted global cut " +
        "(e251) | hist cut (e256) | e251 score dirs | e256 hist " +
        "dirs |")
      println("|---|---|---|---|---|---|")
      (0 until nBatches).foreach { b =>
        val d = batchDocs(b)
        val dirs = fanIn(s"$work/gcomp", "scores")
        val hdirs = fanIn(s"$work/hist", "shist")
        val tg = timed(Curation.curateBatchGlobalCut(
          spark, d, b.toLong, s"$work/glob", qualityMin = 0.0))
        val tc = timed(Curation.curateBatchGlobalCutCompacting(
          spark, d, b.toLong, s"$work/gcomp", qualityMin = 0.0,
          compactEvery = compactEvery))
        val th = timed(Curation.curateBatchHistCut(
          spark, d, b.toLong, s"$work/hist", qualityMin = 0.0,
          compactEvery = compactEvery))
        println(f"| $b%5d | $tg%17.2f | $tc%26.2f | $th%15.2f | " +
          f"${dirs + 1}%3d | ${hdirs + 1}%3d |")
      }
      val (sg, sc) = (sig(s"$work/glob"), sig(s"$work/gcomp"))
      println(s"\nsurvivor identity (membership + integer stats): " +
        s"global=$sg compacted=$sc " +
        (if (sg == sc) "(IDENTICAL)" else "(MISMATCH!)"))
      println(f"max |ppl delta| global-vs-compacted " +
        f"${maxPplDelta(s"$work/glob", s"$work/gcomp")}%.2e")
      val sh = sig(s"$work/hist")
      println(s"hist-cut survivors (own contract, cut error ≤ one " +
        s"~5% bin): $sh")
    }
    spark.stop()
  }

  /** The NAIVE curation twin (measurement-only): identical dedup and
    * quality stages to [[graft.ext.Curation.curateBatch]], but the
    * model retrains from the RE-READ curated prefix documents every
    * trigger — O(prefix) raw-doc work, the shape whose growth this
    * probe exists to show. */
  private def naiveBatch(spark: SparkSession, batch: DataFrame,
                         batchId: Long, store: String,
                         qualityMin: Double = 0.0): Unit = {
    val canon = batch
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(struct(col("doc_id"), col("text"))).as("m"))
      .select(col("fp"), col("m.doc_id").as("doc_id"),
        col("m.text").as("text"))
    val prior = graft.StoreFs.mergedDirs(spark, s"$store/fps",
      upTo = batchId - 1)
    val fresh =
      if (prior.isEmpty) canon
      else canon.join(spark.read.parquet(prior: _*),
        Seq("fp"), "left_anti")
    fresh.select(col("fp")).write.mode("overwrite")
      .parquet(s"$store/fps/batch_$batchId")
    val kept = fresh.select(col("doc_id"), col("text"))
      .join(TextAnalysis.qualityScore(fresh)
          .filter(col("quality") >= qualityMin)
          .select(col("doc_id"), col("n_words"), col("quality")),
        Seq("doc_id"))
    kept.write.mode("overwrite")
      .parquet(s"$store/curated/batch_$batchId")
    val prefixDocs = spark.read.parquet(graft.StoreFs.batchDirs(
      spark, s"$store/curated", upTo = batchId): _*)
    KneserNey.bigramLogProbs(
        prefixDocs.select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$store/model/v$batchId")
    val model = spark.read.parquet(s"$store/model/v$batchId")
    val keptStored =
      spark.read.parquet(s"$store/curated/batch_$batchId")
    val scored = KneserNey.finalizeScores(
      keptStored.select(col("doc_id")),
      KneserNey.docScores(
        keptStored.select(col("doc_id"), col("text")), model))
    val cut = graft.TwoPass.scalar(
      scored.agg(percentile(col("ppl"), lit(0.5)).as("c")))
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
}
