package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.KneserNey

/** Measured per-batch cost of the three KN model-refresh forms over a
  * stream's life (VERDICT r17 #1's claim, as numbers): the NAIVE form
  * (e239 — full raw-prefix retrain per trigger) does O(prefix) work
  * per batch and O(N²) cumulatively; the INCREMENTAL form (e241 —
  * merged additive count partials) does O(batch) raw-doc work but its
  * merge fan-in still grows O(N) in partial COUNT; the COMPACTING
  * form (e244) bounds the fan-in with periodic checkpoint folds. All
  * three are oracle-gated hash-identical — this probe measures the
  * wall-clock shape the gates cannot.
  *
  * Feed: deterministic synthetic docs (spark.range — no driver
  * arrays, no RNG): doc i carries `wordsPerDoc` tokens
  * `w<hash(i,j) % vocab>`, batch b = docs [b·perBatch, (b+1)·perBatch).
  *
  * Usage: `sbt "runMain graft.tools.RefreshScaleProbe <workDir>
  * [nBatches] [docsPerBatch] [vocab] [wordsPerDoc] [compactEvery]"` —
  * prints a markdown per-batch wall table for SCALE.md, then a
  * final-model identity check across the three stores.
  */
object RefreshScaleProbe {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_refresh_probe")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val perBatch = args.lift(2).map(_.toInt).getOrElse(20000)
    val vocab = args.lift(3).map(_.toInt).getOrElse(5000)
    val wordsPerDoc = args.lift(4).map(_.toInt).getOrElse(30)
    val compactEvery = args.lift(5).map(_.toInt).getOrElse(3)
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
          concat_ws(" ", transform(sequence(lit(1), lit(wordsPerDoc)),
            j => concat(lit("w"),
              pmod(hash(col("id") * 31 + j), lit(vocab)))))
            .as("text"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(s"\n### KN refresh forms, per-batch wall s " +
      s"($nBatches batches x $perBatch docs x $wordsPerDoc words, " +
      s"vocab $vocab, compactEvery $compactEvery; same-process, " +
      s"in-order)")
    println("| batch | naive (e239) | incremental (e241) | " +
      "compacting (e244) | count dirs before merge |")
    println("|---|---|---|---|---|")
    (0 until nBatches).foreach { b =>
      val d = batchDocs(b)
      val dirsBefore =
        graft.StoreFs.batchDirs(spark, s"$work/compact/counts").length +
          graft.StoreFs.batchDirs(spark, s"$work/compact/counts",
            prefix = "ckpt_").length
      val tn = timed(KneserNey.refreshAndScore(
        spark, d, b.toLong, s"$work/naive"))
      val ti = timed(KneserNey.refreshAndScoreIncremental(
        spark, d, b.toLong, s"$work/incr"))
      val tc = timed(KneserNey.refreshAndScoreCompacting(
        spark, d, b.toLong, s"$work/compact", compactEvery))
      println(f"| $b%5d | $tn%12.2f | $ti%18.2f | $tc%17.2f | " +
        f"${dirsBefore + 1}%3d |")
    }

    // the three final models must be value-identical (the gates pin
    // this at sf0.01; re-checked here at probe scale). The signature
    // must be ORDER-INDEPENDENT: long-summed row hashes, never a
    // float sum, whose accumulation order differs per store layout.
    val last = nBatches - 1
    def sig(store: String) = spark.read
      .parquet(s"$work/$store/model/v$last")
      .agg(count(lit(1)),
        sum(xxhash64(col("w1"), col("w2"), col("lp")))).head()
    val (sn, si, sc) = (sig("naive"), sig("incr"), sig("compact"))
    println(s"\nfinal-model identity: naive=$sn incremental=$si " +
      s"compacting=$sc " +
      (if (sn == si && si == sc) "(IDENTICAL)" else "(MISMATCH!)"))
    spark.stop()
  }
}
