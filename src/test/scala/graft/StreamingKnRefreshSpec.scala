package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ext.KneserNey
import graft.streaming.StagedReplay

/** Mid-replay staleness contract of the streaming KN model-refresh
  * loop (the e239 gate pins only the converged per-batch scores): a
  * batch's recorded scores must come from the model trained on its
  * INCLUSIVE prefix — not the final model, and not a stale earlier
  * version — with every version reachable through storage alone; and
  * an at-least-once redelivery of a batch must reproduce identical
  * store state, not doubled state. */
class StreamingKnRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(pairs: (Long, String)*) =
    pairs.toDF("doc_id", "text")

  test("batch scores come from the inclusive-prefix model, versions " +
    "grow through storage, and redelivery is idempotent") {
    // batch 2 is ADVERSARIAL: "a b c a" changes ctot(a), n1l(c), and
    // the type total, so P(c|a) under the final model (0.2125) != the
    // prefix model (0.25) — staleness/clairvoyance is observable
    val b0 = docsOf(0L -> "a b a b")
    val b1 = docsOf(1L -> "a c")
    val b2 = docsOf(2L -> "a b c a")
    val scratch = Scratch.fresh("kn_refresh_spec",
      "/root/testdata/sf0.001")
    StagedReplay.stageFiles(Seq(b0, b1, b2), s"$scratch/stages")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$scratch/stages").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        KneserNey.refreshAndScore(spark, b, id, scratch)
      }
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rec1 = rows(spark.read.parquet(s"$scratch/out_1")
      .drop("batch").orderBy("doc_id"))
    val prefix = KneserNey.bigramLogProbs(b0.unionByName(b1))
    val expPrefix = rows(KneserNey.finalizeScores(b1,
      KneserNey.docScores(b1, prefix)).orderBy("doc_id"))
    val full = KneserNey.bigramLogProbs(
      b0.unionByName(b1).unionByName(b2))
    val expFull = rows(KneserNey.finalizeScores(b1,
      KneserNey.docScores(b1, full)).orderBy("doc_id"))
    assert(rec1 == expPrefix, "batch 1's recorded scores diverged " +
      "from its inclusive-prefix model (stale or clairvoyant read)")
    assert(expPrefix != expFull,
      "fixture too weak: the final model scores batch 1 identically")
    // version growth is visible through nothing but storage
    assert(spark.read.parquet(s"$scratch/model/v0").count() <
      spark.read.parquet(s"$scratch/model/v2").count())

    // an at-least-once redelivery (same batchId, store holding
    // exactly the prefix) reproduces identical state — overwrites,
    // never appends
    val store2 = Scratch.fresh("kn_refresh_spec2",
      "/root/testdata/sf0.001")
    KneserNey.refreshAndScore(spark, b0, 0L, store2)
    val once = rows(spark.read.parquet(s"$store2/out_0")
      .orderBy("doc_id"))
    KneserNey.refreshAndScore(spark, b0, 0L, store2)
    assert(rows(spark.read.parquet(s"$store2/out_0")
      .orderBy("doc_id")) == once)
    assert(new java.io.File(s"$store2/corpus").listFiles().length == 1)
  }
}
