package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, VectorIndex}
import graft.streaming.StagedReplay

/** Mid-replay visibility contract of the streaming append-then-serve
  * loop (the e231 gate pins only the CONVERGED full-corpus serve):
  * a probe running between two appends must see exactly the
  * corpus-so-far — neither stale (missing the batch it rode in with)
  * nor clairvoyant (seeing the later append) — with the model halves
  * frozen at the old-corpus build throughout. */
class StreamingAnnAppendSpec extends SparkSpec {

  test("probes between appends serve against exactly the corpus-so-" +
    "far; the same probes after the next append see its vectors") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.load(spark, dir, "embeddings")
    val old = e.filter(col("vec_id") % 10 =!= 0)
    val a1 = e.filter(col("vec_id") % 10 === 0)
    val probes = e.filter(col("vec_id") < 10)
    // the second append is ADVERSARIAL: the probes' own vectors under
    // fresh ids — each probe's post-append top-1 MUST become its
    // clone (ADC distance 0), so mid != full is guaranteed and the
    // clairvoyance check has teeth
    val a2 = probes.withColumn("vec_id", col("vec_id") + 10000L)

    val model = Similarity.trainIvfPq(old)
    val scratch = Scratch.fresh("ann_append_spec", dir)
    val path = s"$scratch/index"
    VectorIndex.write(spark, model, old, path)
    val served = VectorIndex.read(spark, path)

    // batch 0: append a1 + probe; batch 1: append a2 + the SAME probe
    StagedReplay.stageFiles(Seq(
      a1.withColumn("kind", lit("append"))
        .unionByName(probes.withColumn("kind", lit("query"))),
      a2.withColumn("kind", lit("append"))
        .unionByName(probes.withColumn("kind", lit("query")))),
      s"$scratch/stages")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$scratch/stages").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$scratch/stages")
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val adds = b.filter(col("kind") === "append").drop("kind")
        if (!adds.isEmpty) VectorIndex.append(spark, path, adds)
        served.topKFromCoded(
          b.filter(col("kind") === "query").drop("kind"),
          VectorIndex.readCoded(spark, path), 3)
          .write.mode("overwrite").parquet(s"$scratch/out_$id")
        ()
      }
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def sorted(df: DataFrame) =
      rows(df.orderBy("q_id", "rank", "n_id"))
    val mid = sorted(spark.read.parquet(s"$scratch/out_0"))
    val full = sorted(spark.read.parquet(s"$scratch/out_1"))

    // corpus-so-far twins computed through the same persisted model
    val expMid = sorted(served.topKFromCoded(probes,
      served.encode(old.unionByName(a1)), 3))
    val expFull = sorted(served.topKFromCoded(probes,
      served.encode(old.unionByName(a1).unionByName(a2)), 3))

    assert(mid == expMid, "mid-replay probe diverged from the " +
      "corpus-so-far serve (stale or clairvoyant read)")
    assert(full == expFull, "post-append probe diverged from the " +
      "full-corpus serve")
    // the visibility change is REAL: a2 holds some probe's new top-3
    assert(mid != full,
      "fixture too weak: the second append changed no probe's top-3")
  }
}
