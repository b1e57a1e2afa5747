package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Dedup

/** Streaming maintenance of a MinHash near-dup PAIR STORE — the
  * delta-dedup [[graft.ext.Dedup.SignatureIndex]] wired into the
  * streaming path (the near-dup face of the e57 exact-dedup
  * bootstrap). Each micro-batch of new documents runs one
  * [[Dedup.deltaStep]] against the evolving index inside foreachBatch
  * and applies the store update rule the DeltaDedupSpec union identity
  * licenses:
  *
  *   P' = (P \ pairs-with-affected-side) ∪ delta ∪ compaction
  *
  * Index and pair store round-trip through parquet between batches —
  * store-faithful (the persisted artifacts ARE the operator's state)
  * and lineage-truncating (without the round-trip, each batch's
  * logical plan would compound the previous batches' trees and
  * Catalyst's optimization time would dominate — the measured
  * union-verify lesson in BENCHNOTES).
  *
  * Crash recovery is EXACTLY-ONCE on the state: a `state_&lt;n&gt;`
  * marker is written only after batch n's index AND store writes are
  * durable, and a new [[maintain]] call on the same `workDir` resumes
  * index/store from the highest marker, skipping any batch at or
  * below it that the (at-least-once) checkpoint replays — so a crash
  * between the state writes and the checkpoint commit re-runs the
  * batch idempotently (overwrite + marker re-write), and a crash
  * after the commit skips it with the absorbed state intact.
  *
  * Starting from an EMPTY index, replaying a corpus in any batch
  * split converges to exactly the one-shot full-corpus
  * [[Dedup.minhashLshPairs]] (induction over the union identity;
  * gated end-to-end by `e58_streaming_neardup_replay` against e3's
  * oracle, and property-tested batch-side in GraftProperties).
  *
  * Scale shape: per-batch work is batch-sized plus the cap-flip blast
  * radius (the deltaStep contract); the store writes are the absorbed
  * index (at 100 TB: partitioned/bucketed parquet, with `sig` the
  * append-only frame) and the maintained pair set. State lives in
  * parquet, not executor memory — the state-store budget is zero.
  */
object StreamingNearDup {

  /** Replay `stagesDir` (a directory of parquet files, one micro-batch
    * per file under `maxFilesPerTrigger=1`) through the maintenance
    * loop, persisting index/store versions under `workDir`. Returns
    * the final pair store (doc_a, doc_b, jaccard) read from parquet.
    *
    * `init` seeds the index — pass a built index to dedup new batches
    * against an existing corpus, or an empty-corpus index to build
    * from nothing. When bootstrapping from an existing corpus, pass
    * that corpus's pair set as `initPairs` too: the update rule
    * retires/extends an EXISTING store, so with index but no seed
    * pairs the result is only the pairs discovered during the replay
    * (delta + compaction), not the full post-absorb set —
    * StreamingNearDupSpec pins both modes. Bounded replay
    * (`Trigger.AvailableNow`): the call blocks until every staged
    * file is absorbed. */
  def maintain(spark: SparkSession, stagesDir: String, workDir: String,
               init: Dedup.SignatureIndex,
               initPairs: Option[DataFrame] = None, k: Int = 5,
               numHashes: Int = 16, rowsPerBand: Int = 2,
               minJaccard: Double = 0.5,
               maxDf: Int = 100): DataFrame = {
    var idx = init
    // store is born with the first batch unless seeded
    var pairs: DataFrame = initPairs.orNull
    // recover from a previous run on this workDir: resume index/store
    // from the highest durable state marker (see the class doc); the
    // checkpoint below then skips the already-committed files, and any
    // replayed in-flight batch is detected by `batchId <= committed`
    val wd = java.nio.file.Paths.get(workDir)
    var committed = -1L
    if (java.nio.file.Files.isDirectory(wd)) {
      val listing = java.nio.file.Files.list(wd)
      val ids =
        try listing.toArray.map(_.toString).flatMap { p =>
          val n = p.substring(p.lastIndexOf('/') + 1)
          if (n.startsWith("state_")) Some(n.stripPrefix("state_").toLong)
          else None
        }
        finally listing.close()
      if (ids.nonEmpty) {
        committed = ids.max
        idx = Dedup.SignatureIndex.read(spark, s"$workDir/idx_$committed")
        pairs = spark.read.parquet(s"$workDir/pairs_$committed")
      }
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(stagesDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagesDir)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (batchId > committed) {
          val step = Dedup.deltaStep(idx, b, k, numHashes, rowsPerBand,
            minJaccard, maxDf)
          val updated =
            if (pairs == null) step.pairs.unionByName(step.compaction)
            else {
              val affA = step.affected.withColumnRenamed("doc_id", "doc_a")
              val affB = step.affected.withColumnRenamed("doc_id", "doc_b")
              pairs // retire pairs a cap flip invalidated, then union
                .join(broadcast(affA), Seq("doc_a"), "left_anti")
                .join(broadcast(affB), Seq("doc_b"), "left_anti")
                .unionByName(step.pairs).unionByName(step.compaction)
            }
          updated.write.mode("overwrite")
            .parquet(s"$workDir/pairs_$batchId")
          step.updated.write(s"$workDir/idx_$batchId")
          pairs = spark.read.parquet(s"$workDir/pairs_$batchId")
          idx = Dedup.SignatureIndex.read(spark, s"$workDir/idx_$batchId")
          Dedup.releasePinnedCaches() // stores persisted; pins done
          // durable-state marker LAST: its presence certifies both
          // writes above (re-written idempotently on a replayed batch)
          java.nio.file.Files.write(wd.resolve(s"state_$batchId"),
            Array.emptyByteArray)
          committed = batchId
        }
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (pairs == null) // zero staged batches → empty store, not an NPE
      spark.range(0).select(col("id").as("doc_a"), col("id").as("doc_b"),
        col("id").cast("double").as("jaccard"))
    else pairs.select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
