package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, max => maxOf}
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Dedup

/** Streaming maintenance of a MinHash near-dup PAIR STORE — the
  * delta-dedup [[graft.ext.Dedup.SignatureIndex]] wired into the
  * streaming path (the near-dup face of the e57 exact-dedup
  * bootstrap). Each micro-batch of new documents runs one
  * [[Dedup.deltaStep]] against the evolving index inside foreachBatch
  * and records the store update rule the DeltaDedupSpec union identity
  * licenses:
  *
  *   P' = (P \ pairs-with-affected-side) ∪ delta ∪ compaction
  *
  * as an APPEND-ONLY LOG rather than a store rewrite. Batch n appends
  * two segments:
  *
  *  - `plog_n`  (doc_a, doc_b, jaccard, seq=n): the pairs this batch
  *    discovered (delta ∪ compaction);
  *  - `tomb_n`  (doc_id, seq=n): the affected docs whose cap flips
  *    retire every OLDER pair touching them.
  *
  * The live pair set is then resolved lazily: a pair appended at seq s
  * is live iff no tombstone with seq > s touches either side (a batch's
  * own appends follow its retirements, so seq == tombstone-seq
  * survives). This reproduces the update rule exactly — a pair re-added
  * after a cap flip always rides a same-batch tombstone for its
  * affected side, so the older copy dies and the newer survives, and no
  * duplicates arise (delta pairs touch a NEW doc, which batch-id
  * disjointness makes unrepeatable; compaction pairs always carry a
  * same-seq tombstone on an affected side).
  *
  * Per-batch WRITE volume is therefore batch-sized plus the cap-flip
  * blast radius — the deltaStep contract — never O(|store|). The full
  * store is touched only by the cadence COMPACTION: every
  * `compactEvery` batches the resolved live set is folded into a
  * `base_n` snapshot and the covered log/tombstone segments are
  * vacuumed, so the resolve union stays ≤ compactEvery segments deep
  * and reads prune to segments newer than the base. Old `idx_`/`state_`
  * versions are vacuumed down to the latest two after each durable
  * marker (one retained version for crash safety).
  *
  * Index and base/log segments round-trip through parquet —
  * store-faithful (the persisted artifacts ARE the operator's state)
  * and lineage-truncating (without the round-trip each batch's logical
  * plan would compound the previous batches' trees and Catalyst's
  * optimization time would dominate — the measured union-verify lesson
  * in BENCHNOTES).
  *
  * Crash recovery is EXACTLY-ONCE on the state: a `state_&lt;n&gt;`
  * marker is written only after batch n's index, log, tombstone, and
  * (when compacting) base writes are durable, and a new [[maintain]]
  * call on the same `workDir` resumes from the highest marker, skipping
  * any batch at or below it that the (at-least-once) checkpoint
  * replays — a crash between the state writes and the checkpoint commit
  * re-runs the batch idempotently (every segment write is
  * mode-overwrite keyed by batch id), and a crash after the commit
  * skips it with the absorbed state intact. Resolution trusts only
  * segments with seq ≤ the committed marker, so a partially written
  * segment from a crashed batch is invisible until its re-run
  * overwrites it.
  *
  * Starting from an EMPTY index, replaying a corpus in any batch split
  * converges to exactly the one-shot full-corpus
  * [[Dedup.minhashLshPairs]] (induction over the union identity; gated
  * end-to-end by `e58_streaming_neardup_replay` against e3's oracle,
  * and property-tested batch-side in GraftProperties).
  *
  * Scale shape: per-batch work AND writes are batch-sized plus the
  * blast radius; compaction cost is O(live store) amortized over
  * `compactEvery` batches; the resolve-side tombstone frame is at most
  * `compactEvery` batches' affected sets (broadcast — the same bound
  * deltaStep's own affected broadcast assumes). State lives in parquet,
  * not executor memory — the state-store budget is zero.
  */
object StreamingNearDup {

  private val StateRe = "^state_(\\d+)$".r
  private val IdxRe = "^idx_(\\d+)$".r
  private val PlogRe = "^plog_(-?\\d+)$".r
  private val TombRe = "^tomb_(-?\\d+)$".r
  private val BaseRe = "^base_(-?\\d+)$".r

  /** Numeric suffixes of workDir entries matching `re` — entries that
    * do not match (partial writes, editor temps) are skipped, never
    * parsed (ADVICE r8: a stray `state_x` file must not wedge
    * recovery). */
  private def numberedIds(wd: Path,
                          re: scala.util.matching.Regex): Seq[Long] =
    if (!Files.isDirectory(wd)) Seq.empty
    else {
      val listing = Files.list(wd)
      try listing.toArray.toSeq
        .map(p => p.asInstanceOf[Path].getFileName.toString)
        .flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toLong))
      finally listing.close()
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** Resolve the LIVE pair set from the newest trusted base plus the
    * log/tombstone segments after it, bounded by the committed marker
    * (segments beyond it may be partial writes from a crashed batch).
    * Returns (doc_a, doc_b, jaccard); empty-store safe. */
  private def resolve(spark: SparkSession, workDir: String,
                      committed: Long): DataFrame = {
    val wd = Paths.get(workDir)
    val baseId = numberedIds(wd, BaseRe).filter(_ <= committed)
      .reduceOption(_ max _)
    val floor = baseId.getOrElse(Long.MinValue)
    def segs(re: scala.util.matching.Regex, prefix: String) =
      numberedIds(wd, re).filter(s => s > floor && s <= committed).sorted
        .map(s => spark.read.parquet(s"$workDir/$prefix$s"))
        .reduceOption(_.unionByName(_))
    val logs = segs(PlogRe, "plog_")
    val base = baseId.map(b => spark.read.parquet(s"$workDir/base_$b"))
    val liveCols = Seq(col("doc_a"), col("doc_b"), col("jaccard"))
    (base, logs) match {
      case (None, None) =>
        spark.range(0).select(col("id").as("doc_a"),
          col("id").as("doc_b"), col("id").cast("double").as("jaccard"))
      case _ =>
        val tombMax = segs(TombRe, "tomb_").map(
          _.groupBy(col("doc_id")).agg(maxOf(col("seq")).as("ts")))
        // every loaded tombstone postdates the base, so base rows die on
        // ANY affected hit; log rows die only to STRICTLY NEWER
        // tombstones (a batch's appends follow its retirements)
        val baseLive = base.map { bs =>
          tombMax.fold(bs) { t =>
            bs.join(broadcast(t.select(col("doc_id").as("doc_a"))),
                Seq("doc_a"), "left_anti")
              .join(broadcast(t.select(col("doc_id").as("doc_b"))),
                Seq("doc_b"), "left_anti")
          }.select(liveCols: _*)
        }
        val logLive = logs.map { ls =>
          tombMax.fold(ls) { t =>
            ls.join(broadcast(t.select(col("doc_id").as("doc_a"),
                col("ts").as("ta"))), Seq("doc_a"), "left")
              .join(broadcast(t.select(col("doc_id").as("doc_b"),
                col("ts").as("tb"))), Seq("doc_b"), "left")
              .filter((col("ta").isNull || col("seq") >= col("ta")) &&
                (col("tb").isNull || col("seq") >= col("tb")))
          }.select(liveCols: _*)
        }
        (baseLive.toSeq ++ logLive.toSeq).reduce(_.unionByName(_))
    }
  }

  /** Drop state no reader can need: log/tombstone segments a base
    * snapshot covers, superseded bases, and all but the latest two
    * idx/state versions (one previous version retained for crash
    * safety). Runs only AFTER batch n's marker is durable, so a crash
    * mid-vacuum leaves stale-but-ignored extras, never missing state. */
  private def vacuum(wd: Path, workDir: String, n: Long): Unit = {
    val baseId = numberedIds(wd, BaseRe).filter(_ <= n)
      .reduceOption(_ max _)
    baseId.foreach { b =>
      numberedIds(wd, PlogRe).filter(_ <= b)
        .foreach(s => deleteRecursively(Paths.get(s"$workDir/plog_$s")))
      numberedIds(wd, TombRe).filter(_ <= b)
        .foreach(s => deleteRecursively(Paths.get(s"$workDir/tomb_$s")))
      numberedIds(wd, BaseRe).filter(_ < b)
        .foreach(m => deleteRecursively(Paths.get(s"$workDir/base_$m")))
    }
    numberedIds(wd, IdxRe).filter(_ < n - 1)
      .foreach(m => deleteRecursively(Paths.get(s"$workDir/idx_$m")))
    numberedIds(wd, StateRe).filter(_ < n - 1)
      .foreach(m => Files.deleteIfExists(wd.resolve(s"state_$m")))
  }

  /** Replay `stagesDir` (a directory of parquet files, one micro-batch
    * per file under `maxFilesPerTrigger=1`) through the maintenance
    * loop, persisting index/log/base versions under `workDir`. Returns
    * the resolved live pair store (doc_a, doc_b, jaccard).
    *
    * `init` seeds the index — pass a built index to dedup new batches
    * against an existing corpus, or an empty-corpus index to build
    * from nothing. When bootstrapping from an existing corpus, pass
    * that corpus's pair set as `initPairs` too: the update rule
    * retires/extends an EXISTING store, so with index but no seed
    * pairs the result is only the pairs discovered during the replay
    * (delta + compaction), not the full post-absorb set —
    * StreamingNearDupSpec pins both modes. The seed is persisted as
    * the pre-stream base snapshot, so later tombstones retire its
    * pairs exactly as they would any other pre-batch pair.
    *
    * `compactEvery` sets the compaction cadence: fold the live set
    * into a base snapshot once the uncompacted log is that many
    * segments deep (0 disables). Bounded replay
    * (`Trigger.AvailableNow`): the call blocks until every staged
    * file is absorbed. */
  def maintain(spark: SparkSession, stagesDir: String, workDir: String,
               init: Dedup.SignatureIndex,
               initPairs: Option[DataFrame] = None, k: Int = 5,
               numHashes: Int = 16, rowsPerBand: Int = 2,
               minJaccard: Double = 0.5,
               maxDf: Int = 100, compactEvery: Int = 8): DataFrame = {
    // state crosses threads (mutated on the micro-batch execution
    // thread, read here after awaitTermination) — Atomic holders give
    // the formal happens-before ADVICE r8 asked for
    val idx = new AtomicReference[Dedup.SignatureIndex](init)
    val committed = new AtomicLong(-1L)
    // recover from a previous run on this workDir: resume the index
    // from the highest durable state marker (see the class doc); the
    // checkpoint below then skips the already-committed files, and any
    // replayed in-flight batch is detected by `batchId <= committed`
    val wd = Paths.get(workDir)
    val markers = numberedIds(wd, StateRe)
    if (markers.nonEmpty) {
      committed.set(markers.max)
      idx.set(Dedup.SignatureIndex.read(spark,
        s"$workDir/idx_${committed.get}"))
    } else initPairs.foreach { seed =>
      // fresh run: persist the seed store as the pre-stream base
      seed.select(col("doc_a"), col("doc_b"), col("jaccard"))
        .withColumn("seq", lit(-1L))
        .write.mode("overwrite").parquet(s"$workDir/base_-1")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(stagesDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagesDir)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (batchId > committed.get) {
          val step = Dedup.deltaStep(idx.get, b, k, numHashes,
            rowsPerBand, minJaccard, maxDf)
          // append-only: this batch's discovered pairs + retirements
          step.pairs.unionByName(step.compaction)
            .withColumn("seq", lit(batchId))
            .write.mode("overwrite").parquet(s"$workDir/plog_$batchId")
          step.affected.withColumn("seq", lit(batchId))
            .write.mode("overwrite").parquet(s"$workDir/tomb_$batchId")
          step.updated.write(s"$workDir/idx_$batchId")
          idx.set(Dedup.SignatureIndex.read(spark,
            s"$workDir/idx_$batchId"))
          Dedup.releasePinnedCaches() // stores persisted; pins done
          val lastBase = numberedIds(wd, BaseRe).filter(_ <= batchId)
            .reduceOption(_ max _).getOrElse(-1L)
          if (compactEvery > 0 && batchId - lastBase >= compactEvery) {
            // this batch's segments are durable → safe to fold through
            resolve(spark, workDir, batchId)
              .withColumn("seq", lit(batchId))
              .write.mode("overwrite").parquet(s"$workDir/base_$batchId")
          }
          // durable-state marker LAST: its presence certifies every
          // write above (re-written idempotently on a replayed batch);
          // vacuum strictly after, so a crash loses only garbage
          Files.write(wd.resolve(s"state_$batchId"),
            Array.emptyByteArray)
          committed.set(batchId)
          vacuum(wd, workDir, batchId)
        }
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    resolve(spark, workDir, committed.get)
  }
}
