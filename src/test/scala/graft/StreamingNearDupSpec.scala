package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ext.Dedup
import graft.streaming.{StagedReplay, StreamingNearDup}

/** The streaming pair-store maintainer against the DeltaDedupSpec
  * fixture semantics: bootstrap from an EXISTING corpus (seeded index +
  * seeded pair store) must converge to the one-shot full-corpus pairs,
  * across a df-cap flip; and the e58 empty-start mode is pinned here at
  * spec scale too (the driver gate proves it at table scale). */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val (k, nh, rpb, minJ, maxDf) = (3, 8, 2, 0.1, 3)

  private def oldDocs = Seq(
    (1L, "z1 z2 z3 x1 x2 x3 x4 x5 x6"),
    (2L, "z1 z2 z3 x1 x2 x3 x4 x5 x7"),
    (5L, "z1 z2 z3 y1 y2 y3 y4 y5 y6"),
    (3L, "p1 p2 p3 p4 p5 p6 p7"),
    (4L, "p1 p2 p3 p4 p5 p6 p8"),
    (6L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 wA"),
    (7L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 wB")).toDF("doc_id", "text")

  private def batch1 = Seq(
    (10L, "z1 z2 z3 x1 x2 x3 x4 x5 x8"), // flips "z1 z2 z3" over cap
    (11L, "p1 p2 p3 p4 p5 p6 p9")).toDF("doc_id", "text")

  private def batch2 = Seq(
    (20L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 wC")).toDF("doc_id", "text")

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("bootstrap from an existing corpus: seeded index + seeded " +
    "pairs converge to the one-shot full pairs across a cap flip") {
    val stages = tmpDir("graft_snd_stages")
    StagedReplay.stageFiles(Seq(batch1, batch2), stages)
    val idx = Dedup.buildSignatureIndex(oldDocs, k, nh, rpb, maxDf)
    val seed = Dedup.minhashLshPairs(oldDocs, k, nh, rpb, minJ, maxDf)
      .cache()
    seed.count()
    val got = pairSet(StreamingNearDup.maintain(spark, stages,
      tmpDir("graft_snd_work"), idx, Some(seed), k, nh, rpb, minJ,
      maxDf))
    Dedup.releasePinnedCaches()
    seed.unpersist()
    val full = pairSet(Dedup.minhashLshPairs(
      oldDocs.union(batch1).union(batch2), k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    assert(full.nonEmpty)
    assert(got == full)
  }

  test("re-invoking maintain on the same workDir resumes the durable " +
    "state instead of resetting to init") {
    val stages = tmpDir("graft_snd_stages_r")
    StagedReplay.stageFiles(Seq(oldDocs, batch1), stages)
    val work = tmpDir("graft_snd_work_r")
    val empty = Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb,
      maxDf)
    val first = pairSet(StreamingNearDup.maintain(spark, stages, work,
      empty, None, k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    // second call: checkpoint skips every committed file; without the
    // state markers this would return the init-reset store (null →
    // empty), silently missing every absorbed batch
    val resumed = pairSet(StreamingNearDup.maintain(spark, stages, work,
      empty, None, k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    assert(first.nonEmpty)
    assert(resumed == first)
  }

  private def dirIds(work: String, prefix: String): Seq[Long] = {
    val re = ("^" + prefix + "_(-?\\d+)$").r
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(work))
    try listing.toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toLong))
    finally listing.close()
  }

  test("cadence compaction + vacuum: a 4-batch replay keeps at most " +
    "two idx/state versions, folds covered log segments into a base, " +
    "and still equals the one-shot full pairs") {
    val all = oldDocs.union(batch1).union(batch2)
    val stages = tmpDir("graft_snd_stages_v")
    StagedReplay.stageFiles(
      Seq(0L, 1L, 2L, 3L).map(r => all.filter(col("doc_id") % 4 === r)),
      stages)
    val work = tmpDir("graft_snd_work_v")
    val got = pairSet(StreamingNearDup.maintain(spark, stages, work,
      Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb, maxDf),
      None, k, nh, rpb, minJ, maxDf, compactEvery = 2))
    Dedup.releasePinnedCaches()
    val full = pairSet(Dedup.minhashLshPairs(all, k, nh, rpb, minJ,
      maxDf))
    Dedup.releasePinnedCaches()
    assert(got == full)
    // vacuum contract: ≤2 retained state markers (latest + one for
    // crash safety), exactly one pair base and one index base, and no
    // pair-log / tombstone / index-delta segment the bases already
    // cover
    assert(dirIds(work, "state").toSet == Set(2L, 3L))
    val bases = dirIds(work, "base")
    assert(bases.size == 1)
    val idxBases = dirIds(work, "idxbase")
    assert(idxBases.size == 1)
    assert(dirIds(work, "plog").forall(_ > bases.max))
    assert(dirIds(work, "idxd").forall(_ > idxBases.max))
    assert(dirIds(work, "tomb")
      .forall(_ > (bases.max min idxBases.max)))
  }

  test("recovery from a vacuumed+compacted workDir resumes the " +
    "retained state and returns the same store") {
    val all = oldDocs.union(batch1).union(batch2)
    val stages = tmpDir("graft_snd_stages_vr")
    StagedReplay.stageFiles(
      Seq(0L, 1L, 2L, 3L).map(r => all.filter(col("doc_id") % 4 === r)),
      stages)
    val work = tmpDir("graft_snd_work_vr")
    val empty = Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb,
      maxDf)
    val first = pairSet(StreamingNearDup.maintain(spark, stages, work,
      empty, None, k, nh, rpb, minJ, maxDf, compactEvery = 2))
    Dedup.releasePinnedCaches()
    val resumed = pairSet(StreamingNearDup.maintain(spark, stages, work,
      empty, None, k, nh, rpb, minJ, maxDf, compactEvery = 2))
    Dedup.releasePinnedCaches()
    assert(first.nonEmpty)
    assert(resumed == first)
  }

  test("compactEvery = 1 (fold every batch — the materialized-index " +
    "latency profile) still converges to the one-shot full pairs") {
    val stages = tmpDir("graft_snd_stages_c1")
    StagedReplay.stageFiles(Seq(oldDocs, batch1, batch2), stages)
    val got = pairSet(StreamingNearDup.maintain(spark, stages,
      tmpDir("graft_snd_work_c1"),
      Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb, maxDf),
      None, k, nh, rpb, minJ, maxDf, compactEvery = 1))
    Dedup.releasePinnedCaches()
    val full = pairSet(Dedup.minhashLshPairs(
      oldDocs.union(batch1).union(batch2), k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    assert(got == full)
  }

  test("a stray non-numeric state_ file in workDir is skipped, not " +
    "parsed (recovery does not wedge)") {
    val stages = tmpDir("graft_snd_stages_s")
    StagedReplay.stageFiles(Seq(oldDocs), stages)
    val work = tmpDir("graft_snd_work_s")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(work).resolve("state_tmp.swp"),
      Array.emptyByteArray)
    val got = pairSet(StreamingNearDup.maintain(spark, stages, work,
      Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb, maxDf),
      None, k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    val full = pairSet(Dedup.minhashLshPairs(oldDocs, k, nh, rpb, minJ,
      maxDf))
    Dedup.releasePinnedCaches()
    assert(got == full)
  }

  test("empty start: replaying the whole corpus equals the one-shot " +
    "full pairs (the e58 mode at spec scale)") {
    val stages = tmpDir("graft_snd_stages0")
    StagedReplay.stageFiles(Seq(oldDocs, batch1, batch2), stages)
    val got = pairSet(StreamingNearDup.maintain(spark, stages,
      tmpDir("graft_snd_work0"),
      Dedup.buildSignatureIndex(oldDocs.limit(0), k, nh, rpb, maxDf),
      None, k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    val full = pairSet(Dedup.minhashLshPairs(
      oldDocs.union(batch1).union(batch2), k, nh, rpb, minJ, maxDf))
    Dedup.releasePinnedCaches()
    assert(got == full)
  }
}
