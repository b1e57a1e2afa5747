package graft

import graft.ext.{Curation, KneserNey}

/** The store seams go through the Hadoop FileSystem abstraction
  * (VERDICT r17 #2): every listing/probe/marker resolves its
  * filesystem FROM THE STORE PATH (`Path.getFileSystem`), so the same
  * serving loops run against file://, hdfs://, and s3a:// stores. The
  * pin drives them through an explicit SCHEME-QUALIFIED `file:` URI —
  * which `java.io.File` cannot resolve (it would treat "file:/…" as a
  * relative path named "file:") — so a regression back to local-FS
  * probing fails loudly rather than silently narrowing the contract. */
class StoreFsSpec extends SparkSpec {
  import spark.implicits._

  private def uri(store: String): String = "file:" + store

  test("batchDirs/exists/touch operate through the URI's filesystem") {
    val store = Scratch.fresh("storefs_spec", "/root/testdata/sf0.001")
    assert(StoreFs.batchDirs(spark, uri(s"$store/none")) == Seq.empty)
    assert(!StoreFs.exists(spark, uri(s"$store/m/batch_1")))
    StoreFs.touch(spark, uri(s"$store/m/batch_1"))
    assert(StoreFs.exists(spark, uri(s"$store/m/batch_1")))
    // numeric listing order + bound through the same abstraction
    Seq(0L, 2L, 10L).foreach(i =>
      StoreFs.touch(spark, uri(s"$store/b/batch_$i")))
    assert(StoreFs.batchDirs(spark, uri(s"$store/b"))
      .map(_.split("batch_").last.toLong) == Seq(0L, 2L, 10L))
    assert(StoreFs.batchDirs(spark, uri(s"$store/b"), upTo = 2L)
      .map(_.split("batch_").last.toLong) == Seq(0L, 2L))
    // non-matching children are ignored, not mis-parsed
    StoreFs.touch(spark, uri(s"$store/b/_marker"))
    StoreFs.touch(spark, uri(s"$store/b/batch_x"))
    assert(StoreFs.batchDirs(spark, uri(s"$store/b"))
      .length == 3)
  }

  test("retainVersions keeps newest + the on-ladder rungs, bounds " +
    "the ladder at maxLadder, and never touches versions above the " +
    "committed horizon") {
    val store = Scratch.fresh("storefs_retain", "/root/testdata/sf0.001")
    (0L to 13L).foreach(i => StoreFs.touch(spark, uri(s"$store/m/v$i")))
    // committed 12, keepEvery 3, ladder capped at 2: rungs {0,3,6,9}
    // minus newest-committed 12 → keep the newest two rungs {6, 9},
    // the newest committed 12, and untouched v13 above the horizon
    StoreFs.retainVersions(spark, uri(s"$store/m"), prefix = "v",
      committed = 12L, keepEvery = 3, maxLadder = 2)
    assert(StoreFs.batchDirs(spark, uri(s"$store/m"), prefix = "v")
      .map(_.split("/v").last.toLong) == Seq(6L, 9L, 12L, 13L))
    // idempotent: a second pass deletes nothing more
    StoreFs.retainVersions(spark, uri(s"$store/m"), prefix = "v",
      committed = 12L, keepEvery = 3, maxLadder = 2)
    assert(StoreFs.batchDirs(spark, uri(s"$store/m"), prefix = "v")
      .map(_.split("/v").last.toLong) == Seq(6L, 9L, 12L, 13L))
  }

  test("the KN refresh and curation loops run against a scheme-" +
    "qualified store") {
    val b0 = Seq(0L -> "the a of and to in the a of and",
      1L -> "the the of of").toDF("doc_id", "text")
    val b1 = Seq(2L -> "the a of and in a").toDF("doc_id", "text")

    val kn = uri(Scratch.fresh("storefs_kn", "/root/testdata/sf0.001"))
    KneserNey.refreshAndScoreIncremental(spark, b0, 0L, kn)
    KneserNey.refreshAndScoreIncremental(spark, b1, 1L, kn)
    assert(spark.read.parquet(s"$kn/model/v1").count() > 0)
    assert(spark.read.parquet(s"$kn/out_1").count() == 1)

    val naive = uri(Scratch.fresh("storefs_kn_naive",
      "/root/testdata/sf0.001"))
    KneserNey.refreshAndScore(spark, b0, 0L, naive)
    assert(spark.read.parquet(s"$naive/out_0").count() == 2)

    val cur = uri(Scratch.fresh("storefs_cur", "/root/testdata/sf0.001"))
    Curation.curateBatch(spark, b0, 0L, cur)
    Curation.curateBatch(spark, b1, 1L, cur)
    assert(spark.read.parquet(s"$cur/out_0").count() > 0)

    val glob = uri(Scratch.fresh("storefs_glob",
      "/root/testdata/sf0.001"))
    Curation.curateBatchGlobalCut(spark, b0, 0L, glob)
    Curation.curateBatchGlobalCut(spark, b1, 1L, glob)
    assert(spark.read.parquet(s"$glob/out_1")
      .columns.contains("cut_within"))
  }
}
