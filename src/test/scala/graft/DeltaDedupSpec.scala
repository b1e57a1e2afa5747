package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Dedup

/** Incremental (delta) dedup against a persisted signature index
  * (VERDICT r6 #1): delta-mode pairs must equal the full-corpus
  * minhashLshPairs restricted to pairs touching the batch — the mirror
  * of g8's merge==full candle contract — including when the batch
  * pushes a shingle over the corpus-wide df cap (which silently changes
  * OLD documents' signatures). */
class DeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  // k=3 shingles, maxDf=3. The boilerplate shingle "z1 z2 z3" sits AT
  // the cap in the old corpus (d1, d2, d5); batch doc d10 flips it over,
  // making d1/d2/d5 affected docs whose signatures must be recomputed —
  // while the surviving x-prefix shingles keep (d1,d10)/(d2,d10) as
  // genuine near-dup pairs. The p-group stays exactly at the cap (no
  // flip), exercising the stale-stored-bands path for unaffected docs.
  private val K = 3
  private val NH = 8
  private val RPB = 2
  private val MINJ = 0.1
  private val MAXDF = 3

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
    (11L, "p1 p2 p3 p4 p5 p6 p9"),       // at-cap group, no flip
    (12L, "m1 m2 m3 m4 m5")).toDF("doc_id", "text") // no pairs

  private def batch2 = Seq(
    (20L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 wC"), // pairs with d6/d7,
      // no flip (w-shingles reach df=3, exactly at the cap)
    (21L, "z1 z2 z3 a1 a2 a3")).toDF("doc_id", "text") // hits an
      // ALREADY-over-cap shingle: df_old > maxDf, no re-flip

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def fullRestricted(all: DataFrame,
                             batchIds: Set[Long]): Set[(Long, Long, Double)] =
    pairSet(Dedup.minhashLshPairs(all, K, NH, RPB, MINJ, MAXDF))
      .filter(p => batchIds(p._1) || batchIds(p._2))

  test("delta pairs == full-corpus pairs touching the batch, " +
    "across a df-cap flip") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val (pairs, _) = Dedup.deltaDedup(idx, batch1, K, NH, RPB, MINJ,
      MAXDF)
    val got = pairSet(pairs)
    Dedup.releasePinnedCaches()
    val want = fullRestricted(oldDocs.union(batch1),
      Set(10L, 11L, 12L))
    Dedup.releasePinnedCaches()
    assert(want.nonEmpty, "fixture should produce at least one pair")
    assert(got == want)
  }

  test("absorbing a batch yields an index whose NEXT delta is exact") {
    val idx0 = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val (_, idx1) = Dedup.deltaDedup(idx0, batch1, K, NH, RPB, MINJ,
      MAXDF)
    val (pairs2, _) = Dedup.deltaDedup(idx1, batch2, K, NH, RPB, MINJ,
      MAXDF)
    val got = pairSet(pairs2)
    Dedup.releasePinnedCaches()
    val want = fullRestricted(oldDocs.union(batch1).union(batch2),
      Set(20L, 21L))
    Dedup.releasePinnedCaches()
    assert(want.nonEmpty)
    assert(got == want)
  }

  /** Affected old docs, computed independently of the operator under
    * test: old docs containing a shingle whose df the batch pushed
    * over the cap. */
  private def affectedIds(oldDf: DataFrame, batchDf: DataFrame): Set[Long] = {
    def sh(df: DataFrame): Seq[(Long, Long)] =
      Dedup.shingleHashes(df, K).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val o = sh(oldDf)
    val dfo = o.groupBy(_._2).view.mapValues(_.size).toMap
    val dfn = (o ++ sh(batchDf)).groupBy(_._2).view.mapValues(_.size)
      .toMap
    val flips = dfn.keySet.filter(h =>
      dfo.getOrElse(h, 0) <= MAXDF && dfn(h) > MAXDF)
    o.filter(p => flips(p._2)).map(_._1).toSet
  }

  test("compaction pairs == full-corpus old-old pairs with an " +
    "affected side") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val got = pairSet(Dedup.compactionPairs(idx, batch1, K, NH, RPB,
      MINJ, MAXDF))
    Dedup.releasePinnedCaches()
    val aff = affectedIds(oldDocs, batch1)
    assert(aff.nonEmpty, "fixture should flip a shingle over the cap")
    val batchIds = Set(10L, 11L, 12L)
    val want = pairSet(
      Dedup.minhashLshPairs(oldDocs.union(batch1), K, NH, RPB, MINJ,
        MAXDF))
      .filter(p => !batchIds(p._1) && !batchIds(p._2) &&
        (aff(p._1) || aff(p._2)))
    Dedup.releasePinnedCaches()
    assert(want.nonEmpty, "fixture should produce a compaction pair")
    assert(got == want)
  }

  test("delta ∪ compaction ∪ unaffected pre-batch pairs == the full " +
    "post-absorb pair set") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val (deltaPairs, _) = Dedup.deltaDedup(idx, batch1, K, NH, RPB,
      MINJ, MAXDF)
    val delta = pairSet(deltaPairs)
    Dedup.releasePinnedCaches()
    val idx2 = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val comp = pairSet(Dedup.compactionPairs(idx2, batch1, K, NH, RPB,
      MINJ, MAXDF))
    Dedup.releasePinnedCaches()
    val aff = affectedIds(oldDocs, batch1)
    val preUnaffected = pairSet(
      Dedup.minhashLshPairs(oldDocs, K, NH, RPB, MINJ, MAXDF))
      .filter(p => !aff(p._1) && !aff(p._2))
    Dedup.releasePinnedCaches()
    val full = pairSet(
      Dedup.minhashLshPairs(oldDocs.union(batch1), K, NH, RPB, MINJ,
        MAXDF))
    Dedup.releasePinnedCaches()
    assert((delta ++ comp ++ preUnaffected) == full)
    // and the three parts are disjoint — each pair has ONE owner
    assert(delta.intersect(comp).isEmpty)
    assert(delta.intersect(preUnaffected).isEmpty)
    assert(comp.intersect(preUnaffected).isEmpty)
  }

  test("deltaStep returns deltaDedup's pairs, compactionPairs' " +
    "compaction, and the affected set, from one core") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val step = Dedup.deltaStep(idx, batch1, K, NH, RPB, MINJ, MAXDF)
    val gotPairs = pairSet(step.pairs)
    val gotComp = pairSet(step.compaction)
    val gotAff = step.affected.collect().map(_.getLong(0)).toSet
    Dedup.releasePinnedCaches()
    val idx2 = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val (wantPairs, _) = Dedup.deltaDedup(idx2, batch1, K, NH, RPB,
      MINJ, MAXDF)
    val wp = pairSet(wantPairs)
    Dedup.releasePinnedCaches()
    val idx3 = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val wc = pairSet(Dedup.compactionPairs(idx3, batch1, K, NH, RPB,
      MINJ, MAXDF))
    Dedup.releasePinnedCaches()
    assert(gotPairs == wp)
    assert(gotComp == wc)
    assert(gotAff == affectedIds(oldDocs, batch1))
  }

  test("pair-store update rule from an EMPTY index converges to the " +
    "one-shot full-corpus pairs (the e58 streaming invariant)") {
    // P' = (P \ pairs-with-affected-side) ∪ delta ∪ compaction,
    // absorbed batch by batch — the exact loop the staged streaming
    // replay runs in foreachBatch, here in its pure batch form
    var idx = Dedup.buildSignatureIndex(oldDocs.limit(0), K, NH, RPB,
      MAXDF)
    var store = Set.empty[(Long, Long, Double)]
    for (b <- Seq(oldDocs, batch1, batch2)) {
      val step = Dedup.deltaStep(idx, b, K, NH, RPB, MINJ, MAXDF)
      val aff = step.affected.collect().map(_.getLong(0)).toSet
      store = store.filter(p => !aff(p._1) && !aff(p._2)) ++
        pairSet(step.pairs) ++ pairSet(step.compaction)
      // materialize the absorbed index before releasing this step's
      // caches (the parquet round-trip the query form performs)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_e58_idx").toString
      step.updated.write(dir)
      Dedup.releasePinnedCaches()
      idx = Dedup.SignatureIndex.read(spark, dir)
    }
    val full = pairSet(Dedup.minhashLshPairs(
      oldDocs.union(batch1).union(batch2), K, NH, RPB, MINJ, MAXDF))
    Dedup.releasePinnedCaches()
    assert(full.nonEmpty)
    assert(store == full)
  }

  test("deltaStats reports the crafted fixture's blast radius") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val row = Dedup.deltaStats(idx, batch1, K, MAXDF).collect().head
    Dedup.releasePinnedCaches()
    val aff = affectedIds(oldDocs, batch1)
    assert(row.getAs[Long]("n_batch_docs") == 3L)
    // exactly one shingle flips: "z1 z2 z3" (df 3 -> 4)
    assert(row.getAs[Long]("n_cap_flips") == 1L)
    assert(row.getAs[Long]("n_affected_docs") == aff.size.toLong)
    assert(aff == Set(1L, 2L, 5L)) // the z-prefixed old docs
    assert(row.getAs[Long]("n_old_docs") == 7L)
    // 100 * 3/7 duck-rounded at 6 decimals
    assert(row.getAs[Double]("blast_radius_pct") == 42.857143)
  }

  test("deltaStats against an EMPTY index reports a 0.0 blast radius, " +
    "not null (the bootstrap call, ADVICE r8)") {
    val idx = Dedup.buildSignatureIndex(oldDocs.limit(0), K, NH, RPB,
      MAXDF)
    val row = Dedup.deltaStats(idx, batch1, K, MAXDF).collect().head
    Dedup.releasePinnedCaches()
    assert(row.getAs[Long]("n_old_docs") == 0L)
    assert(!row.isNullAt(row.fieldIndex("blast_radius_pct")))
    assert(row.getAs[Double]("blast_radius_pct") == 0.0)
  }

  test("index round-trips through parquet (the persisted-store form)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx").toString
    Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF).write(dir)
    Dedup.releasePinnedCaches()
    val idx = Dedup.SignatureIndex.read(spark, dir)
    val (pairs, _) = Dedup.deltaDedup(idx, batch1, K, NH, RPB, MINJ,
      MAXDF)
    val got = pairSet(pairs)
    Dedup.releasePinnedCaches()
    val want = fullRestricted(oldDocs.union(batch1),
      Set(10L, 11L, 12L))
    Dedup.releasePinnedCaches()
    assert(got == want)
  }

  test("persisted index carries its parameters: write records them, " +
    "read restores them (VERDICT r8 #5)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx_meta").toString
    Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF).write(dir)
    Dedup.releasePinnedCaches()
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths
      .get(dir).resolve(Dedup.SignatureIndex.MetaFile)))
    val idx = Dedup.SignatureIndex.read(spark, dir)
    assert(idx.params == Dedup.IndexParams(K, NH, RPB, MAXDF))
  }

  test("reading an index directory without the metadata file fails " +
    "fast with a migration message, not a guessed-parameter index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx_nometa").toString
    Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF).write(dir)
    Dedup.releasePinnedCaches()
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir)
      .resolve(Dedup.SignatureIndex.MetaFile))
    val e = intercept[IllegalStateException] {
      Dedup.SignatureIndex.read(spark, dir)
    }
    assert(e.getMessage.contains("pre-versioning"))
  }

  test("probing an index with mismatched parameters fails fast " +
    "instead of producing silently-garbage candidates") {
    val idx = Dedup.buildSignatureIndex(oldDocs, K, NH, RPB, MAXDF)
    val e = intercept[IllegalArgumentException] {
      Dedup.deltaStep(idx, batch1, K + 1, NH, RPB, MINJ, MAXDF)
    }
    assert(e.getMessage.contains("built with"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.deltaStats(idx, batch1, K, MAXDF + 1)
    }
    assert(e2.getMessage.contains("built with"))
    Dedup.releasePinnedCaches()
  }
}
