package graft

import org.apache.spark.sql.functions._

import graft.ext.{DataProfile, Dedup, KMeans, Sampling, TextAnalysis}

/** Dataset profiling, k-means centroid training, vocabulary top-k, and
  * shuffle-shard export (E21–E25 invariants). */
class ProfileKMeansSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row, schema-driven stats, nulls counted") {
    val df = Seq((Some(1L), Some("a"), Some(2.0)),
      (None, Some("b"), None), (Some(3L), None, Some(4.0)))
      .toDF("id", "s", "v")
    val r = DataProfile.profile(df).collect()(0)
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("id_nulls") == 1)
    assert(r.getAs[Long]("id_min") == 1 && r.getAs[Long]("id_max") == 3)
    assert(r.getAs[Long]("s_nulls") == 1)
    assert(r.getAs[Long]("s_distinct") == 2)
    assert(r.getAs[Double]("v_avg") == 3.0)
  }

  test("groupedQuantiles: quantiles are order statistics per group") {
    val df = (1 to 9).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = DataProfile.groupedQuantiles(df, col("k"), col("v"),
      qs = Seq(0.25, 0.5, 0.75)).collect()(0)
    // exact interpolated percentile over 1..9: pos = q*(n-1)+1
    assert(r.getAs[Long]("n") == 9)
    assert(r.getAs[Double]("p25") == 3.0)
    assert(r.getAs[Double]("p50") == 5.0)
    assert(r.getAs[Double]("p75") == 7.0)
  }

  test("kmeans: separated clusters recover their means") {
    // two tight blobs on a line; k=2 init = vec_ids 0,1 (one per blob)
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (2L, Array(0.2f, 0.0f)),
      (4L, Array(0.4f, 0.0f)),
      (1L, Array(10.0f, 0.0f)), (3L, Array(10.2f, 0.0f)),
      (5L, Array(10.4f, 0.0f))).toDF("vec_id", "embedding")
    val got = KMeans.centroidsFlat(vecs, k = 2, iters = 2)
      .orderBy("cluster_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 4) // 2 clusters x 2 dims
    val c0 = got.filter(_._1 == 0L).map(_._3).toSeq
    val c1 = got.filter(_._1 == 1L).map(_._3).toSeq
    assert(math.abs(c0.head - 0.2) < 1e-4 && c0(1) == 0.0)
    assert(math.abs(c1.head - 10.2) < 1e-3 && c1(1) == 0.0)
    assert(got.forall(_._4 == 3L)) // each blob has 3 members
  }

  test("kmeans: an emptied cluster re-seeds deterministically from " +
    "the farthest point instead of silently training < k cells") {
    // init seeds are vec_id 0/1 — identical [0,0] vectors, so the
    // lowest-cid tie-break empties cluster 1 on iteration 1; without
    // re-seeding iteration 2 would train ONE cell over this clearly
    // 2-cluster corpus
    val vs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)),
      (2L, Seq(10f, 10f)), (3L, Seq(10f, 10f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.centroidsFlat(vs, k = 2, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    val byCluster = out.groupBy(_._1)
    assert(byCluster.keySet == Set(0L, 1L),
      s"expected both clusters trained, got ${byCluster.keySet}")
    // cluster 1 re-seeded at the farthest point [10,10] (vec_id 2 by
    // tie-break) and then captured both far vectors
    assert(byCluster(1L).map(r => (r._2, r._3)).sorted.toSeq ==
      Seq((0L, 10.0), (1L, 10.0)))
    assert(byCluster(1L).head._4 == 2L)
    assert(byCluster(0L).map(r => (r._2, r._3)).sorted.toSeq ==
      Seq((0L, 0.0), (1L, 0.0)))
  }

  test("kmeans: n_members covers every input vector exactly once") {
    val vecs = (0L until 50L)
      .map(i => (i, Array.tabulate(4)(j => ((i * 7 + j) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val flat = KMeans.centroidsFlat(vecs, k = 5, iters = 2)
    val perCluster = flat.filter(col("pos") === 0)
      .agg(sum("n_members")).collect()(0).getLong(0)
    assert(perCluster == 50L)
  }

  test("topTokens: rank is dense and ordered by (count desc, token)") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c  d")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, n = 3).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("repetitionSignals: top-word and duplicate-2-gram fractions") {
    val docs = Seq(
      (1L, "a a a a"),      // top word 4/4; 2-grams all "a a": dup 2/3
      (2L, "a b c d"),      // top 1/4; 3 distinct 2-grams: dup 0
      (3L, "x")             // dropped: under 2 words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((4L, 1.0, 2.0 / 3)))
    assert(got(2L) == ((4L, 0.25, 0.0)))
  }

  test("decontaminate: counts distinct shared shingles per corpus doc") {
    val ev = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b c d e x y z w v"), // shares "a b c d e"
      (11L, "p q r s t u v w x y"), // no overlap
      (12L, "a b c d e f")          // exact eval copy: both shingles
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 12L -> 2L))
  }

  test("shuffleShards: dense positions per shard, stable permutation") {
    val docs = (0L until 100L).toDF("doc_id")
    val a = Sampling.shuffleShards(docs, col("doc_id"), nShards = 4)
    val b = Sampling.shuffleShards(docs.repartition(7), col("doc_id"),
      nShards = 4)
    assert(a.count() == 100)
    // positions within each shard are 1..size(shard)
    val dense = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos_in_shard").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(dense == 0)
    // partition-layout independent
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
