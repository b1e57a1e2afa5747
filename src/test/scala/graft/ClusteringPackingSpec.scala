package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.{Clustering, Packing, Sampling}

/** Connected components, sequence packing, and deterministic sampling. */
class ClusteringPackingSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, clique and pair resolve to min ids") {
    // chain 1-2-3-4 (diameter 3 → needs several propagation rounds),
    // triangle 10-11-12, isolated pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Clustering.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain converges within maxIter") {
    // a 30-vertex path labels everything with vertex 0: min-label
    // propagation moves the min one hop per round, so this exercises the
    // full iteration loop (and the lineage truncation that keeps 29
    // rounds from blowing up the plan)
    val edges = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Clustering.connectedComponents(edges, maxIter = 40)
    assert(labels.filter(col("label") === 0L).count() == 30)
  }

  test("connectedComponentsStar: chain, clique and pair resolve to " +
    "min ids (same contract as min-label)") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Clustering.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponentsStar: adversarial long chain converges in " +
    "FEWER rounds than its diameter") {
    // a 64-vertex path is the adversarial-diameter case the contraction
    // exists for: min-label needs O(diameter) propagation; the
    // alternating star algorithm contracts geometrically, so maxIter=12
    // (« 63) must suffice
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Clustering.connectedComponentsStar(edges, maxIter = 12)
    assert(labels.filter(col("label") === 0L).count() == 64)
    assert(labels.count() == 64)
  }

  test("connectedComponentsStar: equals min-label propagation on a " +
    "random multi-component graph (property)") {
    // deterministic pseudo-random graph: 120 vertices, edges from a
    // hash-derived pairing — several components of varying shape, plus
    // duplicate and self-referential inputs the canonicalizer must eat
    val raw = (0L until 200L).map { i =>
      val a = (i * 2654435761L) % 120L
      val b = (i * 40503L + 7L) % 120L
      (a, b)
    }.filter { case (a, b) => a != b } ++ Seq((5L, 5L), (3L, 7L), (7L, 3L))
    val edges = raw.toDF("doc_a", "doc_b")
      .filter(col("doc_a") =!= col("doc_b"))
    val star = Clustering.connectedComponentsStar(edges)
    val minLabel = Clustering.connectedComponents(edges)
    assert(star.except(minLabel).isEmpty &&
      minLabel.except(star).isEmpty)
  }

  test("sameEdgeSet: one ACTION per convergence check, correct on " +
    "equal and unequal sets") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L)).toDF("u", "v").localCheckpoint()
    val b = Seq((1L, 2L), (3L, 4L)).toDF("u", "v").localCheckpoint()
    val c = Seq((1L, 2L), (3L, 5L)).toDF("u", "v").localCheckpoint()
    // count ACTIONS (driver round-trips with a full plan each), not
    // Spark jobs — under AQE one action legitimately runs several jobs
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      actions.set(0)
      assert(graft.ext.Clustering.sameEdgeSet(a, b))
      assert(!graft.ext.Clustering.sameEdgeSet(a, c))
      // listener delivery is async: poll briefly for the final count
      var tries = 0
      while (actions.get() < 2 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(actions.get() == 2,
        s"expected 1 action per check, saw ${actions.get()} for 2")
    } finally spark.listenerManager.unregister(l)
  }

  test("packSequences: straddling docs and bucket boundaries") {
    // seqLen 10: cumulative 0,7,12,12,29 — doc 3 straddles 10, the
    // zero-token doc 4 sits inside seq 1, doc 5 starts in seq 2
    val toks = Seq((1L, 7L), (3L, 5L), (4L, 0L), (5L, 17L), (9L, 4L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(toks, seqLen = 10, nBuckets = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 0L), (3L, 0L, 7L), (4L, 1L, 2L),
      (5L, 1L, 2L), (9L, 2L, 9L)))
  }

  test("packSequences: two-phase prefix sum equals one global window") {
    val toks = (0L until 500L).map(i => (i * 2, i % 13))
      .toDF("doc_id", "n_tokens")
    val wG = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = toks
      .withColumn("bef", coalesce(sum(col("n_tokens")).over(wG), lit(0L)))
      .select(col("doc_id"), expr("bef div 64").as("seq_id"),
        expr("bef % 64").as("offset_in_seq"))
    val got = Packing.packSequences(toks, seqLen = 64, nBuckets = 7)
      .select("doc_id", "seq_id", "offset_in_seq")
    assert(got.except(expect).count() == 0 &&
      expect.except(got).count() == 0)
  }

  test("stratifiedSample: deterministic and rate-respecting") {
    val df = (0L until 300L).map(i => (i, i % 3)).toDF("id", "m")
    val stratum = when(col("m") === 0, "a").otherwise(lit("b"))
    val s1 = Sampling.stratifiedSample(df, col("id"), stratum,
      Seq("a" -> 100), defaultPermille = 1000)
    val s2 = Sampling.stratifiedSample(df, col("id"), stratum,
      Seq("a" -> 100), defaultPermille = 1000)
    // identical across runs (hash, not RNG)
    assert(rows(s1.orderBy("id")) == rows(s2.orderBy("id")))
    // rate 1000 keeps everything; rate 100 keeps a strict subset
    assert(s1.filter(col("stratum") === "b").count() == 200)
    val aKept = s1.filter(col("stratum") === "a").count()
    assert(aKept > 0 && aKept < 100)
    // membership is exactly "bucket < rate"
    assert(s1.filter(col("bucket") >= when(col("stratum") === "a", 100)
      .otherwise(1000)).count() == 0)
  }

  test("weightedSample: keep probability follows the per-row weight") {
    val df = (0L until 400L).map(i => (i, if (i < 200) 0.0 else 1.0))
      .toDF("id", "w")
    val s = Sampling.weightedSample(df, col("id"), col("w"))
    // weight 0 keeps nothing; weight 1 keeps everything
    assert(s.filter(col("w") === 0.0).count() == 0)
    assert(s.filter(col("w") === 1.0).count() == 200)
    // clamping: weights beyond [0,1] behave like the bounds
    val s2 = Sampling.weightedSample(
      (0L until 100L).map(i => (i, 7.5)).toDF("id", "w"),
      col("id"), col("w"))
    assert(s2.count() == 100)
  }

  test("packedShards: deterministic order, digest matches a local " +
    "re-pack") {
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"))
      .toDF("doc_id", "text")
    val got = Packing.packedShards(df, nShards = 2).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("packed_len"),
          r.getAs[String]("packed_md5"))).toMap
    assert(got.values.map(_._1).sum == 4)
    // re-derive one shard by hand: md5-rank order, "\n\n"-joined
    def md5Long(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString.take(15), 16)
    val byShard = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"))
      .map { case (id, t) => (md5Long(id.toString), id, t) }
      .groupBy(_._1 % 2)
    byShard.foreach { case (shard, ds) =>
      val packed = ds.sorted.map(_._3).mkString("\n\n")
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(packed.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(shard) == ((ds.size.toLong, packed.length.toLong,
        md5hex)))
    }
  }
}
