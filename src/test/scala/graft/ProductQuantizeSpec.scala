package graft

import graft.ext.Similarity

/** Hand-checkable semantics of product quantization (its corpus gate is
  * e74's per-subspace-Lloyd DuckDB oracle): a corpus of k exact cluster
  * patterns, each replicated, must train codebooks that reconstruct
  * every vector EXACTLY — zero error, and codes equal to cluster
  * identity in both subspaces (integer inputs survive the 6-decimal
  * centroid rounding unchanged, and averaging identical members is the
  * member itself). */
class ProductQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("replicated clusters: exact reconstruction, codes = identity") {
    val base = (0 until 8).map(c =>
      Array.tabulate(8)(j => (c * 10 + j).toFloat))
    val rows = (0 until 32).map(i =>
      (i.toLong, base(i % 8), (i % 4).toLong))
    val out = Similarity.productQuantizeError(
        rows.toDF("vec_id", "embedding", "label"), m = 2, k = 8,
        iters = 2)
      .orderBy("label").collect()
    assert(out.length == 4)
    out.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == 8L, s"label $l n_vecs") // 32 vecs / 4 labels
      assert(r.getLong(2) == 64L, s"label $l n_vals") // 8 vecs × dim 8
      // vecs with label l have cluster i%8 ∈ {l, l+4}, 4 of each, and
      // BOTH subspace codes equal the cluster id (init vec_id = cid):
      // sum = 2 subs × 4 × (l + l + 4) = 16l + 32
      assert(r.getLong(3) == 16 * l + 32, s"label $l sum_code")
      assert(r.getDouble(4) == 0.0, s"label $l max_abs_err")
      assert(r.getDouble(5) == 0.0, s"label $l mse")
    }
  }

  test("ADC on the same fixture finds a query's own cluster at " +
    "distance zero") {
    val base = (0 until 8).map(c =>
      Array.tabulate(8)(j => (c * 10 + j).toFloat))
    val rows = (0 until 32).map(i =>
      (i.toLong, base(i % 8), (i % 4).toLong))
    val df = rows.toDF("vec_id", "embedding", "label")
    // vec 0's cluster members are vecs 8, 16, 24 (self excluded) —
    // exact duplicates, so the quantized distance is exactly 0
    val out = Similarity.pqAdcTopK(df.filter($"vec_id" === 0), df, 3)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((8L, 0.0), (16L, 0.0), (24L, 0.0)))
  }
}
