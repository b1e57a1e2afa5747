package graft

import org.apache.spark.sql.catalyst.plans.logical.Project

import graft.ext.Similarity

/** Pins the PQ expression-staging rule (VERDICT r11 #6): the
  * Similarity.staged combinator must produce plans where expensive
  * multi-referenced values (the double-cast vector, the coarse argmin
  * cell, the residual subtraction) evaluate ONCE per row as alias
  * attributes — CollapseProject keeps such aliases staged rather than
  * inlining them into the m×k codebook distances (the 32×-recompute
  * trap: e81's first cut measured 92 s vs 12 s staged at sf0.1). A
  * future Catalyst change or refactor that collapses the stages would
  * re-inline the cast into every codebook argmin and fail here long
  * before it surfaces as a bench regression. */
class StagedProjectSpec extends SparkSpec {

  // parquet-backed (not a LocalRelation, which ConvertToLocalRelation
  // would constant-fold — the staging question only exists over a
  // real scan)
  private lazy val corpus = {
    import spark.implicits._
    val dir = java.nio.file.Paths.get("target", "test-fixtures",
      "staged_corpus").toString
    (0 until 30).map { i =>
      (i.toLong, (0 until 12).map(d =>
        math.cos(i * 0.9 + d * 1.3).toFloat).toArray)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def castCount(plan: String): Int =
    raw"lambdafunction\(cast\(".r.findAllIn(plan).length

  test("raw encode stages the double-cast vector: one cast per row, " +
    "not one per codebook entry") {
    val c = corpus
    val model = Similarity.trainIvfPq(c, coarseK = 3, m = 3,
      kCodes = 4, iters = 1)
    val qe = model.encode(c).queryExecution
    val optimized = qe.optimizedPlan
    // the stages survive optimization as separate Projects
    val projects = optimized.collect { case p: Project => p }
    assert(projects.size >= 2,
      s"expected staged Projects, got:\n$optimized")
    // the float→double cast lambda appears ONCE (the `ve` alias);
    // inlined it would appear in the cell argmin AND every one of the
    // m codebook argmins
    val n = castCount(optimized.toString)
    assert(n == 1,
      s"double-cast evaluated $n times — expression staging broken")
  }

  test("residual encode stages vector, cell, and residual — the cast " +
    "and the subtraction each evaluate once per row") {
    val c = corpus
    val model = Similarity.trainIvfPqResidual(c, coarseK = 3, m = 3,
      kCodes = 4, iters = 1)
    val optimized = model.encode(c).queryExecution.optimizedPlan
    val projects = optimized.collect { case p: Project => p }
    assert(projects.size >= 3,
      s"expected >= 3 staged Projects, got:\n$optimized")
    assert(castCount(optimized.toString) == 1,
      "double-cast must evaluate once per row")
    // the residual zip_with — distinguishable from the per-entry
    // distance folds by its element_at(centroid-map) second argument —
    // appears once (the `re` alias), not per codebook entry
    val resids = raw"zip_with\(\w+#\d+, element_at".r
      .findAllIn(optimized.toString).length
    assert(resids == 1,
      s"residual subtraction evaluated $resids times — staging broken")
  }
}
