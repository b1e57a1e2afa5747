package graft

import org.apache.spark.sql.functions._

import graft.ext.{ModelCache, Similarity, VectorIndex}

/** The persisted IVF-PQ index (VERDICT r11 #1): parquet round-trip of
  * the model halves + coded corpus, the loaded model serving results
  * identical to the in-memory one, the residual flavor's read guard,
  * and the ModelCache build-once contract. Synthetic 24-dim corpus so
  * the suite is self-contained (the sf-corpus gates are e83/e76). */
class VectorIndexSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // deterministic, non-degenerate: 40 vectors in 24 dims
    (0 until 40).map { i =>
      (i.toLong, (0 until 24).map(d =>
        math.sin(i * 1.7 + d * 0.61).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  private def tmp(name: String): String = {
    val d = java.nio.file.Paths.get("target", "test-fixtures", name)
    Scratch.deleteRecursively(d)
    d.toString
  }

  test("raw model round-trips parquet bit-exactly and the loaded " +
    "model serves identical top-k") {
    val c = corpus
    val model = Similarity.trainIvfPq(c, coarseK = 4, m = 3,
      kCodes = 4, iters = 2)
    val path = tmp("ivfpq_rt")
    VectorIndex.write(spark, model, c, path)
    val loaded = VectorIndex.read(spark, path)
    assert(loaded.subDim === model.subDim)
    assert(loaded.centroids === model.centroids)
    assert(loaded.codebooks === model.codebooks)
    val q = c.filter(col("vec_id") < 5)
    val inMem = rows(model.topK(q, c, 3, 2)
      .orderBy(col("q_id"), col("rank")))
    val served = rows(loaded.topKFromCoded(q,
        VectorIndex.readCoded(spark, path), 3, 2)
      .orderBy(col("q_id"), col("rank")))
    assert(served === inMem)
  }

  test("coded corpus round-trips with the encode layout and cell " +
    "partitioning") {
    val c = corpus
    val model = Similarity.trainIvfPq(c, coarseK = 4, m = 3,
      kCodes = 4, iters = 2)
    val path = tmp("ivfpq_coded")
    VectorIndex.write(spark, model, c, path)
    val coded = VectorIndex.readCoded(spark, path)
    assert(coded.columns.toSeq ===
      Seq("n_id", "cell", "code_0", "code_1", "code_2"))
    val direct = rows(model.encode(c).orderBy(col("n_id")))
    assert(rows(coded.orderBy(col("n_id"))) === direct)
    // partitionBy(cell) layout: one directory per cell on disk, so a
    // probe of nprobe cells prunes the scan
    val dirs = new java.io.File(s"$path/coded").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.nonEmpty)
  }

  test("residual model round-trips and the flavor guard rejects a " +
    "mismatched read") {
    val c = corpus
    val model = Similarity.trainIvfPqResidual(c, coarseK = 4, m = 3,
      kCodes = 4, iters = 2)
    val path = tmp("ivfpq_resid_rt")
    VectorIndex.writeResidual(spark, model, c, path)
    val loaded = VectorIndex.readResidual(spark, path)
    assert(loaded === model)
    val q = c.filter(col("vec_id") < 5)
    assert(
      rows(loaded.topKFromCoded(q, VectorIndex.readCoded(spark, path),
        3, 2).orderBy(col("q_id"), col("rank"))) ===
      rows(model.topK(q, c, 3, 2).orderBy(col("q_id"), col("rank"))))
    val err = intercept[IllegalArgumentException](
      VectorIndex.read(spark, path))
    assert(err.getMessage.contains("residual"))
  }

  test("append encodes a batch with the PERSISTED model — the store " +
    "equals a full re-encode under the old model, and serving reads " +
    "old ∪ new") {
    val c = corpus
    val old = c.filter(col("vec_id") < 30)
    val batch = c.filter(col("vec_id") >= 30)
    val model = Similarity.trainIvfPq(old, coarseK = 4, m = 3,
      kCodes = 4, iters = 2)
    val path = tmp("ivfpq_append")
    VectorIndex.write(spark, model, old, path)
    VectorIndex.append(spark, path, batch)
    val coded = VectorIndex.readCoded(spark, path)
    // append-mode store == one-shot encode of the FULL corpus under
    // the old model (no retraining happened)
    assert(rows(coded.orderBy(col("n_id"))) ===
      rows(model.encode(c).orderBy(col("n_id"))))
    // serving sees the appended vectors
    val q = c.filter(col("vec_id") < 3)
    assert(rows(VectorIndex.read(spark, path)
        .topKFromCoded(q, coded, 3, 2)
        .orderBy(col("q_id"), col("rank"))) ===
      rows(model.topK(q, c, 3, 2).orderBy(col("q_id"), col("rank"))))
  }

  test("appendOnce is idempotent per batchId — a redelivered " +
    "micro-batch does not double its vectors (ADVICE r16)") {
    val c = corpus
    val old = c.filter(col("vec_id") >= 10)
    val batch = c.filter(col("vec_id") < 10)
    val model = Similarity.trainIvfPq(c, coarseK = 4, m = 3,
      kCodes = 4, iters = 2)
    val path = tmp("ivfpq_append_once")
    VectorIndex.write(spark, model, old, path)
    VectorIndex.appendOnce(spark, path, batch, batchId = 7L)
    val once = VectorIndex.readCoded(spark, path).count()
    // the at-least-once redelivery: same batchId → no-op
    VectorIndex.appendOnce(spark, path, batch, batchId = 7L)
    assert(VectorIndex.readCoded(spark, path).count() === once)
    assert(once === 40L)
    // a NEW batchId still appends
    VectorIndex.appendOnce(spark, path,
      batch.withColumn("vec_id", col("vec_id") + 1000L), batchId = 8L)
    assert(VectorIndex.readCoded(spark, path).count() === 50L)
  }

  test("ModelCache evaluates a key's training exactly once and " +
    "returns the identical instance") {
    ModelCache.clear()
    var trainings = 0
    def build() = { trainings += 1; Seq(1 -> Seq(0.5)) }
    val a = ModelCache.cached("vis|spec|k")(build())
    val b = ModelCache.cached("vis|spec|k")(build())
    assert(trainings === 1)
    assert(a eq b)
    val other = ModelCache.cached("vis|spec|other")(build())
    assert(trainings === 2 && (other eq other))
    ModelCache.clear()
  }
}
