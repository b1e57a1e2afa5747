package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet persistence for the IVF-PQ index (VERDICT r11 #1) — the
  * build/serve split that makes IVF-PQ real at 10⁹ vectors, mirroring
  * the near-dup [[Dedup.SignatureIndex]] store (proven by e51): an
  * index BUILD (coarse k-means + per-subspace Lloyd codebooks + corpus
  * encode) runs once and writes four frames; any number of serving
  * processes then `read` the model halves and `topKFromCoded` against
  * the coded corpus without touching a raw vector or retraining.
  *
  * Layout under `path`:
  *  - `meta/`       one row: (sub_dim, m, residual) — decode geometry
  *  - `centroids/`  (cid, vec array<double>) — the coarse quantizer
  *  - `codebooks/`  (sub, cid, vec array<double>) — m × kCodes entries
  *  - `coded/`      (n_id, cell, code_0..code_{m-1}) — the DATA half:
  *    m small ints + a cell id per vector (the PQ compression). At
  *    scale this is the only frame proportional to the corpus; write
  *    it partitioned/bucketed by `cell` so serving's probe join prunes
  *    to nprobe/coarseK of the files.
  *
  * Determinism: model state is doubles, and parquet round-trips
  * doubles bit-exactly, so a loaded model serves HASH-IDENTICAL
  * results to the in-memory one (the e83 gate proves it against
  * e76's oracle). Reads sort by (sub, cid) — centroid ORDER is
  * irrelevant to assignment (argmin over (dist, cid) structs) but a
  * deterministic member order keeps plan literals stable.
  *
  * Scale shape: meta/centroids/codebooks are O(k·dim) model state
  * (the KMeans contract — collected to the driver, entering plans as
  * literals); `coded` is never collected.
  */
object VectorIndex {

  private val vecField = ArrayType(DoubleType, containsNull = false)

  private def seqDf(spark: SparkSession, schema: StructType,
                    rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  private def writeParts(spark: SparkSession, path: String,
                         centroids: Seq[(Int, Seq[Double])],
                         codebooks: IndexedSeq[Seq[(Int, Seq[Double])]],
                         subDim: Int, residual: Boolean,
                         coded: DataFrame): Unit = {
    seqDf(spark,
      StructType(Seq(StructField("sub_dim", IntegerType, false),
        StructField("m", IntegerType, false),
        StructField("residual", BooleanType, false))),
      Seq(Row(subDim, codebooks.size, residual)))
      .write.mode("overwrite").parquet(s"$path/meta")
    seqDf(spark,
      StructType(Seq(StructField("cid", IntegerType, false),
        StructField("vec", vecField, false))),
      centroids.map { case (cid, v) => Row(cid, v) })
      .write.mode("overwrite").parquet(s"$path/centroids")
    seqDf(spark,
      StructType(Seq(StructField("sub", IntegerType, false),
        StructField("cid", IntegerType, false),
        StructField("vec", vecField, false))),
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.map { case (cid, v) => Row(s, cid, v) } })
      .write.mode("overwrite").parquet(s"$path/codebooks")
    // the corpus-sized half: partition by cell so a probe of nprobe
    // cells prunes the scan to nprobe/coarseK of the files
    coded.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/coded")
  }

  /** Persist a raw-vector IVF-PQ index: model halves + the
    * [[Similarity.IvfPqModel.encode]]d corpus. */
  def write(spark: SparkSession, model: Similarity.IvfPqModel,
            corpus: DataFrame, path: String): Unit =
    writeParts(spark, path, model.centroids, model.codebooks,
      model.subDim, residual = false, model.encode(corpus))

  /** Paths [[writeOnce]] has built THIS JVM — the cross-gate sharing
    * half of the build/serve split: the first gate to touch a shared
    * index path pays the build (always a fresh overwrite, so a stale
    * artifact from a previous process can never be served), later
    * gates in the same Verify/Bench run reuse the artifact. */
  private val writtenPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** [[write]], but at most once per (path) per JVM — for gates that
    * share one index artifact (e83 build/serve and e94 stream-serve
    * use the same model + corpus, so the artifact is identical; the
    * driver bench should pay ONE build, not one per gate). Training
    * is deterministic, so a reuse is value-identical to a rebuild. */
  def writeOnce(spark: SparkSession, model: Similarity.IvfPqModel,
                corpus: DataFrame, path: String): Unit =
    if (writtenPaths.add(path)) write(spark, model, corpus, path)

  /** Test seam: forget which paths were built so a spec can prove
    * both the build and the reuse branch. */
  private[graft] def forgetWrites(): Unit = writtenPaths.clear()

  /** Persist a residual IVF-PQ index. */
  def writeResidual(spark: SparkSession,
                    model: Similarity.IvfPqResidualModel,
                    corpus: DataFrame, path: String): Unit =
    writeParts(spark, path, model.centroids, model.codebooks,
      model.subDim, residual = true, model.encode(corpus))

  private def readParts(spark: SparkSession, path: String,
      wantResidual: Boolean): (Seq[(Int, Seq[Double])],
      IndexedSeq[Seq[(Int, Seq[Double])]], Int) = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val subDim = meta.getAs[Int]("sub_dim")
    val residual = meta.getAs[Boolean]("residual")
    require(residual == wantResidual,
      s"index at $path is residual=$residual; read with the matching " +
        "entry point (read vs readResidual)")
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("vec")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .toSeq.sortBy(_._1)
    val cbs = spark.read.parquet(s"$path/codebooks")
      .select(col("sub"), col("cid"), col("vec")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_._2).map(r => r._2 -> r._3).toSeq }
      .toIndexedSeq
    (cents, cbs, subDim)
  }

  /** Load the model halves of a persisted raw index (O(k·dim) driver
    * state — the KMeans contract). */
  def read(spark: SparkSession, path: String): Similarity.IvfPqModel = {
    val (c, cb, l) = readParts(spark, path, wantResidual = false)
    Similarity.IvfPqModel(c, cb, l)
  }

  /** Load the model halves of a persisted residual index. */
  def readResidual(spark: SparkSession,
                   path: String): Similarity.IvfPqResidualModel = {
    val (c, cb, l) = readParts(spark, path, wantResidual = true)
    Similarity.IvfPqResidualModel(c, cb, l)
  }

  /** Append a batch of NEW vectors to a persisted index's coded
    * corpus — the index-UPDATE mode (the delta-dedup analog for ANN:
    * a 10⁹-vector index absorbs a day's vectors without retraining or
    * re-encoding the corpus). The batch is encoded with the PERSISTED
    * model halves — so its codes are exactly what a full re-encode
    * under the same model would produce — and appended as
    * cell-partitioned files; serving reads old ∪ new transparently.
    * Model staleness is the operator's knob, not its bug: quantizer
    * drift is observable as rising reconstruction error
    * ([[Similarity.productQuantizeErrorWith]] over recent batches),
    * and the remedy is a rebuild — the same cadence decision as the
    * near-dup store's compaction. Works for both flavors (the meta
    * row dispatches). */
  def append(spark: SparkSession, path: String,
             batch: DataFrame): Unit = {
    val residual = spark.read.parquet(s"$path/meta").head()
      .getAs[Boolean]("residual")
    val coded =
      if (residual) readResidual(spark, path).encode(batch)
      else read(spark, path).encode(batch)
    coded.write.mode("append").partitionBy("cell")
      .parquet(s"$path/coded")
  }

  /** [[append]] guarded for AT-LEAST-ONCE callers (ADVICE r16):
    * `foreachBatch` re-delivers a failed micro-batch, and the parquet
    * `append` is not self-idempotent — a retry would double the
    * batch's vectors. A marker file under `applied/` records each
    * completed batchId; a redelivery that finds its marker skips the
    * append. The marker lands AFTER the data, so a crash BETWEEN
    * append and marker still re-appends — the standard at-least-once
    * residue (exactly-once needs the data and the marker in one
    * atomic commit, which plain parquet does not offer); the window
    * is the marker write, not the batch. The marker probe and create
    * go through the Hadoop `FileSystem` resolved from the index path
    * itself ([[graft.StoreFs]], VERDICT r17 #2), so the same loop
    * serves a file://, hdfs://, or s3a:// index. */
  def appendOnce(spark: SparkSession, path: String, batch: DataFrame,
                 batchId: Long): Unit = {
    val marker = s"$path/applied/batch_$batchId"
    if (!graft.StoreFs.exists(spark, marker)) {
      append(spark, path, batch)
      // a LOST marker race (two writers both observed "absent" —
      // both have appended by now) means the batch is already
      // applied from this writer's perspective: failing the
      // micro-batch here would only trigger a THIRD append on
      // redelivery, so the losing writer treats it as done
      // (ADVICE r18)
      try graft.StoreFs.touch(spark, marker)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      }
    }
  }

  /** The persisted coded corpus, columns re-ordered to the
    * [[Similarity.IvfPqModel.encode]] layout (partitionBy moves `cell`
    * last on disk). */
  def readCoded(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(s"$path/coded")
    val codes = df.columns.filter(_.startsWith("code_"))
      .sortBy(_.drop(5).toInt).map(col)
    df.select((col("n_id") +: col("cell").cast("int") +: codes.toSeq): _*)
  }
}

/** JVM-wide memo for trained driver-side models (VERDICT r11 #1's
  * amortization half): e74/e75/e76/e79/e80/e81 all need the SAME
  * deterministic training (coarse centroids, PQ codebooks) and
  * previously each retrained from scratch (~35-40 s of the bench
  * suite). A production system builds an index once and serves many
  * queries against it — this cache is the in-process form of that
  * split ([[VectorIndex]] is the cross-process form).
  *
  * Keys must encode EVERYTHING the training depends on (input dir +
  * every hyper-parameter); training is deterministic, so a hit is
  * value-identical to retraining — gates stay hash-identical. Memory:
  * entries are O(k·dim) model state, bounded by the handful of
  * distinct (dir, params) keys a process touches. Thread-safe via
  * ConcurrentHashMap; a miss trains inside computeIfAbsent, so two
  * threads racing the same key train once. */
object ModelCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** `train` evaluated once per distinct `key` per JVM. */
  def cached[T <: AnyRef](key: String)(train: => T): T =
    cache.computeIfAbsent(key, _ => train).asInstanceOf[T]

  /** Test seam: forget everything (so a spec can prove both the miss
    * and the hit path). */
  private[graft] def clear(): Unit = cache.clear()
}
