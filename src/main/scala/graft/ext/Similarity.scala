package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Rounding

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — SURVEY §7 E-ops.
  *
  * All vector math uses higher-order functions (`zip_with`/`aggregate`)
  * over double-cast arrays — codegen-friendly, no UDFs. Similarities are
  * rounded to 6 decimals BEFORE ranking so top-k ties break identically
  * across engines (then by neighbor id).
  *
  * Scale path: brute force is O(Q·N) — fine when Q is small or as a
  * per-cell step. The IVF variant prunes the corpus to the query's coarse
  * cell (here the `label` column as quantizer cell): the join key carries
  * the cell, so the shuffle co-locates each query with only its cell's
  * vectors — the standard IVF-Flat topology. The LSH variant buckets by
  * deterministic hyperplane sign bits, pruning to same-bucket candidates.
  */
object Similarity {

  /** Double-precision dot product of two numeric-array columns.
    * Backed by the native codegen'd [[graft.functions.DoubleDot]]
    * expression — same sequential accumulation order as the portable
    * `zip_with`+`aggregate` fold in [[dotPortable]] (bit-identical
    * results, verified by the oracle gate) without per-element lambda
    * interpretation. */
  def dot(x: Column, y: Column): Column =
    graft.functions.DoubleDot(x, y)

  /** Built-ins-only fold form of [[dot]] (reference semantics). */
  def dotPortable(x: Column, y: Column): Column =
    aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity between two `array<float>` columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine given precomputed norms: higher-order-function lambdas are
    * not codegen'd, so evaluating each vector's norm once (instead of
    * per pair) cuts the pairwise work by 3x. sqrt(dot(v,v)) is the same
    * expression either way — values stay bit-identical to [[cosine]]. */
  def cosineWithNorms(a: Column, b: Column, normA: Column,
                      normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Norm column for precomputation. */
  def norm(e: Column): Column = sqrt(dot(e, e))

  /** Brute-force top-k cosine neighbors for each query vector (self
    * excluded). `queries`/`corpus`: (vec_id, embedding). */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame,
                    k: Int = 3): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_n"))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), norm(col("embedding")).as("n_n"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", Rounding.duckRound(cosineWithNorms(col("q_emb"), col("n_emb"),
        col("q_n"), col("n_n")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** IVF-style pruned k-NN: search only the query's coarse cell
    * (`label` as the quantizer assignment). Equi-join on the cell key
    * replaces the cross join — the scalable ANN shape.
    *
    * Measured caveat (e52 gate): a label column is only as good a
    * quantizer as its correlation with the metric — on the synthetic
    * testdata recall@3 is 0.033. [[kmeansIvfKnn]] is the trained
    * variant (recall 0.90 at nprobe=2, same data); this one remains
    * as the zero-training shape for data whose labels ARE
    * neighborhoods (e.g. near-dup shards). */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int = 3): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("label").as("cell"),
      norm(col("embedding")).as("q_n"))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("label").as("cell"),
      norm(col("embedding")).as("n_n"))
    q.join(c, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", Rounding.duckRound(cosineWithNorms(col("q_emb"), col("n_emb"),
        col("q_n"), col("n_n")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("cell"), col("n_id"), col("sim"),
        col("rank"))
  }

  /** IVF-Flat with a TRAINED k-means quantizer and multi-probe — the
    * real IVF shape ([[ivfKnn]] uses the table's label column as a
    * stand-in quantizer; this one trains cells that actually follow the
    * vector distribution, and `nprobe` is the recall knob the e52 gate
    * measures). Corpus vectors are assigned to their nearest centroid
    * (one narrow projection over centroid literals — no shuffle);
    * each query probes its `nprobe` nearest cells and ranks candidates
    * by the same rounded cosine / (sim desc, n_id) tie rule as
    * [[bruteForceKnn]].
    *
    * Scale shape: the probe set is queries × nprobe — broadcast onto
    * the celled corpus, so the corpus never shuffles; cell assignment
    * and distance ranking are per-row expressions over O(k·dim)
    * centroid literals (the MLlib model-state topology). */
  def kmeansIvfKnn(queries: DataFrame, corpus: DataFrame,
                   centroids: Seq[(Int, Seq[Double])], k: Int = 3,
                   nprobe: Int = 2): DataFrame = {
    val dbl: Column => Column = e => transform(e, _.cast("double"))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), norm(col("embedding")).as("n_n"),
      KMeans.nearestCells(dbl(col("embedding")), centroids, 1)
        .getItem(0).as("cell"))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_n"),
      explode(KMeans.nearestCells(dbl(col("embedding")), centroids,
        nprobe)).as("cell"))
    broadcast(q).join(c, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", Rounding.duckRound(cosineWithNorms(
        col("q_emb"), col("n_emb"), col("q_n"), col("n_n")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): assign every vector to its
    * nearest TRAINED k-means centroid, then compute pairwise rounded
    * cosine only WITHIN each cell and keep pairs at or above `minSim`
    * — the embedding-space twin of the LSH band trick, with cells that
    * follow the data distribution instead of a hash or a label column
    * (e14's label buckets are the stand-in this replaces at scale).
    *
    * Scale shape: cell assignment is a per-row expression over
    * O(k·dim) centroid literals (no shuffle); the quadratic step is
    * the per-cell pair expansion of one equi-join on `cell` — bounded
    * by cell size, which the quantizer's k controls (SemDeDup's
    * clusters exist precisely to bound the pairwise stage; the paper
    * runs the same within-cluster all-pairs). Ties and rounding follow
    * the e5/e14 cosine contract, so the pair set is oracle-exact. */
  def semanticDedupPairs(vectors: DataFrame,
                         centroids: Seq[(Int, Seq[Double])],
                         minSim: Double = 0.4): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      KMeans.nearestCells(
        transform(col("embedding"), _.cast("double")), centroids, 1)
        .getItem(0).as("cell"))
    v.as("x").join(v.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cell").as("cell"),
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        graft.Rounding.duckRound(cosineWithNorms(
          col("x.embedding"), col("y.embedding"),
          col("x.nrm"), col("y.nrm")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Embedding outliers: the `k` vectors per label LEAST similar to
    * their label's centroid — the mislabel / off-topic screen a curation
    * pass runs per class or cluster.
    *
    * Fully distributed, no driver-held state (contrast [[KMeans]], whose
    * ITERATION forces centroids through the driver): per-label centroids
    * are one posexplode + partial-aggregated groupBy (label·dim groups),
    * reassembled and BROADCAST back onto the vectors — label cardinality
    * is bounded, vectors never shuffle. Centroid components and
    * similarities are rounded to 6 (ties → lowest vec_id) for exact
    * cross-engine ranking. */
  def labelOutliers(vectors: DataFrame, k: Int = 3): DataFrame = {
    val emb = vectors.select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("e"))
    val cent = emb
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(graft.Rounding.duckRound(avg(col("v")), 6).as("cv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("carr"))
    emb.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        graft.Rounding.duckRound(cosine(col("e"), col("carr")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("sim"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component: integer arithmetic
    * identical in any engine — h[j][i] = ((i·31 + j·17) mod 7) − 3.
    * Backed by the codegen'd [[graft.functions.HyperplaneDot]] (r19:
    * a bucket evaluates this nBits times per vector; the portable fold
    * it replaces was interpreted per element and allocated an index
    * array per row — equality property-pinned in DoubleL2Spec). */
  private[graft] def hyperplaneDot(emb: Column, j: Int): Column =
    graft.functions.HyperplaneDot(emb, j)

  /** The built-ins-only fold [[hyperplaneDot]] replaces (reference
    * semantics for the equivalence property; not on any query path). */
  private[graft] def hyperplaneDotPortable(emb: Column, j: Int): Column =
    aggregate(
      zip_with(emb, sequence(lit(0), size(emb) - 1),
        (v, i) => v.cast("double") *
          ((i * 31 + j * 17) % 7 - 3).cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** LSH bucket id from `nBits` hyperplane sign bits. */
  def lshBucket(emb: Column, nBits: Int = 8): Column =
    (0 until nBits).map(j =>
      when(hyperplaneDot(emb, j) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH bucket id from `nBits` sign bits of hyperplanes
    * `offset..offset+nBits-1` — the per-table bucket for the
    * OR-construction ([[lshPairsMulti]]); [[lshBucket]] is the
    * offset-0 table. */
  def lshBucketAt(emb: Column, nBits: Int, offset: Int): Column =
    (0 until nBits).map(j =>
      when(hyperplaneDot(emb, offset + j) > 0, lit(1 << j))
        .otherwise(lit(0)))
      .reduce(_ + _)

  /** Multi-table (OR-construction) LSH ANN pairs — the RECALL knob the
    * single-table [[lshPairs]] lacks: candidates share a bucket in ANY
    * of `nTables` independent hash tables (table t uses hyperplanes
    * t·nBits..t·nBits+nBits−1), then exact cosine ≥ `minSim` verifies.
    * For sign-random-projection LSH, P[candidate] = 1 − (1 − p^nBits)^
    * nTables with p = 1 − θ/π; fewer bits per table widens buckets
    * (more candidate work), more tables multiplies probes (more
    * recall) — the measured tradeoff e52_ann_recall reports.
    *
    * Scale shape: one explode to (vec_id, table, bucket) — nTables rows
    * per vector — one equi-join on (table, bucket), a distinct on the
    * pair ids BEFORE the cosine (a pair colliding in several tables is
    * verified once), then one hash-join back to the vectors for the
    * verification. Same bounded-key topology as MinHash banding. */
  def lshPairsMulti(vectors: DataFrame, nBits: Int = 4,
                    nTables: Int = 8, minSim: Double = 0.3): DataFrame = {
    val tb = vectors.select(col("vec_id"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          lshBucketAt(col("embedding"), nBits, t * nBits).as("b"))): _*))
        .as("e"))
      .select(col("vec_id"), col("e.t").as("t"), col("e.b").as("b"))
    val cand = tb.as("x").join(tb.as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val v = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    cand
      .join(v.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na")), Seq("vec_a"))
      .join(v.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Rounding.duckRound(cosineWithNorms(col("ea"), col("eb"),
          col("na"), col("nb")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** LSH-bucketed ANN: same-bucket candidate pairs with cosine ≥
    * `minSim`. The bucket key prunes the all-pairs space exactly like
    * MinHash banding does for Jaccard. */
  def lshPairs(vectors: DataFrame, nBits: Int = 8,
               minSim: Double = 0.9): DataFrame = {
    val b = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      lshBucket(col("embedding"), nBits).as("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        Rounding.duckRound(cosineWithNorms(col("x.embedding"), col("y.embedding"),
          col("x.nrm"), col("y.nrm")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** INT8 scalar quantization (SQ8 — the FAISS IVF+SQ memory recipe:
    * 4× smaller vectors than float32, 8× than float64) with a
    * reconstruction-error profile. Per-dimension global [min, max] is
    * ONE partial-aggregated pass (output = dim rows, broadcast back);
    * each value quantizes to q ∈ [0, 255] via
    * `floor((v − mn)/scale · 255 + 0.5)` — floor(x + 0.5) rather than
    * a round() builtin, because the two engines' rounding MODES differ
    * but their IEEE multiply/divide/floor are bit-identical, making
    * `sum_q` an EXACT integer gate on the whole quantization. The
    * error profile per label: max |v − dequant(q)| (order-independent,
    * rounded) and mean squared error (accumulation-ordered, rounded).
    *
    * Scale shape: explode → dim-stats agg (tiny) → broadcast join →
    * label agg; the corpus never shuffles except the final label
    * aggregation of partials. */
  /** Product quantization (PQ — the other half of the FAISS IVF-PQ
    * billion-scale recipe next to [[scalarQuantizeError]]'s SQ8): the
    * embedding splits into `m` subspaces, each subspace trains its own
    * k-entry codebook with the SAME deterministic Lloyd iterations as
    * the IVF coarse quantizer ([[KMeans]] — lowest-vec_id init,
    * 6-decimal rounded distances/means, lowest-id tie-breaks), and
    * each vector encodes as `m` sub-codes — dim·4 bytes of float32
    * down to `m` bytes. Emitted per label: vector/value counts, the
    * exact integer code sum (the whole-pipeline gate: ANY divergence
    * in training, slicing, or assignment changes some code), and the
    * reconstruction-error profile (max |err| order-independent, MSE
    * rounded like e68's).
    *
    * Scale shape: per-sub codebooks are O(m·k·dim/m) = O(k·dim)
    * driver-side model state (the KMeans contract); training streams
    * the corpus `iters` times per subspace; encode is a NARROW
    * per-row argmin over codebook literals (no join, no shuffle);
    * the two output aggregations shuffle only label-cardinality
    * partials. */
  /** Per-subspace PQ codebooks: subspace `s` trains a `k`-entry
    * [[KMeans]] codebook on `embedding[s·L, s·L+L)` (so the full
    * KMeans contract applies, including the farthest-point re-seed of
    * emptied entries). Returns the codebooks plus the subspace length
    * L. Driver-side model state, O(k·dim) total — the KMeans
    * contract. A fused all-subspaces-in-one-aggregation variant was
    * measured SLOWER at bench scale (the 4×-wider interpreted
    * higher-order-function projection costs more than the extra
    * per-subspace jobs save), so the m independent loops stand.
    * Train-once reuse across query batches is [[IvfPqModel]]'s job,
    * not fusion's. */
  private def pqCodebooks(emb: DataFrame, m: Int, k: Int,
      iters: Int): (IndexedSeq[Seq[(Int, Seq[Double])]], Int) = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val L = dim / m
    ((0 until m).map { s =>
      KMeans.centroidArrays(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * L + 1, L).as("embedding")),
        k, iters)
    }, L)
  }

  /** The PQ expression-staging rule as a combinator (VERDICT r11 #6):
    * append the aliased expressions as ONE extra Project over `df`, so
    * each alias evaluates once per row and every downstream stage
    * references it as an ATTRIBUTE. Inlining an expensive expression
    * (double-cast vector, coarse argmin, residual subtraction) into
    * the m×k codebook distances instead duplicates it per entry — the
    * 32×-recompute trap e81's first cut measured (92 s → 12 s staged).
    * CollapseProject deliberately keeps multi-referenced non-cheap
    * aliases staged, so these Projects survive optimization
    * (StagedProjectSpec pins that). */
  private[graft] def staged(df: DataFrame)(
      exprs: (String, Column)*): DataFrame =
    df.select(col("*") +: exprs.map { case (n, e) => e.as(n) }: _*)

  /** Trained IVF-PQ model: coarse quantizer centroids + per-subspace
    * PQ codebooks, O(coarseK·dim + kCodes·dim) driver-side state that
    * enters plans as literals (the KMeans contract). Train ONCE, then
    * serve any number of [[ivfPqTopK]]/[[ivfPqRerankTopK]]/
    * [[pqAdcTopK]] query batches against it — the production split
    * (index build vs serving) the parameter-only entry points
    * collapse for the self-contained oracle gates. [[VectorIndex]]
    * persists the model (and its [[encode]]d corpus) to parquet for
    * the build-once/serve-many split across processes. */
  final case class IvfPqModel(centroids: Seq[(Int, Seq[Double])],
                              codebooks: IndexedSeq[Seq[(Int, Seq[Double])]],
                              subDim: Int) {

    /** Cell-assign + PQ-encode the corpus: (n_id, cell, code_0..m-1) —
      * the index's DATA half (m bytes + a cell id per vector), the
      * frame [[VectorIndex]] persists so serving never re-encodes.
      * One narrow codegen'd projection, [[staged]] per the rule. */
    def encode(corpus: DataFrame): DataFrame = {
      val e = transform(col("embedding"), _.cast("double"))
      val st = staged(
        corpus.select(col("vec_id").as("n_id"), e.as("ve")))(
        "cell" -> KMeans.nearestCells(col("ve"), centroids, 1)
          .getItem(0))
      st.select((col("n_id") +: col("cell") +:
        pqCodeCols(col("ve"), codebooks, subDim)): _*)
    }

    /** [[topK]] served from an already-[[encode]]d corpus — the hot
      * path once the index is built (or loaded via [[VectorIndex]]):
      * the probe set broadcasts onto the coded frame, which never
      * shuffles before the per-query top-k. */
    def topKFromCoded(queries: DataFrame, coded: DataFrame, k: Int = 3,
                      nprobe: Int = 2): DataFrame = {
      val e = transform(col("embedding"), _.cast("double"))
      val q = queries.select(col("vec_id").as("q_id"), e.as("qe"),
        explode(KMeans.nearestCells(e, centroids, nprobe)).as("cell"))
      coded.join(broadcast(q), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("adc", Rounding.duckRound(
          adcExpr(col("qe"), codebooks, subDim), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("n_id"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("adc"), col("rank"))
    }

    /** [[Similarity.ivfPqTopK]] against this trained model. */
    def topK(queries: DataFrame, corpus: DataFrame, k: Int = 3,
             nprobe: Int = 2): DataFrame =
      topKFromCoded(queries, encode(corpus), k, nprobe)

    /** [[rerankTopK]] served from an [[encode]]d corpus; `corpus`
      * supplies only the candidates' full vectors for the exact tail
      * (ONE bounded hash-join by vec_id). */
    def rerankFromCoded(queries: DataFrame, coded: DataFrame,
                        corpus: DataFrame, k: Int = 3,
                        rerankR: Int = 10, nprobe: Int = 2): DataFrame = {
      val cand = topKFromCoded(queries, coded, rerankR, nprobe)
        .select(col("q_id"), col("n_id"))
      val e = transform(col("embedding"), _.cast("double"))
      val q = queries.select(col("vec_id").as("q_id"), e.as("qe"))
      val c = corpus.select(col("vec_id").as("n_id"), e.as("ne"))
      cand
        .join(broadcast(q), Seq("q_id"))
        .join(c, Seq("n_id"))
        .withColumn("dist", Rounding.duckRound(
          graft.functions.DoubleL2(col("qe"), col("ne")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("dist"), col("n_id"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("dist"), col("rank"))
    }

    /** [[Similarity.ivfPqRerankTopK]] against this trained model. */
    def rerankTopK(queries: DataFrame, corpus: DataFrame, k: Int = 3,
                   rerankR: Int = 10, nprobe: Int = 2): DataFrame =
      rerankFromCoded(queries, encode(corpus), corpus, k, rerankR,
        nprobe)

    /** [[Similarity.pqAdcTopK]] against this trained model (the
      * coarse centroids go unused — ADC scans the whole coded
      * corpus). */
    def adcTopK(queries: DataFrame, corpus: DataFrame,
                k: Int = 3): DataFrame = {
      val L = subDim
      val e = transform(col("embedding"), _.cast("double"))
      val coded = corpus
        .select(col("vec_id").as("n_id"), e.as("ve"))
        .select((col("n_id") +: pqCodeCols(col("ve"), codebooks, L)): _*)
      val q = queries.select(col("vec_id").as("q_id"), e.as("qe"))
      val adc = adcExpr(col("qe"), codebooks, L)
      coded.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("adc", Rounding.duckRound(adc, 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("n_id"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("adc"), col("rank"))
    }
  }

  def trainIvfPq(emb: DataFrame, coarseK: Int = 8, m: Int = 4,
                 kCodes: Int = 8, iters: Int = 2): IvfPqModel = {
    val (cbs, l) = pqCodebooks(emb, m, kCodes, iters)
    IvfPqModel(KMeans.centroidArrays(emb, coarseK, iters), cbs, l)
  }

  /** The PQ-codebooks half of [[trainIvfPq]] alone (codebooks,
    * subDim) — public so an index builder sharing one training across
    * several serving paths (e74/e75 vs the composed e76 family) can
    * assemble models from shared parts instead of retraining. */
  def trainPqCodebooks(emb: DataFrame, m: Int = 4, kCodes: Int = 8,
      iters: Int = 2): (IndexedSeq[Seq[(Int, Seq[Double])]], Int) =
    pqCodebooks(emb, m, kCodes, iters)

  /** Map literal cid → centroid array, for residual subtraction. */
  private def centroidMap(
      centroids: Seq[(Int, Seq[Double])]): Column =
    typedlit(centroids.map { case (cid, c) => cid -> c }.toMap)

  /** RESIDUAL IVF-PQ — the true FAISS IVFPQ encoding ([[IvfPqModel]]
    * quantizes raw vectors; this quantizes each vector's RESIDUAL
    * against its assigned coarse centroid). Residuals are centered
    * near zero with far smaller spread than raw vectors, so the same
    * k-entry codebooks quantize them finer — the recall lift e79's
    * `ivfpq_resid` row measures against the raw-vector composition.
    *
    * Search must subtract per probed cell: a query probing cell c
    * compares `q − centroid(c)` against that cell's codes (candidate
    * codes encode `v − centroid(c)` for the same c, so the asymmetric
    * distance approximates ‖q − v‖² cell-consistently — the reason
    * residual PQ ties codes to their cell). Same scale shape as
    * [[IvfPqModel.topK]]: model state is literals, corpus cell-assign
    * + encode is one narrow projection, the probe set broadcasts. */
  final case class IvfPqResidualModel(
      centroids: Seq[(Int, Seq[Double])],
      codebooks: IndexedSeq[Seq[(Int, Seq[Double])]],
      subDim: Int) {

    /** Cell-assign + residual-PQ-encode the corpus: (n_id, cell,
      * code_0..m-1) — the persisted DATA half, codes tied to their
      * cell (residual PQ's defining coupling). [[staged]] per the
      * rule: vector, cell, and residual each evaluate ONCE per row —
      * inlining the residual into the m×k codebook distances would
      * recompute the coarse argmin AND the subtraction per entry (the
      * 15× regression the first cut measured at sf0.1). */
    def encode(corpus: DataFrame): DataFrame = {
      val cm = centroidMap(centroids)
      val e = transform(col("embedding"), _.cast("double"))
      val st = staged(staged(
        corpus.select(col("vec_id").as("n_id"), e.as("ve")))(
        "cell" -> KMeans.nearestCells(col("ve"), centroids, 1)
          .getItem(0)))(
        "re" -> zip_with(col("ve"), element_at(cm, col("cell")),
          (x, y) => x - y))
      st.select((col("n_id") +: col("cell") +:
        pqCodeCols(col("re"), codebooks, subDim)): _*)
    }

    /** [[topK]] served from an already-[[encode]]d corpus (or one
      * loaded via [[VectorIndex]]). The query subtracts each PROBED
      * cell's centroid, matching that cell's residual codes. */
    def topKFromCoded(queries: DataFrame, coded: DataFrame, k: Int = 3,
                      nprobe: Int = 2): DataFrame = {
      val cm = centroidMap(centroids)
      val e = transform(col("embedding"), _.cast("double"))
      val q = queries.select(col("vec_id").as("q_id"), e.as("qe"),
          explode(KMeans.nearestCells(e, centroids, nprobe)).as("cell"))
        .withColumn("qres", zip_with(col("qe"),
          element_at(cm, col("cell")), (x, y) => x - y))
      coded.join(broadcast(q), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("adc", Rounding.duckRound(
          adcExpr(col("qres"), codebooks, subDim), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("n_id"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("adc"), col("rank"))
    }

    def topK(queries: DataFrame, corpus: DataFrame, k: Int = 3,
             nprobe: Int = 2): DataFrame =
      topKFromCoded(queries, encode(corpus), k, nprobe)
  }

  /** Train [[IvfPqResidualModel]]: coarse quantizer first, then PQ
    * codebooks on the residual table (same [[KMeans]] Lloyd contract
    * — lowest-vec_id init over residuals, rounded distances/means). */
  def trainIvfPqResidual(emb: DataFrame, coarseK: Int = 8, m: Int = 4,
                         kCodes: Int = 8,
                         iters: Int = 2): IvfPqResidualModel =
    trainIvfPqResidualWith(emb,
      KMeans.centroidArrays(emb, coarseK, iters), m, kCodes, iters)

  /** [[trainIvfPqResidual]] against an ALREADY-TRAINED coarse
    * quantizer — the shared-build form (the raw and residual models
    * use the same coarse centroids, so an index builder trains them
    * once). */
  def trainIvfPqResidualWith(emb: DataFrame,
                             cents: Seq[(Int, Seq[Double])], m: Int = 4,
                             kCodes: Int = 8,
                             iters: Int = 2): IvfPqResidualModel = {
    val cm = centroidMap(cents)
    val e = transform(col("embedding"), _.cast("double"))
    // staged like the search side: vector then cell then residual,
    // each a once-per-row alias
    val residDf = emb
      .select(col("vec_id"), e.as("ve"))
      .select(col("vec_id"), col("ve"),
        KMeans.nearestCells(col("ve"), cents, 1).getItem(0).as("cell"))
      .select(col("vec_id"),
        zip_with(col("ve"), element_at(cm, col("cell")),
          (x, y) => x - y).as("embedding"))
    val (cbs, l) = pqCodebooks(residDf, m, kCodes, iters)
    IvfPqResidualModel(cents, cbs, l)
  }

  /** One `code_s` column per subspace: the id of the nearest codebook
    * entry for the row's subvector (rounded distance, lowest-id ties —
    * [[KMeans.nearestCells]]'s assignment). Narrow codegen'd argmin
    * over codebook literals. */
  private def pqCodeCols(e: Column,
      codebooks: IndexedSeq[Seq[(Int, Seq[Double])]],
      L: Int): Seq[Column] =
    codebooks.indices.map { s =>
      element_at(
        KMeans.nearestCells(slice(e, s * L + 1, L), codebooks(s), 1), 1)
        .as(s"code_$s")
    }

  def productQuantizeError(emb: DataFrame, m: Int = 4, k: Int = 8,
                           iters: Int = 2): DataFrame = {
    val (codebooks, l) = pqCodebooks(emb, m, k, iters)
    productQuantizeErrorWith(emb, codebooks, l)
  }

  /** [[productQuantizeError]] against ALREADY-TRAINED codebooks — the
    * shared-build form (one training serves the error profile, ADC,
    * and the composed searches). */
  def productQuantizeErrorWith(emb: DataFrame,
      codebooks: IndexedSeq[Seq[(Int, Seq[Double])]],
      l: Int): DataFrame = {
    val m = codebooks.size
    val L = l
    val e = transform(col("embedding"), _.cast("double"))
    val codeCols = pqCodeCols(e, codebooks, L)
    val coded = emb.select(
      (col("vec_id") +: col("label") +: e.as("e") +: codeCols): _*)
    // exact integer gate: sum of all codes per label
    val codeSum = coded.groupBy(col("label")).agg(
      count(lit(1)).as("n_vecs"),
      sum((0 until m).map(s => col(s"code_$s").cast("long"))
        .reduce(_ + _)).as("sum_code"))
    // reconstruction: dim i decodes from codebook[i/L][code_{i/L}][i%L]
    val cbLit = array((0 until m).map(s =>
      typedlit(codebooks(s).map { case (cid, c) => cid -> c }.toMap)): _*)
    val errs = coded
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")),
        array((0 until m).map(s => col(s"code_$s")): _*).as("codes"))
      .withColumn("sub", (col("pos") / L).cast("int"))
      .withColumn("deq", element_at(
        element_at(element_at(cbLit, col("sub") + 1),
          element_at(col("codes"), col("sub") + 1)),
        (col("pos") % L).cast("int") + 1))
      .withColumn("err", col("v") - col("deq"))
    val errProfile = errs.groupBy(col("label")).agg(
      count(lit(1)).as("n_vals"),
      Rounding.duckRound(max(abs(col("err"))), 6).as("max_abs_err"),
      Rounding.duckRound(avg(col("err") * col("err")), 9).as("mse"))
    codeSum.join(errProfile, Seq("label"))
      .select(col("label"), col("n_vecs"), col("n_vals"),
        col("sum_code"), col("max_abs_err"), col("mse"))
  }

  /** PQ asymmetric-distance (ADC) top-k search — how an IVF-PQ index
    * actually ANSWERS queries: the corpus exists only as its m-byte PQ
    * codes, queries stay full-precision, and the distance is computed
    * query-subvector-to-CODEBOOK-ENTRY (Σ_s ‖q_s − codebook_s[code_s]‖²
    * — the "asymmetric" in ADC: only the corpus side is quantized).
    * Completes the IVF-PQ triad: e54 probes coarse cells, e74 profiles
    * the storage error, this searches the compressed corpus.
    *
    * Scale shape: codebooks are literals; the per-(query, doc) distance
    * reads the doc's m CODES, not its dim floats — the memory-bandwidth
    * win that makes PQ the billion-scale recipe. The query set
    * broadcasts (queries are few by definition), so the corpus scan
    * stays shuffle-free until the per-query top-k. Tie order:
    * (rounded adc asc, n_id) — deterministic, oracle-mirrored. */
  /** The asymmetric distance Σ_s ‖q_s − codebook_s[code_s]‖² as a fixed
    * -order sum d0+d1+…+d(m−1), each term a left-fold over the subspace
    * dims — the oracle's `list_sum(list(d ORDER BY s))` twin. Reads the
    * row's `code_s` columns; `qe` is the query's double vector. */
  private def adcExpr(qe: Column,
      codebooks: IndexedSeq[Seq[(Int, Seq[Double])]], L: Int): Column =
    codebooks.indices.map { s =>
      val cb = typedlit(codebooks(s).map { case (cid, c) => cid -> c }
        .toMap)
      val entry = element_at(cb, col(s"code_$s"))
      // codegen'd L2 on (query subvector, codebook entry) — same fold
      // order as the portable aggregate/zip_with twin (DoubleL2Spec)
      graft.functions.DoubleL2(slice(qe, s * L + 1, L), entry)
    }.reduce(_ + _)

  def pqAdcTopK(queries: DataFrame, emb: DataFrame, k: Int = 3,
                m: Int = 4, kCodes: Int = 8,
                iters: Int = 2): DataFrame = {
    val (codebooks, l) = pqCodebooks(emb, m, kCodes, iters)
    IvfPqModel(Nil, codebooks, l).adcTopK(queries, emb, k)
  }

  /** IVF-PQ composed top-k — the production billion-scale ANN recipe
    * the triad builds toward (VERDICT r10 #1): e54's TRAINED coarse
    * quantizer prunes the corpus to each query's `nprobe` nearest
    * cells, and e75's asymmetric distance ranks ONLY those cells'
    * PQ codes. The scan therefore touches nprobe/coarseK of the corpus
    * AND reads m bytes per touched vector instead of dim floats — the
    * two multiplicative wins (cell pruning × code compression) that
    * make FAISS-style IVFPQ the standard at 10⁹ vectors.
    *
    * Scale shape: coarse centroids and PQ codebooks are O(k·dim)
    * driver model state entering the plan as literals (the KMeans
    * contract); corpus cell assignment + encoding is one narrow
    * codegen'd projection (no shuffle); the probe set (queries ×
    * nprobe) BROADCASTS onto the celled coded corpus, so the corpus
    * never shuffles before the per-query top-k. Tie order:
    * (rounded adc asc, n_id) — the e75 contract, oracle-mirrored.
    *
    * PQ codebooks here are trained on RAW vectors (the e74/e75
    * chain); [[trainIvfPqResidual]] is the residual-encoding
    * refinement, and `e79_ivfpq_recall` measures both. */
  def ivfPqTopK(queries: DataFrame, emb: DataFrame, k: Int = 3,
                coarseK: Int = 8, nprobe: Int = 2, m: Int = 4,
                kCodes: Int = 8, iters: Int = 2): DataFrame =
    trainIvfPq(emb, coarseK, m, kCodes, iters)
      .topK(queries, emb, k, nprobe)

  /** [[ivfPqTopK]] with an EXACT re-rank tail — the full FAISS serving
    * recipe: ADC over the probed cells' codes selects `rerankR`
    * candidates per query (the cheap, compressed-domain pass), then
    * ONLY those candidates' full vectors are fetched and re-scored
    * with exact squared-L2 (the expensive pass, bounded at queries ×
    * rerankR rows). Fixes ADC's quantization-induced rank inversions
    * inside the candidate set — e79 measures the recall this buys.
    *
    * Scale shape: everything up to the candidate list is
    * [[ivfPqTopK]]'s shuffle-free scan; the re-rank fetch is ONE
    * hash-join of a (queries × rerankR)-row frame against the corpus
    * by vec_id — at 10⁹ vectors that is the random-access pattern a
    * bucketed-by-vec_id store serves without a corpus shuffle. Tie
    * order: (rounded exact dist asc, n_id), oracle-mirrored. */
  def ivfPqRerankTopK(queries: DataFrame, emb: DataFrame, k: Int = 3,
                      rerankR: Int = 10, coarseK: Int = 8,
                      nprobe: Int = 2, m: Int = 4, kCodes: Int = 8,
                      iters: Int = 2): DataFrame =
    trainIvfPq(emb, coarseK, m, kCodes, iters)
      .rerankTopK(queries, emb, k, rerankR, nprobe)

  /** Brute-force top-k by EXACT squared-L2 distance — the ground truth
    * the PQ search paths approximate (ADC is an L2 estimator, so
    * gating its recall against the COSINE brute force would conflate
    * metric mismatch with quantization loss). Same rounding/tie
    * contract as [[pqAdcTopK]]: (rounded dist asc, n_id). */
  def bruteForceL2Knn(queries: DataFrame, corpus: DataFrame,
                      k: Int = 3): DataFrame = {
    val e = transform(col("embedding"), _.cast("double"))
    val q = queries.select(col("vec_id").as("q_id"), e.as("qe"))
    val c = corpus.select(col("vec_id").as("n_id"), e.as("ne"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("dist", Rounding.duckRound(
        graft.functions.DoubleL2(col("qe"), col("ne")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("dist"), col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("dist"), col("rank"))
  }

  def scalarQuantizeError(emb: DataFrame): DataFrame = {
    val vals = emb
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .toDF("vec_id", "label", "pos", "v")
      .select(col("label"), col("pos"), col("v").cast("double").as("v"))
    val stats = vals.groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val q = vals.join(broadcast(stats), Seq("pos"))
      .withColumn("scale", col("mx") - col("mn"))
      .withColumn("q", when(col("scale") > 0,
          floor((col("v") - col("mn")) / col("scale") * lit(255.0)
            + lit(0.5)))
        .otherwise(lit(0.0)))
      .withColumn("deq", when(col("scale") > 0,
          col("mn") + col("q") * col("scale") / lit(255.0))
        .otherwise(col("mn")))
      .withColumn("err", col("v") - col("deq"))
    q.groupBy(col("label")).agg(
      count(lit(1)).as("n_vals"),
      sum(col("q")).cast("long").as("sum_q"),
      Rounding.duckRound(max(abs(col("err"))), 6).as("max_abs_err"),
      Rounding.duckRound(avg(col("err") * col("err")), 9).as("mse"))
  }
}
