package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Rounding

/** Lloyd's k-means over an embedding column — the centroid-training step
  * behind IVF index building (Similarity.ivfKnn's coarse quantizer) and
  * cluster-based curation (topic pruning, diversity sampling) in a
  * training-data pipeline.
  *
  * Deterministic and oracle-twinned: init = the k lowest vec_ids; each
  * assignment minimizes squared-L2 distance ROUNDED to 6 decimals with
  * ties broken by lowest cluster id; each new centroid component is the
  * member mean rounded to 6 decimals — so every iteration starts from
  * doubles both engines agree on.
  *
  * Scale: k-means model state is O(k·dim) by definition, so centroids
  * live on the driver between iterations (the MLlib topology) and enter
  * the plan as literals — assignment is a NARROW per-row argmin, no
  * join, no shuffle of the N input vectors. The only exchange per
  * iteration is the mean aggregation: posexplode to (cluster, pos, v),
  * map-side partial sums, k·dim final groups. A 100 TB corpus streams
  * through each iteration once.
  *
  * Empty-cluster re-seeding (VERDICT r10 #6): a cluster that loses
  * every member between iterations is re-seeded DETERMINISTICALLY from
  * the point farthest from its assigned centroid (rounded distance
  * desc, lowest vec_id tie — the k-means++-style repair, so a
  * degenerate init can never silently train fewer than k cells).
  * Re-seeding costs one extra top-k job and runs ONLY when a cluster
  * empties — on healthy data the plan is untouched, which is why the
  * SQL twin (which implements no re-seeding) stays hash-identical on
  * the corpus gates. A cluster emptying in the FINAL iteration has no
  * next assignment to re-enter and is absent from the output, like any
  * empty group.
  */
object KMeans {

  /** Squared L2 distance between a double-array column and a literal
    * centroid — the codegen'd [[graft.functions.DoubleL2]], same
    * sequential fold/accumulation order as DuckDB's list_sum and the
    * portable `aggregate(zip_with(…))` twin it replaces (r19: this
    * expression runs once per centroid PER ROW in every assignment
    * pass, the vector stack's hottest loop; equality property-pinned
    * in DoubleL2Spec). */
  private def dist2(e: Column, centroid: Seq[Double]): Column =
    graft.functions.DoubleL2(e, typedlit(centroid))

  /** The built-ins-only fold [[dist2]] replaces (reference semantics
    * for the equivalence property; not on any query path). */
  private[graft] def dist2Portable(e: Column,
                                   centroid: Seq[Double]): Column =
    aggregate(
      zip_with(e, typedlit(centroid), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Argmin cluster id for one row: lexicographic struct min over
    * (rounded distance, cluster id) — codegen'd, broadcast-free. */
  private def assign(e: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      struct(Rounding.duckRound(dist2(e, c), 6).as("d"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** The `nprobe` nearest cluster ids for one row, nearest first (same
    * rounded-distance / lowest-id order as [[assign]]; element 1 IS the
    * assignment) — the multi-probe column for IVF search
    * ([[Similarity.kmeansIvfKnn]]). Pure per-row expression over
    * centroid literals: no join, no shuffle. */
  def nearestCells(e: Column, centroids: Seq[(Int, Seq[Double])],
                   nprobe: Int): Column =
    transform(
      slice(array_sort(array(centroids.map { case (cid, c) =>
        struct(Rounding.duckRound(dist2(e, c), 6).as("d"),
          lit(cid).as("cid"))
      }: _*)), 1, nprobe),
      s => s.getField("cid"))

  /** The trained quantizer as driver-side centroid arrays (cluster_id →
    * component vector), reshaped from [[centroidsFlat]] — O(k·dim)
    * model state, the same deliberate collect the trainer itself uses. */
  def centroidArrays(vectors: DataFrame, k: Int = 8,
                     iters: Int = 2): Seq[(Int, Seq[Double])] =
    centroidsFlat(vectors, k, iters)
      .select(col("cluster_id").cast("int"), col("pos"), col("c_val"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cid, rows) => cid -> rows.sortBy(_._2).map(_._3).toSeq }
      .toSeq.sortBy(_._1)

  /** Flattened centroid table after `iters` Lloyd iterations:
    * (cluster_id, pos, c_val, n_members) — one row per centroid
    * component, n_members = the final assignment's cluster size.
    * `vectors`: (vec_id, embedding array<numeric>). */
  def centroidsFlat(vectors: DataFrame, k: Int = 8,
                    iters: Int = 2): DataFrame = {
    require(iters >= 1, "at least one Lloyd iteration")
    val emb = vectors.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))

    // O(k·dim) model state: k rows — this is the one deliberate collect.
    var centroids: Seq[(Int, Seq[Double])] =
      emb.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int"), col("e"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toSeq.sortBy(_._1)
    require(centroids.nonEmpty,
      s"k-means needs at least one vector with vec_id < k=$k to seed")

    var flat: DataFrame = null
    for (iter <- 1 to iters) {
      val assigned = emb.select(
        assign(col("e"), centroids).as("cluster_id"), col("e"))
      flat = assigned
        .select(col("cluster_id"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos").cast("long").as("pos"))
        .agg(Rounding.duckRound(avg(col("v")), 6).as("c_val"),
          count(lit(1)).as("n_members"))
      if (iter < iters) {
        var next: Seq[(Int, Seq[Double])] = flat
          .select(col("cluster_id"), col("pos"), col("c_val"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
          .groupBy(_._1)
          .map { case (cid, rows) =>
            cid -> rows.sortBy(_._2).map(_._3).toSeq }
          .toSeq.sortBy(_._1)
        // re-seed emptied clusters from the farthest points (rounded
        // assigned-distance desc, vec_id asc — deterministic), pairing
        // missing ids in ascending order; one extra bounded top-k job,
        // only on the degenerate path
        val have = next.map(_._1).toSet
        val missing = centroids.map(_._1).filterNot(have).sorted
        if (missing.nonEmpty) {
          val assignedDist = array_min(array(centroids.map {
            case (_, c) => Rounding.duckRound(dist2(col("e"), c), 6)
          }: _*))
          val far = emb
            .select(col("vec_id"), col("e"), assignedDist.as("d"))
            .orderBy(col("d").desc, col("vec_id"))
            .limit(missing.size).collect()
          require(far.length == missing.size,
            s"cannot re-seed ${missing.size} emptied clusters from " +
              s"${far.length} vectors")
          next = (next ++ missing.zip(far).map { case (cid, r) =>
            cid -> r.getSeq[Double](1) }).sortBy(_._1)
        }
        centroids = next
      }
    }
    flat.select(col("cluster_id").cast("long").as("cluster_id"),
      col("pos"), col("c_val"), col("n_members"))
  }
}
