package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turns near-dup PAIRS (the output of
  * [[Dedup]]'s Jaccard/MinHash/SimHash operators) into connected
  * components, so a training pipeline can pick one canonical document per
  * cluster — the step after candidate pairs in every production dedup.
  *
  * Algorithm: iterative min-label propagation (Pregel-style connected
  * components). Every vertex starts labeled with its own id; each round,
  * a vertex takes the minimum label among itself and its neighbors; the
  * fixpoint label is the component's minimum id — a deterministic,
  * content-independent cluster id. Each round is one shuffle join
  * (edges ⋈ labels on the shuffle key) plus a hash aggregate, so rounds
  * scale exactly like any keyed join; the round count is the graph
  * diameter, and near-dup graphs are short chains/cliques (diameter ≪ 10)
  * — web-scale corpora with adversarially long chains would swap in the
  * large-star/small-star contraction, which keeps this exact join shape
  * but halves path lengths per round.
  *
  * Labels monotonically decrease, so convergence ("no label changed") is
  * a simple count on the cached round result.
  */
object Clustering {

  /** Connected components over an undirected edge list (`doc_a`,
    * `doc_b`): returns (id, label) with `label` = min doc id reachable.
    * Isolated documents (no pair) are not emitted — a no-edge doc is its
    * own singleton cluster by definition.
    *
    * Every round ends in an eager `localCheckpoint()`, not `cache()`:
    * round N's plan references round N−1's frame, so without lineage
    * TRUNCATION the logical tree doubles per round (round N embeds two
    * copies of round N−1's tree) and analysis alone OOMs after ~20
    * rounds — the classic iterative-dataflow trap. Checkpointing
    * materializes the round and restarts the plan from the stored
    * partitions; on a cluster with an unreliable-executor concern,
    * swap in reliable `checkpoint()` against the checkpoint dir. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // checkpoint BEFORE mirroring: the union consumes the edge frame
    // through two branches, so an unmaterialized (possibly expensive)
    // pair-generation plan would run once per branch; the checkpoint also
    // cuts that plan out of every round's tree. The mirrored list is NOT
    // deduplicated — duplicate edges cannot change a min aggregate, so
    // the distinct would be a pure extra shuffle.
    val e = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint()
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // init = round 1 fused in: label(v) = min(v, direct neighbors) in the
    // same aggregate that discovers the vertex set
    var labels = und.groupBy(col("src"))
      .agg(min(col("dst")).as("_m"))
      .select(col("src").as("id"),
        least(col("src"), col("_m")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // hop 1: min over self + direct neighbors' labels
      val nbrMin = und
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("label")).as("nbr_min"))
      val hop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("_prev"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("_m"))
      // hops 2+3 — POINTER JUMPING, twice: a label is itself a vertex id
      // in the same component, so resolving it through the label table
      // (label ← min(m, label(m))) halves every vertex's distance to the
      // component minimum; doing it twice per round quarters it —
      // O(log4 diameter) rounds. Each jump is one cheap keyed join,
      // while a ROUND carries fixed driver cost (plan + schedule +
      // checkpoint + convergence count), so trading a join for a round
      // wins: the sf0.1 SimHash graph (propagation diameter 13) takes 5
      // rounds with one jump, 3 with two.
      val jump1 = hop
        .join(labels.select(col("id").as("_m"), col("label").as("_p1")),
          Seq("_m"), "left")
        .select(col("id"), col("_prev"),
          least(col("_m"), coalesce(col("_p1"), col("_m"))).as("_m2"))
      val next = jump1
        .join(labels.select(col("id").as("_m2"), col("label").as("_p2")),
          Seq("_m2"), "left")
        .select(col("id"), col("_prev"),
          least(col("_m2"), coalesce(col("_p2"), col("_m2"))).as("label"))
        .localCheckpoint() // eager: materializes + truncates lineage
      // isEmpty, not count: a non-converged round (the common case)
      // short-circuits on the first changed row instead of scanning the
      // whole checkpointed frame
      changed =
        if (next.filter(col("label") < col("_prev")).isEmpty) 0L else 1L
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    labels
  }
}
