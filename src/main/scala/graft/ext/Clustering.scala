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
  * — web-scale corpora with adversarially long chains swap in
  * [[connectedComponentsStar]], the large-star/small-star contraction,
  * which keeps this exact shuffle shape but contracts path lengths
  * geometrically per round.
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
    * Every round ends in an eager tracked `localCheckpoint`
    * ([[CachePins.pinCheckpoint]] — freed by the harness release after
    * the caller's final action, ADVICE r11), not `cache()`:
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
    val e = CachePins.pinCheckpoint(
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // init = round 1 fused in: label(v) = min(v, direct neighbors) in the
    // same aggregate that discovers the vertex set
    var labels = CachePins.pinCheckpoint(und.groupBy(col("src"))
      .agg(min(col("dst")).as("_m"))
      .select(col("src").as("id"),
        least(col("src"), col("_m")).as("label")))
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
      val next = CachePins.pinCheckpoint(jump1
        .join(labels.select(col("id").as("_m2"), col("label").as("_p2")),
          Seq("_m2"), "left")
        .select(col("id"), col("_prev"),
          least(col("_m2"), coalesce(col("_p2"), col("_m2")))
            .as("label"))) // eager: materializes + truncates lineage
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

  /** Set equality of two DISTINCT canonical edge frames in ONE Spark
    * action: equal sets ⟺ every (u, v) appears exactly twice in the
    * bag union. Both inputs are expected checkpointed/cached (the
    * union rescans stored partitions); the equivalent
    * count+count+except chain costs three driver round-trips per
    * convergence check — measured as one job per round in
    * ClusteringPackingSpec. */
  private[graft] def sameEdgeSet(a: DataFrame, b: DataFrame): Boolean =
    a.union(b).groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") =!= 2).isEmpty

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14) — the adversarial-diameter fallback to
    * [[connectedComponents]]: min-label propagation needs O(diameter)
    * rounds (pointer jumping reduces that to O(log diameter)), while the
    * alternating algorithm converges in O(log² n) rounds REGARDLESS of
    * diameter, because each round rewires edges toward component minima
    * rather than just relaying labels. Same contract as
    * [[connectedComponents]]: returns (id, label) with `label` = min doc
    * id in the component; isolated vertices are not emitted.
    *
    *  - large-star(v): connect every neighbor u > v to
    *    m = min(Γ(v) ∪ v);
    *  - small-star(v): connect every neighbor u < v, and v itself, to
    *    m = min(Γ≤(v) ∪ v).
    *
    * Both are one shuffle each (a per-vertex window min over the edge
    * list — the same keyed-exchange shape as the min-label join), both
    * preserve connectivity, and their fixpoints are exactly the star
    * graphs rooted at component minima. Convergence is checked with ONE
    * action per round — a bag-union multiplicity count over the two
    * checkpointed canonical edge sets (equal sets ⟺ every edge appears
    * exactly twice); each round ends in an eager `localCheckpoint()`
    * for the same lineage-truncation reason as
    * [[connectedComponents]].
    */
  def connectedComponentsStar(edges: DataFrame,
                              maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // canonical undirected edge set: (u, v) with u < v, no self loops
    var e = CachePins.pinCheckpoint(edges
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") < col("v"))
      .distinct())
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR on the undirected view: per center c, every strictly
      // larger neighbor is rewired to m = min(neighbors ∪ c). Emitted
      // rows are (m, bigger) with m <= c < bigger — already canonical.
      // No dedup here: duplicate edges cannot change small-star's min,
      // and the round's single distinct (below) bounds growth — a
      // distinct here would be one extra full shuffle per round.
      val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mLs = least(min(col("v")).over(Window.partitionBy("u")),
        col("u"))
      val ls = und.withColumn("m", mLs)
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v").as("v"))
      // SMALL-STAR on the canonical (u < v) view: per center v, every
      // smaller neighbor u — and v itself — is rewired to
      // m = min(smaller neighbors), which is <= every u. Both emitted
      // rows come out of ONE explode over the windowed frame — a
      // two-branch union would recompute the entire large-star pipeline
      // once per branch (the multi-branch rebuild this repo's cache
      // notes measure at ~2x).
      val mSs = min(col("u")).over(Window.partitionBy("v"))
      val ss = CachePins.pinCheckpoint(ls.withColumn("m", mSs)
        .select(explode(array(
          struct(col("m").as("a"), col("u").as("b")),
          struct(col("m").as("a"), col("v").as("b")))).as("_e"))
        .select(col("_e.a").as("u"), col("_e.b").as("v"))
        .filter(col("u") < col("v"))
        .distinct())
      // fixpoint: star graphs are invariant under both phases — one
      // action per round (see sameEdgeSet)
      converged = sameEdgeSet(ss, e)
      e = ss
      iter += 1
    }
    // converged edges are (root, child) stars: children label = root,
    // roots label themselves
    e.select(col("v").as("id"), col("u").as("label"))
      .union(e.select(col("u").as("id"), col("u").as("label")))
      .distinct()
  }

  /** Golden-record survivorship over duplicate clusters: one merged
    * record per cluster (singletons included via the left-join
    * backfill, their own cluster), with per-FIELD survivor rules —
    * keep_id = the stable minimum id, representative text = the
    * longest member (tie: min id), language = the cluster majority
    * (tie: alphabetical) — the MDM merge step that turns "these rows
    * are the same thing" (the CC closure) into "this is the thing".
    * Every rule is a rank-1 window or an aggregate over the CLUSTER
    * (bounded by cluster size, keyed by cluster id — clusters are
    * the parallel unit); deterministic tie-breaks make survivors
    * cross-engine exact. */
  def survivorship(docs: DataFrame, comp: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assign = docs.select(col("doc_id"), col("n_chars"),
        col("lang"))
      .join(comp, docs("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"),
        col("n_chars"), col("lang"))
    val rep = assign.withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc_id"),
        col("n_chars").as("rep_n_chars"))
    val lv = assign.groupBy(col("cluster_id"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val lr = lv.withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("lang").as("majority_lang"))
    assign.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("keep_id"))
      .join(rep, Seq("cluster_id"))
      .join(lr, Seq("cluster_id"))
      .select(col("cluster_id"), col("n_members"), col("keep_id"),
        col("rep_doc_id"), col("rep_n_chars"), col("majority_lang"))
  }
}
