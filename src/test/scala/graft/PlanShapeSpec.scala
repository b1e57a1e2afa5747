package graft

import org.apache.spark.sql.execution.FormattedMode

/** Pins the physical-plan shapes the scale story depends on — the
  * properties BENCHNOTES/SCALE.md previously audited by hand with
  * graft.Explain. A refactor that silently un-pushes a filter, turns a
  * broadcast into a sort-merge join, or adds a second shuffle to the
  * flagship aggregate now fails here instead of surfacing as a 100x
  * regression on a cluster.
  *
  * Static plans only: queries whose broadcasts come from explicit
  * broadcast() hints or whose shapes Catalyst fixes before execution
  * (AQE runtime conversions are deliberately NOT asserted). */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
  }

  private def shuffleCount(p: String): Int =
    raw"\(\d+\) Exchange\b".r.findAllIn(p).length

  test("s2_scan_prune pushes its filters and prunes to 3 columns") {
    val p = plan("s2_scan_prune")
    assert(p.contains("PushedFilters: [Is") || p.matches(
      "(?s).*PushedFilters: \\[[^\\]].*"),
      "expected non-empty PushedFilters at the parquet scan")
    val read = raw"ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").length <= 3,
      s"scan should read <= 3 columns, got: $read")
  }

  test("flagship OHLC resample shuffles once (partials, not ticks)") {
    val p = plan("g1_g2_g3_ohlc_resample")
    assert(shuffleCount(p) == 1,
      s"expected exactly one shuffle, plan:\n$p")
  }

  test("o2 top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan("o2_top5_offenders").contains("TakeOrderedAndProject"))
  }

  test("e54 kmeans-IVF broadcasts the probe set; corpus never " +
    "sort-merge-joins") {
    val p = plan("e54_kmeans_ivf_knn")
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"),
      "probe join must stay broadcast")
  }

  test("e26 decontamination broadcasts the eval-hash side") {
    val p = plan("e26_decontaminate")
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"),
      "the corpus must stream through a broadcast semi-join")
  }

  test("e60 multi-query BM25 pushes the rank limit and broadcasts " +
    "every scoring side") {
    val p = plan("e60_bm25_topk")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k should plan a group-limit, not rank-all")
    assert(!p.contains("SortMergeJoin"),
      "query table / df / stats must broadcast onto the match frame")
  }

  test("e61 SemDeDup pairs join on the cell key, never all-pairs") {
    val p = plan("e61_semantic_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairs must come from the cell equi-join")
  }

  test("e66 pii scrub is one map-side pass: zero shuffles") {
    assert(shuffleCount(plan("e66_pii_scrub")) == 0,
      "regex count+mask must not exchange anything")
  }

  test("e67 boilerplate removal joins on the line key, never " +
    "all-pairs") {
    val p = plan("e67_boilerplate_lines")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the anti-join must stay a line-key equi-join")
  }

  test("e68 scalar quantization broadcasts the dim stats; the corpus " +
    "never sort-merge-joins") {
    val p = plan("e68_scalar_quantize")
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"),
      "per-dimension stats must broadcast onto the exploded corpus")
  }

  test("e71 BMP decode stays partition-local: zero shuffles") {
    val p = plan("e71_bmp_codec_rows")
    assert(shuffleCount(p) == 0,
      s"encode→decode→scanline features must not exchange, plan:\n$p")
  }

  test("e72 span profile never expands pairs: no joins beyond the df " +
    "attach, no cartesian") {
    val p = plan("e72_repeated_spans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the duplication profile must stay linear in the corpus")
  }

  test("e75 ADC search broadcasts the query set; the coded corpus " +
    "never shuffles before the per-query top-k") {
    val p = plan("e75_pq_adc_topk")
    assert(p.contains("BroadcastExchange"),
      "queries must broadcast onto the corpus scan")
    assert(!p.contains("SortMergeJoin"),
      "a sort-merge join would shuffle the corpus by a join key")
  }

  test("e76 composed IVF-PQ broadcasts the probe set; the celled " +
    "coded corpus never shuffles before the per-query top-k") {
    val p = plan("e76_ivfpq_topk")
    assert(p.contains("BroadcastExchange"),
      "the (queries x nprobe) probe set must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the cell join must stay broadcast — the corpus never shuffles")
    assert(!p.contains("CartesianProduct"),
      "probing must prune cells, never scan all pairs")
  }

  test("e77 cross-doc spans stay linear: df attach + per-doc window, " +
    "no pair expansion") {
    val p = plan("e77_cross_doc_spans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the span scan must never expand pairs")
    // one df shuffle, one join-back shuffle, one doc window shuffle —
    // linear in the corpus; a 4th exchange means a pair join crept in
    assert(shuffleCount(p) <= 4,
      s"expected <= 4 exchanges (df agg, join-back, doc window), " +
        s"plan:\n$p")
  }

  test("e81 residual IVF-PQ broadcasts the probe set; the celled " +
    "coded corpus never shuffles before the per-query top-k") {
    val p = plan("e81_ivfpq_residual_topk")
    assert(p.contains("BroadcastExchange"),
      "the (queries x nprobe) probe set must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the cell join must stay broadcast — the corpus never shuffles")
    assert(!p.contains("CartesianProduct"),
      "probing must prune cells, never scan all pairs")
  }

  test("e82 span scrub stays linear: no pair expansion, bounded " +
    "exchanges") {
    val p = plan("e82_cross_doc_scrub")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the scrub must never expand pairs")
    // df/min-doc agg, join-back, covered distinct, token anti-join,
    // doc reassembly, final doc join — linear in the corpus
    assert(shuffleCount(p) <= 7,
      s"expected <= 7 exchanges, plan:\n$p")
  }

  test("e87 bloom probe is a literal-array lookup: the training scan " +
    "joins nothing until the candidate verify") {
    val p = plan("e87_bloom_decontaminate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the 128-word filter must live INSIDE the probe expressions, not
    // arrive via a join: the only joins are the candidate verify and
    // the flag join-back
    assert(raw"\(\d+\) [A-Za-z]*Join".r.findAllIn(p).length <= 3,
      s"probe must not add joins, plan:\n$p")
  }

  test("e91 pagerank iterates over checkpointed one-node frames: " +
    "plan stays shallow after 5 rounds") {
    val p = plan("e91_pagerank")
    // the final round reads rank/topology as LogicalRDD leaves — if
    // lineage truncation regresses, 5 rounds of two joins each stack
    // into one giant tree and the scan reappears here
    assert(p.contains("Scan ExistingRDD"),
      s"expected checkpointed LogicalRDD leaves, plan:\n$p")
    // every input — the final round's frames AND the n-scalar — reads
    // checkpointed state; a parquet scan means something re-derived
    // the edge list from the raw tables
    assert(!p.contains("Scan parquet"),
      s"iteration must not re-derive from the raw tables, plan:\n$p")
  }

  test("e93 all-pairs candidates come from the prefix equi-join: " +
    "no cartesian anywhere") {
    val p = plan("e93_allpairs_tfidf_cosine")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "prefix filtering must keep the pair space an equi-join")
    spark.sharedState.cacheManager.clearCache()
  }

  test("e126 k-core's final round reads checkpointed frames, never " +
    "re-derives the edge list") {
    val p = plan("e126_kcore")
    assert(p.contains("Scan ExistingRDD"),
      s"expected checkpointed LogicalRDD leaves, plan:\n$p")
    // the peel loop must not stack 6 rounds of joins over the raw
    // parquet tables (the e91 lineage rule)
    assert(!p.contains("Scan parquet"),
      s"iteration must not re-derive from the raw tables, plan:\n$p")
  }

  test("e150 trailing features run in ONE per-key window pass: all " +
    "four aggregates share a frame, one shuffle") {
    val p = plan("e150_trailing_features")
    assert(raw"\(\d+\) Window\b".r.findAllIn(p).length == 1,
      s"the four RANGE aggregates must share one Window, plan:\n$p")
    assert(shuffleCount(p) == 1,
      s"expected exactly one exchange (the user_id partition), " +
        s"plan:\n$p")
  }

  test("e200 sliding CMS: pane-sharing fan-out is pure equi-join — " +
    "no nested-loop, no cartesian (e196's only cross joins are the " +
    "documented 64-row register grids)") {
    val p = plan("e200_sliding_cms_heavy")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pane->window fan-out must be an equi-join, plan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian expansion, plan:\n$p")
    // the HLL variant 0-fills via grp × range(64) cross joins — the
    // sanctioned bounded-grid shape; assert they are the ONLY ones
    val ph = plan("e196_sliding_hll")
    val bnlj = raw"BroadcastNestedLoopJoin".r
      .findAllIn(ph.split("\n").takeWhile(!_.startsWith("(1)"))
        .mkString("\n")).length
    assert(!ph.contains("CartesianProduct"),
      s"e196: no unbounded cartesian, plan:\n$ph")
    assert(bnlj <= 3,
      s"e196: only the register-grid cross joins allowed, plan:\n$ph")
  }

  test("e201 label propagation's final round reads checkpointed " +
    "frames: rounds never re-derive from raw events") {
    val p = plan("e201_label_propagation")
    // the co-purchase projection self-join appears ONCE (inside the
    // checkpointed topo frame); the 6 label rounds reuse scans of
    // the checkpoint RDDs instead of re-deriving the projection
    assert(raw"Scan ExistingRDD".r.findAllIn(p).length >= 2,
      s"expected checkpointed label/topo frames, plan:\n$p")
  }

  test("composed streaming pipeline plans exactly four chained " +
    "stateful operators, window-join keyed, no cartesian") {
    import org.apache.spark.sql.functions._
    // analyzed logical plan of the UNSTARTED streaming query: the
    // whole composition must be 2 aggregates + 1 full-outer join +
    // 1 transformWithState — nothing stateful hides elsewhere, and
    // the join is an equi-join on the window column (state evictable
    // by watermark), never a cartesian
    def emptyDir(n: String) = {
      val d = java.nio.file.Paths.get("target", "test-fixtures", n)
      java.nio.file.Files.createDirectories(d)
      d.toString
    }
    val t = spark.readStream
      .schema("datetime timestamp, tick_id long, mid double, spread double")
      .parquet(emptyDir("plan-pin-t"))
    val m = spark.readStream
      .schema("datetime timestamp, tick_id long, mid double, spread double")
      .parquet(emptyDir("plan-pin-m"))
    val q = graft.streaming.StreamingPipeline.run(t, m, "10 minutes",
      medianSpread = 0.0, spikeThreshold = 1.0,
      consensusThreshold = 1.0, cutoffMs = Long.MaxValue,
      flushFireMs = Long.MaxValue)
    val p = q.queryExecution.analyzed.toString()
    assert(raw"(?m)^\s*[~+:\- ]*Aggregate ".r.findAllIn(p).length == 2,
      s"expected exactly the two OHLC aggregates, plan:\n$p")
    assert(p.contains("Join FullOuter, (t_w"),
      s"expected the full-outer window equi-join, plan:\n$p")
    assert(p.contains("TransformWithState"),
      s"expected the transformWithState tail, plan:\n$p")
    assert(!p.contains("Join Cross") && !p.contains("Join Inner, None"),
      s"no condition-less join may appear, plan:\n$p")
  }

  test("mixed pipeline routes ONLY W1 through the day backend: the " +
    "global mode plans zero day-partitioned windows, the mixed mode " +
    "some, the all-day mode strictly more") {
    val key = "spark.sql.maxPlanStringLength"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "10000000") // pipeline plans exceed the 65k
    try {                           // default and would truncate counts
      def dayMarks(name: String): Int = {
        val n = "_dw_day".r.findAllIn(plan(name)).length
        spark.sharedState.cacheManager.clearCache()
        n
      }
      val global = dayMarks("pipeline_hybrid_full")
      val mixed = dayMarks("pipeline_hybrid_mixed_part")
      val allDay = dayMarks("pipeline_hybrid_day_part")
      assert(global == 0,
        s"global mode must not touch DayWindows ($global marks)")
      assert(mixed > 0,
        "mixed mode must route W1 through DayWindows")
      assert(mixed < allDay,
        s"mixed mode must route ONLY W1 day-side: $mixed marks vs " +
          s"all-day $allDay")
    } finally spark.conf.set(key, prev)
  }

  test("KN scoring joins on the n-gram key: no CartesianProduct, the " +
    "only nested-loop is the broadcast 1-row totals (incl. the " +
    "e238/e242 OOV-backoff left joins)") {
    Seq("e233_kn_bigram_logprob", "e236_kn_trigram_logprob",
      "e238_kn_oov_serve", "e242_kn_trigram_oov_serve").foreach {
      name =>
        val p = plan(name)
        assert(!p.contains("CartesianProduct"),
          s"$name must never plan a cartesian, plan:\n$p")
        // the distinct-type total enters via broadcast (1 row); every
        // count/model/backoff join is an equi-join on its n-gram or
        // word key
        assert(p.contains("BroadcastExchange"), name)
    }
  }

  test("e237 curation chain: stage boundaries read the cache pin, " +
    "every join is an equi-join (no cartesian beyond the broadcast " +
    "1-row KN total)") {
    val p = plan("e237_curation_chain")
    assert(!p.contains("CartesianProduct"),
      s"the chain must never plan a cartesian, plan:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the KN stage must read the pinned quality-surviving corpus, " +
        s"plan:\n$p")
    spark.sharedState.cacheManager.clearCache()
  }

  test("e124 skyline prunes through broadcasts: exactly two windows " +
    "(B-row suffix + survivor scan), bucket stats join broadcast") {
    val p = plan("e124_skyline")
    // naive = ONE global window over all points; the scale shape is
    // TWO — the B-row suffix-max and the survivors-only exact scan
    assert(raw"\(\d+\) Window\b".r.findAllIn(p).length == 2,
      s"expected the prune + survivor-scan window pair, plan:\n$p")
    // range + suffix tables reach the points via broadcast — the
    // point set itself never shuffles for a join
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"),
      s"bucket-stat joins must broadcast, plan:\n$p")
  }
}
