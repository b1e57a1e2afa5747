package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic probabilistic sketches with EXACT final answers.
  *
  * Both operators here follow the same two-phase scale pattern:
  * a sketch pass produces a bounded summary (bits / counters — O(m),
  * independent of data size) that broadcasts as a literal into a
  * codegen'd probe, and the probe's candidate set — a guaranteed
  * SUPERSET of the truth (Bloom has no false negatives, count-min never
  * undercounts) — is then verified EXACTLY with a join that only the
  * candidates pay for. The end-to-end result is exact, so the full
  * pipeline oracle-checks; the sketch's value is the pruning ratio, not
  * an approximation contract.
  *
  * Everything is hash-derived (md5, the [[Dedup.md5Long]] parity trick)
  * — no RNG, no JVM-specific hashing — so the sketch CONTENTS are
  * bit-identical cross-engine and the DuckDB twins rebuild the same
  * bits/counters from SQL.
  *
  * At 100 TB: the sketch build is one partial-aggregated groupBy whose
  * key space is the sketch's own size (each map task emits at most m
  * cells — the groupBy IS the treeAggregate), the collected model is
  * O(m) driver state like the KMeans centroids, and the probe adds zero
  * shuffle. The exact-verify join is sized by the candidate set: for
  * Bloom that is |true matches| + FPR·|scanned|; for count-min it is
  * the heavy-hitter count — both orders of magnitude under the corpus.
  */
object Sketches {

  /** Bloom geometry: m = 4096 bits as 128 32-bit words (stored in
    * longs so the bit arithmetic never touches the sign), k = 3
    * probes. Small by design — the gate's corpus is small and the FPR
    * is SUPPOSED to be visible (bf_hit && !contaminated rows prove the
    * sketch prunes rather than answers). */
  val BloomBits = 4096
  val BloomWordBits = 32
  val BloomWords: Int = BloomBits / BloomWordBits
  val BloomK = 3

  /** Double-hashing probe positions pos_i = (h1 + i·h2) mod m from the
    * 60-bit md5 halves of the key; both operands < 2^60 so h1 + 2·h2
    * stays far from Long overflow (DuckDB BIGINT arithmetic is checked,
    * so wraparound would not even be portable). */
  private def bloomPositions(key: Column): Seq[Column] = {
    val h1 = Dedup.md5Long(key)
    val h2 = Dedup.md5Long(concat(lit("bf|"), key))
    (0 until BloomK).map(i => pmod(h1 + lit(i.toLong) * h2,
      lit(BloomBits.toLong)))
  }

  /** Build the filter over `keys` (a single string column): explode to
    * probe positions, OR the bits per word, collect the ≤ [[BloomWords]]
    * (word, bits) cells. The groupBy key space IS the sketch size, so
    * map-side combine bounds every task's output at 128 rows regardless
    * of input volume. Returns the dense word array (missing words 0). */
  def bloomBuild(keys: DataFrame, key: Column): Array[Long] = {
    val pos = keys.select(bloomPositions(key).zipWithIndex.map {
      case (p, i) => p.as(s"p$i")
    }: _*)
    val cells = pos
      .select(explode(array((0 until BloomK).map(i => col(s"p$i")): _*))
        .as("pos"))
      .select(expr(s"pos DIV $BloomWordBits").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(BloomWordBits.toLong)).cast("int"))
          .as("v"))
      .groupBy(col("w")).agg(call_function("bit_or", col("v")).as("bits"))
      .collect()
    val words = new Array[Long](BloomWords)
    cells.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Probe column: true iff all k probe bits for `key` are set in
    * `words` (passed as a broadcast literal array — element_at + shift
    * + mask, fully codegen'd, no shuffle). No false negatives, so
    * `bloomMightContain === false` is a PROOF of absence. */
  def bloomMightContain(words: Seq[Long], key: Column): Column = {
    val arr = typedlit(words)
    bloomPositions(key).map { p =>
      // the 1-indexed word holding bit p, then (word >> bit) & 1
      // (call_function because the Scala shiftright only takes a
      // literal shift amount — the SQL expression is column×column)
      val word = element_at(arr,
        ((p - pmod(p, lit(BloomWordBits.toLong))) /
          BloomWordBits).cast("int") + 1)
      call_function("shiftright", word,
        pmod(p, lit(BloomWordBits.toLong)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Count-min geometry: d = 4 rows × w = 256 counters. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Row-j bucket of a key: md5Long("cms<j>|<key>") mod w. */
  def cmsBucket(key: Column, j: Column): Column =
    pmod(Dedup.md5Long(concat(lit("cms"), j.cast("string"), lit("|"),
      key)), lit(CmsWidth.toLong))

  /** The d×w counter cells over `rows` as a FRAME (j, h, c) — the
    * mergeable form: counts are additive, so per-shard / per-batch
    * cell frames sum into the global sketch exactly (the property the
    * streaming maintainer relies on). The groupBy key space is the
    * sketch size (≤ d·w cells per map task after combine). */
  def cmsCells(rows: DataFrame, key: Column): DataFrame =
    rows
      .select(posexplode(array((0 until CmsDepth).map(j =>
        cmsBucket(key, lit(j))): _*)).as(Seq("j", "h")))
      .groupBy(col("j"), col("h")).agg(count(lit(1)).as("c"))

  /** PER-GROUP cell frames — the tumbling-pane form of [[cmsCells]]
    * (per-day frequency sketches, groups × d·w rows of state). */
  def cmsCellsBy(rows: DataFrame, grp: Column, key: Column): DataFrame =
    rows
      .select(grp.as("grp"),
        posexplode(array((0 until CmsDepth).map(j =>
          cmsBucket(key, lit(j))): _*)).as(Seq("j", "h")))
      .groupBy(col("grp"), col("j"), col("h"))
      .agg(count(lit(1)).as("c"))

  /** SLIDING-window cell frames: the CMS twin of
    * [[hllSlidingRegisters]] — counts are ADDITIVE, so overlapping
    * windows SUM the covered panes' cells (where HLL max-merges
    * registers). Same pane-sharing topology: each pane row fans out
    * `spanPanes` ways, sketch-sized, events scanned once. */
  def cmsSlidingCells(panes: DataFrame, spanPanes: Int): DataFrame = {
    val wins = panes.select(col("grp").as("w")).distinct()
    panes
      .withColumn("w", explode(sequence(col("grp"),
        col("grp") + lit(spanPanes - 1))))
      .join(wins, Seq("w"), "left_semi")
      .groupBy(col("w").as("grp"), col("j"), col("h"))
      .agg(sum(col("c")).as("c"))
  }

  /** SLIDING-window histogram cells — the DISTRIBUTION member of the
    * sliding-sketch trilogy (cardinality = [[hllSlidingRegisters]]
    * max-merge, frequency = [[cmsSlidingCells]] sum-merge): bin
    * counts are additive, so overlapping windows SUM the covered
    * panes' cells. Same pane-sharing fan-out, sketch-sized. */
  def histSlidingCells(panes: DataFrame, spanPanes: Int): DataFrame = {
    val wins = panes.select(col("grp").as("w")).distinct()
    panes
      .withColumn("w", explode(sequence(col("grp"),
        col("grp") + lit(spanPanes - 1))))
      .join(wins, Seq("w"), "left_semi")
      .groupBy(col("w").as("grp"), col("bin"))
      .agg(sum(col("c")).as("c"))
  }

  /** Collect a (j, h, c) cell frame into the dense flat counter array
    * (index j·w + bucket; missing cells 0) — O(d·w) driver model
    * state. */
  def cmsFromCells(cells: DataFrame): Array[Long] = {
    val arr = new Array[Long](CmsDepth * CmsWidth)
    cells.select(col("j").cast("int"), col("h").cast("long"),
        col("c").cast("long")).collect()
      .foreach(r => arr(r.getInt(0) * CmsWidth + r.getLong(1).toInt) =
        r.getLong(2))
    arr
  }

  /** Build the d×w counter table over `rows`: [[cmsCells]] collected
    * via [[cmsFromCells]]. */
  def cmsBuild(rows: DataFrame, key: Column): Array[Long] =
    cmsFromCells(cmsCells(rows, key))

  /** Point estimate for `key` against the collected counters: the MIN
    * over the d row counters — never an undercount, so
    * `cmsEstimate >= t` selects a SUPERSET of the true heavy hitters.
    * Literal-array lookups, fully codegen'd. */
  def cmsEstimate(counters: Seq[Long], key: Column): Column = {
    val arr = typedlit(counters)
    (0 until CmsDepth).map(j =>
      element_at(arr, (lit(j * CmsWidth) + cmsBucket(key, lit(j)))
        .cast("int") + 1))
      .reduce(least(_, _))
  }

  /** Histogram-quantile geometry: 32 fixed bins of width 16 over
    * [0, 512) (the events.value domain), top bin clamped open-ended.
    * Fixed a-priori bounds are what make the sketch MERGEABLE — the
    * third member of the sketch family (membership = Bloom,
    * frequency = count-min, DISTRIBUTION = this): per-shard /
    * per-batch bin-count frames sum into the global histogram
    * exactly, and quantiles come out of the 32-row summary instead
    * of a corpus sort. */
  val HistBins = 32
  val HistWidth = 16.0

  /** The bin of a value — identical floor arithmetic cross-engine
    * (same doubles in, same IEEE divide, same floor). */
  def histBin(value: Column): Column =
    least(lit(HistBins - 1L), floor(value / HistWidth).cast("long"))

  /** The bin-count cells over `rows` as a mergeable FRAME (bin, c):
    * one partial-aggregated groupBy whose key space is the sketch
    * size — each map task emits ≤ 32 rows regardless of input
    * volume (the cmsCells contract for distributions). */
  def histCells(rows: DataFrame, value: Column): DataFrame =
    rows.select(histBin(value).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))

  /** Join-cardinality estimate from two CMS cell frames — the
    * AMS/CMS inner-product application (what a distributed planner
    * uses to SIZE a join before paying for it):
    * |A ⋈ₖ B| = Σₖ cntA(k)·cntB(k) ≤ min_j Σ_h cA[j,h]·cB[j,h],
    * never an undercount (hash collisions only ADD cross terms), so
    * the estimate is a safe upper bound for reservation decisions.
    * Both sketches share [[cmsBucket]]'s hashes by construction —
    * the inner product is only meaningful on aligned cells.
    *
    * Scale shape: the two corpus scans are the cmsCells builds; this
    * function touches only sketch-sized frames (≤ d·w rows joined on
    * (j,h), one d-row aggregate, one 1-row min). */
  def cmsJoinCardinality(cellsA: DataFrame,
                         cellsB: DataFrame): DataFrame =
    cellsA.withColumnRenamed("c", "ca")
      .join(cellsB.withColumnRenamed("c", "cb"), Seq("j", "h"))
      .groupBy(col("j")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join"))

  /** PER-GROUP histogram cells: (grp, bin, c) — the partitioned form
    * of [[histCells]] (per-tenant / per-type distribution summaries);
    * still one partial-aggregated scan with ≤ |groups|·32 cells. */
  def histCellsBy(rows: DataFrame, grp: Column,
                  value: Column): DataFrame =
    rows.select(grp.as("grp"), histBin(value).as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("c"))

  /** Group-wise quantile scorecard: [[histQuantileScorecard]]'s
    * cumulative-walk interpolation per group, next to each group's
    * EXACT interpolated quantiles. The window partitions by group
    * over sketch-sized frames (≤ 32 rows per group). */
  def histQuantileScorecardBy(cells: DataFrame, rows: DataFrame,
      grp: Column, valueCol: String, probs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.select(col("grp"), col("bin"), col("c"),
      coalesce(sum(col("c")).over(w), lit(0L)).as("cum_before"))
    val n = cells.groupBy(col("grp"))
      .agg(sum(col("c")).cast("double").as("n_rows"))
    val pframe = n.select(col("grp"), col("n_rows"),
        posexplode(typedlit(probs)).as(Seq("i", "prob")))
      .withColumn("target", col("prob") * col("n_rows"))
    val exact = rows.select(grp.as("grp"), col(valueCol).as("v"))
      .groupBy(col("grp"))
      .agg(expr(s"percentile(v, array(${probs.mkString(", ")}))")
        .as("qs"))
      .select(col("grp"), posexplode(col("qs")).as(Seq("i", "exact_raw")))
    val est = lit(HistWidth) * col("bin").cast("double") +
      lit(HistWidth) * (col("target") - col("cum_before").cast("double")) /
        col("c").cast("double")
    pframe
      .join(cum,
        pframe("grp") === cum("grp") &&
          col("cum_before").cast("double") < col("target") &&
          col("target") <= (col("cum_before") + col("c")).cast("double"))
      .drop(cum("grp"))
      .join(exact, Seq("grp", "i"))
      .select(col("grp"), col("prob"),
        graft.Rounding.duckRound(est, 6).as("est_q"),
        graft.Rounding.duckRound(col("exact_raw"), 6).as("exact_q"),
        (graft.Rounding.duckRound(abs(est - col("exact_raw")), 6) <=
          lit(HistWidth)).as("within_bin"))
  }

  /** HyperLogLog geometry: m = 64 registers (6 index bits off the
    * 60-bit md5 hash, 54 rank bits). The CARDINALITY member of the
    * sketch family — unlike e13's built-in approx_count_distinct
    * (ε-gated because its internal hashing is JVM-specific), this one
    * is md5-derived end to end, so the DuckDB twin rebuilds the SAME
    * 64 registers and the gate is register-level EXACT. */
  val HllRegisters = 64

  /** rho(w) = leading-zero count of the 54-bit rank word + 1 — an
    * integer CASE chain over powers of two (never a float log2, which
    * could flip at exact powers cross-engine). */
  def hllRho(w: Column): Column =
    (53 to 0 by -1).foldLeft(when(w === lit(0L), lit(55)))(
      (acc, k) => acc.when(w >= lit(1L << k), lit(54 - k)))

  /** The 64-register frame over `keys`: (j, m_rho), absent registers
    * filled with 0 — mergeable by max, one sketch-sized exchange
    * (each map task emits ≤ 64 rows after combine, the cmsCells
    * contract for cardinality). */
  def hllRegisters(keys: DataFrame, key: Column): DataFrame = {
    val h = Dedup.md5Long(key)
    val grouped = keys
      .select(h.bitwiseAND(lit(63L)).as("j"),
        hllRho(call_function("shiftright", h, lit(6))).as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("m_rho"))
    keys.sparkSession.range(HllRegisters.toLong)
      .select(col("id").as("j"))
      .join(grouped, Seq("j"), "left")
      .select(col("j"), coalesce(col("m_rho"), lit(0)).as("m_rho"))
  }

  /** PER-GROUP register frames — the windowed/partitioned form of
    * [[hllRegisters]] (distinct-per-day, distinct-per-shard): one
    * grouped max on (grp, j) — still sketch-sized per group — then
    * the full 64-register grid per group via a bounded
    * groups × 64 expansion (the Pipeline grid-×-bounded-set shape,
    * never data-sized). */
  def hllRegistersBy(keys: DataFrame, grp: Column,
                     key: Column): DataFrame = {
    val h = Dedup.md5Long(key)
    val grouped = keys
      .select(grp.as("grp"), h.bitwiseAND(lit(63L)).as("j"),
        hllRho(call_function("shiftright", h, lit(6))).as("rho"))
      .groupBy(col("grp"), col("j")).agg(max(col("rho")).as("m_rho"))
    keys.select(grp.as("grp")).distinct()
      .crossJoin(keys.sparkSession.range(HllRegisters.toLong)
        .select(col("id").as("j")))
      .join(grouped, Seq("grp", "j"), "left")
      .select(col("grp"), col("j"),
        coalesce(col("m_rho"), lit(0)).as("m_rho"))
  }

  /** SLIDING-window register frames (VERDICT r13 #4): overlapping
    * windows composed from the per-pane frames of [[hllRegistersBy]]
    * by REGISTER MAX — the standard pane-sharing trick: each
    * tumbling pane is built ONCE from the data, then every sliding
    * window of `spanPanes` consecutive panes merges by max, so the
    * overlap never re-scans events. A pane row fans out `spanPanes`
    * ways (explode over the windows it feeds) — sketch-sized
    * (groups × 64 × span rows), never data-sized — and windows are
    * labeled by their LAST pane, kept only where that pane exists.
    * HLL registers are max-mergeable, so the merged frame is exactly
    * the sketch of the union of the covered panes' key sets. */
  def hllSlidingRegisters(panes: DataFrame,
                          spanPanes: Int): DataFrame = {
    val wins = panes.select(col("grp").as("w")).distinct()
    panes
      .withColumn("w", explode(sequence(col("grp"),
        col("grp") + lit(spanPanes - 1))))
      .join(wins, Seq("w"), "left_semi")
      .groupBy(col("w").as("grp"), col("j"))
      .agg(max(col("m_rho")).as("m_rho"))
      .select(col("grp"), col("j"), col("m_rho"))
  }

  /** Per-group estimate scorecard: [[hllScorecard]]'s arithmetic
    * applied group-wise, joined to the exact per-group distinct
    * counts (`exact`: (grp, n_exact)). */
  def hllScorecardBy(regs: DataFrame, exact: DataFrame): DataFrame = {
    val a = regs.groupBy(col("grp")).agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(55) - col("m_rho")).cast("int"))).as("sum_int"),
      sum(when(col("m_rho") === 0, lit(1L)).otherwise(lit(0L)))
        .as("v_zeros"))
    val raw = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
      col("sum_int").cast("double")
    val est = when(raw <= lit(160.0) && col("v_zeros") > 0L,
        lit(64.0) * log(lit(64.0) / col("v_zeros").cast("double")))
      .otherwise(raw)
    a.join(exact, Seq("grp"))
      .select(col("grp"), col("n_exact"), col("v_zeros"),
        col("sum_int"),
        graft.Rounding.duckRound(est, 6).as("hll_est"),
        graft.Rounding.duckRound(
          abs(est - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
  }

  /** Estimate scorecard from a register frame next to the EXACT
    * distinct count (the measured-error pattern): the harmonic sum is
    * kept as an exact INTEGER in units of 2^-55 (Σ 2^(55−Mj) ≤ 2^61 —
    * under both engines' overflow lines), so the only floats are the
    * final α·m²·2⁵⁵/sum division and the small-range ln correction —
    * identical expression trees, rounded once. */
  def hllScorecard(regs: DataFrame, exact: DataFrame,
                   label: String): DataFrame = {
    val a = regs.agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(55) - col("m_rho")).cast("int"))).as("sum_int"),
      sum(when(col("m_rho") === 0, lit(1L)).otherwise(lit(0L)))
        .as("v_zeros"))
    val raw = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
      col("sum_int").cast("double")
    val est = when(raw <= lit(160.0) && col("v_zeros") > 0L,
        lit(64.0) * log(lit(64.0) / col("v_zeros").cast("double")))
      .otherwise(raw)
    a.crossJoin(broadcast(exact))
      .select(lit(label).as("key_col"), col("n_exact"), col("v_zeros"),
        col("sum_int"),
        graft.Rounding.duckRound(est, 6).as("hll_est"),
        graft.Rounding.duckRound(
          abs(est - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
  }

  /** Quantile scorecard from a (possibly merged) cell frame: for each
    * probability, the histogram estimate (cumulative walk + linear
    * interpolation inside the covering bin — max error one bin width,
    * asserted as `within_bin`) next to the EXACT interpolated
    * quantile over `rows` — the approximation error is a measured
    * number in the result, not a hope (the e13/e84 pattern).
    *
    * Scale shape: the cumulative window runs over the 32-row cell
    * frame (global order over sketch-sized data — never the corpus);
    * the corpus-sized work is histCells' one partial-aggregated scan
    * plus the exact-quantile column, which exists only for the gate's
    * error measurement (production serves from the cells alone). */
  def histQuantileScorecard(cells: DataFrame, rows: DataFrame,
                            valueCol: String,
                            probs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.select(col("bin"), col("c"),
      coalesce(sum(col("c")).over(w), lit(0L)).as("cum_before"))
    val n = cells.agg(sum(col("c")).cast("double").as("n_rows"))
    val pframe = cells.sparkSession.range(1)
      .select(posexplode(typedlit(probs)).as(Seq("i", "prob")))
    val exact = rows.select(col(valueCol).as("v"))
      .agg(expr(s"percentile(v, array(${probs.mkString(", ")}))")
        .as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "exact_raw")))
    val est = lit(HistWidth) * col("bin").cast("double") +
      lit(HistWidth) * (col("target") - col("cum_before").cast("double")) /
        col("c").cast("double")
    pframe.crossJoin(broadcast(n))
      .withColumn("target", col("prob") * col("n_rows"))
      .join(broadcast(cum),
        col("cum_before").cast("double") < col("target") &&
          col("target") <= (col("cum_before") + col("c")).cast("double"))
      .join(broadcast(exact), Seq("i"))
      .select(col("prob"),
        graft.Rounding.duckRound(est, 6).as("est_q"),
        graft.Rounding.duckRound(col("exact_raw"), 6).as("exact_q"),
        graft.Rounding.duckRound(abs(est - col("exact_raw")), 6)
          .as("abs_err"),
        (graft.Rounding.duckRound(abs(est - col("exact_raw")), 6) <=
          lit(HistWidth)).as("within_bin"))
  }
}
