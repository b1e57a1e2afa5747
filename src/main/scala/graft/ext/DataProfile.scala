package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Rounding

/** Schema-driven dataset profiling — the data-quality snapshot a
  * training pipeline records before/after each curation stage (null
  * budgets, range drift, cardinality explosions).
  *
  * One pass, one row out: every statistic is an aggregate column in a
  * SINGLE hash-free global aggregation (partial-aggregated map-side,
  * one 1-row exchange), so profiling a 100 TB table costs one scan.
  * Statistics are chosen per column type from the schema: null counts
  * everywhere; min/max/avg/stddev for numerics (floats rounded — the
  * only accumulation-order-sensitive outputs); min/max for timestamps;
  * exact distinct counts for strings (swap for approx_count_distinct at
  * extreme cardinalities).
  */
object DataProfile {

  /** @param approx swap the exact string-cardinality counts for
    *               `approx_count_distinct` (HyperLogLog) — the
    *               extreme-cardinality form: the sketch is mergeable
    *               map-side, so a 100 TB profile never shuffles distinct
    *               values, only fixed-size HLL registers. The sketch is
    *               engine-specific (Spark HLL++ ≠ DuckDB's), so the
    *               approx profile has no hash oracle twin — the driver
    *               records rows/schema only, same class as e13. */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val nulls =
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}_nulls")
      f.dataType match {
        case _: NumericType => Seq(nulls,
          min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"),
          Rounding.duckRound(avg(c), 6).as(s"${f.name}_avg"),
          Rounding.duckRound(stddev_samp(c), 6).as(s"${f.name}_std"))
        // both timestamp flavors — the driver's parquet footer has
        // flipped between TIMESTAMP and TIMESTAMP_NTZ across data
        // regenerations, and the profile schema must not follow it
        case _: TimestampType | _: TimestampNTZType => Seq(nulls,
          min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"))
        case _: StringType => Seq(nulls,
          (if (approx) approx_count_distinct(c) else countDistinct(c))
            .as(s"${f.name}_distinct"))
        case _ => Seq(nulls)
      }
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    df.agg(all.head, all.tail: _*)
  }

  /** Per-group exact quantiles of one numeric column (p25/p50/… named by
    * percent) — the distribution-drift snapshot between curation stages.
    *
    * `percentile` is the exact interpolated form (identical to DuckDB's
    * `quantile_cont`): it buffers each group's values, so it is the right
    * tool while per-group cardinality is bounded; at extreme group sizes
    * swap for `percentile_approx`, which is mergeable and streams.
    */
  def groupedQuantiles(df: DataFrame, key: Column, value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val aggs = count(lit(1)).as("n") +: qs.map(q =>
      Rounding.duckRound(percentile(value, lit(q)), 6)
        .as(s"p${(q * 100).round}"))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** The extreme-cardinality swap [[groupedQuantiles]] documents:
    * `percentile_approx` (Greenwald-Khanna sketch, accuracy 1/10000) is
    * MERGEABLE — partials combine map-side and per-group state is a
    * fixed-size sketch instead of a buffer of every value, so group
    * cardinality no longer bounds the operator. The sketch is
    * engine-specific (no DuckDB twin computes the same ranks), so the
    * approx form has no hash oracle — the driver records rows/schema
    * only, same class as e13. */
  def groupedQuantilesApprox(df: DataFrame, key: Column, value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val aggs = count(lit(1)).as("n") +: qs.map(q =>
      Rounding.duckRound(percentile_approx(value, lit(q), lit(10000)), 6)
        .as(s"p${(q * 100).round}"))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** ε-GATE for the approx profile (VERDICT r8 #3): the sketch itself
    * has no cross-engine oracle, but its ERROR BOUND does. Emits the
    * exact profile plus, for each sketched (string-cardinality) column,
    * a `&lt;col&gt;_distinct_within` flag = 1 iff the HLL estimate is
    * within `relErr` of the exact count — so a DuckDB oracle can assert
    * the bound (`1 AS ..._within`) and a hash mismatch means the sketch
    * left its documented envelope. `relErr` defaults to 3× Spark's
    * default HLL++ rsd (0.05): a ~3σ envelope, far inside which the
    * estimator sits at any cardinality the sparse/dense modes cover.
    * Both profiles are single 1-row aggregations; the join of the two
    * 1-row frames is a trivial broadcast. */
  def profileApproxCheck(df: DataFrame,
                         relErr: Double = 0.15): DataFrame = {
    val stringCols = df.schema.fields.toSeq
      .filter(_.dataType.isInstanceOf[StringType]).map(_.name)
    val exact = profile(df)
    val ap = profile(df, approx = true).select(stringCols.map(c =>
      col(s"${c}_distinct").as(s"${c}_approx")): _*)
    val flags = stringCols.map(c =>
      (abs(col(s"${c}_approx") - col(s"${c}_distinct")) <=
        col(s"${c}_distinct") * lit(relErr)).cast("int")
        .as(s"${c}_distinct_within"))
    exact.crossJoin(ap)
      .select(exact.columns.toSeq.map(col) ++ flags: _*)
  }

  /** ε-GATE for [[groupedQuantilesApprox]] (VERDICT r8 #3): per group
    * and per quantile, a `p&lt;q&gt;_within` flag = 1 iff the GK
    * estimate's RANK inside the group is within `slackMult`× the
    * relative rank error percentile_approx documents (≤ 1/accuracy),
    * plus one rank of discreteness absorption. Checked in rank space —
    * the space the guarantee is actually stated in — so the gate is
    * scale-invariant: a value-space band between exact quantiles at
    * p ± ε collapses below one rank on small groups (sf0.001 groups of
    * ~200 rows) and false-negatives, while rank error never does.
    *
    * The estimate occupies the rank interval
    * (count(v &lt; ap), count(v ≤ ap)] — the flag asserts that interval
    * intersects [q·n − tol, q·n + tol]. Two aggregations over the
    * input and one broadcast join of the per-group sketch row: still
    * scan-bound, no value buffering, mergeable map-side.
    *
    * The oracle asserts all-1 flags; the exact quantile VALUES are
    * already hash-gated by the e23 twin, so only the bound flags (and
    * the group count) are exposed here. `key` must be a plain column
    * reference (its name keys the broadcast join). */
  def groupedQuantilesApproxCheck(df: DataFrame, key: Column,
      value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99),
      accuracy: Int = 10000, slackMult: Double = 10.0): DataFrame = {
    def apName(q: Double) = s"__ap${(q * 100).round}"
    val apAggs = qs.map(q =>
      percentile_approx(value, lit(q), lit(accuracy)).as(apName(q)))
    val sketch = df.groupBy(key).agg(apAggs.head, apAggs.tail: _*)
    val keyName = sketch.columns.head
    // null-safe key match (ADVICE r10): a plain equi-join would drop a
    // null-keyed group entirely — the groupBy retains it, so the join
    // back must too, or its rows silently vanish from the gate
    val joined = df.join(
      broadcast(sketch.withColumnRenamed(keyName, "__gk_key")),
      col(keyName) <=> col("__gk_key"))
    val nVals = count(value) // rank universe = non-null values only
    val flags = qs.map { q =>
      val ap = col(apName(q))
      val lowRank = sum(when(value < ap, 1L).otherwise(0L))
      val highRank = sum(when(value <= ap, 1L).otherwise(0L))
      val target = nVals * lit(q)
      val tol = lit(slackMult) * nVals / lit(accuracy) + lit(1.0)
      // an all-null group (null sketch) degrades to 0 ranks vs target
      // 0 ± tol ≥ 1 — still true, matching the oracle's constant 1
      (lowRank + lit(1) <= target + tol && highRank >= target - tol)
        .cast("int").as(s"p${(q * 100).round}_within")
    }
    val aggs = count(lit(1)).as("n") +: flags
    joined.groupBy(col(keyName)).agg(aggs.head, aggs.tail: _*)
  }

  /** Population stability index between a reference and a current
    * snapshot, per group: equi-depth bin BOUNDARIES come from the
    * REFERENCE's interpolated quantiles (rounded before use — the e36
    * contract), rows bin via a codegen'd `size(filter(bounds, ...))`
    * lambda against the broadcast per-group boundary array (no row
    * expansion), and PSI = Σ (p−q)·ln(p/q) with Laplace-smoothed
    * shares ((c+0.5)/(N+B/2)) so an empty current bin contributes a
    * finite, comparable term instead of ∞ — the standard drift
    * monitor between training snapshots.
    *
    * Inputs are (key, value) frames; output (key, psi). Scale shape:
    * one quantile aggregate on the reference, two binned counts
    * (partial-aggregated, key×bins cells), one bounded full-outer
    * align — nothing row-expands and nothing sorts the corpus. */
  def psiDrift(ref: DataFrame, cur: DataFrame,
               nBins: Int = 10): DataFrame = {
    val qs = (1 until nBins).map(i =>
      s"CAST(${i.toDouble / nBins} AS DOUBLE)").mkString(",")
    // duckRound inline (lambda scope): DuckDB double-space rounding so
    // both engines bin against bit-identical boundaries
    val bnd = ref.groupBy(col("key"))
      .agg(expr(s"""transform(percentile(value, array($qs)),
        b -> signum(b) * floor(abs(b) * 1000000.0d + 0.5d)
             / 1000000.0d)""").as("bs"))
    def binned(df: DataFrame, cName: String) =
      df.join(broadcast(bnd), Seq("key"))
        .select(col("key"),
          expr("size(filter(bs, x -> value > x))").as("bin"))
        .groupBy(col("key"), col("bin"))
        .agg(count(lit(1)).as(cName))
    val f = binned(ref, "c_r")
      .join(binned(cur, "c_c"), Seq("key", "bin"), "full_outer")
      .withColumn("c_r", coalesce(col("c_r"), lit(0L)))
      .withColumn("c_c", coalesce(col("c_c"), lit(0L)))
    val n = f.groupBy(col("key"))
      .agg(sum(col("c_r")).cast("double").as("n_r"),
        sum(col("c_c")).cast("double").as("n_c"))
    val p = (col("c_r") + lit(0.5)) / (col("n_r") + lit(nBins / 2.0))
    val q = (col("c_c") + lit(0.5)) / (col("n_c") + lit(nBins / 2.0))
    f.join(broadcast(n), Seq("key"))
      .groupBy(col("key"))
      .agg(graft.Rounding.duckRound(
        sum((p - q) * log(p / q)), 6).as("psi"))
  }

  /** Pairwise Pearson correlation of numeric columns, long-form
    * (col_x, col_y, pearson) — the feature-redundancy screen run before
    * training (|r| ≈ 1 columns are candidates to drop). ALL C(k,2)
    * coefficients come from ONE partial-aggregated global agg (one
    * scan, one 1-row exchange — the profile() topology), then the
    * single row unpivots driver-free into k·(k−1)/2 labeled rows.
    * corr is an order-dependent co-moment → rounds to 6 (e36
    * contract). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      Rounding.duckRound(corr(col(cols(i)), col(cols(j))), 6)
        .as(s"c_${i}_$j")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    pairs.map { case (i, j) =>
      one.select(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        col(s"c_${i}_$j").as("pearson"))
    }.reduce(_.unionByName(_))
  }

  /** Per-group higher-moment statistics — population stddev, skewness,
    * and excess kurtosis — the tail-shape profile that tells a heavy-
    * tailed feature from a Gaussian one before winsorize/clip
    * decisions. Built from SCALED central moments: built-in
    * skewness/kurtosis aggregates differ across engines (sample vs
    * population corrections), so the moments are computed explicitly —
    * two partial-aggregated passes (rounded group means broadcast
    * back, then avg of centered powers) — and every moment rounds
    * BEFORE derived use (e36). The `scale` divisor keeps m4's
    * magnitude in the range where the round-6 grain is far above the
    * accumulation ulp (an unscaled value⁴ at ~500 puts round-6 at the
    * sum's own ulp — the e119 failure mode); skewness and kurtosis are
    * scale-invariant, and stddev rescales back. */
  def momentStats(df: DataFrame, groupCol: String, valueCol: String,
                  scale: Double = 100.0): DataFrame = {
    val vs = col(valueCol) / lit(scale)
    val m = df.groupBy(col(groupCol))
      .agg(Rounding.duckRound(avg(col(valueCol)), 6).as("mean"),
        Rounding.duckRound(avg(vs), 6).as("mean_s"))
    val d = df.join(broadcast(m), Seq(groupCol))
      .select(col(groupCol), col("mean"),
        (vs - col("mean_s")).as("ds"))
    val a = d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), first(col("mean")).as("mean"),
        Rounding.duckRound(avg(col("ds") * col("ds")), 6).as("m2"),
        Rounding.duckRound(
          avg(col("ds") * col("ds") * col("ds")), 6).as("m3"),
        Rounding.duckRound(
          avg(col("ds") * col("ds") * col("ds") * col("ds")), 6)
          .as("m4"))
    a.select(col(groupCol), col("n"), col("mean"),
      Rounding.duckRound(sqrt(col("m2")) * lit(scale), 6)
        .as("stddev_pop"),
      Rounding.duckRound(
        col("m3") / pow(col("m2"), lit(1.5)), 6).as("skewness"),
      Rounding.duckRound(
        col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)
        .as("kurtosis_excess"))
  }

  /** Quantile normalization across sources WITHIN a partition key:
    * each (key, source) distribution maps onto the key-wide reference
    * distribution — row i's source-decile is replaced by the mean of
    * the key-wide decile with the same index (the batch-effect
    * correction used to make heterogeneous sources comparable before
    * mixing). Two NTILE windows (the e103 machinery: (value, id)
    * total order makes bucket fills deterministic cross-engine) — one
    * per (key, source), one per key — plus a broadcast join of the
    * ≤ key×10 reference-bin means. Partitioning by `keyCol` is what
    * keeps this off the single-task global window: keys are the
    * parallel unit, and a corpus-wide normalization at scale would
    * compute its reference bins from per-key aggregates instead. */
  def quantileNormalize(df: DataFrame, keyCol: String,
                        sourceCol: String, idCol: String,
                        valueCol: String, n: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRef = Window.partitionBy(col(keyCol))
      .orderBy(col(valueCol), col(idCol))
    val wSrc = Window.partitionBy(col(keyCol), col(sourceCol))
      .orderBy(col(valueCol), col(idCol))
    val binned = df.select(col(idCol), col(keyCol), col(sourceCol),
        col(valueCol))
      .withColumn("ref_bin", ntile(n).over(wRef).cast("long"))
      .withColumn("bin", ntile(n).over(wSrc).cast("long"))
    val refMeans = binned.groupBy(col(keyCol),
        col("ref_bin").as("bin"))
      .agg(Rounding.duckRound(avg(col(valueCol)), 6).as("normalized"))
    binned.drop("ref_bin")
      .join(broadcast(refMeans), Seq(keyCol, "bin"))
      .select(col(idCol), col(keyCol), col(sourceCol), col(valueCol),
        col("bin"), col("normalized"))
  }

  /** Benford first-digit screen: the observed leading-digit
    * distribution of a positive money column against Benford's law
    * p(d) = log₁₀(1 + 1/d), with per-digit χ² terms — the fraud /
    * synthetic-data smell test every audit pipeline runs. The leading
    * digit comes from the INT64 cents value via string head — exact
    * (a float log₁₀ digit extraction misclassifies exact powers of
    * ten when log10 lands at 2.9999…); one partial-aggregated
    * groupBy to 9 rows, expectations as identical ln trees rounded
    * before the χ² algebra. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * lit(100)).cast("bigint")
    val d = df.filter(col(valueCol) > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    import org.apache.spark.sql.expressions.Window
    val withN = d.withColumn("n",
      sum(col("n_obs")).over(Window.partitionBy()))
    val p = Rounding.duckRound(
      log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6)
    withN
      .withColumn("benford_p", p)
      .select(col("digit"), col("n_obs"),
        Rounding.duckRound(
          col("n_obs").cast("double") / col("n").cast("double"), 6)
          .as("share"),
        col("benford_p"),
        Rounding.duckRound(
          (col("n_obs").cast("double") -
            col("n").cast("double") * col("benford_p")) *
            (col("n_obs").cast("double") -
              col("n").cast("double") * col("benford_p")) /
            (col("n").cast("double") * col("benford_p")), 6)
          .as("chi2_term"))
  }

  /** Declarative data-quality expectations: each rule is (name,
    * ok-predicate, violation-rate threshold); the report is one row
    * per rule with its violation count, rate, and pass flag — the
    * contract-check every ingestion gate runs (the FX reference's
    * validator is this in miniature: two hand-coded expectations over
    * a merged frame). ALL rules evaluate in ONE partial-aggregated
    * scan (a conditional sum per rule beside the row count — the
    * corrMatrix topology), then the single row unpivots driver-free.
    * The pass decision compares the ROUNDED rate to the threshold
    * (e36: round before use), so a last-ulp division difference can
    * never flip a verdict. */
  def expectations(df: DataFrame,
                   rules: Seq[(String, org.apache.spark.sql.Column,
                     Double)]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      rules.zipWithIndex.map { case ((_, ok, _), i) =>
        sum(when(ok, 0L).otherwise(1L)).as(s"v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.zipWithIndex.map { case ((name, _, thr), i) =>
      val rate = Rounding.duckRound(
        col(s"v_$i").cast("double") / col("n").cast("double"), 6)
      one.select(lit(name).as("rule_name"),
        col(s"v_$i").as("n_violations"),
        rate.as("violation_rate"),
        (rate <= lit(thr)).as("passed"))
    }.reduce(_.unionByName(_))
  }

  /** χ² independence screen of a category column against day-of-week:
    * observed cell counts vs the independence expectation
    * rowTot·colTot/n, with per-cell χ² terms — the "is behavior
    * uniform across the week" bias probe (and, summed, the test
    * statistic). Day-of-week is PURE integer arithmetic on epoch
    * days ((days + 4) mod 7, anchored to 1970-01-01 = Thursday)
    * because engine dayofweek() conventions disagree (Sunday = 0 vs
    * 1). One partial-aggregated groupBy to ≤ 7·k cells; the marginal
    * totals are window sums over that tiny cell table. Expected
    * counts round before the χ² algebra (e36). */
  def chisqIndependence(df: DataFrame, catCol: String,
                        tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dow = expr(
      s"(unix_micros($tsCol) DIV 86400000000 + 4) % 7")
    val o = df.select(col(catCol), dow.as("dow"))
      .groupBy(col(catCol), col("dow"))
      .agg(count(lit(1)).as("n_obs"))
    val t = o
      .withColumn("row_tot",
        sum(col("n_obs")).over(Window.partitionBy(col(catCol))))
      .withColumn("col_tot",
        sum(col("n_obs")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
    val expected = Rounding.duckRound(
      (col("row_tot") * col("col_tot")).cast("double") /
        col("n").cast("double"), 6)
    t.withColumn("expected", expected)
      .select(col(catCol), col("dow").cast("long").as("dow"),
        col("n_obs"), col("expected"),
        Rounding.duckRound(
          (col("n_obs").cast("double") - col("expected")) *
            (col("n_obs").cast("double") - col("expected")) /
            col("expected"), 6).as("chi2_term"))
  }

  /** Gini coefficient of value concentration per group — 0 = every
    * row equal, →1 = one row holds everything — the inequality lens
    * on spend/volume/contribution distributions (a pretraining mix
    * with Gini ≈ 1 over sources is one source in disguise). Uses the
    * rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the
    * (value, id)-ordered ranks, computed in int64 CENTS so both the
    * rank-weighted sum and the total are EXACT (the e119 contract);
    * the only float arithmetic is the final identical division. One
    * per-group rank window + one partial-aggregated groupBy. */
  def giniConcentration(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    events
      .select(col("event_type"), col("event_id"),
        round(col("value") * lit(100)).cast("bigint").as("cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"),
        sum(col("rk") * col("cents")).as("wsum"))
      .select(col("event_type"), col("n"),
        Rounding.duckRound(
          (lit(2L) * col("wsum")).cast("double") /
            (col("n").cast("double") * col("tot").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double"),
          6).as("gini"))
  }

  /** Herfindahl-Hirschman concentration of the corpus across sources
    * (Σ share², by doc count and by character mass): the one-number
    * "is this dataset really N sources or one megasource" check —
    * 1/N at perfect balance, 1.0 at monopoly. Exact integer masses;
    * the share squares sum over the SOURCE table (dimension-bounded)
    * and round once. */
  def hhiSources(docs: DataFrame): DataFrame = {
    val s = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val t = s.agg(sum(col("n_docs")).as("nd"),
      sum(col("chars")).as("nc"))
    val shareD = col("n_docs").cast("double") / col("nd").cast("double")
    val shareC = col("chars").cast("double") / col("nc").cast("double")
    s.join(broadcast(t))
      .agg(count(lit(1)).as("n_sources"),
        Rounding.duckRound(sum(shareD * shareD), 6).as("hhi_docs"),
        Rounding.duckRound(sum(shareC * shareC), 6).as("hhi_chars"))
  }

  /** Bootstrap confidence interval for the per-group mean:
    * `nResamples` deterministic resamples (every draw is an
    * md5-derived index — the weightedReservoir rule: derived
    * randomness, never RNG, so both engines draw the IDENTICAL
    * resamples), each resample's mean in exact int64 cents, the CI
    * as interpolated percentiles of the resample means — inference
    * without distributional assumptions, and the honest error bar
    * for any curation statistic. Work is n×B rows of narrow
    * integer join+aggregate — embarrassingly parallel, grouped by
    * (key, resample). */
  def bootstrapCI(events: DataFrame, nResamples: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val session = events.sparkSession
    val r = events.select(col("event_type"),
        round(col("value") * lit(100)).cast("bigint").as("cents"),
        col("value"), col("event_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))).cast("long"))
      .select(col("event_type"), col("cents"), col("rk"))
    val n = r.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
    val bs = session.range(0, nResamples).select(col("id").as("b"))
    val draws = r.join(broadcast(n), Seq("event_type"))
      .crossJoin(broadcast(bs))
      .select(col("event_type"), col("b"), col("nt"),
        (Dedup.md5Long(concat(lit("bs|"), col("event_type"),
          lit("|"), col("b").cast("string"), lit("|"),
          col("rk").cast("string"))) % col("nt") + 1).as("idx"))
    val picked = draws.join(r,
      draws("event_type") === r("event_type") &&
        draws("idx") === r("rk"))
      .select(draws("event_type"), col("b"), col("cents"), col("nt"))
    val means = picked.groupBy(col("event_type"), col("b"),
        col("nt"))
      .agg(Rounding.duckRound(sum(col("cents")).cast("double") /
        (col("nt") * lit(100L)).cast("double"), 6).as("m"))
    val base = r.groupBy(col("event_type"))
      .agg(Rounding.duckRound(sum(col("cents")).cast("double") /
        (count(lit(1)) * lit(100L)).cast("double"), 6)
        .as("mean_value"))
    means.groupBy(col("event_type"))
      .agg(Rounding.duckRound(expr("percentile(m, 0.025)"), 6)
        .as("ci_lo"),
        Rounding.duckRound(expr("percentile(m, 0.975)"), 6)
          .as("ci_hi"),
        count(lit(1)).as("n_resamples"))
      .join(broadcast(base), Seq("event_type"))
      .select(col("event_type"), col("mean_value"), col("ci_lo"),
        col("ci_hi"), col("n_resamples"))
  }

  /** Hill tail-index estimator per group: α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * over the top-k order statistics — the standard "how heavy is
    * this tail" number (α ≤ 2 ⇒ infinite variance: winsorize before
    * averaging anything). One per-group rank window; the threshold
    * x₍ₖ₊₁₎ is a k+1-rank pick joined back; the ln-sum rounds before
    * the one division. */
  def hillTail(events: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = events.select(col("event_type"), col("value"),
        col("event_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id"))))
    val xm = r.filter(col("rk") === k + 1)
      .select(col("event_type"), col("value").as("xmin"))
    r.filter(col("rk") <= k)
      .join(broadcast(xm), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(Rounding.duckRound(
        sum(log(col("value") / col("xmin"))), 6).as("lnsum"),
        first(col("xmin")).as("xmin"))
      .select(col("event_type"), lit(k.toLong).as("k"), col("xmin"),
        Rounding.duckRound(lit(k.toDouble) / col("lnsum"), 6)
          .as("alpha_hat"))
  }

  /** K-anonymity audit over quasi-identifier combinations (category ×
    * day-of-week × per-category value decile): any combination with
    * fewer than `k` members re-identifies its rows — the privacy
    * screen run before releasing event-level data. Bins are the e103
    * deterministic NTILE; every cell is exact counts; the flag is one
    * integer comparison. */
  def kAnonymity(events: DataFrame, k: Long = 25L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = events.select(col("event_type"),
        expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"),
        col("value"), col("event_id"))
      .withColumn("vbin", ntile(10).over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))).cast("long"))
    bins.groupBy(col("event_type"), col("dow"), col("vbin"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** Mutual information between a category column and day-of-week:
    * MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) — the effect-SIZE companion
    * to [[chisqIndependence]]'s significance test (χ² says "not
    * independent", MI says "by how many nats"). Exact cell counts,
    * marginals as window sums over the ≤ 7·k cell table, identical
    * ln trees, one rounding. */
  def mutualInformation(df: DataFrame, catCol: String,
                        tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dow = expr(
      s"(unix_micros($tsCol) DIV 86400000000 + 4) % 7")
    val j = df.select(col(catCol).as("x"), dow.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy"))
    val t = j
      .withColumn("nx",
        sum(col("nxy")).over(Window.partitionBy(col("x"))))
      .withColumn("ny",
        sum(col("nxy")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    t.agg(
      Rounding.duckRound(sum(
        (col("nxy").cast("double") / col("n").cast("double")) *
          log(col("nxy").cast("double") * col("n").cast("double") /
            (col("nx").cast("double") * col("ny").cast("double")))),
        6).as("mutual_information"),
      count(lit(1)).as("n_cells"),
      first(col("n")).as("n_events"))
  }

  /** Key-reconciliation report between two tables: matched /
    * left-only / right-only counts and the match rate from ONE
    * full-outer join over the distinct key sets — the referential-
    * integrity audit every warehouse load ends with (this corpus
    * really does ship 257 childless orders). */
  def reconcileKeys(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.toDF("k").distinct().withColumn("in_l", lit(1))
    val r = right.toDF("k").distinct().withColumn("in_r", lit(1))
    l.join(r, Seq("k"), "full_outer")
      .agg(
        sum(when(col("in_l").isNotNull && col("in_r").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("in_l").isNotNull && col("in_r").isNull, 1L)
          .otherwise(0L)).as("n_left_only"),
        sum(when(col("in_l").isNull && col("in_r").isNotNull, 1L)
          .otherwise(0L)).as("n_right_only"),
        Rounding.duckRound(
          sum(when(col("in_l").isNotNull && col("in_r").isNotNull,
            1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6).as("match_rate"))
  }

  /** Day-of-week seasonal indices per group: cell mean / group mean —
    * the multiplicative seasonality profile (index 1.1 ⇒ that weekday
    * runs 10% hot) that deseasonalizes monitoring baselines before
    * drift tests like CUSUM see them. Day-of-week is the same
    * integer epoch-day arithmetic as [[chisqIndependence]]; both
    * means round BEFORE the ratio (e36), making the index identical
    * cross-engine. Two partial-aggregated passes, a ≤ 7·k-row
    * broadcast join. */
  def seasonalIndex(df: DataFrame, catCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val dow = expr(
      s"(unix_micros($tsCol) DIV 86400000000 + 4) % 7")
    val d = df.select(col(catCol), dow.as("dow"), col(valueCol))
    val cell = d.groupBy(col(catCol), col("dow"))
      .agg(count(lit(1)).as("n_obs"),
        Rounding.duckRound(avg(col(valueCol)), 6).as("cell_mean"))
    val tm = d.groupBy(col(catCol))
      .agg(Rounding.duckRound(avg(col(valueCol)), 6).as("type_mean"))
    cell.join(broadcast(tm), Seq(catCol))
      .select(col(catCol), col("dow").cast("long").as("dow"),
        col("n_obs"), col("cell_mean"), col("type_mean"),
        Rounding.duckRound(col("cell_mean") / col("type_mean"), 6)
          .as("seasonal_index"))
  }
}
