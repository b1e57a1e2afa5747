package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Sampling here is HASH-based, never RNG-based: membership is a pure
  * function of the row's id (md5-derived permille bucket), so a sample is
  * (a) reproducible across runs, partitionings, and cluster topologies,
  * (b) oracle-checkable cross-engine (the md5 parity trick from
  * [[Dedup.md5Long]]), and (c) consistent across tables — joining two
  * hash-sampled tables on the id keeps exactly the intersection rates.
  * `TABLESAMPLE`/`df.sample` give none of those guarantees.
  *
  * Stratified form: each row's stratum chooses its keep-rate, so a
  * pipeline can downsample over-represented strata (boilerplate-length
  * docs, dominant languages) while keeping the rare tail intact —
  * standard practice for pretraining-mix curation. Pure per-row
  * expressions: fully codegen'd, no shuffle at all.
  */
object Sampling {

  /** Stable permille bucket (0–999) of an id column. */
  def permilleBucket(id: Column): Column =
    Dedup.md5Long(id.cast("string")) % 1000

  /** Keep rows whose permille bucket falls under their stratum's rate.
    * @param strata  (stratumName, keepPermille), matched in order against
    *                `stratumOf`; unmatched rows use `defaultPermille`. */
  def stratifiedSample(df: DataFrame, id: Column, stratumOf: Column,
                       strata: Seq[(String, Int)],
                       defaultPermille: Int): DataFrame = {
    val rate = strata.foldRight(lit(defaultPermille): Column) {
      case ((name, p), acc) => when(stratumOf === name, lit(p)).otherwise(acc)
    }
    df.withColumn("stratum", stratumOf)
      .withColumn("bucket", permilleBucket(id))
      .filter(col("bucket") < rate)
  }

  /** Weighted deterministic Bernoulli sample: each row's keep
    * probability is its own `weight` (clamped to [0, 1]), realized as
    * `permille(id) < floor(1000 · weight)` — the hash-not-RNG guarantee
    * of [[stratifiedSample]] with a continuous per-row rate (quality
    * scores, recency decay). The weight arithmetic is single IEEE
    * multiply/floor, identical cross-engine. Pure per-row expressions:
    * no shuffle, fully codegen'd. */
  def weightedSample(df: DataFrame, id: Column,
                     weight: Column): DataFrame =
    df.withColumn("weight_p",
        floor(lit(1000.0) *
          greatest(lit(0.0), least(lit(1.0), weight))).cast("long"))
      .withColumn("bucket", permilleBucket(id))
      .filter(col("bucket") < col("weight_p"))

  /** Weighted reservoir sample WITHOUT replacement (Efraimidis–Spirakis
    * A-ES), deterministic: each row draws its "uniform" u from the id
    * hash (not an RNG — the same reproducibility contract as
    * [[stratifiedSample]]), takes key = u^(1/weight), and the k largest
    * keys win. Heavier rows get keys nearer 1, so inclusion probability
    * is proportional to weight, but — unlike [[weightedSample]]'s
    * Bernoulli form — the output size is EXACTLY k. Distributed shape:
    * the key is one codegen'd projection and the top-k runs as
    * `TakeOrderedAndProject` (per-partition heaps of k, one k-row
    * driver merge) — no global sort, no shuffle of the corpus, the
    * same plan Spark gives ORDER BY ... LIMIT k. weight is clamped to
    * ≥ 1 so a zero-weight row degrades to the uniform draw instead of
    * u^∞. */
  def weightedReservoir(df: DataFrame, id: Column, weight: Column,
                        k: Int): DataFrame = {
    val u = (Dedup.md5Long(id.cast("string")) % 1000000L + 1L)
      .cast("double") / 1000001.0
    val key = pow(u, lit(1.0) / greatest(weight.cast("double"), lit(1.0)))
    df.withColumn("samp_key", key)
      .orderBy(col("samp_key").desc, id)
      .limit(k)
  }

  /** Pretraining mix planner: given per-row (source, n_toks) and target
    * mix WEIGHTS, compute each source's token inventory and the sampling
    * rate / epoch count that hits `weight · tokenBudget` tokens from it —
    * the arithmetic behind "60% web, 30% books, 10% code" data recipes.
    * `epochs` > 1 means the source must repeat to meet its quota (the
    * up-sampling a mix actually implies); `sample_rate` caps at 1.
    *
    * One partial-aggregated groupBy on source (output cardinality =
    * number of sources); everything after is per-row arithmetic on that
    * tiny table. */
  def mixPlan(docTokens: DataFrame, weights: Seq[(String, Double)],
              defaultWeight: Double, tokenBudget: Double): DataFrame = {
    val w = weights.foldRight(lit(defaultWeight): Column) {
      case ((src, p), acc) => when(col("source") === src, lit(p))
        .otherwise(acc)
    }
    val target = w * lit(tokenBudget)
    docTokens.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        w.as("weight"), target.as("target_tokens"),
        least(lit(1.0), target / col("n_tokens")).as("sample_rate"),
        (target / col("n_tokens")).as("epochs"))
  }

  /** Deterministic global shuffle + sharding for training export: shard
    * = id-hash mod `nShards`, and `pos_in_shard` numbers rows in hash
    * order within each shard — a reproducible random permutation of the
    * corpus into n writer-sized pieces (what a pretraining export does
    * before writing tfrecord/webdataset shards).
    *
    * Scale shape: one shuffle on the shard key; each shard's sort is
    * local to its partition (`nShards` should be >= the writer
    * parallelism you want). No RNG — re-running on any cluster layout
    * yields byte-identical shard assignments. */
  def shuffleShards(df: DataFrame, id: Column,
                    nShards: Int = 16): DataFrame = {
    val h = Dedup.md5Long(id.cast("string"))
    df.withColumn("h", h)
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos_in_shard", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("h"), id)).cast("long"))
      .drop("h")
  }
}
