package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay documents out on one
  * continuous token stream (deterministic doc_id order) and cut it into
  * fixed-size context windows — "concat-and-chunk", the packing used by
  * GPT-style pretraining pipelines. Each document gets the sequence id
  * containing its first token plus its offset inside that sequence; a
  * document straddling a boundary spills into the next sequence by
  * construction (the stream is continuous).
  *
  * The global prefix sum is computed in two distributed phases, never as
  * one single-task window:
  *   1. docs are range-bucketed by doc_id and the cumulative token count
  *      runs inside each bucket (parallel windows);
  *   2. per-bucket totals — one row per bucket — get a prefix sum on the
  *      tiny bucket table (single-task but O(nBuckets), data-independent)
  *      and are broadcast back as each bucket's carry-in.
  * Same patch-table topology as [[graft.ops.DayWindows]]; at 100 TB the
  * only serial piece stays the nBuckets-row carry table.
  */
object Packing {

  /** @param tokens (doc_id: long, n_tokens: long) — one row per doc.
    * @return (doc_id, n_tokens, seq_id, offset_in_seq), where
    *         seq_id = ⌊tokens-before / seqLen⌋ in doc_id order. */
  def packSequences(tokens: DataFrame, seqLen: Int,
                    nBuckets: Int = 64): DataFrame = {
    // one tiny 1-row action for the id range (same shape as G5's median
    // scalar); an empty input short-circuits to the empty result
    val bounds = tokens.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi")).head()
    if (bounds.isNullAt(0))
      return tokens.select(col("doc_id"), col("n_tokens"),
        lit(0L).as("seq_id"), lit(0L).as("offset_in_seq"))
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / nBuckets + 1)
    val wIn = Window.partitionBy(col("_b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withIn = tokens
      .withColumn("_b", expr(s"(doc_id - ${lo}L) div ${width}L"))
      .withColumn("_cum_in", sum(col("n_tokens")).over(wIn))
    // carry-in per bucket: prefix sum over the O(nBuckets) totals table
    val wB = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = withIn.groupBy(col("_b"))
      .agg(sum(col("n_tokens")).as("_bt"))
      .select(col("_b"), coalesce(sum(col("_bt")).over(wB), lit(0L))
        .as("_carry"))
    withIn.join(broadcast(carries), Seq("_b"))
      .withColumn("_before", col("_carry") + col("_cum_in") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"_before div ${seqLen}L").as("seq_id"),
        expr(s"_before % ${seqLen}L").as("offset_in_seq"))
  }

  /** Shard-packed text digests: documents hash into `nShards` shards
    * (the [[Sampling.shuffleShards]] md5 assignment), each shard's texts
    * are concatenated in md5-rank order with a blank-line separator, and
    * the result is summarized as (n_docs, packed_len, packed_md5) — the
    * content-addressed manifest a packed training-shard export publishes
    * for integrity checks.
    *
    * Scale shape: one shuffle on the shard key; each shard's pack
    * materializes inside its own task (`collect_list` + `array_sort` —
    * per-GROUP memory, not per-job), which is exactly the working set a
    * shard FILE writer needs anyway. At 100 TB, `nShards` scales with
    * corpus size so each pack stays file-sized (the same knob as the
    * shard export in e25); the digest keeps the query's OUTPUT tiny
    * regardless of text volume. */
  def packedShards(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        Dedup.md5Long(col("doc_id").cast("string")).as("r"))
      .withColumn("shard", pmod(col("r"), lit(nShards)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("r"), col("doc_id"),
          col("text")))).as("ds"))
      .select(col("shard"), col("n_docs"),
        length(array_join(expr("transform(ds, d -> d.text)"), "\n\n"))
          .cast("long").as("packed_len"),
        md5(array_join(expr("transform(ds, d -> d.text)"), "\n\n"))
          .as("packed_md5"))
}
