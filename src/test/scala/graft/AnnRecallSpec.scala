package graft

/** ANN recall floors (VERDICT r6 #2): the e52 gate proves the recall
  * NUMBERS are oracle-exact; this spec pins their measured LEVELS at
  * sf0.01 so a regression in the pruning topology (bucket family,
  * table count, cell assignment) fails loudly instead of silently
  * returning fewer neighbors. Floors sit under the measured values
  * (label-ivf 0.033, kmeans-ivf 0.90 at nprobe=2, lsh single-table
  * 0.037, lsh multi-table 0.454) with headroom only for data
  * regeneration, not behavior change. */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("measured ANN recall at sf0.01 stays at or above the " +
    "documented floors") {
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    val rows = ExtQueries.queries("e52_ann_recall")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rows("ivf_knn") >= 0.03,
      s"ivf recall ${rows("ivf_knn")} under floor 0.03")
    assert(rows("kmeans_ivf") >= 0.8,
      s"kmeans-ivf recall ${rows("kmeans_ivf")} under floor 0.8")
    assert(rows("kmeans_ivf_p1") >= 0.7,
      s"kmeans-ivf@nprobe=1 ${rows("kmeans_ivf_p1")} under floor 0.7")
    // the knob must be monotone: probing more cells never loses truth
    assert(rows("kmeans_ivf") >= rows("kmeans_ivf_p1"))
    // the trained quantizer is the point: it must crush the label
    // stand-in
    assert(rows("kmeans_ivf") >= 10 * rows("ivf_knn"))
    assert(rows("lsh_pairs") >= 0.03,
      s"single-table lsh recall ${rows("lsh_pairs")} under floor 0.03")
    assert(rows("lsh_multi") >= 0.40,
      s"multi-table lsh recall ${rows("lsh_multi")} under floor 0.40")
    // the OR-construction must meaningfully beat the single table —
    // the whole point of the knob
    assert(rows("lsh_multi") >= 5 * rows("lsh_pairs"))
  }

  test("measured PQ-path recall vs exact-L2 brute force at sf0.01 " +
    "stays at or above the documented floors") {
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    val rows = ExtQueries.queries("e79_ivfpq_recall")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // 8-entry codebooks over 16-dim subspaces of near-random synthetic
    // vectors quantize coarsely by construction — these floors pin the
    // measured levels (pq_adc 0.167, ivfpq 0.20 at sf0.01), not a
    // production PQ config (m=64, k=256); the gate exists so a
    // training/encode/probe regression fails loudly
    assert(rows("pq_adc") >= 0.1,
      s"whole-corpus ADC recall ${rows("pq_adc")} under floor 0.1")
    assert(rows("ivfpq") >= 0.1,
      s"composed IVF-PQ recall ${rows("ivfpq")} under floor 0.1")
    assert(rows("ivfpq_rerank") >= 0.3,
      s"re-ranked IVF-PQ recall ${rows("ivfpq_rerank")} under 0.3")
    // the exact re-rank tail exists to fix ADC's quantization rank
    // inversions inside the candidate set — it must never lose to the
    // raw composed path (measured: 0.40 vs 0.20 at sf0.01)
    assert(rows("ivfpq_rerank") >= rows("ivfpq"),
      s"re-rank ${rows("ivfpq_rerank")} lost to raw ${rows("ivfpq")}")
    assert(rows("ivfpq_resid") >= 0.2,
      s"residual IVF-PQ recall ${rows("ivfpq_resid")} under 0.2")
    // residuals are centered with far smaller spread than raw
    // vectors, so the same codebook size quantizes them finer — the
    // reason FAISS encodes residuals (measured: 0.30 vs 0.20)
    assert(rows("ivfpq_resid") >= rows("ivfpq"),
      s"residual ${rows("ivfpq_resid")} lost to raw ${rows("ivfpq")}")
    // the composed path prunes to probed cells, so it can only lose
    // candidates vs the whole-corpus scan PLUS the coarse quantizer's
    // own neighborhood structure; on this data the cell pruning
    // happens to help ADC's tie-heavy ranking — require it stays
    // within 2x either way rather than a direction that data regen
    // could flip
    assert(rows("ivfpq") >= rows("pq_adc") / 2,
      s"ivfpq ${rows("ivfpq")} collapsed vs pq_adc ${rows("pq_adc")}")
  }

  test("tuned IVF-PQ reaches serving-grade recall at sf0.01 and " +
    "beats the untuned baseline (VERDICT r11 #2)") {
    assume(new java.io.File(sfDir).exists(), s"$sfDir not present")
    val rows = ExtQueries.queries("e84_ivfpq_tuned_recall")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // the knob→recall trade, pinned the way lshParamsFor pinned LSH:
    // m=8/L=8/kCodes=16/nprobe=4/R=30 measured 0.833 at sf0.01 —
    // production recall is a knob setting on the SAME operator
    assert(rows("ivfpq_tuned_rerank") >= 0.8,
      s"tuned re-ranked recall ${rows("ivfpq_tuned_rerank")} under " +
        "the 0.8 serving floor")
    assert(rows("ivfpq_tuned_rerank") > rows("ivfpq_rerank"),
      s"tuned ${rows("ivfpq_tuned_rerank")} does not beat untuned " +
        s"${rows("ivfpq_rerank")}")
    // WHERE the recall comes from: composed ADC top-3 alone plateaus
    // (quantization noise reorders near-ties regardless of nprobe —
    // measured ~0.2-0.3 at every swept config); the exact tail is
    // what converts candidate coverage into recall. Pin the plateau
    // as a floor only, so a data regen can't flip the direction.
    assert(rows("ivfpq_tuned") >= 0.1,
      s"tuned composed recall ${rows("ivfpq_tuned")} under floor 0.1")
    assert(rows("ivfpq_tuned_rerank") >= 2 * rows("ivfpq_tuned"),
      "the exact re-rank tail stopped paying: tuned composed " +
        s"${rows("ivfpq_tuned")} vs re-ranked " +
        s"${rows("ivfpq_tuned_rerank")}")
  }
}
