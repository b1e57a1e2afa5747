package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}

/** Crafted-fixture semantics of the r10 span operators (their corpus
  * gates are e72/e73; this pins the edge rules on inputs small enough
  * to verify by hand). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("repeatedSpanProfile: shared spans counted, short docs absent") {
    // doc 1 and 2 share their first 5-word shingle; doc 3 is unique;
    // doc 4 is too short to shingle at k=5
    val d = docsDf(
      1L -> "a b c d e f",
      2L -> "a b c d e g",
      3L -> "p q r s t u",
      4L -> "x y")
    val out = Dedup.repeatedSpanProfile(d, k = 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // docs 1/2: shingles {abcde, bcdef|g} — one of two shared (df 2)
    assert(byDoc(1L) == ((2L, 1L, 2L, 0.5)))
    assert(byDoc(2L) == ((2L, 1L, 2L, 0.5)))
    assert(byDoc(3L) == ((2L, 0L, 1L, 0.0)))
  }

  test("crossDocSpans: a planted cross-doc span surfaces as ONE " +
    "maximal run with its position; unique and short docs are absent") {
    // docs 1 and 2 share the 7-token span "c1 c2 c3 c4 c5 c6 c7" at
    // DIFFERENT offsets (doc 1: tokens 2..8, doc 2: tokens 0..6) —
    // 3 consecutive shared 5-shingles must merge into one span of
    // n_tokens 7; doc 3 is all-unique, doc 4 too short to shingle
    val span = "c1 c2 c3 c4 c5 c6 c7"
    val d = docsDf(
      1L -> s"u1 u2 $span u3",
      2L -> s"$span v1 v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      4L -> "x y")
    val out = Dedup.crossDocSpans(d, k = 5).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 7L, 3L, 2L),
      (2L, 0L, 7L, 3L, 2L)))
  }

  test("crossDocSpans: within-doc repetition alone does NOT make a " +
    "span — the df is cross-document") {
    // doc 1 repeats its own 5-gram; no other doc shares it
    val d = docsDf(
      1L -> "a b c d e a b c d e",
      2L -> "p q r s t u v w x y")
    assert(Dedup.crossDocSpans(d, k = 5).count() == 0)
  }

  test("crossDocSpans: two disjoint shared regions in one doc stay " +
    "two rows; overlapping shares merge to one") {
    val s1 = "a1 a2 a3 a4 a5"
    val s2 = "b1 b2 b3 b4 b5"
    val d = docsDf(
      1L -> s"$s1 gap1 gap2 gap3 gap4 gap5 $s2",
      2L -> s"$s1 z1 z2 z3 z4",
      3L -> s"z5 z6 z7 z8 $s2")
    val one = Dedup.crossDocSpans(d, k = 5)
      .filter(col("doc_id") === 1L).orderBy("start_pos").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(one.toSeq == Seq((0L, 5L), (10L, 5L)))
  }

  test("crossDocExactSpans: overlapping spans shared with DIFFERENT " +
    "partners over-merge in the profile but stay partner-precise " +
    "exact matches (VERDICT r11 #3)") {
    // doc 0 = w0..w12; doc 1 contains w0..w7 (at offset 2), doc 2
    // contains w4..w12 (at offset 0). Doc 0's shared shingle
    // positions are 0..3 (with 1) ∪ 4..8 (with 2) — CONTIGUOUS, so
    // the shingle-granular profile merges them into one 13-token
    // region that NO single partner actually shares
    val w = (0 to 12).map(i => s"w$i")
    val d = docsDf(
      0L -> w.mkString(" "),
      1L -> ("a0 a1 " + w.take(8).mkString(" ")),
      2L -> (w.drop(4).mkString(" ") + " b0"))
    val merged = Dedup.crossDocSpans(d, k = 5)
      .filter(col("doc_id") === 0L).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == Seq((0L, 13L)),
      "the profile must over-merge here — that is the documented " +
        "approximation the exact operator closes")
    val exact = Dedup.crossDocExactSpans(d, k = 5)
      .filter(col("doc_id") === 0L)
      .orderBy("start_pos").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // two partner-precise maximal matches: 8 tokens with doc 1 (its
    // copy starts at token 2), 9 tokens with doc 2 (at token 0)
    assert(exact.toSeq == Seq((0L, 8L, 1L, 2L), (4L, 9L, 2L, 0L)))
  }

  test("crossDocExactSpans: matches are maximal and bidirectional; " +
    "a doc with no cross-doc shingle is absent") {
    val span = "c1 c2 c3 c4 c5 c6 c7"
    val d = docsDf(
      1L -> s"u1 u2 $span u3",
      2L -> s"$span v1 v2 v3",
      3L -> "q1 q2 q3 q4 q5 q6")
    val out = Dedup.crossDocExactSpans(d, k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 7L, 2L, 0L),
      (2L, 0L, 7L, 1L, 2L)))
  }

  test("crossDocSpanScrub: the canonical (lowest doc_id) holder keeps " +
    "the span, every other doc loses exactly its covered tokens") {
    val span = "c1 c2 c3 c4 c5 c6 c7"
    val d = docsDf(
      1L -> s"u1 u2 $span u3",
      2L -> s"$span v1 v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8",
      4L -> "x y")
    val out = Dedup.crossDocSpanScrub(d, k = 5).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, 10L, 0L, s"u1 u2 $span u3"),
      (2L, 10L, 3L, 7L, "v1 v2 v3"),
      (3L, 8L, 8L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, 2L, 2L, 0L, "x y")))
  }

  test("crossDocSpanScrub: a fully-duplicated non-canonical doc " +
    "survives as an empty row; corpus-wide exactly one copy remains") {
    val d = docsDf(
      1L -> "a b c d e f",
      2L -> "a b c d e f")
    val out = Dedup.crossDocSpanScrub(d, k = 5).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, "a b c d e f"),
      (2L, 0L, "")))
  }

  test("canonicalLineDedup keeps the FIRST occurrence, drops later " +
    "ones — within and across documents") {
    // 2-word lines; doc 1 repeats "a b" internally, doc 2 repeats it
    // again — only doc 1 pos 0 survives; unique lines all survive
    val d = docsDf(
      1L -> "a b a b c d",
      2L -> "a b e f")
    val out = TextAnalysis.canonicalLineDedup(d, lineWords = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq == Seq(
      (1L, 2L, 1L, "a b c d"),
      (2L, 1L, 1L, "e f")))
  }

  test("canonicalLineDedup: a document losing every line survives " +
    "with empty text") {
    val d = docsDf(1L -> "a b", 2L -> "a b")
    val out = TextAnalysis.canonicalLineDedup(d, lineWords = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .toSeq == Seq((1L, 1L, "a b"), (2L, 0L, "")))
  }
}
