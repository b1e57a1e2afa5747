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
