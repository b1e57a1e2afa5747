package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.KneserNey

/** Hand-computed Kneser-Ney pins: on corpus {"a b", "a b", "a c"}
  * the interpolated bigram model gives P(b|a) = 1.25/3 + 0.75·(2/3)·
  * (1/2) = 2/3 and P(c|a) = 0.25/3 + 0.25 = 1/3 — summing to exactly
  * 1 over the history (the property discounting must preserve). */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("bigram probabilities match the closed form and sum to 1 " +
    "over a history") {
    val d = docsOf("a b", "a b", "a c")
    val lps = KneserNey.bigramLogProbs(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(lps(("a", "b")) - math.log(2.0 / 3)) < 1e-8)
    assert(math.abs(lps(("a", "c")) - math.log(1.0 / 3)) < 1e-8)
    assert(math.abs(lps.values.map(math.exp).sum - 1.0) < 1e-8)
  }

  test("trigram KN matches the closed form: lower-order mass comes " +
    "from continuation counts, not raw bigram counts") {
    // corpus {"a b c", "a b c", "a b d"}: c3(abc)=2, c3(abd)=1,
    // ctot(ab)=3, N1+(ab·)=2; continuation bigram: N1+(·bc)=N1+(·bd)=1,
    // N1+(·b·)=2, N1+ctx(b)=2; bigram-left unigram: N1+(·c)=N1+(·d)=1
    // over 3 bigram types. P2c(c|b) = 0.25/2 + 0.75·(2/2)·(1/3) = 0.375
    // P3(c|ab) = 1.25/3 + 0.75·(2/3)·0.375 = 0.604166…
    // P3(d|ab) = 0.25/3 + 0.1875 = 0.270833…
    val d = docsOf("a b c", "a b c", "a b d")
    val lps = KneserNey.trigramLogProbs(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(3)).toMap
    assert(math.abs(lps(("a", "b", "c")) -
      math.log(1.25 / 3 + 0.75 * 2 / 3 * 0.375)) < 1e-8)
    assert(math.abs(lps(("a", "b", "d")) -
      math.log(0.25 / 3 + 0.75 * 2 / 3 * 0.375)) < 1e-8)
    // short docs keep zero rows with NULL ppl
    val short = KneserNey.trigramDocLogProb(docsOf("a b c", "a b", ""))
      .orderBy("doc_id").collect()
    assert(short.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L))
    assert(short(1).isNullAt(3) && short(2).isNullAt(3))
  }

  test("OOV serving (e238): model hits keep their KN lp, misses back " +
    "off to the continuation unigram, unknowns are excluded from the " +
    "rate") {
    // model from {"a b","a b","a c"}: bigrams (a,b) lp=ln(2/3),
    // (a,c) lp=ln(1/3); continuations {b, c} each clp=ln(1/2); "a"
    // never appears as a continuation
    val train = docsOf("a b", "a b", "a c")
    val model = KneserNey.bigramLogProbs(train)
    val cont = KneserNey.continuationUnigram(train)
    val serve = docsOf("a b", "b c", "c a", "x", "a b c a")
    val got = KneserNey.finalizeOovScores(serve,
      KneserNey.docScoresOov(serve, model, cont))
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((1L, 0L, 0L), (1L, 1L, 0L), (1L, 0L, 1L),
        (0L, 0L, 0L), (3L, 1L, 1L)))
    assert(math.abs(got(0).getDouble(5) - 1.5) < 5e-6)  // pure hit
    assert(math.abs(got(1).getDouble(5) - 2.0) < 5e-6)  // pure backoff
    // all-unk and wordless docs have no defined rate
    assert(got(2).isNullAt(5) && got(3).isNullAt(5))
    // mixed doc "a b c a": hit ln(2/3) + backoff ln(1/2), rate over
    // the 2 scored bigrams → ppl = sqrt(3)
    assert(math.abs(got(4).getDouble(4) - math.log(1.0 / 3)) < 5e-6)
    assert(math.abs(got(4).getDouble(5) - math.sqrt(3.0)) < 5e-6)
  }

  test("doc scores, perplexity, zero-rows for wordless docs, and the " +
    "median-ppl filter keeping the low-perplexity head") {
    val d = docsOf("a b", "a b", "a c", "")
    val got = KneserNey.docLogProb(d).orderBy("doc_id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L, 0L))
    assert(math.abs(got(0).getDouble(3) - 1.5) < 5e-6)   // ppl(a b)
    assert(math.abs(got(2).getDouble(3) - 3.0) < 5e-6)   // ppl(a c)
    assert(got(3).isNullAt(3) && got(3).getDouble(2) == 0.0)
    // median ppl of (1.5, 1.5, 3.0) = 1.5 → keep the two "a b" docs;
    // the wordless doc has NULL ppl and drops
    val kept = KneserNey.perplexityFilter(d, q = 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L))
    // an all-wordless corpus has no quantile: keep nothing, no NPE
    assert(KneserNey.perplexityFilter(docsOf("", "x"), q = 0.5)
      .count() == 0L)
  }
}
