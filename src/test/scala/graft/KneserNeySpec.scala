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
  }
}
