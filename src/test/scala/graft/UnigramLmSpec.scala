package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.UnigramLm

/** Unigram-LM trainer pins (VERDICT r14 #6 "tie/pruning specs"):
  * deterministic seed/prune tie-breaks, the alphabet-never-pruned
  * invariant, EM mass conservation, and the Viterbi longer-piece tie
  * preference on an exact dyadic tie. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("seed + prune tie-breaks are (count/prob DESC, piece ASC); " +
    "the alphabet survives pruning regardless of probability") {
    // "xy" and "yx" tie on count; with room for ONE multi, "xy" wins
    // the piece-ASC tie. 'q' appears once — its prob is far below
    // both multis, but single chars are never pruned.
    val d = docsOf("xy yx xy yx q")
    val m = UnigramLm.train(d, seedMulti = 10, emRounds = 1,
      keepMulti = 1)
    val pieces = m.pieces.map(_._1)
    assert(pieces.count(_.length > 1) == 1)
    assert(pieces.contains("xy") && !pieces.contains("yx"))
    assert(pieces.contains("q")) // alphabet never pruned
    // probabilities renormalize to 1 after the prune
    assert(math.abs(m.pieces.map(_._2).sum - 1.0) < 1e-9)
  }

  test("EM keeps probability mass on pieces that explain the corpus") {
    val d = docsOf("abc abc abc abc", "abc abc", "zz")
    val m = UnigramLm.train(d, seedMulti = 20, emRounds = 2,
      keepMulti = 8)
    val p = m.pieces.toMap
    // the whole-word piece "abc" must out-weigh any single char of it
    assert(p("abc") > p("a") && p("abc") > p("b") && p("abc") > p("c"))
    assert(math.abs(m.pieces.map(_._2).sum - 1.0) < 1e-9)
  }

  test("Viterbi prefers the LONGER piece on an exact log-prob tie") {
    // dyadic probs: lp(ab) = lp(a) + lp(b) exactly after the round-9
    // snap (0.0625 = 0.25², all powers of two) — the [ab] and [a, b]
    // segmentations tie on v, and the longer arriving piece must win
    val model = UnigramLm.Model(Seq(
      "a" -> 0.25, "b" -> 0.25, "ab" -> 0.0625,
      "c" -> 0.4375))
    val got = UnigramLm.viterbiStats(docsOf("ab"), model)
      .select(col("word"), col("n_pieces")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("ab") == 1L, "longer piece must win the tie")
  }

  test("doc serving: memo hits and inline-DP misses agree exactly " +
    "(coverage never changes results, only cost)") {
    val model = UnigramLm.Model(Seq(
      "a" -> 0.05, "b" -> 0.05, "ab" -> 0.6, "c" -> 0.3))
    val d = docsOf("abc ab c", "cab cab abc", "")
    val full = UnigramLm.servingMemo(d, model)
    def run(memo: Map[String, (Long, Double)]) =
      UnigramLm.viterbiDocStats(d, model, memo)
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val bare = run(Map.empty)            // every word via inline DP
    assert(run(full) == bare)            // every word via the memo
    assert(run(full.take(1)) == bare)    // mixed hit/miss
    // empty doc keeps a zero row
    assert(bare.last == Seq(2L, 0L, 0L, 0.0))
  }

  test("broadcast-join Viterbi equals the map-literal path exactly, " +
    "ties and OOV-null semantics included (VERDICT r15 #4)") {
    // dyadic tie (ab vs a+b) plus a no-tie segmentation, multi-word
    // docs — the join path must reproduce the literal path bit-for-bit
    val model = UnigramLm.Model(Seq(
      "a" -> 0.25, "b" -> 0.25, "ab" -> 0.0625, "c" -> 0.4375))
    val d = docsOf("ab abc cab", "ba ac b", "abcabc")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("word").collect().map(_.toSeq).toSeq
    assert(sorted(UnigramLm.viterbiStatsJoin(d, model)) ==
      sorted(UnigramLm.viterbiStats(d, model)))
  }

  test("scheduled training: one-stage schedule equals train(); a " +
    "descending schedule prunes toward the target vocab each stage") {
    val d = docsOf("abc abc ab bc", "abc ab ab c", "zz az")
    val single = UnigramLm.train(d, seedMulti = 20, emRounds = 2,
      keepMulti = 8)
    val viaSchedule = UnigramLm.trainSchedule(d, seedMulti = 20,
      schedule = Seq(2 -> 8))
    assert(single.pieces == viaSchedule.pieces)
    // two prune stages: the final vocab hits the last stage's target,
    // the alphabet survives every prune, mass renormalizes to 1
    val sched = UnigramLm.trainSchedule(d, seedMulti = 20,
      schedule = Seq(1 -> 6, 1 -> 2))
    assert(sched.pieces.count(_._1.length > 1) <= 2)
    val alphabet = d.select(explode(split(col("text"), " ")))
      .collect().flatMap(_.getString(0)).toSet.filter(_ != ' ')
    assert(alphabet.forall(ch => sched.pieces.exists(_._1 == ch.toString)))
    assert(math.abs(sched.pieces.map(_._2).sum - 1.0) < 1e-9)
  }

  test("a word with an out-of-alphabet character fails BY NAME, " +
    "never silently nulling n_pieces/best_lp (ADVICE r15)") {
    val model = UnigramLm.Model(Seq("a" -> 0.5, "b" -> 0.5))
    val ex = intercept[Exception] {
      UnigramLm.viterbiStats(docsOf("ab zb"), model).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("outside the model alphabet")),
      s"expected the named OOV error, got: $ex")
    // same guard on the doc-serving inline-DP miss branch
    val ex2 = intercept[Exception] {
      UnigramLm.viterbiDocStats(docsOf("ab zb"), model).collect()
    }
    assert(msgs(ex2).exists(_.contains("outside the model alphabet")))
  }

  test("Viterbi picks the higher-likelihood segmentation when there " +
    "is no tie, and counts pieces correctly") {
    val model = UnigramLm.Model(Seq(
      "a" -> 0.05, "b" -> 0.05, "ab" -> 0.6, "c" -> 0.3))
    val got = UnigramLm.viterbiStats(docsOf("abc cab"), model)
      .select(col("word"), col("n_pieces"), col("best_lp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    // "abc" → [ab, c] (2 pieces); "cab" → [c, ab] (2 pieces)
    assert(got.map(t => t._1 -> t._2) ==
      List("abc" -> 2L, "cab" -> 2L))
    val lpAb = Rounding.duckRoundDouble(math.log(0.6), 9)
    val lpC = Rounding.duckRoundDouble(math.log(0.3), 9)
    got.foreach(t => assert(math.abs(
      t._3 - Rounding.duckRoundDouble(lpAb + lpC, 6)) < 1e-9))
  }
}
