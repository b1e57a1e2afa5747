package graft

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.functions.BpeMergeFold

/** The native O(n) BPE merge fold must match the portable
  * aggregate/slice/concat fold element for element — on repeated-run
  * parity, null elements, empty/null arrays, space-carrying fused
  * symbols, and through both the codegen and interpreted paths — and
  * fusing the whole rule chain into one pass must reproduce the
  * checkpointed chain's bpeApply stats. */
class BpeMergeFoldSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[Seq[String]], a: String, b: String) =
    rows.toDF("w").select(
      BpeMergeFold(col("w"), a, b).as("native"),
      TextAnalysis.mergeFoldPortable(a, b).as("portable"))

  test("native == portable on plain, run-parity, and no-match arrays") {
    val rows = Seq(
      Seq("a", "b", "c"),
      Seq("a", "b", "a", "b"),
      Seq("x", "x", "x", "x", "x"), // odd run: merges at even offsets
      Seq("x", "x", "x", "x"),
      Seq("b", "a"), // reversed pair: no match
      Seq("a"), Seq("b"), Seq.empty[String])
    for ((aa, bb) <- Seq(("a", "b"), ("x", "x"), ("c", "a"))) {
      val r = both(rows, aa, bb).collect()
      assert(r.forall(row =>
        row.getSeq[String](0) == row.getSeq[String](1)),
        s"mismatch for rule ($aa, $bb)")
    }
  }

  test("fused symbols (containing spaces) chain exactly like the " +
    "portable fold — the trained-rule shape") {
    // rule 1 fuses (a, b) -> "a b"; rule 2 fuses ("a b", c)
    val rows = Seq(Seq("a", "b", "c", "a", "b"), Seq("a", "b", "b"))
    val df = rows.toDF("w")
    val nat = df
      .select(BpeMergeFold(col("w"), "a", "b").as("w"))
      .select(BpeMergeFold(col("w"), "a b", "c").as("w"))
    val por = df
      .select(TextAnalysis.mergeFoldPortable("a", "b").as("w"))
      .select(TextAnalysis.mergeFoldPortable("a b", "c").as("w"))
    assert(nat.collect().map(_.getSeq[String](0)).toSeq ==
      por.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("null elements break pairs and pass through; null array " +
    "yields null — matching the portable fold") {
    val rows = Seq(
      Seq("a", null, "b"), // null between: no merge
      Seq(null, "b", "a", "b"),
      Seq("a", "b", null),
      null.asInstanceOf[Seq[String]])
    val r = rows.toDF("w").select(
      BpeMergeFold(col("w"), "a", "b").as("native"),
      TextAnalysis.mergeFoldPortable("a", "b").as("portable"))
      .collect()
    assert(r.forall(row => row.isNullAt(0) == row.isNullAt(1)))
    assert(r.filterNot(_.isNullAt(0)).forall(row =>
      row.getSeq[String](0) == row.getSeq[String](1)))
  }

  test("random small-vocab arrays under random rules: native == " +
    "portable (both eval paths)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(20260819L)
    val vocab = Vector("a", "b", "c", "d")
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    for (_ <- 1 to 5) {
      val (aa, bb) =
        (vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))
      // codegen path (whole-stage projection)
      val r = both(rows, aa, bb).collect()
      assert(r.forall(row =>
        row.getSeq[String](0) == row.getSeq[String](1)),
        s"codegen mismatch for rule ($aa, $bb)")
      // interpreted path (direct eval on the expression)
      val expected = rows.toDF("w")
        .select(TextAnalysis.mergeFoldPortable(aa, bb))
        .collect().map(_.getSeq[String](0)).toSeq
      val got = rows.map { ws =>
        val in = new GenericArrayData(
          ws.map(UTF8String.fromString).toArray[Any])
        graft.functions.BpeMergeFold(
            Literal(in, ArrayType(StringType)), aa, bb)
          .eval(null).asInstanceOf[ArrayData]
          .toObjectArray(StringType).map(_.toString).toSeq
      }
      assert(got == expected, s"interpreted mismatch for rule ($aa, $bb)")
    }
  }

  test("bpeApply's fused single-pass chain reproduces the trained " +
    "rules' final segmentation stats") {
    val docs = Seq(
      (1L, "a b a b c a"), (2L, "a a a a"), (3L, "c"), (4L, ""),
      (5L, "a b c a b c a b c")).toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrainRules(docs, 3)
      .map { case (_, a, b, _) => (a, b) }
    val applied = TextAnalysis.bpeApply(docs, rules)
      .orderBy("doc_id").collect()
    // recompute by hand with the portable fold chain
    val w = expr("filter(split(text, ' '), x -> x != '')")
    var seqs = docs.select(col("doc_id"),
      size(w).cast("long").as("n_before"), w.as("w"))
    rules.foreach { case (a, b) =>
      seqs = seqs.select(col("doc_id"), col("n_before"),
        TextAnalysis.mergeFoldPortable(a, b).as("w"))
    }
    val want = seqs.select(col("doc_id"), col("n_before"),
        size(col("w")).cast("long").as("n_after"),
        (col("n_before") - size(col("w")).cast("long")).as("n_merged"))
      .orderBy("doc_id").collect()
    assert(applied.toSeq == want.toSeq)
  }
}
