package graft

import org.apache.spark.sql.functions._

import graft.functions.{DoubleL2, HyperplaneDot}

/** The native squared-L2 and hyperplane-dot expressions must be
  * bit-identical to the portable aggregate/zip_with folds they
  * replace — on float and double arrays, random values, length
  * mismatches, nulls, and empties, through both codegen and
  * interpreted evaluation. */
class DoubleL2Spec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260819L)
  private def vec(n: Int): Seq[Double] =
    Seq.fill(n)(rnd.nextDouble() * 4 - 2)

  test("DoubleL2: native == portable fold on random double arrays") {
    val rows = Seq.fill(300)((vec(64), vec(64))) ++
      Seq((vec(0), vec(0)), (vec(1), vec(1)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      DoubleL2(col("a"), col("b")).as("n"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("p"))
    // bit-identical, not approximately equal
    assert(both.filter(col("n") =!= col("p") ||
      col("n").isNull =!= col("p").isNull).count() == 0)
  }

  test("DoubleL2: float arrays cast exactly like the portable fold") {
    val rows = Seq.fill(50)(
      (vec(16).map(_.toFloat), vec(16)))
    val df = rows.toDF("a", "b")
    val both = df.select(
      DoubleL2(col("a"), col("b")).as("n"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v).as("p"))
    assert(both.filter(col("n") =!= col("p")).count() == 0)
  }

  test("DoubleL2: length mismatch and null element/array yield NULL " +
    "like zip_with padding") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))), // mismatch
      (Some(Seq(1.0, Double.NaN)), Some(Seq(1.0, 2.0))), // NaN is a value
      (None, Some(Seq(1.0)))) // null array
      .toDF("a", "b")
    val r = df.select(
      DoubleL2(col("a"), col("b")).as("n"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("p")).collect()
    assert(r.forall(row => row.isNullAt(0) == row.isNullAt(1)))
    // NaN propagates as a value on both paths
    assert(r.exists(row => !row.isNullAt(0) &&
      row.getDouble(0).isNaN && row.getDouble(1).isNaN))
  }

  test("HyperplaneDot: native == portable fold for j in 0..31") {
    val df = (Seq.fill(100)(vec(64)) ++ Seq(vec(0), vec(3)))
      .toDF("e")
    for (j <- Seq(0, 1, 7, 17, 31)) {
      val both = df.select(
        HyperplaneDot(col("e"), j).as("n"),
        graft.ext.Similarity.hyperplaneDotPortable(col("e"), j)
          .as("p"))
      assert(both.filter(col("n") =!= col("p")).count() == 0,
        s"mismatch at j=$j")
    }
  }

  test("KMeans dist2: native == portable against a literal centroid") {
    val cent = vec(32)
    val df = Seq.fill(100)(vec(32)).toDF("e")
    val both = df.select(
      graft.functions.DoubleL2(col("e"), typedlit(cent)).as("n"),
      graft.ext.KMeans.dist2Portable(col("e"), cent).as("p"))
    assert(both.filter(col("n") =!= col("p")).count() == 0)
  }

  test("interpreted path (direct eval) matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = vec(8); val b = vec(8)
    def litArr(v: Seq[Double]) =
      Literal(new GenericArrayData(v.toArray[Any]),
        ArrayType(DoubleType))
    val viaEval = graft.functions.DoubleL2(litArr(a), litArr(b))
      .eval(null).asInstanceOf[Double]
    val expected = a.zip(b).map { case (x, y) => (x - y) * (x - y) }
      .foldLeft(0.0)(_ + _)
    assert(viaEval == expected)
    val hEval = graft.functions.HyperplaneDot(litArr(a), 5)
      .eval(null).asInstanceOf[Double]
    val hExp = a.zipWithIndex.map { case (v, i) =>
      v * ((i * 31 + 5 * 17) % 7 - 3) }.foldLeft(0.0)(_ + _)
    assert(hEval == hExp)
  }
}
