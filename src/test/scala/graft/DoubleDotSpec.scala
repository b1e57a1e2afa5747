package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.DoubleDot

/** Native DoubleDot expression: parity with the portable fold, null
  * semantics (NULL array / NULL element / length mismatch), mixed
  * float/double element types, and both execution paths. */
class DoubleDotSpec extends SparkSpec {
  import spark.implicits._

  test("native dot equals the portable zip_with/aggregate fold " +
    "bit-for-bit") {
    val df = (1 to 50).map { i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
        Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat))
    }.toDF("a", "b")
    val cmp = df.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotPortable($"a", $"b").as("portable"))
      .filter($"native" =!= $"portable" ||
        $"native".isNull =!= $"portable".isNull)
    assert(cmp.count() == 0)
  }

  test("null semantics mirror zip_with+aggregate: NULL array, NULL " +
    "element, and length mismatch all yield NULL") {
    def F(xs: Float*): Array[Float] = xs.toArray
    val rows = Seq(
      (F(1f, 2f), F(3f, 4f)),                     // 11.0
      (null.asInstanceOf[Array[Float]], F(1f, 2f)), // NULL array
      (F(1f, 2f, 3f), F(1f, 2f)))                  // length mismatch
      .toDF("a", "b")
    val got = rows.select(Similarity.dot($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
    // NULL element (array<double> with a null slot)
    val withNullElem = Seq(1)
      .toDF("x")
      .select(array(lit(1.0), lit(null).cast("double")).as("a"),
        array(lit(2.0), lit(3.0)).as("b"))
    assert(withNullElem.select(Similarity.dot($"a", $"b"))
      .head().isNullAt(0))
  }

  test("GraftExtensions registers graft_dot as a SQL function") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared session exists first
    // a SEPARATE session with the extensions conf (same SparkContext):
    // the function must be reachable from a plain SQL string, not just
    // the Column API. getOrCreate() returns the active session as-is,
    // so clear it for the build and restore it after — and never
    // close() s2, which would stop the shared context.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the builder-side hook behind the
      // spark.sql.extensions STATIC conf (which only applies when set at
      // SparkContext launch — a shared test context can't re-set it)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 0.5D)) AS d")
        .head().getDouble(0)
      assert(got == 4.0)
      // length mismatch → NULL through the SQL path too
      assert(s2.sql(
        "SELECT graft_dot(array(1.0D), array(1.0D, 2.0D)) AS d")
        .head().isNullAt(0))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("mixed float/double arrays and the interpreted (non-codegen) " +
    "path agree") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("f", "d")
    assert(df.select(Similarity.dot($"f", $"d")).head().getDouble(0) ==
      1.0)
    // interpreted path: nullSafeEval directly
    val e = DoubleDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5, 0.25),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 1.0)
  }
}
