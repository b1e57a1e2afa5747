package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.Md5Long64

/** The native one-pass Md5Long64 must be bit-identical to the portable
  * conv(substring(md5, 1, 15), 16, 10) chain — on ASCII, unicode,
  * empty, and long inputs, in codegen and interpreted evaluation, and
  * through the SQL registration. */
class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  private def inputs = Seq(
    "", "a", "hello world", "a b c d e f g h",
    "üñïçødé — 多字节 文本 🙂", "x" * 10000,
    "0", "\n\t|", "the quick brown fox jumps over the lazy dog")
    .toDF("s")

  test("native == portable chain on ascii/unicode/empty/long strings") {
    val both = inputs.select(
      Md5Long64(col("s")).as("native"),
      Dedup.md5LongPortable(col("s")).as("portable"))
    assert(both.filter(col("native") =!= col("portable")).count() == 0)
    // and non-negative 60-bit range
    assert(both.filter(col("native") < 0 ||
      col("native") >= (1L << 60)).count() == 0)
  }

  test("NULL input yields NULL, matching the portable chain") {
    val r = Seq(Option("x"), None).toDF("s")
      .select(Md5Long64(col("s")).as("n"),
        Dedup.md5LongPortable(col("s")).as("p"))
      .collect()
    assert(r.count(row => row.isNullAt(0)) == 1)
    assert(r.forall(row => row.isNullAt(0) == row.isNullAt(1)))
  }

  test("interpreted path (direct eval) matches the portable chain") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val expected = inputs.select(Dedup.md5LongPortable(col("s")))
      .collect().map(_.getLong(0)).toSeq
    val got = inputs.select(col("s")).collect().map(_.getString(0))
      .map(s => Md5Long64(Literal(s)).eval(null)).toSeq
    assert(got == expected)
  }

  test("registered as graft_md5long via SparkSessionExtensions") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val viaSql = s2.sql(
        "SELECT graft_md5long('hello world') AS h").head().getLong(0)
      val viaCol = inputs.filter(col("s") === "hello world")
        .select(Dedup.md5LongPortable(col("s"))).head().getLong(0)
      assert(viaSql == viaCol)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
