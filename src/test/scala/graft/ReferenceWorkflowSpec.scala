package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.sources.CsvSources

/** The reference's complete user journey (`hybrid_merger.py` __main__ →
  * `run()` → CSVs; then `validator.py`): M1 history CSV + raw tick CSV in
  * the reference's exact formats → hybrid 1-minute dataset CSV + audit
  * CSV → forensic validation. A user of the reference switches to this
  * library by swapping file paths. */
class ReferenceWorkflowSpec extends SparkSpec {

  private def fixture(name: String, content: String): String =
    writeFixture("workflow", name, content)

  test("CSV-to-CSV reference workflow: load, fuse, bridge, sink, validate") {
    // M1 history (reference format: Date,Time + OHLC + TickVol) —
    // Wed 2024-01-03; covers 10:01 which the tick feed lacks
    val m1Path = fixture("m1.csv",
      """Date,Time,Open,High,Low,Close,TickVol
        |2024.01.03,10:00:00,1.000,1.020,0.990,1.010,7
        |2024.01.03,10:01:00,1.010,1.020,1.000,1.015,5
        |""".stripMargin)
    // Raw ticks (datetime,ask,bid,av,bv) incl. a malformed line, a
    // garbage quote, a weekend tick, and a gap at 10:01-10:02
    val tickPath = fixture("ticks.csv",
      """datetime,ask,bid,av,bv
        |2024-01-03 10:00:05,1.006,1.004,1,1
        |garbage line
        |2024-01-03 10:00:40,1.012,1.008,1,1
        |2024-01-03 10:00:50,0.00001,1.008,1,1
        |2024-01-06 12:00:00,1.5,1.49,1,1
        |2024-01-03 10:03:20,1.022,1.018,1,1
        |""".stripMargin)

    val m1 = CsvSources.loadM1(spark, m1Path)
      .withColumn("spread", col("spread").cast("double"))
      .select(col("datetime"),
        col("open").cast("double").as("open"),
        col("high").cast("double").as("high"),
        col("low").cast("double").as("low"),
        col("close").cast("double").as("close"),
        col("volume").cast("long").as("volume"), col("spread"))
    val ticks = CsvSources.loadTicks(spark, tickPath)
      .select(col("datetime"), col("tick_id"),
        col("ask").cast("double").as("ask"),
        col("bid").cast("double").as("bid"))

    val result = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5)

    // Sink both outputs as the reference does (S4 + S5)
    val outDir = Paths.get("target", "test-fixtures", "workflow-out")
    CsvSources.writeCsv(result.candles, outDir.resolve("hybrid").toString)
    CsvSources.writeCsv(result.audit, outDir.resolve("audit").toString)

    // Re-load the hybrid output through the validator's scan (S6)
    val hybrid = CsvSources.loadHybrid(spark,
      outDir.resolve("hybrid").toString + "/part-*.csv")
    val rows = hybrid.orderBy("datetime").collect()
    // dense minutes 10:00..10:03 (weekend + garbage ticks excluded;
    // 10:01 filled from M1; 10:02 bridged flat)
    assert(rows.map(_.getTimestamp(0)).toSeq ==
      (0 to 3).map(m => ts(s"2024-01-03 10:0$m:00")))
    assert(rows(1).getFloat(4) == 1.015f) // M1 close for tick-less 10:01
    assert(rows(2).getAs[Byte]("is_flat") == 1.toByte) // bridged gap
    assert(rows(3).getAs[Byte]("is_flat") == 0.toByte)

    // validator.py: joined closes must agree within threshold
    val validator = graft.ops.FusionOps.intersectAlign(
      hybrid.select(col("datetime"), col("close").cast("double")
        .as("new_close")),
      CsvSources.loadM1Validator(spark, m1Path)
        .select(col("datetime"), col("m1_close").cast("double")
          .as("old_close")))
      .withColumn("diff", abs(col("new_close") - col("old_close")))
      .filter(col("diff") > 0.5)
    assert(validator.count() == 0)
    result.release()
  }
}
