package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DayWindows, Resample, WindowOps}

/** Skew quantification (VERDICT r6 #7): feeds a hot-minute distribution
  * (85% of 2M ticks in ONE minute) through `ohlc1min` vs
  * `ohlc1minSalted`, asserts equivalence, and RECORDS the per-stage
  * task-time skew ratio — the measurement behind SCALE.md's salting
  * claim. Also measures the window-stage skew DayWindows exists for
  * (global single-partition rolling median vs day-partitioned).
  *
  * The printed `[skew-profile]` lines are transcribed into
  * BENCHNOTES.md; the assertions pin only result equivalence and that
  * the measurement ran — wall-clock and ratios vary with the box, so
  * they are recorded, not asserted.
  */
class SkewProfileSpec extends SparkSpec {

  private class TaskCap extends SparkListener {
    val byStage = TrieMap[Int, ArrayBuffer[Long]]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null)
        byStage.getOrElseUpdate(e.stageId, ArrayBuffer()) +=
          m.executorRunTime
    }
  }

  /** Runs `body`, returning (result, wallMs, per-stage task runtimes). */
  private def measure[T](body: => T): (T, Long, Map[Int, Seq[Long]]) = {
    val cap = new TaskCap
    spark.sparkContext.addSparkListener(cap)
    val t0 = System.nanoTime()
    val r = body
    val wall = (System.nanoTime() - t0) / 1000000L
    // listener delivery is async: poll until the task count stabilizes
    var last = -1
    var n = cap.byStage.values.map(_.size).sum
    var tries = 0
    while (n != last && tries < 50) {
      last = n; Thread.sleep(100)
      n = cap.byStage.values.map(_.size).sum; tries += 1
    }
    spark.sparkContext.removeSparkListener(cap)
    (r, wall, cap.byStage.map { case (k, v) => k -> v.toSeq }.toMap)
  }

  /** (max/median task runtime within the stage holding the slowest
    * task, that slowest task's ms). A single-task stage counts — its
    * lone task IS the wall-clock floor no core count can shrink (the
    * single-partition WindowExec signature); its ratio is reported as
    * the stage's task count so the straggler is visible either way. */
  private def skewRatio(stages: Map[Int, Seq[Long]]): (Double, Long) = {
    if (stages.isEmpty) (1.0, 0L)
    else {
      val worst = stages.values.maxBy(_.max)
      val s = worst.sorted
      if (s.size == 1) (1.0, s.last)
      else (s.last.toDouble / math.max(s(s.size / 2), 1L), s.last)
    }
  }

  /** 2M ticks, 85% inside one hot minute, the rest across 24h. */
  private def hotTicks: DataFrame = {
    val base = ts("2024-01-01 00:00:00").getTime
    spark.range(2000000L).select(
      expr(s"""timestamp_millis($base +
              |  CASE WHEN id % 100 < 85 THEN 600 * 60000
              |       ELSE (id % 1440) * 60000 END +
              |  id % 60000)""".stripMargin).as("datetime"),
      col("id").as("tick_id"),
      ((col("id") % 1000).cast("double") / 100.0).as("mid"),
      lit(0.5).as("spread"))
  }

  private def canon(df: DataFrame): Array[Row] = {
    df.select(col("datetime"),
      Rounding.duckRound(col("open"), 6).as("open"),
      Rounding.duckRound(col("high"), 6).as("high"),
      Rounding.duckRound(col("low"), 6).as("low"),
      Rounding.duckRound(col("close"), 6).as("close"),
      col("volume"),
      Rounding.duckRound(col("spread"), 6).as("spread"))
      .orderBy(col("datetime")).collect()
  }
  private type Row = org.apache.spark.sql.Row

  test("hot-minute OHLC: salted == plain, task-time ratios recorded") {
    val t = hotTicks.cache()
    t.count()
    val (plainRows, wallPlain, stPlain) =
      measure(canon(Resample.ohlc1min(t)))
    val (ratioPlain, maxPlain) = skewRatio(stPlain)
    val (saltRows, wallSalt, stSalt) =
      measure(canon(Resample.ohlc1minSalted(t, 16)))
    val (ratioSalt, maxSalt) = skewRatio(stSalt)
    t.unpersist()
    assert(plainRows.length > 500, s"got ${plainRows.length} minutes")
    assert(plainRows.sameElements(saltRows),
      "salted aggregate must be value-identical to the plain one")
    info(f"[skew-profile] ohlc plain : wall ${wallPlain}ms, " +
      f"worst-stage max/median $ratioPlain%.2f (max task ${maxPlain}ms)")
    info(f"[skew-profile] ohlc salted: wall ${wallSalt}ms, " +
      f"worst-stage max/median $ratioSalt%.2f (max task ${maxSalt}ms)")
    println(f"[skew-profile] ohlc plain : wall ${wallPlain}ms " +
      f"ratio $ratioPlain%.2f maxtask ${maxPlain}ms")
    println(f"[skew-profile] ohlc salted: wall ${wallSalt}ms " +
      f"ratio $ratioSalt%.2f maxtask ${maxSalt}ms")
  }

  test("single-key window stage: day-partitioned == global, " +
    "parallelism recorded") {
    // ~15 years of 1-minute candles (the frame size WindowOps' header
    // names as the single-partition ceiling): big enough that the
    // single WindowExec task dominates the global plan
    val base = ts("2024-01-01 00:00:00").getTime
    val candles = spark.range(5500L * 1440L).select(
      expr(s"timestamp_millis($base + id * 60000)").as("datetime"),
      ((col("id") % 97).cast("double") / 10.0).as("spread"))
      .cache()
    candles.count()
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val globalDf = candles.withColumn("sm",
      WindowOps.rollingMedian5(col("spread"), Nil))
    val dayDf = DayWindows.rollingMedian5(candles, "spread", "sm")
    val (_, wallGlobal, stGlobal) = measure(sink(globalDf))
    val (_, wallDay, stDay) = measure(sink(dayDf))
    // equality, distributed (rounded: backend-identical by contract,
    // rounding only guards float ulps)
    def canonW(df: DataFrame): DataFrame = df.select(col("datetime"),
      Rounding.duckRound(col("sm"), 6).as("sm"))
    assert(canonW(globalDf).exceptAll(canonW(dayDf)).isEmpty &&
      canonW(dayDf).exceptAll(canonW(globalDf)).isEmpty,
      "day-partitioned window must equal the global one")
    candles.unpersist()
    val (rg, mg) = skewRatio(stGlobal)
    val (rd, md) = skewRatio(stDay)
    println(f"[skew-profile] window global: wall ${wallGlobal}ms " +
      f"ratio $rg%.2f maxtask ${mg}ms")
    println(f"[skew-profile] window by-day: wall ${wallDay}ms " +
      f"ratio $rd%.2f maxtask ${md}ms")
    def dump(tag: String, st: Map[Int, Seq[Long]]): Unit =
      st.toSeq.sortBy(-_._2.sum).take(4).foreach { case (sid, ds) =>
        println(s"[skew-profile] $tag stage $sid: n=${ds.size} " +
          s"sum=${ds.sum}ms max=${ds.max}ms")
      }
    dump("global", stGlobal)
    dump("by-day", stDay)
  }
}
