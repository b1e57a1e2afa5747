package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.{Pipeline, Tables}

/** Measured scale probe of the DayWindows claim (VERDICT r14 #4):
  * synthesizes an N× time-span replica of an sf dir's `events` table
  * (shifted whole-table copies — spec'd in TESTDATA.md §scale-probe),
  * then times every global-window pipeline stage against its
  * day-partitioned backend on the SAME candle frame, recording wall
  * time and the longest single task (the serialization evidence: a
  * global `WindowExec` collapses to ONE task regardless of cores).
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe <srcSfDir> <workDir>
  * [factor]"` — results print as a markdown table for SCALE.md.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_scale_probe")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg restricts sections ("keyed" = dominant-skew
    // keyed probe only, "uni10" = uniform-10-key discriminator only)
    // — the other sections' numbers are already in SCALE.md;
    // re-measuring them per invocation wastes a quiesced box
    val only = args.lift(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- task-skew listener: longest task + count per timed section.
    // ONE lock object shared by the listener and the timing loop (the
    // listener's own monitor and the enclosing object's are different
    // locks — ADVICE r15), and a post-action settle before read/reset:
    // the listener bus delivers task-end events asynchronously, so
    // without the drain a slow event from one timed stage could bleed
    // into the next stage's counters.
    val counterLock = new Object
    @volatile var maxTaskMs = 0L
    @volatile var nTasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        counterLock.synchronized {
          if (d > maxTaskMs) maxTaskMs = d; nTasks += 1
        }
      }
    })
    // bus drain before reading counters: LiveListenerBus HAS a
    // waitUntilEmpty, it is just private[spark] — reach it via
    // reflection (ADVICE r16: a fixed sleep can still let a loaded
    // machine bleed one stage's late task-end events into the next
    // stage's counters). Fallback to the settle sleep only if the
    // private surface ever changes shape.
    def drainBus(): Unit = {
      val drained =
        try {
          val bus = spark.sparkContext.getClass
            .getMethod("listenerBus").invoke(spark.sparkContext)
          bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
            .invoke(bus, java.lang.Long.valueOf(30000L))
          true
        } catch { case _: ReflectiveOperationException => false }
      if (!drained) Thread.sleep(300)
    }
    // force EVERY column to evaluate (a bare count() lets Catalyst
    // prune the window/ffill columns away and times an empty plan)
    def force(df: DataFrame): Long =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(sum(col("h")), count(lit(1))).head().getLong(1)
    // force + release, for sections that time whole Pipeline.run
    // results: reps must not stack the run's internal caches
    def forceRun(r: Pipeline.Result): Long = {
      val n = force(r.candles); r.release(); n
    }

    // medians-of-3 keep the table honest about JVM noise; deep-scale
    // rows (1000× keyed: ~8 min/rep) can drop to 1 reputably — at
    // that wall length the backend question is a 2-5× signal, not a
    // ±10% one (set SPARK_GRAFT_PROBE_RUNS=1)
    val probeRuns = sys.env.get("SPARK_GRAFT_PROBE_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    def timed(name: String)(f: => Long): Unit = {
      val runs = (1 to probeRuns).map { _ =>
        counterLock.synchronized { maxTaskMs = 0L; nTasks = 0 }
        val t0 = System.nanoTime()
        val n = f
        val wall = (System.nanoTime() - t0) / 1e9
        drainBus()
        val (mt, nt) = counterLock.synchronized((maxTaskMs, nTasks))
        (wall, mt / 1e3, nt, n)
      }
      val m = runs.sortBy(_._1)(Ordering.Double.TotalOrdering)
        .apply((runs.size - 1) / 2)
      println(f"| $name%-34s | ${m._1}%8.2f | ${m._2}%10.2f | ${m._3}%6d | ${m._4}%9d |")
    }

    // ---- synthesize the N× span replica (idempotent)
    val evPath = s"$work/events.parquet"
    if (!new java.io.File(evPath).exists()) {
      val ev = Tables.load(spark, src, "events")
      val spanUs = ev.agg(unix_micros(max(col("ts"))) -
        unix_micros(min(col("ts")))).head().getLong(0) +
        86400L * 1000000L
      val copies = (0 until factor).map { k =>
        ev.withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + k * spanUs))
          .withColumn("event_id",
            col("event_id") + lit(k.toLong * 1000000000L))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evPath)
    }

    val ticks = Tables.ticks(spark, work)
    val m1 = Resample.ohlc1min(
      Tables.load(spark, work, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("ts").as("datetime"),
          col("event_id").as("tick_id"), col("value").as("mid"),
          lit(null).cast("double").as("spread")))
    val tickCandles = Resample.ohlc1min(TickPrep(ticks)).cache()
    val nCandles = tickCandles.count()
    val days = tickCandles
      .select(to_date(col("datetime"))).distinct().count()
    println(s"probe: factor=$factor candles=$nCandles days=$days " +
      s"(src=$src)")
    println("| stage                              | wall s   | " +
      "max task s | tasks  | rows      |")
    println("|------------------------------------|----------|" +
      "------------|--------|-----------|")

    if (only.isEmpty) {
    // W1 spread stage: global single-task window vs (day)-parallel
    timed("W1+U3 spread: global window")(
      force(SpreadOps(tickCandles)))
    timed("W1+U3 spread: DayWindows")(
      force(SpreadOps.applyByDay(tickCandles)))
    val spreadDone = SpreadOps(tickCandles).cache()
    spreadDone.count()

    // U1+W3 repair/ffill
    timed("U1+W3 repair+ffill: global")(
      force(CleanOps.structuralRepair(CleanOps.dropInverted(spreadDone))))
    timed("U1+W3 repair+ffill: DayWindows")(
      force(CleanOps.structuralRepairByDay(
        CleanOps.dropInverted(spreadDone))))

    // F6 spike lag
    timed("F6 spike filter: global lag")(
      force(CleanOps.spikeFilter(spreadDone, 2.0)))
    timed("F6 spike filter: DayWindows lag")(
      force(CleanOps.spikeFilterByDay(spreadDone, 2.0)))

    // full composed pipeline: global, all-day, and the MIXED backend
    // (W1 day, ffill/lag/bridge global — VERDICT r15 #1, the shape the
    // r15 crossover measurement predicts wins at large spans)
    timed("pipeline run: global windows")(
      force(Pipeline.run(spark, ticks, Some(m1), 2.0, 50.0).candles))
    timed("pipeline run: DayWindows")(
      force(Pipeline.run(spark, ticks, Some(m1), 2.0, 50.0,
        dayWindows = true).candles))
    timed("pipeline run: MIXED (W1 day)")(
      force(Pipeline.run(spark, ticks, Some(m1), 2.0, 50.0,
        w1Day = Some(true)).candles))
    }

    // "keyed2" = the keyed section minus the plain-keyed row (for
    // re-runs after a measured row: the 1000× plain-keyed run costs
    // 20+ minutes of single-task straggler by itself)
    if (only.isEmpty || only.exists(_.startsWith("keyed"))) {
    // ---- keyed dominant-skew probe (VERDICT r16 #6): the per-key
    // dispatch evidence. One key ("BIG") carries the full N× span,
    // ten keys the base 1× span — the skew shape where a plain keyed
    // window serializes the dominant key's whole span into one task
    // while the small keys finish instantly. The serializing quantity
    // is therefore max-per-key (what Pipeline.dispatchRows feeds the
    // auto regimes), not the total. m1 = None: the window backends
    // are what is under test, not the consensus join. Each run is
    // released so reps don't stack caches.
    val bigTicks = Tables.ticks(spark, work)
      .withColumn("sym", lit("BIG"))
    val smallTicks = Tables.ticks(spark, src)
      .crossJoin(spark.range(1, 11).select(
        concat(lit("S"), col("id")).as("sym")))
      .select(col("datetime"), col("tick_id"), col("ask"), col("bid"),
        col("sym"))
    val kticks = bigTicks.unionByName(smallTicks)
    val keyedCandles = Resample.ohlc1min(TickPrep(kticks), Seq("sym"))
      .cache()
    keyedCandles.count()
    println(s"keyed probe: dominant-key candles = " +
      s"${Pipeline.dispatchRows(keyedCandles, Seq("sym"))}, " +
      s"total = ${keyedCandles.count()}")
    keyedCandles.unpersist()
    if (!only.contains("keyed2"))
      timed("keyed pipeline: plain keyed")(
        forceRun(Pipeline.run(spark, kticks, None, 2.0, 50.0,
          partitionBy = Seq("sym"))))
    timed("keyed pipeline: MIXED (W1 day)")(
      forceRun(Pipeline.run(spark, kticks, None, 2.0, 50.0,
        partitionBy = Seq("sym"), w1Day = Some(true))))
    timed("keyed pipeline: all (key,day)")(
      forceRun(Pipeline.run(spark, kticks, None, 2.0, 50.0,
        partitionBy = Seq("sym"), dayWindows = true)))
    timed("keyed pipeline: AUTO (per-key)")(
      forceRun(Pipeline.run(spark, kticks, None, 2.0, 50.0,
        partitionBy = Seq("sym"), autoWindows = true)))
    }

    if (only.isEmpty || only.contains("uni10")) {
    // ---- max-vs-sum DISCRIMINATOR: ten uniform keys, each carrying
    // the full N× span. The TOTAL candle count (~10 × N×span) would
    // dispatch all-day at N=100 (28 M > the 10 M boundary) while the
    // per-key max (2.8 M) correctly dispatches MIXED — so if mixed
    // beats all-day here, dispatching on the dominant key's span is
    // not just spec-pinned but measured-right where the two rules
    // disagree.
    val uni10 = Tables.ticks(spark, work)
      .crossJoin(spark.range(1, 11).select(
        concat(lit("U"), col("id")).as("sym")))
      .select(col("datetime"), col("tick_id"), col("ask"), col("bid"),
        col("sym"))
    val uniCandles = Resample.ohlc1min(TickPrep(uni10), Seq("sym"))
      .cache()
    println(s"uniform-10 probe: per-key candles = " +
      s"${Pipeline.dispatchRows(uniCandles, Seq("sym"))}, " +
      s"total = ${uniCandles.count()}")
    uniCandles.unpersist()
    timed("uniform10: MIXED (per-key rule)")(
      forceRun(Pipeline.run(spark, uni10, None, 2.0, 50.0,
        partitionBy = Seq("sym"), w1Day = Some(true))))
    timed("uniform10: all-day (total rule)")(
      forceRun(Pipeline.run(spark, uni10, None, 2.0, 50.0,
        partitionBy = Seq("sym"), dayWindows = true)))
    timed("uniform10: AUTO (per-key)")(
      forceRun(Pipeline.run(spark, uni10, None, 2.0, 50.0,
        partitionBy = Seq("sym"), autoWindows = true)))
    }

    spark.stop()
  }
}
