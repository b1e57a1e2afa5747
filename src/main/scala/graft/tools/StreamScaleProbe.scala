package graft.tools

import java.sql.Timestamp

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.TickPrep
import graft.streaming.{StagedReplay, StreamingPipeline}

/** Measured state-scale probe of the composed STREAMING pipeline
  * (VERDICT r15 #3 — the ScaleProbe pattern applied to the keyed
  * four-stateful-operator query): synthesizes a K-symbol tick feed
  * (identical per-symbol candle rate, so state must scale linearly in
  * K and ONLY in K), replays it through `StreamingPipeline.runKeyed`
  * at >1 state partitions, and records per-batch state-store rows /
  * bytes per stateful operator from the progress events, plus the
  * longest task from the listener.
  *
  * Feed spec (deterministic, spark.range — no driver arrays): K
  * symbols × one tick per 10 s × `spanMin` minutes starting Tue
  * 2024-01-02 09:00 UTC (inside trading hours, so F2 passes all of
  * it); mid walks ±0.002 on (sym, tick index); the M1 side is the
  * same grid at 1 row/min. Staged as `batches` in-order time slices
  * per feed + the weekday flush sentinel, maxFilesPerTrigger=1.
  *
  * Usage: `sbt "runMain graft.tools.StreamScaleProbe <workDir>
  * [keysCsv] [spanMin] [batches] [statePartitions]"` — prints a
  * markdown table per K for SCALE.md. A `keysCsv` entry of the form
  * `skew<M>` (VERDICT r17 #6, arg-gated like ScaleProbe's sections —
  * a quiesced box never re-measures recorded rows) runs the
  * DOMINANT-SKEW shape instead of a uniform K: 11 symbols where
  * `BIG` (sym 0) carries M ticks per 10 s slot and S1..S10 one each,
  * mirroring the batch keyed-dispatch probe's BIG + 10 small keys so
  * the streaming tail's straggler (max task) is measured the same
  * way. State is minute-grid-bound (keys × span), so skew moves the
  * per-batch WORK onto BIG's partition without inflating state — the
  * straggler story, isolated. */
object StreamScaleProbe {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_stream_probe")
    val keySpecs = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim).toSeq
    val spanMin = args.lift(2).map(_.toInt).getOrElse(360)
    val nBatches = args.lift(3).map(_.toInt).getOrElse(6)
    val statePartitions = args.lift(4).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        maxTaskMs.accumulateAndGet(t.taskInfo.duration, Math.max)
    })

    val t0 = Timestamp.valueOf("2024-01-02 09:00:00").getTime
    val delayMin = 5

    keySpecs.foreach { spec =>
      val skewMult = if (spec.startsWith("skew"))
        spec.drop(4).toInt else 0
      val k = if (skewMult > 0) 11 else spec.toInt
      // ---- synthesize + stage the K-symbol feeds. Uniform: one tick
      // / 10 s / sym. Skew: BIG (sym 0) gets `skewMult` ticks per
      // 10 s slot, S1..S10 (syms 1-10) one each — same minute grid
      // per key, so state scales identically and only the per-key
      // WORK is skewed.
      val slots = if (skewMult > 0) skewMult + 10 else k
      val nTicks = slots.toLong * spanMin * 6
      val symExpr = if (skewMult > 0)
        when(col("id") % slots < skewMult, lit(0L))
          .otherwise((col("id") % slots) - skewMult + 1)
      else col("id") % k
      val ticks = spark.range(nTicks).select(
        symExpr.as("sym"),
        timestamp_millis(lit(t0) +
          (col("id") / slots).cast("long") * 10000L).as("datetime"),
        col("id").as("tick_id"),
        (lit(1.10) + (col("id") % 41) * 0.0001
          + symExpr * 0.01).as("mid"))
        .withColumn("ask", col("mid") + lit(0.005))
        .withColumn("bid", col("mid") - lit(0.005))
        .drop("mid")
      val m1 = spark.range(k.toLong * spanMin).select(
        (col("id") % k).as("sym"),
        timestamp_millis(lit(t0) +
          (col("id") / k).cast("long") * 60000L + 30000L)
          .as("datetime"),
        (col("id") + 1000000000L).as("tick_id"),
        (lit(1.10) + (col("id") % 37) * 0.0001
          + (col("id") % k) * 0.01).as("mid"))
        .withColumn("spread", lit(null).cast("double"))

      val mx = t0 + spanMin.toLong * 60000L
      val flushFireMs = mx + 10 * 60000L
      val flush = new Timestamp(StreamingPipeline.weekdaySentinelMs(
        flushFireMs + (delayMin + 1440L) * 60000L))
      def sentinel(df: DataFrame) =
        df.limit(1).withColumn("datetime", lit(flush))
      val perBatch = spanMin / nBatches
      def slices(df: DataFrame) = (0 until nBatches).map { b =>
        df.filter(col("datetime") >=
          new Timestamp(t0 + b.toLong * perBatch * 60000L) &&
          col("datetime") <
            new Timestamp(t0 + (b + 1).toLong * perBatch * 60000L))
      } :+ sentinel(df)
      val tDir = StagedReplay.stageFiles(slices(ticks),
        s"$work/k${spec}_ticks")
      val mDir = StagedReplay.stageFiles(slices(m1),
        s"$work/k${spec}_m1")
      def stream(p: String) = spark.readStream
        .schema(spark.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)

      // ---- replay with RocksDB + >1 state partitions, keep the
      // query handle so progress events (state rows/bytes) survive
      val confs = Seq(
        "spark.sql.shuffle.partitions" -> statePartitions.toString,
        "spark.sql.streaming.stateStore.providerClass" ->
          ("org.apache.spark.sql.execution.streaming." +
            "state.RocksDBStateStoreProvider"),
        "spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled" -> "true")
      val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      maxTaskMs.set(0L)
      val wall0 = System.nanoTime()
      val result = StreamingPipeline.runKeyed(
        TickPrep(stream(tDir)), stream(mDir), s"$delayMin minutes",
        medianSpread = 0.01, spikeThreshold = 100.0,
        consensusThreshold = 100.0, cutoffMs = flushFireMs,
        flushFireMs = flushFireMs,
        bridgeEndMin = Math.floorDiv(mx - 60000L, 60000L))
      val q = result.writeStream
        .outputMode("append").format("memory")
        .queryName(s"probe_k$spec")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - wall0) / 1e9
      val outRows = spark.table(s"probe_k$spec").count()
      val maxTask = maxTaskMs.get() / 1e3
      prev.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None) => spark.conf.unset(c)
      }

      val label = if (skewMult > 0)
        s"K=11 DOMINANT-SKEW (BIG ${skewMult}×/slot + 10 small)"
      else s"K=$k symbols"
      println(s"\n### $label, $spanMin min span, " +
        s"$nBatches+1 batches, $statePartitions state partitions " +
        f"(wall $wall%.1f s, max task $maxTask%.2f s, $outRows rows)")
      val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
      val opNames = progress.headOption
        .map(_.stateOperators.map(_.operatorName).toSeq)
        .getOrElse(Nil)
      println(("| batch | input rows |" +:
        opNames.map(n => s" $n rows |")).mkString +
        " state MB |")
      println(("|-------|-----------|" +:
        opNames.map(_ => "---|")).mkString + "---|")
      progress.foreach { p =>
        val ops = p.stateOperators
        val mb = ops.map(_.memoryUsedBytes).sum / 1e6
        println((f"| ${p.batchId}%5d | ${p.numInputRows}%9d |" +:
          ops.map(o => f" ${o.numRowsTotal}%9d |").toSeq).mkString +
          f" $mb%8.1f |")
      }
    }
    spark.stop()
  }
}
