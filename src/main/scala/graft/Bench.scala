package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Each query is executed through the noop datasource sink, which runs the
  * FULL physical plan (scan, shuffles, joins, windows) without collecting —
  * `count()` would let Catalyst prune projections and undercount the real
  * work. One warmup query absorbs JVM/codegen startup so per-query numbers
  * reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: run the flagship once to absorb JVM/codegen startup
    runOne("g1_g2_g3_ohlc_resample")

    // optional comma-separated query filter for local profiling; the
    // driver never sets it and always benches the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // median mode (VERDICT r8 #4): per-query MEDIAN of N runs, so a
    // round-close artifact is contention-robust by construction and
    // the r1/r2/r7-style single-run "regression" false alarms stop at
    // the source. Default 3 (VERDICT r10 #4: the box swings ±2× under
    // driver contention, so single-run artifacts flap — medians are
    // the recorded truth); set SPARK_GRAFT_BENCH_RUNS=1 for a quick
    // local profiling pass.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n)).map { n =>
      val ts = (1 to runs).map { _ =>
        val t = runOne(n)
        // release caches a query pinned (pipeline candles, shingles)
        spark.sharedState.cacheManager.clearCache()
        // and the delta-path localCheckpoint blocks, which clearCache
        // does NOT see (ADVICE r11) — the noop write above was the
        // final action on this query's frames, so they are dead here
        graft.ext.Dedup.releaseCheckpointedFrames()
        t
      }
      // any failed run fails the query — a flaky query must never
      // launder into a clean median
      n -> (if (ts.exists(_ < 0)) -1.0
            else ts.sorted.apply((ts.size - 1) / 2))
    }
    // Truncation-proof artifact: the consumer keeps only the TAIL of the
    // process output (BENCH_r04.json captured the end of the line, not
    // the start), so the ONE spec JSON line must be the LAST line printed
    // and short enough to survive a ~3 KB tail buffer — seconds rounded
    // to 3 decimals (ms precision; the raw totals are summed before
    // rounding). Failures are listed explicitly so a crashing query can
    // never make the headline total look faster. Field order is
    // TAIL-SAFE: the per-query map (the only part that grows with the
    // registry) comes FIRST on the line and the headline fields
    // (failures, total value) come LAST, so if the suite ever outgrows
    // the tail buffer it is per-query entries that truncate, never the
    // headline.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"runs":$runs,"unit":"sec","failures":[${failed.mkString(",")}],"value":${r3(total)}}"""
    println(line)
    System.out.flush()
    // The registry has outgrown the consumer's ~3 KB tail buffer: the
    // tail-safe field order above keeps the HEADLINE intact under
    // truncation, but early per-query entries can now be cut. Persist
    // the full line to a file so the complete per-query map survives
    // regardless (best-effort: a read-only cwd must not fail the
    // bench). The default path is RUN-STAMPED: the repo tracks one
    // curated quiesced BENCHFULL.json, and a contended round-close run
    // writing to a fresh BENCHFULL_<epoch>.json can never clobber it
    // (the r01/r02/r05/r06 phantom-regression pattern). Set
    // SPARK_GRAFT_BENCH_OUT to write a fixed path deliberately.
    // Run-stamped snapshots go STRAIGHT into bench_history/ (VERDICT
    // r14 hygiene: fixing the generator, not sweeping the root).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val dir = java.nio.file.Paths.get("bench_history")
      try java.nio.file.Files.createDirectories(dir)
      catch { case scala.util.control.NonFatal(_) => () }
      dir.resolve(
        s"BENCHFULL_${System.currentTimeMillis() / 1000}.json").toString
    })
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
