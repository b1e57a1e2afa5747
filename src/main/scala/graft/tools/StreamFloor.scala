package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-harness floor probe (VERDICT r12 #6): measures what a
  * `*_replay` gate costs BEFORE any operator work — a no-op
  * AvailableNow file stream over the same 3-staged-batch fixture shape
  * every replay gate uses (stage 3 one-row files → readStream with
  * maxFilesPerTrigger=1 → foreachBatch parquet write → checkpoint →
  * await). The split between this control and a real gate's time is
  * the operator's true cost; BENCHNOTES records the numbers.
  *
  * Not a gate: run by hand via
  * `sbt "runMain graft.tools.StreamFloor [runs]"`.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(5)
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
    import spark.implicits._

    def noopReplay(tag: String): Double = {
      val scratch = graft.Scratch.fresh(s"stream_floor_$tag", "probe")
      val stages = Seq(0, 1, 2).map(i =>
        Seq((i.toLong, s"batch_$i")).toDF("id", "v"))
      graft.streaming.StagedReplay.stageFiles(stages, s"$scratch/stages")
      val t0 = System.nanoTime()
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$scratch/out_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def noopBatch(tag: String): Double = {
      val scratch = graft.Scratch.fresh(s"batch_floor_$tag", "probe")
      Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$scratch/in")
      val t0 = System.nanoTime()
      spark.read.parquet(s"$scratch/in")
        .select(col("id"), col("v"))
        .write.mode("overwrite").parquet(s"$scratch/out")
      (System.nanoTime() - t0) / 1e9
    }

    // warmup both paths once (JVM/codegen/stream-machinery startup)
    noopReplay("warm"); noopBatch("warm")
    def r3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rs = (1 to runs).map(i => noopReplay(s"r$i"))
    val bs = (1 to runs).map(i => noopBatch(s"b$i"))
    println(s"""{"probe":"stream_floor","runs":$runs,""" +
      s""""noop_replay_3batch_sec":[${rs.map(r3).mkString(",")}],""" +
      s""""noop_batch_sec":[${bs.map(r3).mkString(",")}],""" +
      s""""replay_median":${r3(rs.sorted.apply((runs - 1) / 2))},""" +
      s""""batch_median":${r3(bs.sorted.apply((runs - 1) / 2))}}""")
    spark.stop()
  }
}
