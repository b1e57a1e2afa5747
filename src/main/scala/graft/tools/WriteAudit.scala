package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Dedup
import graft.streaming.{StagedReplay, StreamingNearDup}

/** One-off audit for BENCHNOTES: per-batch write volume of the
  * log-structured StreamingNearDup store at sf0.01. */
object WriteAudit {
  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val walk = Files.walk(p)
      try walk.toArray.map(_.asInstanceOf[Path])
        .filter(Files.isRegularFile(_)).map(Files.size).sum
      finally walk.close()
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-write-audit").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))
    val nBatches = 8
    val scratch = Files.createTempDirectory("graft_audit").toString
    StagedReplay.stageFiles(
      (0 until nBatches).map(r =>
        d.filter(col("doc_id") % nBatches === r)),
      s"$scratch/stages")
    val work = s"$scratch/work"
    // compaction disabled so every per-batch segment survives to be
    // measured; vacuum of idx/state still runs
    val pairs = StreamingNearDup.maintain(spark, s"$scratch/stages",
      work, Dedup.buildSignatureIndex(d.limit(0), 5, 16, 2, 100),
      None, 5, 16, 2, 0.5, 100, compactEvery = 0)
    val live = pairs.count()
    val liveBytes = {
      val t = s"$scratch/live"
      pairs.write.mode("overwrite").parquet(t)
      dirBytes(Paths.get(t))
    }
    println(f"live store: $live rows, $liveBytes bytes")
    val idxBase = dirBytes(Paths.get(s"$work/idxbase_-1"))
    println(f"seed idxbase: $idxBase B (one-time)")
    (0 until nBatches).foreach { n =>
      val pl = dirBytes(Paths.get(s"$work/plog_$n"))
      val tb = dirBytes(Paths.get(s"$work/tomb_$n"))
      val ix = dirBytes(Paths.get(s"$work/idxd_$n"))
      println(f"batch $n: plog=$pl%9d B  tomb=$tb%9d B  " +
        f"idxd=$ix%9d B  " +
        f"(old design rewrote full store+index here)")
    }
    spark.stop()
  }
}
