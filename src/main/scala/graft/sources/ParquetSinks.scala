package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet layout for the candle store at scale.
  *
  * The reference writes one flat CSV (`hybrid_merger.py:249`) — fine for
  * 8M rows, wrong at 100 TB. The scalable layout is hive-style
  * date-partitioned parquet (plus a symbol partition when multi-asset):
  * time-range queries prune whole directories before any IO, and each
  * day's candles form a compact, independently-rewritable unit.
  */
object ParquetSinks {

  /** Write candles partitioned by calendar day (and optional extra
    * keys). The repartition by the partition columns gives one file per
    * (day[, key]) instead of one file per task per day — the classic
    * small-files fix. */
  def writeDayPartitioned(df: DataFrame, path: String,
                          extraKeys: Seq[String] = Nil): Unit = {
    val cols = extraKeys :+ "date"
    df.withColumn("date", to_date(col("datetime")))
      .repartition(cols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(cols: _*)
      .parquet(path)
  }

  /** Read the partitioned store; date filters prune partitions before
    * the scan (verify `PartitionFilters` in the plan). */
  def readDayPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC twin of [[writeDayPartitioned]] — same hive day-partitioned
    * layout through Spark's second built-in columnar format, for
    * deployments whose lake standard is ORC. Identical pruning story:
    * date filters hit `PartitionFilters`, column pruning reaches the
    * ORC reader, and values round-trip losslessly
    * (`s8_orc_roundtrip_ohlc` proves the round-tripped candles still
    * hash-match the DuckDB oracle computed from the original
    * parquet). */
  def writeDayPartitionedOrc(df: DataFrame, path: String,
                             extraKeys: Seq[String] = Nil): Unit = {
    val cols = extraKeys :+ "date"
    df.withColumn("date", to_date(col("datetime")))
      .repartition(cols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(cols: _*)
      .orc(path)
  }

  /** Read the ORC store. */
  def readDayPartitionedOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Training-export writer: the physical counterpart of
    * [[graft.ext.Sampling.shuffleShards]]. Rows land hive-partitioned by
    * shard, one file per shard (repartition on the partition key — the
    * small-files fix), ordered by the deterministic in-shard position —
    * so a re-run on any cluster layout produces byte-identical shard
    * files, which is what makes a 100 TB export resumable and
    * verifiable. `df` must carry `shard` and `pos_in_shard`. */
  def writeShards(df: DataFrame, path: String): Unit =
    df.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos_in_shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
