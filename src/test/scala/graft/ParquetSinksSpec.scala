package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.sources.ParquetSinks

/** Day-partitioned candle store: round-trip plus partition pruning. */
class ParquetSinksSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned write round-trips and date filters prune " +
    "partitions before the scan") {
    val out = Paths.get("target", "test-fixtures", "daystore").toString
    val candles = Seq(
      (ts("2024-01-03 10:00:00"), 1.0, 1.1, 0.9, 1.05, 3L, 0.01),
      (ts("2024-01-03 11:00:00"), 1.05, 1.2, 1.0, 1.1, 2L, 0.01),
      (ts("2024-01-04 09:30:00"), 1.1, 1.3, 1.05, 1.2, 5L, 0.02))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    ParquetSinks.writeDayPartitioned(candles, out)

    val back = ParquetSinks.readDayPartitioned(spark, out)
    assert(back.count() == 3)

    val oneDay = back.filter(col("date") === "2024-01-04")
    assert(oneDay.count() == 1)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-04"), s"no partition pruning in:\n$plan")
    // exactly one physical partition directory is read
    val scanned = oneDay.select(input_file_name()).distinct()
      .as[String].collect()
    assert(scanned.length == 1 && scanned.head.contains("date=2024-01-04"))
  }

  test("ORC day store: round-trips and prunes partitions the same way") {
    val out = Paths.get("target", "test-fixtures", "daystore_orc").toString
    val candles = Seq(
      (ts("2024-01-03 10:00:00"), 1.0, 1.1, 0.9, 1.05, 3L, 0.01),
      (ts("2024-01-04 09:30:00"), 1.1, 1.3, 1.05, 1.2, 5L, 0.02))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    ParquetSinks.writeDayPartitionedOrc(candles, out)
    val back = ParquetSinks.readDayPartitionedOrc(spark, out)
    assert(back.count() == 2)
    val oneDay = back.filter(col("date") === "2024-01-04")
    assert(oneDay.count() == 1)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-04"), s"no partition pruning in:\n$plan")
    // lossless values through the format change
    assert(oneDay.select("open", "close").as[(Double, Double)]
      .collect().head == ((1.1, 1.2)))
  }

  test("shard export: one ordered file per shard, shard dirs prune") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val docs = (0L until 200L).toDF("doc_id")
    ParquetSinks.writeShards(
      graft.ext.Sampling.shuffleShards(docs, col("doc_id"), nShards = 4),
      out)

    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    assert(back.select(col("shard")).distinct().count() == 4)
    // one physical file per shard partition
    val files = back.select(col("shard"), input_file_name()).distinct()
      .groupBy(col("shard")).count()
      .filter(col("count") > 1).count()
    assert(files == 0, "expected exactly one file per shard")
    // rows inside each shard file are stored in pos_in_shard order
    val shard0 = spark.read.parquet(s"$out/shard=0")
      .select(col("pos_in_shard")).as[Long].collect()
    assert(shard0.sameElements(shard0.sorted))
  }
}
