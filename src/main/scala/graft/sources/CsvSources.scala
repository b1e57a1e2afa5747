package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV sources S1/S2/S6/S7 from SURVEY.md §2.1.
  *
  * The reference declares every schema explicitly at the scan
  * (`hybrid_merger.py:44-46`, `:68-71`, `validator.py:10`) — schema-on-read
  * with a declared schema, never inference. We mirror that: explicit
  * `StructType`, `header=true` to skip the header row while imposing our own
  * names, `DROPMALFORMED` for the reference's `on_bad_lines='skip'`.
  *
  * Scale note: the reference streams ticks in 50M-row chunks
  * (`hybrid_merger.py:72`) purely as memory management; Spark's partitioned
  * file scan replaces that entirely — each ~128MB split is an independent
  * task, and column pruning (the reference's `usecols`, `:70`) happens in
  * Catalyst automatically once we `select` only the needed columns.
  */
object CsvSources {

  /** M1 history CSV schema — `hybrid_merger.py:44-46`. Prices float32. */
  val m1Schema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("Time", StringType),
    StructField("Open", FloatType),
    StructField("High", FloatType),
    StructField("Low", FloatType),
    StructField("Close", FloatType),
    StructField("TickVol", FloatType)))

  /** Raw tick CSV schema — 5 declared columns, `hybrid_merger.py:68-69`. */
  val tickSchema: StructType = StructType(Seq(
    StructField("datetime", StringType),
    StructField("ask", FloatType),
    StructField("bid", FloatType),
    StructField("av", FloatType),
    StructField("bv", FloatType)))

  /** S1: load M1 history → canonical frame
    * (datetime, open, high, low, close, volume, spread=NULL).
    * Covers P1 (two-string timestamp parse), P3 (projection), P4 (rename),
    * P5 (constant null spread) — `hybrid_merger.py:42-52`.
    */
  def loadM1(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(m1Schema).option("header", "true").csv(path)
      .select(
        to_timestamp(concat_ws(" ", col("Date"), col("Time")),
          "yyyy.MM.dd HH:mm:ss").as("datetime"),
        col("Open").as("open"),
        col("High").as("high"),
        col("Low").as("low"),
        col("Close").as("close"),
        col("TickVol").as("volume"),
        lit(null).cast(FloatType).as("spread"))

  /** S2: load raw ticks with column pruning (the reference's
    * `usecols=['datetime','ask','bid']`, `hybrid_merger.py:70`) and
    * malformed-line skipping (`:73`). Covers P2 (ISO timestamp parse).
    *
    * A `tick_id` is synthesized for deterministic first/last tie-breaks
    * on same-timestamp ticks (pandas gets this from stable row order,
    * `hybrid_merger.py:83`). It is derived from ROW CONTENT — a 60-bit
    * md5 of (datetime, ask, bid) — NOT from
    * `monotonically_increasing_id()`: the monotonic id encodes the
    * partition index, so the same file read with a different split
    * layout (multi-part CSV, different `maxPartitionBytes`, an upstream
    * `repartition`) would assign different ids and flip first/last
    * tie-breaks. The content hash is identical under any partition
    * topology; two FULLY identical tick rows share an id, which is
    * harmless for tie-breaking — either pick yields the same mid. */
  def loadTicks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(tickSchema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      .select(col("datetime"), col("ask"), col("bid"))
      .withColumn("datetime", to_timestamp(col("datetime")))
      .filter(col("datetime").isNotNull && col("ask").isNotNull &&
        col("bid").isNotNull)
      .withColumn("tick_id",
        conv(substring(md5(concat_ws("|",
          col("datetime").cast("string"), col("ask").cast("string"),
          col("bid").cast("string"))), 1, 15), 16, 10).cast("long"))

  /** S6: hybrid-output CSV scan (`validator.py:8`). */
  def loadHybrid(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("datetime", TimestampType),
      StructField("open", FloatType), StructField("high", FloatType),
      StructField("low", FloatType), StructField("close", FloatType),
      StructField("volume", FloatType), StructField("spread", FloatType),
      StructField("is_flat", ByteType)))
    spark.read.schema(schema).option("header", "true").csv(path)
  }

  /** S7: M1 scan, validator variant (`Vol` column name, `validator.py:10`). */
  def loadM1Validator(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(m1Schema.fields.map(f =>
      if (f.name == "TickVol") f.copy(name = "Vol") else f))
    spark.read.schema(schema).option("header", "true").csv(path)
      .select(
        to_timestamp(concat_ws(" ", col("Date"), col("Time")),
          "yyyy.MM.dd HH:mm:ss").as("datetime"),
        col("Close").as("m1_close"))
  }

  /** S4: main CSV sink (`hybrid_merger.py:249`). Single header CSV; the
    * `coalesce(1)` is a deliberate sink-only concession — upstream stages
    * keep their parallelism (SURVEY §6).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
