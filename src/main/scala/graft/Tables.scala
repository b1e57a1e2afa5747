package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus the
  * canonical "tick frame" adapter used by the FX-pipeline queries.
  *
  * The reference pipeline (`/root/reference/src/hybrid_merger.py`) operates on
  * two feeds: a raw bid/ask tick stream and a legacy 1-minute OHLC ("M1")
  * history. The driver's `events` table plays the tick-feed role:
  * `ts` = tick datetime, `value` = price, `event_id` = unique arrival id
  * (the deterministic tie-break the reference gets for free from pandas'
  * stable ordering), `user_id`/`event_type` = partition/subset keys.
  */
object Tables {
  /** Load a driver parquet table. The physical encoding of `events.ts`
    * has changed under us across driver data regenerations, so [[load]]
    * accepts every encoding seen so far and normalizes to session-TZ
    * `TimestampType` (see [[normalizeTs]]).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ANSI division-by-zero raises in Spark 4; the reference (pandas) and
    // the DuckDB oracle both yield NULL/NaN instead — match them.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Normalize every timestamp column to µs session-TZ `TimestampType`
    * from any physical parquet encoding the driver has generated:
    *
    *  - TIMESTAMP(NANOS) `ts`, surfaced as `LongType` under the
    *    `nanosAsLong` legacy conf → integer-divide to micros (the same
    *    truncation DuckDB applies reading nanos into its µs timestamps,
    *    so oracle comparisons stay exact);
    *  - µs TIMESTAMP_NTZ (pyarrow `timestamp[us]`, no tz — the current
    *    driver encoding for `events.ts`, `lineitem.l_shipdate`,
    *    `orders.o_orderdate`) → `cast(TimestampType)`, a value-identity
    *    relabel under the UTC session timezone every entry point sets;
    *  - µs TIMESTAMP (isAdjustedToUTC) → already the target type.
    *
    * Normalizing ALL NTZ columns (not just `ts`) gives one uniform
    * engine contract — "timestamps are TimestampType" — so no seam
    * (watermark, unix_micros, getTimestamp, schema-driven profiling)
    * depends on which footer flavor the driver last wrote
    * (TestdataSchemaSpec pins the post-load schemas). Exposed
    * separately from [[load]] so a streaming scan of the same parquet
    * (which must declare the RAW schema) can apply the identical
    * normalization. Every branch is a narrow codegen'd projection:
    * stream-safe, no shuffle.
    *
    * DECIMAL columns normalize to DoubleType under the same contract
    * (VERDICT r10 #7 carryover): the reference is float64 pandas and
    * every oracle twin compares under double arithmetic, so a driver
    * regeneration that flips a numeric column (`value`, `l_quantity`,
    * `l_extendedprice`, …) to parquet DECIMAL(p,s) must not silently
    * switch the engine to Spark's decimal arithmetic (different
    * division/rounding semantics, ANSI overflow behavior) —
    * EncodingCanarySpec drives a decimal-encoded fixture through this
    * seam and the profile so the flip fails by name. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType,
      TimestampNTZType}
    val base = df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
    base.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name -> "timestamp"
      case f if f.dataType.isInstanceOf[DecimalType] => f.name -> "double"
    }.foldLeft(base) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t)) }
  }

  /** Canonical tick frame: datetime, tick_id, ask, bid.
    *
    * Bid/ask are derived deterministically from `value` with a synthetic,
    * varying spread (0.010..0.019 keyed on event_id) so that the reference's
    * spread operators (G2/G5/U3/W1, `hybrid_merger.py:98-102,204-211`) have
    * non-trivial input. Pure arithmetic — identical in Spark and DuckDB.
    */
  def ticks(spark: SparkSession, sfDir: String): DataFrame =
    ticksFromEvents(load(spark, sfDir, "events"))

  /** The events→ticks derivation of [[ticks]] over an already-loaded
    * (or streaming) events frame — single source of truth for the
    * synthetic bid/ask formula. Pure narrow projection: stream-safe. */
  def ticksFromEvents(events: DataFrame): DataFrame = {
    val halfSpread = (lit(0.01) + (col("event_id") % 10) * lit(0.001)) / 2
    events.select(
      col("ts").as("datetime"),
      col("event_id").as("tick_id"),
      (col("value") + halfSpread).as("ask"),
      (col("value") - halfSpread).as("bid"))
  }

  /** SQL twin of [[ticks]] as a DuckDB CTE body (oracle side; wrapped by
    * SparkEntry's `ticksCte` — single source of truth for the formula).
    * Literals are cast to DOUBLE: DuckDB parses bare `0.01` as DECIMAL,
    * whose arithmetic rounds differently from Spark's double literals. */
  def ticksSql: String =
    """SELECT ts AS datetime, event_id AS tick_id,
      |       value + (CAST(0.01 AS DOUBLE)
      |                + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS ask,
      |       value - (CAST(0.01 AS DOUBLE)
      |                + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS bid
      |FROM events""".stripMargin.replace("\n", " ")
}
