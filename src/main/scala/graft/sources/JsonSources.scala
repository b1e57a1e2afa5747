package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source: schema-DECLARED ingestion of newline-delimited
  * JSON event logs — the third source format next to the CSV scans (S1/
  * S2) and parquet. The schema is declared, never inferred: inference
  * costs an extra full pass over 100 TB and silently widens types on
  * dirty data; a declared schema makes the scan single-pass and
  * malformed rows drop per split (same policy as the tick CSV scan).
  * Timestamps travel as explicit-format strings and parse with
  * `to_timestamp` so the JSON fixture is byte-deterministic and the
  * cross-engine parse is exact.
  */
object JsonSources {

  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Write an events frame as JSON-lines with string timestamps. */
  def writeEvents(events: DataFrame, path: String): Unit =
    events.select(col("event_id"),
        date_format(col("ts"), TsFormat).as("ts"),
        col("event_type"), col("value"))
      .coalesce(1)
      .write.mode("overwrite").json(path)

  /** Scan JSON-lines events with the declared schema; malformed lines
    * drop (DROPMALFORMED, per split — no coordination). */
  def loadEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .select(col("event_id"),
        to_timestamp(col("ts"), TsFormat).as("ts"),
        col("event_type"), col("value"))
}
