package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1/S5: the anomaly audit log (`hybrid_merger.py:18-36`).
  *
  * The reference snapshots offending rows plus a `reason` literal into an
  * accumulated list and writes one `*_AUDIT.csv`. In Spark each anomaly
  * class is the explicit complement of its filter (no boolean-mask side
  * effects), tagged and `unionByName`-ed — a pure plan, computed in the
  * same job as the main pipeline wherever Catalyst can share scans.
  */
object AuditOps {

  val ReasonDroppedInverted = "dropped_inverted"
  val ReasonFixedStructure = "fixed_structure_integrity"
  val ReasonDroppedSpike = "dropped_volatility_spike"
  val ReasonRejectedCatastrophe = "rejected_tick_catastrophe"
  val ReasonGapBridged = "gap_bridged_flat"

  private val auditCols =
    Seq("datetime", "open", "high", "low", "close", "volume")

  /** Tag a snapshot of offending rows with its reason (A1). Missing audit
    * columns (e.g. OHLC on a catastrophe frame) become NULL, and all value
    * columns are cast to double, so every stage's snapshot unions cleanly
    * regardless of origin (long counts, float prices). `keyCols` carries
    * the pipeline's partition keys (symbol) so keyed runs can attribute
    * every anomaly. */
  def tag(rows: DataFrame, reason: String,
          keyCols: Seq[String] = Nil): DataFrame = {
    val present = rows.columns.toSet
    val sel = keyCols.map(col) ++ (col("datetime") +: auditCols.tail.map(
      c =>
        if (present(c)) col(c).cast("double").as(c)
        else lit(null).cast("double").as(c)))
    rows.select(sel: _*).withColumn("reason", lit(reason))
  }

  /** Union the per-stage audit snapshots (S5's concat,
    * `hybrid_merger.py:30-36`). */
  def union(logs: Seq[DataFrame]): DataFrame =
    logs.reduce(_.unionByName(_))
}
