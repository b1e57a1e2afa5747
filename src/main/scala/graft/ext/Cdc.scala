package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-level change data capture: diff two versions of a
  * fingerprinted table into added / removed / changed / unchanged rows
  * — the primitive behind incremental corpus refreshes (what changed
  * since the last crawl?), dataset-version audits, and the
  * delta-dedup cadence decision (e59 reports blast radius; this
  * reports the raw churn that causes it).
  *
  * Scale shape: ONE co-partitioned full-outer equi-join on the key —
  * both sides shuffle once on the same key, AQE coalesces, and the
  * classifier is a codegen'd null/fingerprint case expression. Content
  * comparison rides the md5 fingerprint, not the payload, so wide rows
  * diff at 16 bytes a side. */
object Cdc {

  /** (key, status) for every key in either snapshot; `status` ∈
    * added | removed | changed | unchanged. Callers filter
    * `!= "unchanged"` for the change log. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.select(col("doc_id"), md5(col("text")).as("fp_old"))
    val n = newDf.select(col("doc_id"), md5(col("text")).as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("status"))
  }

  /** Apply a [[snapshotDiff]] change log to the old snapshot: drop
    * the removed/changed keys (one co-partitioned anti-join), splice
    * in the added/changed payload rows (one semi-join against the
    * new snapshot) — the MERGE half of CDC, turning a diff stream
    * back into a table. Row-for-row equal to the target snapshot by
    * construction; callers prove it cheaply with the e115 order-free
    * fingerprint instead of a row-level compare (the e148 gate does
    * exactly that). */
  def applyDiff(oldDf: DataFrame, newDf: DataFrame,
                changes: DataFrame): DataFrame = {
    val gone = changes
      .filter(col("status").isin("removed", "changed"))
      .select(col("doc_id"))
    val incoming = changes
      .filter(col("status").isin("added", "changed"))
      .select(col("doc_id"))
    oldDf.join(gone, Seq("doc_id"), "left_anti")
      .unionByName(newDf.join(incoming, Seq("doc_id"), "left_semi"))
  }
}
