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
}
