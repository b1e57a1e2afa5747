package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Proof of the bucketed co-located join — the scale technique that
  * removes the shuffle from a repeated big-big join entirely (SCALE.md:
  * "co-locate joins via bucketing"). Both sides are written bucketed by
  * the join key with the same bucket count, so the planner proves
  * co-partitioning from the catalog and the sort-merge join runs with
  * NO exchange on either side — at warehouse scale that is the
  * difference between re-shuffling 100 TB per run and never shuffling
  * the fact table again after ingest.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-join-key tables sort-merge-join with no shuffle") {
    val facts = (1L to 1000L).map(i => (i % 97, i, i * 1.5))
      .toDF("key", "fact_id", "amount")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("key", "name")
    spark.sql("DROP TABLE IF EXISTS graft_fact_b")
    spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    facts.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_fact_b")
    dims.write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_dim_b")

    // force the join strategy decision to SMJ (a broadcast would hide
    // the co-partitioning proof this test is about)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_fact_b")
        .join(spark.table("graft_dim_b"), "key")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      assert(joined.count() == 1000)
      assert(joined.filter(col("name") === "dim_3").count() ==
        (1L to 1000L).count(_ % 97 == 3))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    }
  }
}
