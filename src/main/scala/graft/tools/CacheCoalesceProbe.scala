package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (r19): does
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
  * let AQE coalesce a cached plan's output partitioning in this Spark
  * version — i.e. does a cached-then-written tiny aggregate produce 1
  * size-adaptive file (like its uncached twin) or one file per
  * shuffle partition? */
object CacheCoalesceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def files(p: String): Int =
      new java.io.File(p).list().count(_.endsWith(".parquet"))
    def run(tag: String, conf: Option[String]): Unit = {
      conf.foreach(v => spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v))
      val base = spark.range(10000)
        .groupBy((col("id") % 500).as("k")).agg(count(lit(1)).as("c"))
      val uncached = s"/tmp/ccp_${tag}_u"
      base.write.mode("overwrite").parquet(uncached)
      val cached = base.cache()
      val cpath = s"/tmp/ccp_${tag}_c"
      cached.write.mode("overwrite").parquet(cpath)
      println(s"$tag: uncached=${files(uncached)} cached=${files(cpath)}")
      cached.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
    run("default", None)
    run("conf_true", Some("true"))
    spark.stop()
  }
}
