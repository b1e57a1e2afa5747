package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Local stage-level profiling aid (not part of the driver contract):
  * times the building blocks of the heaviest bench queries one action at
  * a time. Usage: `sbt "runMain graft.Profile <sfDir>"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    // mode "q <name>": job-level anatomy of ANY registered query — a
    // listener attributes every Spark job to its submitting call site
    // and prints the per-site totals (jobs from streaming/foreachBatch
    // threads inherit the stream's site; use GRAFT_DEDUP_TIMING for
    // the delta path's per-action anatomy instead).
    if (args.lift(1).contains("q")) {
      val name = args.lift(2).getOrElse(
        sys.error("usage: graft.Profile <sfDir> q <queryName>"))
      val agg = scala.collection.mutable.Map[String, (Long, Double)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.mutable.Map[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = (j.time,
              Option(j.properties.getProperty("callSite.short"))
                .getOrElse("?"))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { case (t0, site) =>
              val sec = (j.time - t0) / 1e3
              agg.synchronized {
                val (n, su) = agg.getOrElse(site, (0L, 0.0))
                agg(site) = (n + 1, su + sec)
              }
            }
        })
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      agg.toSeq.sortBy(-_._2._2).foreach { case (site, (n, su)) =>
        println(f"[profile]   $su%7.2f s  x$n%-4d $site")
      }
      spark.stop()
      return
    }

    // mode "e58": job-level anatomy of the streaming near-dup replay —
    // a listener attributes every Spark job to its call site, so the
    // per-batch cost of each eager action in deltaStep/maintain is
    // read directly off the log (sbt "runMain graft.Profile <sf> e58")
    if (args.lift(1).contains("e58")) {
      val agg = scala.collection.mutable.Map[String, (Long, Double)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.mutable.Map[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = (j.time,
              j.stageInfos.sortBy(_.stageId).lastOption.map(_.name)
                .getOrElse("?").takeWhile(_ != '\n'))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { case (t0, site) =>
              val sec = (j.time - t0) / 1e3
              agg.synchronized {
                val (n, s) = agg.getOrElse(site, (0L, 0.0))
                agg(site) = (n + 1, s + sec)
              }
            }
        })
      val d = Tables.load(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      val scratch = graft.Scratch.fresh("neardup_stream_prof", sfDir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r => d.filter(col("doc_id") % 3 === r)),
        s"$scratch/stages")
      graft.streaming.StreamingNearDup.maintain(spark,
        s"$scratch/stages", scratch,
        Dedup.buildSignatureIndex(d.limit(0), 5, 16, 2, 100),
        None, 5, 16, 2, 0.5, 100)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] e58 total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      agg.toSeq.sortBy(-_._2._2).foreach { case (site, (n, s)) =>
        println(f"[profile]   $s%7.2f s  x$n%-4d $site")
      }
      spark.stop()
      return
    }

    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    t("rawShingles+md5 (no distinct)") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(w) - 5),
            |  i -> array_join(slice(w, i + 1, 5), ' '))""".stripMargin))
          .as("shingle"))
        .select(Dedup.md5Long(col("shingle")).as("h")).count()
    }
    t("shingleHashes (distinct)") { Dedup.shingleHashes(docs, 5).count() }
    val sh0 = Dedup.shingleHashes(docs, 5).cache()
    t("sh0 cache+count") { sh0.count() }
    val sh = Dedup.capDf(sh0, 100).cache()
    t("capDf+cache+count") { sh.count() }
    t("minhash wide") { Dedup.minhash(sh, 16).count() }
    val bands = Dedup.lshBands(Dedup.minhash(sh, 16), 16, 2)
    t("bands") { bands.count() }
    t("band self-join distinct") {
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    }
    t("intersection self-join") {
      sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }
    t("full e3") {
      Dedup.minhashLshPairs(docs, 5, 16, 2, 0.5, 100).count()
    }
    t("full e2") {
      Dedup.ngramJaccardPairs(docs, 5, 0.5, 100).count()
    }

    // e16 anatomy
    t("simhashPairs") { Dedup.simhashPairs(docs, 3).count() }
    val pairs = Dedup.simhashPairs(docs, 3)
    t("edges checkpoint") {
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .localCheckpoint().count()
    }
    val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint()
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    t("und + labels init") {
      und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")).localCheckpoint().count()
    }
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      t(s"cc round $iter") {
        val nbrMin = und
          .join(labels.select(col("id").as("src"), col("label")),
            Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("label")).as("nbr_min"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("_prev"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"))
          .localCheckpoint()
        changed = next.filter(col("label") < col("_prev")).count()
        labels = next.select(col("id"), col("label"))
        changed
      }
      iter += 1
    }
    spark.stop()
  }
}
