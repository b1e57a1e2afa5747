package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.ext.{Clustering, Dedup, KMeans, KneserNey, Packing}
import graft.ops.{AsofJoin, CleanOps, GridOps, Resample}

/** ScalaCheck property tests for the pipeline invariants the reference
  * asserts by construction (SURVEY §5): OHLC vs an in-memory reference
  * fold, post-repair candle containment, and dense-grid/flat-candle
  * invariants — over randomized tick streams. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = Timestamp.valueOf("2024-01-03 10:00:00").getTime

  private val tickGen: Gen[List[(Long, Double)]] = Gen.nonEmptyListOf(
    for {
      offsetSec <- Gen.choose(0, 600) // ten minutes of stream
      price <- Gen.choose(1.0, 100.0)
    } yield (offsetSec.toLong, price))

  private def toDf(ticks: List[(Long, Double)]) = {
    import spark.implicits._
    ticks.zipWithIndex.map { case ((off, p), i) =>
      (new Timestamp(base + off * 1000), i.toLong, p, 0.01)
    }.toDF("datetime", "tick_id", "mid", "spread")
  }

  property("ohlc1min equals an in-memory reference fold") =
    Prop.forAll(tickGen) { ticks =>
      val got = Resample.ohlc1min(toDf(ticks)).collect().map { r =>
        r.getTimestamp(0).getTime ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getLong(5)))
      }.toMap
      val expected = ticks.zipWithIndex
        .map { case ((off, p), i) => (off, i.toLong, p) }
        .groupBy { case (off, _, _) => base + (off / 60) * 60000 }
        .map { case (minute, ts) =>
          val byTime = ts.sortBy { case (off, id, _) => (off, id) }
          minute -> ((byTime.head._3,
            ts.map(_._3).max, ts.map(_._3).min,
            byTime.last._3, ts.size.toLong))
        }
      got == expected
    }

  private val candleGen = Gen.nonEmptyListOf(
    for {
      minute <- Gen.choose(0, 30)
      o <- Gen.choose(1.0, 10.0); h <- Gen.choose(1.0, 10.0)
      l <- Gen.choose(1.0, 10.0); c <- Gen.choose(1.0, 10.0)
    } yield (minute, o, h, l, c))

  property("structuralRepair restores low<=min(o,c)<=max(o,c)<=high on " +
    "arbitrary candles") = Prop.forAll(candleGen) { cs =>
    import spark.implicits._
    val df = cs.groupBy(_._1).map(_._2.head).toSeq.map {
      case (m, o, h, l, c) =>
        (new Timestamp(base + m * 60000L), o, h, l, c, 1L, 0.01)
    }.toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val repaired = CleanOps.structuralRepair(CleanOps.dropInverted(df))
    repaired.collect().forall { r =>
      val (o, h, l, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      l <= math.min(o, c) && math.max(o, c) <= h
    }
  }

  private val asofGen = for {
    lefts <- Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 2); off <- Gen.choose(0, 300)
    } yield (k, off))
    rights <- Gen.listOf(for {
      k <- Gen.choose(0, 2); off <- Gen.choose(0, 300)
    } yield (k, off))
  } yield (lefts, rights.distinct) // right unique per (key, time)

  property("asof join equals the brute-force latest-prior lookup") =
    Prop.forAll(asofGen) { case (lefts, rights) =>
      import spark.implicits._
      val l = lefts.zipWithIndex.map { case ((k, off), i) =>
        (k, new Timestamp(base + off * 1000L), i.toLong)
      }.toDF("k", "lt", "id")
      val r = rights.map { case (k, off) =>
        (k, new Timestamp(base + off * 1000L), k * 1000.0 + off)
      }.toDF("k", "rt", "rv")
      val got = AsofJoin.asof(l, r, Seq("k"), "lt", "rt", Seq("rv"))
        .collect().map(x => x.getLong(2) ->
          (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
      val expected = lefts.zipWithIndex.map { case ((k, off), i) =>
        val prior = rights.filter(rr => rr._1 == k && rr._2 <= off)
        i.toLong -> prior.sortBy(_._2).lastOption
          .map { case (rk, roff) => rk * 1000.0 + roff }
      }.toMap
      // and the tolerance form: same lookup, but a match further than
      // 60 s behind reverts to None
      val gotTol = AsofJoin.asofTolerance(l, r, Seq("k"), "lt", "rt",
        Seq("rv"), toleranceSec = 60L)
        .collect().map(x => x.getLong(2) ->
          (if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
      val expectedTol = lefts.zipWithIndex.map { case ((k, off), i) =>
        val prior = rights.filter(rr => rr._1 == k && rr._2 <= off)
        i.toLong -> prior.sortBy(_._2).lastOption
          .filter { case (_, roff) => off - roff <= 60 }
          .map { case (rk, roff) => rk * 1000.0 + roff }
      }.toMap
      got == expected && gotTol == expectedTol
    }

  private val tinyDocsGen: Gen[List[List[String]]] =
    Gen.listOfN(6, Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))

  property("decontaminate equals brute-force shingle-set intersection") =
    Prop.forAll(tinyDocsGen) { wordLists =>
      import spark.implicits._
      val docs = wordLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.decontaminate(
        docs.filter(col("doc_id") >= 2), docs.filter(col("doc_id") < 2))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def sh(ws: List[String]): Set[String] =
        if (ws.length < 5) Set.empty
        else ws.sliding(5).map(_.mkString(" ")).toSet
      val evalSh = wordLists.take(2).flatMap(sh).toSet
      val expected = wordLists.zipWithIndex.drop(2)
        .map { case (ws, i) =>
          i.toLong -> (sh(ws) & evalSh).size.toLong }
        .filter(_._2 >= 1).toMap
      got == expected
    }

  // heavy shingle collisions by construction: 4-letter vocabulary and
  // 2-word shingles, with the df cap LOW so batches flip cap status
  // constantly — the path deltaDedup must re-derive old signatures for
  private val deltaCorpusGen: Gen[(List[List[String]], List[List[String]])] =
    for {
      nOld <- Gen.choose(3, 6)
      nNew <- Gen.choose(1, 3)
      mk = Gen.choose(0, 9).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))
      old <- Gen.listOfN(nOld, mk)
      fresh <- Gen.listOfN(nNew, mk)
    } yield (old, fresh)

  property("delta == full pairs touching the batch, AND delta ∪ " +
    "compaction ∪ unaffected pre-batch == full, for any split") =
    Prop.forAll(deltaCorpusGen) { case (oldWs, newWs) =>
      import spark.implicits._
      val oldDocs = oldWs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val newDocs = newWs.zipWithIndex
        .map { case (ws, i) => ((100 + i).toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val (k, nh, rpb, minJ, maxDf) = (2, 4, 2, 0.05, 2)
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val idx = Dedup.buildSignatureIndex(oldDocs, k, nh, rpb, maxDf)
      val (dp, _) = Dedup.deltaDedup(idx, newDocs, k, nh, rpb,
        minJ, maxDf)
      val delta = pairsOf(dp)
      Dedup.releasePinnedCaches()
      val idx2 = Dedup.buildSignatureIndex(oldDocs, k, nh, rpb, maxDf)
      val comp = pairsOf(Dedup.compactionPairs(idx2, newDocs, k, nh,
        rpb, minJ, maxDf))
      Dedup.releasePinnedCaches()
      val pre = pairsOf(Dedup.minhashLshPairs(oldDocs, k, nh, rpb,
        minJ, maxDf))
      Dedup.releasePinnedCaches()
      val full = pairsOf(Dedup.minhashLshPairs(oldDocs.union(newDocs),
        k, nh, rpb, minJ, maxDf))
      Dedup.releasePinnedCaches()
      // affected old docs, derived in-memory from the raw shingles
      def sh(ws: List[List[String]], off: Int): Seq[(Long, String)] =
        ws.zipWithIndex.flatMap { case (w, i) =>
          w.sliding(k).filter(_.size == k)
            .map(s => ((off + i).toLong, s.mkString(" "))).toSeq.distinct
        }
      val oSh = sh(oldWs, 0)
      val dfo = oSh.groupBy(_._2).view.mapValues(_.size).toMap
      val dfn = (oSh ++ sh(newWs, 100)).groupBy(_._2).view
        .mapValues(_.size).toMap
      val aff = oSh.filter { case (_, s) =>
        dfo.getOrElse(s, 0) <= maxDf && dfn(s) > maxDf
      }.map(_._1).toSet
      val batchIds = newWs.indices.map(i => (100 + i).toLong).toSet
      val preUnaffected = pre.filter(p => !aff(p._1) && !aff(p._2))
      delta == full.filter(p => batchIds(p._1) || batchIds(p._2)) &&
        (delta ++ comp ++ preUnaffected) == full &&
        comp.forall(p => !batchIds(p._1) && !batchIds(p._2) &&
          (aff(p._1) || aff(p._2)))
    }

  property("sequential pair-store maintenance from an empty index " +
    "equals the one-shot full pairs, for any 3-way split") =
    Prop.forAll(deltaCorpusGen) { case (oldWs, newWs) =>
      import spark.implicits._
      // the e58 streaming loop in pure batch form: absorb random
      // batches one by one, maintaining
      //   P' = (P \ pairs-with-affected-side) ∪ delta ∪ compaction
      val (k, nh, rpb, minJ, maxDf) = (2, 4, 2, 0.05, 2)
      val all = (oldWs ++ newWs).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val allDf = all.toDF("doc_id", "text")
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      var idx = Dedup.buildSignatureIndex(allDf.limit(0), k, nh, rpb,
        maxDf)
      var store = Set.empty[(Long, Long, Double)]
      (0 until 3).foreach { r =>
        val batch = all.filter(_._1 % 3 == r).toDF("doc_id", "text")
        val step = Dedup.deltaStep(idx, batch, k, nh, rpb, minJ, maxDf)
        val aff = step.affected.collect().map(_.getLong(0)).toSet
        store = store.filter(p => !aff(p._1) && !aff(p._2)) ++
          pairsOf(step.pairs) ++ pairsOf(step.compaction)
        idx = step.updated
        Dedup.releasePinnedCaches()
      }
      val full = pairsOf(Dedup.minhashLshPairs(allDf, k, nh, rpb, minJ,
        maxDf))
      Dedup.releasePinnedCaches()
      store == full
    }

  private val edgeGen: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
    for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L)
    } yield (a, b))

  property("both connected-components backends equal a union-find " +
    "reference on random graphs") = Prop.forAll(edgeGen) { raw =>
    val edges = raw.filter { case (a, b) => a != b }.distinct
    edges.isEmpty || { // all-self-loop draws are vacuously true
      import spark.implicits._
      val df = edges.toDF("doc_a", "doc_b")
      def toMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = toMap(Clustering.connectedComponentsStar(df).collect())
      val minLabel = toMap(Clustering.connectedComponents(df).collect())
      // union-find with min-id roots
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap
      star == expected && minLabel == expected
    }
  }

  property("partial-merge maintenance equals full re-aggregation for " +
    "any split of the tick stream") = Prop.forAll(tickGen) { ticks =>
    val all = toDf(ticks)
    val a = all.filter(col("tick_id") % 2 === 0)
    val b = all.filter(col("tick_id") % 2 =!= 0)
    // spread is an average — accumulation trees differ between the
    // one-shot and merged forms, so compare it rounded (the same
    // contract the oracle gate uses); everything else is exact
    def norm(df: org.apache.spark.sql.DataFrame) = df.select(
      col("datetime"), col("open"), col("high"), col("low"),
      col("close"), col("volume"),
      Rounding.duckRound(col("spread"), 6).as("spread"))
    val merged = norm(Resample.finishPartials(Resample.mergePartials(
      Resample.ohlcPartials(a), Resample.ohlcPartials(b))))
    val full = norm(Resample.ohlc1min(all))
    merged.except(full).isEmpty && full.except(merged).isEmpty
  }

  property("packSequences equals the sequential prefix-sum reference " +
    "for any doc sizes") = Prop.forAll(
    Gen.nonEmptyListOf(Gen.choose(0L, 30L))) { sizes =>
    import spark.implicits._
    val toks = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong * 3, n) } // sparse, unsorted-safe ids
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(toks, seqLen = 16, nBuckets = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    var bef = 0L
    val expected = sizes.zipWithIndex.map { case (n, i) =>
      val e = (i.toLong * 3) -> ((bef / 16, bef % 16))
      bef += n
      e
    }.toMap
    got == expected
  }

  // integer-valued components keep every sum exact in both the engine
  // and the reference, so the duckRound contract is the only rounding
  private def dround(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  private val kmGen = for {
    n <- Gen.choose(4, 20)
    dim <- Gen.choose(2, 3)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(0, 10)))
  } yield vecs

  /** Engine-vs-reference compare for one corpus, INCLUDING the
    * documented empty-cluster re-seed rule (KMeans scaladoc /
    * VERDICT r10 #6): between iterations, each emptied cluster id
    * (ascending) re-seeds from the point FARTHEST from its assigned
    * centroid (rounded min-distance desc, vec_id asc); a cluster
    * emptying in the FINAL iteration is simply absent. The original
    * reference skipped re-seeding and was falsified by a corpus whose
    * two seed vectors were IDENTICAL (cluster 1 empties immediately)
    * — pinned below as a deterministic regression. */
  private def kmeansMatchesReference(vecs: List[List[Int]]): Boolean = {
    import spark.implicits._
    val k = 2
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val got = KMeans.centroidsFlat(df, k, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap

    def d2(v: List[Int], c: Seq[Double]): Double =
      dround(v.map(_.toDouble).zip(c)
        .map { case (x, y) => (x - y) * (x - y) }.sum)
    var cents: Seq[(Int, Seq[Double])] = vecs.zipWithIndex
      .filter(_._2 < k).map { case (v, i) => i -> v.map(_.toDouble) }
    var assign: Map[Int, Int] = Map.empty
    for (iter <- 1 to 2) {
      val cur = cents
      assign = vecs.zipWithIndex.map { case (v, i) =>
        i -> cur.map { case (cid, c) => (d2(v, c), cid) }.min._2
      }.toMap
      var next: Seq[(Int, Seq[Double])] =
        assign.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (cid, members) =>
            val ms = members.keys.toSeq.map(vecs(_))
            cid -> ms.head.indices
              .map(d => dround(ms.map(_(d).toDouble).sum / ms.size))
          }
      if (iter < 2) {
        val have = next.map(_._1).toSet
        val missing = cur.map(_._1).filterNot(have).sorted
        if (missing.nonEmpty) {
          val far = vecs.zipWithIndex
            .map { case (v, i) =>
              (cur.map { case (_, c) => d2(v, c) }.min, i)
            }
            .sortBy { case (d, i) => (-d, i) }
            .take(missing.size)
          next = (next ++ missing.zip(far).map { case (cid, (_, i)) =>
            cid -> vecs(i).map(_.toDouble).toIndexedSeq
          }).sortBy(_._1)
        }
      }
      cents = next
    }
    val sizes = assign.groupBy(_._2).map { case (c, m) => c -> m.size }
    val expected = cents.flatMap { case (cid, arr) =>
      arr.zipWithIndex.collect {
        case (v, p) if sizes.contains(cid) =>
          (cid.toLong, p.toLong) -> ((v, sizes(cid).toLong)) }
    }.toMap
    got == expected
  }

  // no shrinking: ScalaCheck's default shrinker leaves the
  // generator's support (empty / dim-1 vectors) and reports
  // counterexamples the engine legitimately rejects
  // ---- incremental KN refresh: random corpus, random batching ----
  // Words from a 5-symbol vocabulary so bigram types overlap across
  // batches (the case where additive merging can actually go wrong);
  // doc lengths 1-6 include zero-bigram docs; batches may be EMPTY.
  private val knCorpusGen: Gen[List[(Long, String, Int)]] =
    Gen.nonEmptyListOf(for {
      nw <- Gen.choose(1, 6)
      ws <- Gen.listOfN(nw, Gen.oneOf("a", "b", "c", "d", "e"))
      b <- Gen.choose(0, 2)
    } yield (ws.mkString(" "), b))
      .map(_.take(10).zipWithIndex.map {
        case ((t, b), i) => (i.toLong, t, b)
      })

  private val knPropRuns =
    new java.util.concurrent.atomic.AtomicInteger(0)

  property("incremental KN refresh equals the naive prefix retrain " +
    "at EVERY batch of a random batching (count partials are a " +
    "sufficient statistic)") =
    Prop.forAll(knCorpusGen) { docs =>
      import spark.implicits._
      val store = Scratch.fresh(
        s"kn_inc_prop_${knPropRuns.incrementAndGet()}", "prop")
      (0 until 3).forall { k =>
        val b = docs.filter(_._3 == k).map(d => (d._1, d._2))
          .toDF("doc_id", "text")
        KneserNey.refreshAndScoreIncremental(spark, b, k.toLong, store)
        val prefix = docs.filter(_._3 <= k).map(d => (d._1, d._2))
          .toDF("doc_id", "text")
        val got = spark.read.parquet(s"$store/out_$k").drop("batch")
          .orderBy("doc_id").collect().toSeq.map(_.toSeq)
        val exp = KneserNey.finalizeScores(b, KneserNey.docScores(b,
            KneserNey.bigramLogProbs(prefix)))
          .orderBy("doc_id").collect().toSeq.map(_.toSeq)
        got == exp
      }
    }

  // ---- log-structured store maintenance (StoreFs.compact): the
  // merged view must equal the naive prefix sum under ANY valid
  // interleaving of compactions and crash residue. Same 5-symbol
  // vocab (overlapping types across batches), doc lengths 2-6,
  // batches may be empty; the plan decides per batch whether to
  // compact at the inclusive horizon and whether to plant residue
  // (an already-covered partial back on disk next to the checkpoint
  // that subsumes it — the crash-between-checkpoint-and-tombstone
  // state, which mergedDirs must ignore, never double-count). ----
  private val maintPropRuns =
    new java.util.concurrent.atomic.AtomicInteger(0)

  private val storeMaintGen
      : Gen[(List[(Long, String, Int)], List[(Boolean, Boolean)])] =
    for {
      docs <- Gen.nonEmptyListOf(for {
        nw <- Gen.choose(2, 6)
        ws <- Gen.listOfN(nw, Gen.oneOf("a", "b", "c", "d", "e"))
        b <- Gen.choose(0, 3)
      } yield (ws.mkString(" "), b))
        .map(_.take(12).zipWithIndex.map {
          case ((t, b), i) => (i.toLong, t, b)
        })
      plan <- Gen.listOfN(4, for {
        c <- Gen.oneOf(true, false)
        r <- Gen.oneOf(true, false)
      } yield (c, r))
    } yield (docs, plan)

  property("a count store's merged view equals the naive prefix sum " +
    "under any interleaving of compaction and crash residue") =
    Prop.forAll(storeMaintGen) { case (docs, plan) =>
      import spark.implicits._
      val store = Scratch.fresh(
        s"storefs_prop_${maintPropRuns.incrementAndGet()}", "prop")
      val dir = s"$store/counts"
      def countsOf(b: Int) = KneserNey.bigramTypeCounts(
        docs.filter(_._3 == b).map(d => (d._1, d._2))
          .toDF("doc_id", "text"))
      var ckpt = -1L
      (0 until 4).forall { k =>
        countsOf(k).write.mode("overwrite").parquet(s"$dir/batch_$k")
        val (doCompact, doResidue) = plan(k)
        if (doResidue && ckpt >= 0)
          // the covered partial reappears with its original content
          countsOf(ckpt.toInt).write.mode("overwrite")
            .parquet(s"$dir/batch_$ckpt")
        if (doCompact) {
          KneserNey.compactCountsAt(spark, dir, Seq("w1", "w2"),
            k.toLong)
          ckpt = k.toLong
        }
        val got = KneserNey.mergedCountsAt(spark, dir,
            Seq("w1", "w2"), k.toLong)
          .orderBy("w1", "w2").collect().toSeq.map(_.toSeq)
        val exp = KneserNey.bigramTypeCounts(
            docs.filter(_._3 <= k).map(d => (d._1, d._2))
              .toDF("doc_id", "text"))
          .orderBy("w1", "w2").collect().toSeq.map(_.toSeq)
        got == exp
      }
    }

  property("kmeans equals an in-memory Lloyd reference") =
    Prop.forAllNoShrink(kmGen)(kmeansMatchesReference)

  property("kmeans re-seeds a cluster emptied by duplicate seed " +
    "vectors (the corpus that falsified the no-re-seed reference)") =
    Prop(kmeansMatchesReference(List(
      List(9, 10), List(9, 10), List(6, 7), List(7, 10), List(5, 0),
      List(5, 2), List(1, 2), List(0, 4), List(3, 4))))

  property("flatCandleBridge yields a dense unique minute grid with " +
    "flat-candle invariants") = Prop.forAll(tickGen) { ticks =>
    val candles = Resample.ohlc1min(toDf(ticks))
    val b = candles.agg(min(col("datetime")), max(col("datetime"))).head()
    val grid = GridOps.minuteGrid(spark, b.getTimestamp(0),
      b.getTimestamp(1))
    val out = GridOps.flatCandleBridge(candles, grid)
      .orderBy("datetime").collect()
    val minutes = out.map(_.getTimestamp(0).getTime)
    val dense = minutes.zip(minutes.drop(1))
      .forall { case (a, bb) => bb - a == 60000L }
    val flatsOk = out.filter(_.getAs[Int]("is_flat") == 1).forall { r =>
      r.getAs[Long]("volume") == 0L &&
        r.getAs[Double]("open") == r.getAs[Double]("close") &&
        r.getAs[Double]("high") == r.getAs[Double]("close") &&
        r.getAs[Double]("low") == r.getAs[Double]("close")
    }
    val noLeadingNull = out.forall(!_.isNullAt(4))
    dense && flatsOk && noLeadingNull && minutes.distinct.length ==
      minutes.length
  }

  property("chunkSliding covers every token with the right windows") =
    Prop.forAll(tinyDocsGen) { wordLists =>
      import spark.implicits._
      val nonEmpty = wordLists.filter(_.nonEmpty)
      val docs = nonEmpty.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val (w, s) = (4, 3)
      val got = graft.ext.TextAnalysis.chunkSliding(docs, w, s)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
          (r.getAs[Long]("n_tok"), r.getAs[String]("chunk_text")))
        .toMap
      nonEmpty.zipWithIndex.forall { case (ws, i) =>
        val starts = 0 until ws.length by s
        starts.zipWithIndex.forall { case (st, ci) =>
          val exp = ws.slice(st, st + w)
          got.get((i.toLong, ci.toLong))
            .contains((exp.length.toLong, exp.mkString(" ")))
        } && got.keys.count(_._1 == i.toLong) == starts.length
      }
    }

  property("containmentPairs equals brute-force |A∩B|/|A| over " +
    "shingle sets") = Prop.forAll(tinyDocsGen) { wordLists =>
    import spark.implicits._
    val docs = wordLists.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val k = 3
    val thr = 0.5
    val got = Dedup.containmentPairs(docs, k, thr, Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def sh(ws: List[String]): Set[String] =
      if (ws.length < k) Set.empty
      else ws.sliding(k).map(_.mkString(" ")).toSet
    val sets = wordLists.map(sh)
    val expected = (for {
      a <- sets.indices; b <- sets.indices
      if a != b && sets(a).nonEmpty
      inter = (sets(a) & sets(b)).size
      c = inter.toDouble / sets(a).size
      if inter > 0 && c >= thr
    } yield (a.toLong, b.toLong) -> c).toMap
    got == expected
  }

  private val funnelEvGen: Gen[List[(Long, Int, String)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.choose(0L, 4L)
      off <- Gen.choose(0, 1000)
      et <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (user, off, et))

  property("retention equals the brute-force cohort fold") =
    Prop.forAll(funnelEvGen) { evs =>
      import spark.implicits._
      val dayMs = 86400000L
      val df = evs.map { case (u, off, et) =>
        // spread offsets over ~3 days so cohorts and offsets vary
        (u, new Timestamp(base + off * 300000L), et, 0.0)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = graft.ext.EventAnalytics.retention(df, maxOffset = 7)
        .collect()
        .map(r => (r.getAs[Timestamp]("cohort_day").getTime,
          r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_users"))
        .toMap
      def dayOf(off: Int): Long = {
        val t = base + off * 300000L
        t - Math.floorMod(t, dayMs)
      }
      val cohort = evs.groupBy(_._1)
        .map { case (u, es) => u -> es.map(e => dayOf(e._2)).min }
      val expected = evs.map(e => (e._1, dayOf(e._2))).distinct
        .map { case (u, d) =>
          (cohort(u), ((d - cohort(u)) / dayMs).toInt) -> u }
        .filter(_._1._2 <= 7)
        .groupBy(_._1).map { case (k, us) =>
          k -> us.map(_._2).distinct.size.toLong }
      got == expected
    }

  property("rolling active users equals the brute-force window count") =
    Prop.forAll(funnelEvGen) { evs =>
      import spark.implicits._
      val dayMs = 86400000L
      val df = evs.map { case (u, off, et) =>
        (u, new Timestamp(base + off * 300000L), et, 0.0)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = graft.ext.EventAnalytics.rollingActiveUsers(df, 3)
        .collect()
        .map(r => r.getAs[Timestamp]("as_of_day").getTime ->
          r.getAs[Long]("wau")).toMap
      def dayOf(off: Int): Long = {
        val t = base + off * 300000L
        t - Math.floorMod(t, dayMs)
      }
      val active = evs.map(e => (e._1, dayOf(e._2))).distinct
      val maxDay = active.map(_._2).max
      val expected = active
        .flatMap { case (u, d) => (0 until 3).map(o => (d + o * dayMs, u)) }
        .filter(_._1 <= maxDay)
        .groupBy(_._1)
        .map { case (d, us) => d -> us.map(_._2).distinct.size.toLong }
      got == expected
    }

  property("funnel equals the brute-force per-user min-chain") =
    Prop.forAll(funnelEvGen) { evs =>
      import spark.implicits._
      val df = evs.map { case (u, off, et) =>
        (u, new Timestamp(base + off * 1000L), et, 0.0)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = graft.ext.EventAnalytics.funnel(df).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (Option(r.getAs[Timestamp]("view_ts")).map(_.getTime),
            Option(r.getAs[Timestamp]("click_ts")).map(_.getTime),
            Option(r.getAs[Timestamp]("purchase_ts")).map(_.getTime)))
        .toMap
      val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
        val t = (et: String) => es.filter(_._3 == et)
          .map(e => base + e._2 * 1000L)
        t("view").minOption.map { v =>
          val c = t("click").filter(_ >= v).minOption
          val p = c.flatMap(ct => t("purchase").filter(_ >= ct).minOption)
          u -> ((Some(v), c, p))
        }
      }
      got == expected
    }

  // WavCodec (r9): encode→decode is the identity for ANY sample
  // sequence across the full PCM16 range — no Spark involved, the
  // byte-level codec contract itself
  property("wav codec round-trips arbitrary PCM16 sequences") =
    Prop.forAll(Gen.listOf(Gen.choose(-32768, 32767))) {
      samples: List[Int] =>
        val arr = samples.toArray
        graft.ext.WavCodec
          .decodePcm16(graft.ext.WavCodec.encodePcm16(arr))
          .sameElements(arr)
    }
}
