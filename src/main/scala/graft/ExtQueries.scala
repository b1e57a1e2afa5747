package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext._
import graft.streaming.{StreamingDedup, StreamingOhlc}

/** North-star extension queries (SURVEY §7 E-ops): dedup, similarity
  * search, text analysis, multimodal plumbing — each oracle-checked where
  * DuckDB can express the twin (all hashing is md5-derived for exact
  * cross-engine parity; see graft.ext.Dedup).
  */
object ExtQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** The e230/e232 scheduled unigram model, trained once per (JVM,
    * dir) like every other O(vocab) driver-state model. */
  private def schedModel(s: SparkSession, dir: String): UnigramLm.Model =
    ModelCache.cached[UnigramLm.Model](
      s"uniglm-sched|$dir|120|${unigramSchedule.mkString(";")}") {
      UnigramLm.trainSchedule(docs(s, dir), 120, unigramSchedule)
    }

  /** The e105 RRF-fused top-5 per query (lexical BM25 arm + shared
    * composed IVF-PQ vector arm), shared by the fusion gate and the
    * e111 nDCG evaluation. */
  private def rrfFused(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val queries = Seq(
      (0L, "the"), (0L, "data"),
      (1L, "spark"), (1L, "window"),
      (2L, "join"), (2L, "vector"), (2L, "stream"))
      .toDF("query_id", "term")
    val lex = Relevance.bm25TopK(docs(s, dir), queries, 10)
      .select(col("query_id"), col("doc_id"),
        col("rnk").as("r_lex"))
    val e = emb(s, dir)
    val vec = sharedIvfPq(s, dir)
      .topK(e.filter(col("vec_id") < 3), e, 10)
      .select(col("q_id").cast("long").as("query_id"),
        col("n_id").as("doc_id"), col("rank").as("r_vec"))
    def arm(r: org.apache.spark.sql.Column) =
      when(r > 0, lit(1.0) / (lit(60.0) + r)).otherwise(lit(0.0))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("r_lex", coalesce(col("r_lex"), lit(0L)))
      .withColumn("r_vec", coalesce(col("r_vec"), lit(0L)))
      .withColumn("rrf", Rounding.duckRound(
        arm(col("r_lex")) + arm(col("r_vec")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("rrf"), col("r_lex"), col("r_vec"))
  }

  /** Distinct (customer, supplier) trade memberships — the bipartite
    * graph behind e91/e107/e108. */
  private def tradePairs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
  }

  // ---- shared ANN index build (VERDICT r11 #1) -----------------------
  // The PQ-family gates (e74/e75/e76/e79/e80/e81/e83) all depend on the
  // SAME deterministic trainings; previously each retrained from
  // scratch (~35-40 s of the bench suite). A production pipeline builds
  // the index once and serves many query batches — ModelCache is the
  // in-process form of that split (training is deterministic, so a
  // cache hit is value-identical and every gate stays hash-identical;
  // keys carry dir + every hyper-parameter).
  private def sharedCentroids(s: SparkSession,
      dir: String): Seq[(Int, Seq[Double])] =
    ModelCache.cached(s"coarse|$dir|k=8|it=2")(
      KMeans.centroidArrays(emb(s, dir), 8, 2))
  private def sharedCodebooks(s: SparkSession, dir: String)
      : (IndexedSeq[Seq[(Int, Seq[Double])]], Int) =
    ModelCache.cached(s"pqcb|$dir|m=4|k=8|it=2")(
      Similarity.trainPqCodebooks(emb(s, dir), 4, 8, 2))
  private def sharedIvfPq(s: SparkSession,
      dir: String): Similarity.IvfPqModel = {
    val (cbs, l) = sharedCodebooks(s, dir)
    Similarity.IvfPqModel(sharedCentroids(s, dir), cbs, l)
  }
  private def sharedResid(s: SparkSession,
      dir: String): Similarity.IvfPqResidualModel =
    ModelCache.cached(s"ivfpqresid|$dir|ck=8|m=4|k=8|it=2")(
      Similarity.trainIvfPqResidualWith(emb(s, dir),
        sharedCentroids(s, dir), 4, 8, 2))
  private def sharedBpeRules(s: SparkSession,
      dir: String): Seq[(Long, String, String, Long)] =
    ModelCache.cached(s"bpe|$dir|merges=10")(
      TextAnalysis.bpeTrainRules(docs(s, dir), 10))
  private def sharedBpeVocab(s: SparkSession, dir: String)
      : (Long, Seq[(Long, String, String, Long, Long)]) =
    ModelCache.cached(s"bpevocab|$dir|extra=18")(
      TextAnalysis.bpeTrainToVocabDelta(docs(s, dir), 18))

  /** The sorted-neighborhood chain as DuckDB CTEs ending in
    * `snnj (doc_a, doc_b, jaccard)`: the global-row_number total order
    * (identical ranks to Spark's offset-composed form), the
    * w=3-successor candidates, and the distinct-shingle Jaccard
    * verification. Shared by e97 and the e114 linkage closure. */
  private lazy val snnCtes: String =
    """keyed AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text),
      |    '[^a-z0-9]+', ' ', 'g')) AS key
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id)
      |    AS rank
      |  FROM keyed),
      |cand AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ranked a JOIN ranked b
      |    ON b.rank - a.rank BETWEEN 1 AND 3),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, greatest(len(w) - 3, 1)),
      |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
      |        AS s
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w
      |          FROM documents) t
      |    WHERE len(w) >= 5) u),
      |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
      |  GROUP BY 1, 2),
      |snnj AS (
      |  SELECT c.doc_a, c.doc_b,
      |    coalesce(i.n_inter, 0)::DOUBLE /
      |      (coalesce(ca.n_sh, 0) + coalesce(cb.n_sh, 0)
      |        - coalesce(i.n_inter, 0)) AS jaccard
      |  FROM cand c
      |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      |  LEFT JOIN counts ca ON ca.doc_id = c.doc_a
      |  LEFT JOIN counts cb ON cb.doc_id = c.doc_b)""".stripMargin

  /** The keep-anchored debounce walked as a recursive CTE: the anchor
    * advances only on kept rows, in the same (ts, event_id) per-user
    * order as the batch fold and the streaming state. Shared by e110
    * (batch) and e112 (streaming replay). */
  private val anchoredDebounceOracle: String =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, event_id, ts, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk(user_id, rn, event_id, ts, value, kept, anchor) AS (
      |  SELECT user_id, rn, event_id, ts, value, true, epoch_us(ts)
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.rn, s.event_id, s.ts, s.value,
      |    epoch_us(s.ts) - w.anchor >= 3600::BIGINT * 1000000,
      |    CASE WHEN epoch_us(s.ts) - w.anchor
      |              >= 3600::BIGINT * 1000000
      |         THEN epoch_us(s.ts) ELSE w.anchor END
      |  FROM walk w JOIN seq s
      |    ON s.user_id = w.user_id AND s.rn = w.rn + 1)
      |SELECT user_id, event_id, ts, value FROM walk
      |WHERE kept""".stripMargin

  /** The e105 RRF fusion as DuckDB CTEs ending in
    * `fusedtop (query_id, rnk, doc_id, rrf, r_lex, r_vec)` — the
    * lexical BM25 arm (e60's machinery at k=10), the composed IVF-PQ
    * vector arm (`aranked76` at rank ≤ 10), the full-outer fuse, and
    * the rounded-score ranking. Shared by e105 and e111. */
  private lazy val rrfFusionCtes: String =
    s"""q(query_id, term) AS (VALUES
      |    (0, 'the'), (0, 'data'),
      |    (1, 'spark'), (1, 'window'),
      |    (2, 'join'), (2, 'vector'), (2, 'stream')),
      |toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
      |      AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |bstats AS (
      |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
      |btf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM toks
      |  WHERE tok IN (SELECT term FROM q) GROUP BY 1, 2),
      |bdf AS (SELECT tok, count(*) AS df FROM btf GROUP BY 1),
      |bscored AS (
      |  SELECT qq.query_id, btf.doc_id,
      |    round(sum(
      |      ln((n_docs - df + CAST(0.5 AS DOUBLE))
      |          / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
      |      * (tf * (CAST(1.2 AS DOUBLE) + 1))
      |      / (tf + CAST(1.2 AS DOUBLE)
      |         * ((1 - CAST(0.75 AS DOUBLE))
      |            + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS bm25
      |  FROM btf JOIN q qq ON btf.tok = qq.term
      |  JOIN bdf USING (tok) JOIN dl USING (doc_id)
      |  CROSS JOIN bstats
      |  GROUP BY 1, 2),
      |lexarm AS (
      |  SELECT query_id, doc_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY bm25 DESC, doc_id) AS r_lex
      |  FROM bscored QUALIFY r_lex <= 10),
      |$ivfpqScoreCtes,
      |vecarm AS (
      |  SELECT q_id AS query_id, n_id AS doc_id, rank AS r_vec
      |  FROM aranked76 WHERE rank <= 10 AND q_id < 3),
      |fused AS (
      |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
      |    coalesce(l.doc_id, v.doc_id) AS doc_id,
      |    coalesce(l.r_lex, 0) AS r_lex,
      |    coalesce(v.r_vec, 0) AS r_vec
      |  FROM lexarm l FULL OUTER JOIN vecarm v
      |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
      |srrf AS (
      |  SELECT *, round(
      |    CASE WHEN r_lex > 0 THEN
      |      CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_lex)
      |      ELSE CAST(0 AS DOUBLE) END +
      |    CASE WHEN r_vec > 0 THEN
      |      CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_vec)
      |      ELSE CAST(0 AS DOUBLE) END, 6) AS rrf
      |  FROM fused),
      |fusedtop AS (
      |  SELECT query_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, doc_id) AS rnk,
      |    doc_id, rrf, r_lex, r_vec
      |  FROM srrf QUALIFY rnk <= 5)""".stripMargin

  /** Per-scanline integer features of the closed-form synthetic
    * image pattern, evaluated directly from the formula - shared by
    * the BMP (e71) and PNG (e116) codec gates: the expected pixels
    * are identical, only the codec under test differs. */
  private lazy val imageCodecOracle: String =
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 17 AS BIGINT) AS w,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS h
        |  FROM documents),
        |yy AS (
        |  SELECT doc_id, w,
        |    unnest(generate_series(0, h - 1)) AS y
        |  FROM g),
        |xx AS (
        |  SELECT doc_id, w, y,
        |    unnest(generate_series(0, w - 1)) AS x
        |  FROM yy),
        |px AS (
        |  SELECT doc_id, y, x,
        |    (doc_id*7 + x*3 + y*5) % 256 AS r,
        |    (doc_id*11 + x + y*2) % 256 AS gg,
        |    (doc_id*13 + x*4 + y) % 256 AS b
        |  FROM xx)
        |SELECT doc_id, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(gg) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max((299*r + 587*gg + 114*b) // 1000) AS BIGINT)
        |    AS max_lum,
        |  CAST(arg_min(r*65536 + gg*256 + b, x) AS BIGINT) AS first_px,
        |  CAST(arg_max(r*65536 + gg*256 + b, x) AS BIGINT) AS last_px
        |FROM px GROUP BY 1, 2""".stripMargin

  /** The CMS heavy-hitter chain as one DuckDB query: d×w counters
    * rebuilt in SQL, est = min over rows, candidates (est ≥ t — the
    * CMS-guaranteed superset) exact-counted and flagged. Shared by the
    * batch gate (e88) and the streaming replay (e99): counts are
    * additive, so the merged per-batch cell store equals the batch
    * sketch exactly. */
  private val cmsHeavyHittersOracle: String =
    """WITH jj AS (SELECT unnest(range(0, 4)) AS j),
      |cells AS (
      |  SELECT j, ('0x' || substr(md5(concat('cms',
      |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
      |      1, 15))::BIGINT % 256 AS h,
      |    count(*) AS c
      |  FROM events, jj GROUP BY 1, 2),
      |u AS (SELECT DISTINCT user_id FROM events),
      |probe AS (
      |  SELECT user_id, j, ('0x' || substr(md5(concat('cms',
      |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
      |      1, 15))::BIGINT % 256 AS h
      |  FROM u, jj),
      |est AS (
      |  SELECT p.user_id, min(c.c) AS cms_est
      |  FROM probe p JOIN cells c USING (j, h)
      |  GROUP BY 1),
      |exact AS (SELECT user_id, count(*) AS n_events FROM events
      |          GROUP BY 1)
      |SELECT e.user_id, e.cms_est, x.n_events,
      |  x.n_events >= 75 AS is_heavy
      |FROM est e JOIN exact x USING (user_id)
      |WHERE e.cms_est >= 75""".stripMargin

  /** Distinct 60-bit hashes of 5-word shingles as a DuckDB CTE (1-based
    * list indexing; shingle SETS equal Spark's 0-based construction; the
    * hash mirrors graft.ext.Dedup.md5Long exactly), document-frequency
    * capped at 100 — the twin of Dedup.cappedShingleHashes. */
  private val shinglesCte =
    """sh0 AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, greatest(len(w) - 3, 1)),
      |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS s
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w
      |          FROM documents) t
      |    WHERE len(w) >= 5) u),
      |rare AS (SELECT h FROM sh0 GROUP BY h HAVING count(*) <= 100),
      |sh AS (SELECT sh0.doc_id, sh0.h FROM sh0 JOIN rare USING (h))""".stripMargin

  /** The e4 SimHash pair pipeline as a DuckDB CTE chain (tok → th →
    * votes → simh → chunks → pairs); `pairs` carries (doc_a, sa, doc_b,
    * sb) pre-hamming-filter. Shared by the e4 oracle and e16's
    * connected-components closure over the same graph. */
  private val simhashPairsCtes =
    """tok AS (
      |  SELECT doc_id, tok, count(*) AS n FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(string_split(text, ' '), x -> x != ''))
      |        AS tok
      |    FROM documents) t
      |  GROUP BY 1, 2),
      |th AS (
      |  SELECT doc_id, n,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
      |  FROM tok),
      |votes AS (
      |  SELECT doc_id, i, sum(n * (2 * ((h >> i) & 1) - 1)) AS v
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS i) bits
      |  GROUP BY 1, 2),
      |simh AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)
      |      AS simhash
      |  FROM votes GROUP BY 1),
      |chunks AS (
      |  SELECT doc_id, simhash, c, (simhash >> (c * 8)) & 255 AS chunk
      |  FROM simh CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS sa,
      |         y.doc_id AS doc_b, y.simhash AS sb
      |  FROM chunks x JOIN chunks y
      |    ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id)"""
      .stripMargin

  /** The e7 quality pipeline as a DuckDB CTE chain ending in `qual`
    * (doc_id, n_words, rounded ratio columns, rounded composite
    * quality), over an arbitrary (doc_id, text) source CTE/table —
    * parametrized so e237's curation chain can run it over the
    * deduped corpus. Shared by the e7 oracle and e20's per-cluster
    * canonical pick (both over `documents`). */
  private def qualityCtesFrom(src: String): String =
    s"""base AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(text, ' '), x -> x != '') AS w
      |  FROM $src),
      |stats AS (
      |  SELECT doc_id, len(w) AS n_words,
      |    length(replace(text, ' ', ''))::DOUBLE / len(w)
      |      AS avg_word_len,
      |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '',
      |      'g')))::DOUBLE / length(text) AS punct_ratio,
      |    len(list_filter(w,
      |      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))::DOUBLE
      |      / len(w) AS stopword_ratio
      |  FROM base),
      |qual AS (
      |  SELECT doc_id, n_words, round(avg_word_len, 6) AS avg_word_len,
      |    round(punct_ratio, 6) AS punct_ratio,
      |    round(stopword_ratio, 6) AS stopword_ratio,
      |    round(CAST(0.4 AS DOUBLE)
      |            * least(n_words / CAST(100 AS DOUBLE),
      |                    CAST(1.0 AS DOUBLE))
      |        + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - punct_ratio)
      |        + CAST(0.3 AS DOUBLE) * stopword_ratio, 6) AS quality
      |  FROM stats)""".stripMargin

  private val qualityCtes = qualityCtesFrom("documents")

  private val jaccardTailSql =
    """cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b
      |    ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // E1: exact dedup by content fingerprint
    "e1_dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    // E1 streaming replay (VERDICT r5 #4): the documents pushed through
    // the Structured-Streaming dedup (readStream parquet →
    // StreamingDedup.dedup → Trigger.AvailableNow → memory sink) and
    // hash-compared against the batch fingerprint-dedup oracle — the
    // same stream-to-batch convergence gate g1_streaming_replay proved
    // for the resampler. Event time is a constant (documents carry no
    // timestamp), so the streaming survivor rule (earliest ts, then min
    // doc_id) degenerates to exactly the batch min(doc_id) pick; the
    // single-file input replays as one micro-batch, matching first-
    // occurrence-wins to the batch grouping. n_copies is state the
    // append-mode stream only surfaces at TTL rollovers, so the gate
    // covers the survivor set (fp, keep_id).
    "e1_streaming_dedup_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val ins = stream.select(md5(col("text")).as("fp"),
          col("doc_id").cast("long").as("doc_id"),
          to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
        .as[StreamingDedup.DocIn]
      StreamingOhlc.replayToBatchAppend(s, StreamingDedup.dedup(ins).toDF())
        .select(col("fp"), col("doc_id").as("keep_id"))
    }),

    // E57: streaming dedup BOOTSTRAPPED from a persisted batch store —
    // the streaming face of the e51 delta story: the indexed corpus's
    // fingerprints load as a static frame, the incoming stream prunes
    // against them with a broadcast stream-static LEFT ANTI join
    // (copies of already-indexed content never reach the state store),
    // then the keyed state machine dedups within the stream itself.
    // Replay must equal the batch answer: new-batch survivors whose
    // content is absent from the old corpus.
    "e57_streaming_bootstrap_dedup_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val tmp = graft.Scratch.dir("fpstore", dir)
      docs(s, dir).filter(col("doc_id") % 10 =!= 0)
        .select(md5(col("text")).as("fp")).distinct()
        .write.mode("overwrite").parquet(tmp)
      val store = s.read.parquet(tmp)
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") % 10 === 0)
      val ins = stream.select(md5(col("text")).as("fp"),
          col("doc_id").cast("long").as("doc_id"),
          to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
        .join(broadcast(store), Seq("fp"), "left_anti")
        .as[StreamingDedup.DocIn]
      StreamingOhlc.replayToBatchAppend(s,
        StreamingDedup.dedup(ins).toDF())
        .select(col("fp"), col("doc_id").as("keep_id"))
    }),

    // E226: NATIVE streaming dedup — Spark's own
    // dropDuplicatesWithinWatermark (the functions-not-UDFs principle
    // applied to streaming state: where the built-in operator's
    // semantics fit, prefer it over custom flatMapGroupsWithState —
    // the custom StreamingDedup documents exactly why ITS semantics
    // differ). Re-deliveries of a third of the events arrive in two
    // later micro-batches; first arrivals emit immediately, the
    // duplicates drop inside the watermark, and the bounded replay
    // equals the original distinct set.
    "e226_streaming_native_dedup_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_id"), col("value")).cache()
      val dupes = ev.filter(col("event_id") % 3 === 1)
      val b = ev.agg(min(col("ts")), max(col("ts"))).head()
      val delayMin = (b.getTimestamp(1).getTime -
        b.getTimestamp(0).getTime) / 60000L + 240
      val eDir = graft.Scratch.dir("native_dedup", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(ev, dupes, dupes), eDir)
      val stream = s.readStream
        .schema(s.read.parquet(eDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(eDir)
        .withWatermark("ts", s"$delayMin minutes")
        .dropDuplicatesWithinWatermark("event_id")
      graft.streaming.StreamingOhlc
        .replayWithStatePartitions(s, stream, 8)
    }),

    // E227: UNIGRAM-LM tokenizer training (VERDICT r14 #6;
    // Kudo 2018, SentencePiece's model family) — the other mainstream
    // LLM tokenizer next to BPE (e34/e173/e195): seed vocab = alphabet
    // + top-120 substrings (≤3 chars) by corpus count, TWO soft-EM
    // rounds (forward-backward expected counts over ALL segmentations
    // — no argmax, no ties), one prune to alphabet + top-48 multis,
    // renormalized. Oracle unrolls the identical EM in SQL: the α/β
    // DPs as recursive CTEs carrying a 3-wide window, the same
    // summation shapes, round-6 expected counts, round-12 probs.
    // Model state is O(vocab) on the driver (ModelCache-shared with
    // e228's Viterbi serving half and e62's scoring shape).
    "e227_unigram_lm_train" -> ((s, dir) =>
      UnigramLm.trainedModel(docs(s, dir), seedMulti = 120,
        emRounds = 2, keepMulti = 48)),

    // E228: Viterbi segmentation with the e227 model (the serving
    // half): per distinct word, the best log-likelihood and its piece
    // count. Log-probs snap to 9 decimals BEFORE the DP so every
    // comparison is bit-identical across engines (ln() can differ by
    // an ulp); ties prefer the longer arriving piece (spec-pinned).
    // Model trained once per JVM via ModelCache.
    "e228_unigram_lm_viterbi" -> ((s, dir) => {
      val model = ModelCache.cached[UnigramLm.Model](
        s"uniglm|$dir|120|2|48") {
        UnigramLm.train(docs(s, dir), seedMulti = 120, emRounds = 2,
          keepMulti = 48)
      }
      UnigramLm.viterbiStats(docs(s, dir), model)
    }),

    // E229: streaming tokenizer SERVING (the e94 pattern for the
    // text family): the e227 model trains once (ModelCache, O(vocab)
    // driver state), then a document stream is scored STATELESSLY —
    // the per-word Viterbi DP runs inside a codegen'd transform/
    // aggregate fold over each doc's word array, zero state stores,
    // so a bounded replay trivially equals batch. Per-word scores
    // snap to 6 decimals before the doc sum (the fold is array-
    // ordered; the oracle's SQL sum is not — round-6 on both).
    "e229_unigram_streaming_serve_replay" -> ((s, dir) => {
      val model = ModelCache.cached[UnigramLm.Model](
        s"uniglm|$dir|120|2|48") {
        UnigramLm.train(docs(s, dir), seedMulti = 120, emRounds = 2,
          keepMulti = 48)
      }
      // serving memo: per-word stats computed ONCE at train time —
      // O(vocab) driver state; the stream pays map lookups, never
      // the interpreted per-occurrence DP (see viterbiDocStats)
      val memo = ModelCache.cached[Map[String, (Long, Double)]](
        s"uniglm-memo|$dir|120|2|48") {
        UnigramLm.servingMemo(docs(s, dir), model)
      }
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      StreamingOhlc.replayToBatchAppend(s,
        UnigramLm.viterbiDocStats(stream, model, memo))
    }),

    // E230: unigram-LM training to a TARGET VOCAB via the full
    // SentencePiece-style loop (VERDICT r15 #4, the e195/e203 BPE
    // analogue): three EM+prune stages walk the multi-piece vocab
    // 120 → 72 → 48 → 32, renormalizing after every prune; the
    // alphabet is never prunable. Oracle = the same schedule unrolled
    // in SQL (per stage: recursive α/β CTEs, round-6 expected counts,
    // round-12 probs, rank-prune + renorm).
    "e230_unigram_target_vocab" -> ((s, dir) =>
      UnigramLm.modelFrame(docs(s, dir), schedModel(s, dir))),

    // E232: Viterbi serving with the model entering the plan as a
    // BROADCAST JOIN instead of a typedLit map (VERDICT r15 #4's
    // production-vocab shape: a 32k-piece literal bloats the constant
    // pool/codegen; the join ships the model once per executor and
    // each word carries an O(len×3) lp array into the SAME DP fold).
    // Runs on the e230 scheduled model; the oracle is the e228
    // Viterbi chain over the scheduled model CTEs — the literal and
    // join paths are additionally pinned hash-identical in
    // UnigramLmSpec.
    "e232_unigram_viterbi_join" -> ((s, dir) =>
      UnigramLm.viterbiStatsJoin(docs(s, dir), schedModel(s, dir))),

    // E58: STREAMING near-dup — the delta-dedup SignatureIndex wired
    // into the streaming path (VERDICT r7 #3, closing the last
    // batch/streaming asymmetry): a document stream replayed as three
    // staged micro-batches (StagedReplay, one file per trigger)
    // maintains a persisted near-dup PAIR STORE via foreachBatch — per
    // batch, one Dedup.deltaStep against the evolving index, then the
    // store update rule the DeltaDedupSpec union identity licenses:
    //   P' = (P \ pairs-with-affected-side) ∪ delta ∪ compaction
    // with index and store round-tripped through parquet between
    // batches (store-faithful, lineage-truncated — the daily
    // operational loop, just at micro-batch cadence). Starting from an
    // EMPTY index, induction over the identity makes the final store
    // exactly the FULL-CORPUS e3 pairs — so this replay shares e3's
    // oracle verbatim: three incremental absorptions, hash-identical
    // to the one-shot batch operator.
    "e58_streaming_neardup_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("neardup_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r => d.filter(col("doc_id") % 3 === r)),
        s"$scratch/stages")
      graft.streaming.StreamingNearDup.maintain(s, s"$scratch/stages",
        scratch, Dedup.buildSignatureIndex(d.limit(0), 5, 16, 2, 100),
        None, 5, 16, 2, 0.5, 100)
    }),

    // E59: compaction cadence observability (VERDICT r7 #4) — the ONE
    // row a store operator schedules compactionPairs by: how many
    // shingles a prospective batch pushes over the df cap, how many
    // OLD documents those flips touch, and the blast radius as a
    // corpus fraction. No candidate generation, no verification — batch
    // shingling plus one broadcast store probe.
    "e59_compaction_cadence" -> ((s, dir) => {
      val d = docs(s, dir)
      val idx = Dedup.buildSignatureIndex(
        d.filter(col("doc_id") % 10 =!= 0), 5, 16, 2, 100)
      Dedup.deltaStats(idx, d.filter(col("doc_id") % 10 === 0), 5, 100)
    }),

    // E2: n-gram Jaccard near-dup pairs (shingle join prunes all-pairs;
    // df cap bounds the per-shingle-key join blowup).
    // NOTE capped-set semantics: with maxDf=100, shingles occurring in
    // >100 documents are excluded BEFORE any similarity math, so the
    // reported `jaccard` is over the df-capped shingle sets, not the raw
    // sets — it shifts with corpus composition. Identical on both
    // engines (the oracle mirrors the cap); consumers wanting raw-set
    // Jaccard should call Dedup.ngramJaccardPairs with maxDf=MaxValue.
    "e2_dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), 5, 0.5, 100)),

    // E3: MinHash + LSH banding, exact-Jaccard verified (same df-capped
    // jaccard semantics as e2 — see the note there)
    "e3_dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), 5, 16, 2, 0.5, 100)),

    // E70: MEASURED LSH recall against the exact ground truth — the
    // dedup-path twin of the e52 ANN recall gate ("recall measured,
    // not asserted"). e3's banding+verify pairs are a subset of e2's
    // exact capped-Jaccard pairs at the same threshold (verification
    // makes precision 1.0 by construction); the one observability row
    // a pipeline tunes numHashes/rowsPerBand by is how many true pairs
    // banding actually surfaced. Both pair sets are bucketed
    // equi-joins; the counts are 1-row aggregates.
    "e70_lsh_dedup_recall" -> ((s, dir) => {
      val d = docs(s, dir)
      // ONE exact verification serves both sides: e3's verification
      // makes LSH precision 1.0 by construction, so the verified-LSH
      // pair set IS exact ∩ band-candidates — re-running the quadratic
      // shingle intersection for the LSH side would recompute a known
      // subset (the oracle runs both full chains and agrees). The
      // capped shingle frame is plan-identical across the two calls,
      // so the CacheManager shares one copy. `exact` is consumed
      // twice (its count + the intersection) → eagerly materialized.
      val exact = Dedup.ngramJaccardPairs(d, 5, 0.5, 100)
        .select(col("doc_a"), col("doc_b")).cache()
      exact.count()
      val both = exact.join(Dedup.lshCandidatePairs(d, 5, 16, 2, 100),
        Seq("doc_a", "doc_b"), "left_semi").cache()
      both.count()
      val nE = exact.agg(count(lit(1)).as("n_exact"))
      // |verified-LSH| ≡ |exact ∩ candidates| (precision 1.0)
      val nL = both.agg(count(lit(1)).as("n_lsh"))
      val nB = both.agg(count(lit(1)).as("n_both"))
      // pins released by the harness's post-query clearCache (the
      // e2/e3 pattern — the returned plan still rides the caches)
      nE.crossJoin(nL).crossJoin(nB)
        .withColumn("recall",
          when(col("n_exact") > 0, Rounding.duckRound(
            col("n_both").cast("double") / col("n_exact"), 6))
            .otherwise(lit(0.0)))
    }),

    // E51: incremental (delta) dedup against a PERSISTED signature
    // index — the daily 100 TB operational mode. The "old corpus"
    // (doc_id % 10 != 0) is indexed, written to parquet, and reopened;
    // the "new batch" (doc_id % 10 == 0) is then deduped against the
    // store without re-shingling the corpus, including the corpus-wide
    // df-cap re-evaluation (a batch shingle can push an old shingle
    // over the cap, changing OLD docs' signatures — deltaDedup
    // recomputes exactly those). Oracle: the full-corpus e3 pipeline
    // restricted to pairs touching the batch — delta == full, the
    // dedup twin of g8's merge == full candle contract.
    "e51_delta_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val tmp = graft.Scratch.dir("sigidx", dir)
      Dedup.buildSignatureIndex(d.filter(col("doc_id") % 10 =!= 0),
        5, 16, 2, 100).write(tmp)
      Dedup.releasePinnedCaches()
      val idx = Dedup.SignatureIndex.read(s, tmp)
      Dedup.deltaDedupPairs(idx, d.filter(col("doc_id") % 10 === 0),
        5, 16, 2, 0.5, 100)
    }),

    // E55: the delta's COMPACTION twin — old↔old pairs whose
    // similarity a batch's df-cap flips invalidated, recomputed from
    // the store (no corpus re-shingling). Oracle: the full-corpus e3
    // pipeline restricted to pairs between two old docs with at least
    // one AFFECTED side (a doc containing a shingle the batch pushed
    // over the cap). Together with e51, delta ∪ compaction ∪
    // unaffected pre-batch pairs == the complete post-absorb set.
    // At sf0.01 this gate is legitimately EMPTY on both engines (no
    // planted near-dup coincides with a cap flip; max shingle df in
    // the table is 3) — it pins the no-spurious-pairs side; the
    // non-empty behavior and the union identity are pinned by
    // DeltaDedupSpec's crafted flip fixture and the ScalaCheck
    // property over random splits.
    "e55_compaction_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val idx = Dedup.buildSignatureIndex(
        d.filter(col("doc_id") % 10 =!= 0), 5, 16, 2, 100)
      Dedup.compactionPairs(idx, d.filter(col("doc_id") % 10 === 0),
        5, 16, 2, 0.5, 100)
    }),

    // E56: train/val split leakage — near-dup pairs CROSSING a
    // deterministic 80/20 md5-bucket split (e18's bucket idiom). The
    // guard every training pipeline needs next to decontamination:
    // a val doc near-duplicating a train doc leaks the eval. Pure
    // composition: one split predicate over the e3 pair operator.
    "e56_split_leakage" -> ((s, dir) => {
      def isTrain(c: org.apache.spark.sql.Column) =
        Dedup.md5Long(c.cast("string")) % 1000 < 800
      Dedup.minhashLshPairs(docs(s, dir), 5, 16, 2, 0.5, 100)
        .filter(isTrain(col("doc_a")) =!= isTrain(col("doc_b")))
    }),

    // E4: SimHash near-dup pairs via 8-bit chunk banding
    "e4_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), 3)),

    // E35: edit-distance near-dup pairs — the string-metric verifier
    // (Levenshtein over a 200-char prefix) on SimHash-bucketed
    // candidates; catches typo-level dupes that shift every shingle
    "e35_edit_distance_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(docs(s, dir), 200, 20)),

    // E5: brute-force cosine top-3 neighbors for query vectors
    "e5_knn_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e.filter(col("vec_id") < 10), e, 3)
    }),

    // E6: IVF-pruned k-NN — search only the query's coarse cell
    "e6_ivf_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfKnn(e.filter(col("vec_id") < 10), e, 3)
    }),

    // E7: text quality scoring
    "e7_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(docs(s, dir))),

    // E62: per-doc average unigram log-prob under the corpus's own
    // unigram model — the self-contained LM-perplexity quality proxy
    // (both tails are cut candidates: rare-token soup scores very
    // negative, boilerplate scores near zero)
    "e62_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(docs(s, dir))),

    // E233: interpolated KNESER-NEY bigram LM scoring (r16) — the
    // perplexity signal production quality filters rank by (CCNet /
    // MassiveText), upgrading e62's unigram proxy to the smoothing
    // family real pipelines use: P = max(c−D,0)/ctot +
    // D·N1+(w1,·)/ctot · N1+(·,w2)/N1+(·,·), D = 0.75, trained on
    // and scored over the corpus. The model is a (w1, w2, lp) TABLE
    // equi-joined to the scoring bigrams — never an expression-tree
    // literal — so a 10⁹-bigram model shards like a fact table.
    // Per-bigram lp snaps to round-9 before the per-doc round-6 sum.
    "e233_kn_bigram_logprob" -> ((s, dir) =>
      KneserNey.docLogProb(docs(s, dir))),

    // E234: the curation operator the score exists for — keep docs at
    // or below the corpus-median perplexity (the low-ppl head, the
    // CCNet shape). The threshold is the G5 two-pass pattern: one
    // exact-percentile driver scalar, then a filtered scan.
    "e234_kn_perplexity_filter" -> ((s, dir) =>
      KneserNey.perplexityFilter(docs(s, dir), q = 0.5)),

    // E237: the END-TO-END curation chain (VERDICT r16 #2) — the
    // production ordering a daily 100 TB corpus run composes from
    // stages the engine already gates individually: exact dedup (e1)
    // → absolute quality cut (e7 composite ≥ 0.5, keeps 297/500 at
    // sf0.01 — a real split) → corpus-median KN perplexity cut (e234)
    // → survivor stats. The sf corpus has no duplicate texts, so the
    // gate PLANTS them (every doc_id % 5 = 0 doc cloned at +100000 —
    // the e98 synthesis pattern) and the dedup stage provably removes
    // the clones (min-doc_id keeps the originals). One lazy plan per
    // stage boundary; the quality-surviving corpus is cache-pinned so
    // the KN stage's four plan branches and the quantile pass never
    // re-run dedup+quality from the raw scan (CurationSpec pins it).
    // The oracle chains the SAME e1/e7/e234 CTEs.
    "e237_curation_chain" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.chain(d.unionByName(
        d.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)))
    }),

    // E236: TRIGRAM interpolated KN (the KenLM-family shape, one
    // order below the usual 5): highest order discounts raw trigram
    // counts and backs off into the Chen-Goodman lower-order bigram
    // built from CONTINUATION counts (distinct left contexts), which
    // backs off into the bigram-left continuation unigram. Same
    // determinism contract as e233; docs with < 3 words keep zero
    // rows.
    "e236_kn_trigram_logprob" -> ((s, dir) =>
      KneserNey.trigramDocLogProb(docs(s, dir))),

    // E235: KN perplexity SERVING on a document stream via a
    // STREAM-STATIC equi-join — the third serving transport in the
    // tokenizer/LM family and the one production-sized models use
    // (e229 ships the model as a literal, e232 as a broadcast join
    // inside one batch; here the batch-trained (w1,w2,lp) TABLE joins
    // a live stream, so model size is bounded by the join, not the
    // plan). Per-doc aggregation replays in complete mode (the e24
    // windowless-agg shape — bounded replay state = one row per doc;
    // a production stream would window by ingest time); wordless docs
    // re-attach batch-side. Converges to e233 exactly — shares its
    // oracle.
    "e235_kn_streaming_serve_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val model = KneserNey.bigramLogProbs(d)
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      KneserNey.finalizeScores(d,
        StreamingOhlc.replayToBatch(s,
          KneserNey.docScores(stream, model)))
    }),

    // E245: the OOV-accounting serve (e238) as a CONTINUOUS
    // STREAMING query — the deployment shape a production perplexity
    // filter actually runs (models are static artifacts, traffic
    // streams): the bigram model and its continuation-unigram backoff
    // table train once on the even-doc half (batch side), the ODD
    // half arrives as a stream, and scoring is the same three-way
    // stream-static LEFT equi-join chain + per-doc agg as the batch
    // twin (e235's model-as-table pattern, plus the backoff level).
    // Replay converges to e238's oracle VERBATIM.
    "e245_kn_streaming_oov_serve_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val model = KneserNey.bigramLogProbs(train)
      val cont = KneserNey.continuationUnigram(train)
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") % 2 =!= 0)
      KneserNey.finalizeOovScores(d.filter(col("doc_id") % 2 =!= 0),
        StreamingOhlc.replayToBatch(s,
          KneserNey.docScoresOov(stream, model, cont)))
    }),

    // E248: e242's TRIGRAM OOV serve as a CONTINUOUS STREAMING query
    // (completing the {bigram,trigram} × {batch,streaming} serving
    // matrix): the trigram model and BOTH backoff tables
    // (continuation-bigram, continuation-unigram) are static
    // artifacts trained on the even half; the odd half streams
    // through the four-way stream-static LEFT equi-join chain +
    // per-doc agg. Replay converges to e242's oracle VERBATIM.
    "e248_kn_trigram_streaming_oov_serve_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val model3 = KneserNey.trigramLogProbs(train)
      val cont2 = KneserNey.continuationBigram(train)
      val cont1 = KneserNey.continuationUnigram(train)
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") % 2 =!= 0)
      KneserNey.finalizeOov3Scores(d.filter(col("doc_id") % 2 =!= 0),
        StreamingOhlc.replayToBatch(s,
          KneserNey.docScoresOov3(stream, model3, cont2, cont1)))
    }),

    // E239: streaming KN model REFRESH (VERDICT r16 #5) — the
    // production perplexity-serving loop, composing the e231 storage
    // pattern with e235's model-as-table serving: micro-batch N first
    // lands its docs in the corpus store (overwrite-idempotent per
    // batch dir), RETRAINS the bigram table on the corpus-so-far
    // (inclusive prefix: batches 0..N), writes it as version v_N, and
    // scores batch N's docs against that newest version read back
    // THROUGH STORAGE ALONE — no driver state carries the model
    // between batches, so a restarted query re-reads the same
    // versions. The per-batch oracle scores each batch against the
    // model trained on exactly its inclusive prefix (three unrolled
    // CTE families); StreamingKnRefreshSpec adversarially pins
    // mid-replay staleness (batch N's recorded scores match the
    // prefix model and NOT the final model).
    "e239_kn_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn_refresh", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScore(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E240: the e237 curation chain as a CONTINUOUS STREAMING ingest
    // loop — cross-batch first-seen-wins dedup against a fingerprint
    // store (the e57 bootstrap pattern), the stateless e7 quality
    // cut, and a KN perplexity cut whose model covers the CURATED
    // prefix per batch — derived incrementally from merged per-batch
    // count partials (the e241 refresh shape; hash-identical to a
    // full prefix retrain) — with the batch's own median as threshold
    // (the per-shard quantile CCNet runs; the corpus-global running
    // quantile is e243's). Clones planted
    // at +100000 land in a DIFFERENT batch than their original
    // ((x+100000) % 3 = (x+1) % 3), so the cross-batch dedup path
    // provably executes — including the adversarial direction where
    // the clone's batch comes FIRST and the original drops. All
    // stores are per-batch overwrites (redelivery-idempotent); the
    // oracle replays the identical first-seen window + per-batch
    // prefix-trained CTE families.
    "e240_streaming_curation_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatch(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E241: the INCREMENTAL KN model refresh (VERDICT r17 #1) — the
    // same staged replay, protocol, and ORACLE as e239 (knRefreshOracle
    // verbatim: the gate asserts hash-identity with the naive
    // full-prefix retrain), but each trigger's raw-doc work is
    // O(batch): the batch reduces once to its bigram COUNT PARTIAL
    // (counts/batch_N), and version v_N derives from one hash
    // aggregation over the merged partials of batches 0..N — type
    // counts are additive, so the merged statistic (and therefore the
    // model, therefore every score) is bit-identical while nothing
    // ever re-reads batches 0..N-1's documents (KnIncrementalSpec pins
    // that the raw docs are UNRECOVERABLE by construction: no corpus
    // store exists at all).
    "e241_kn_incremental_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn_refresh_inc", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreIncremental(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E244: the incremental refresh WITH in-loop store compaction —
    // the log-structured maintenance step a stream-lifetime count
    // store needs (the e58 near-dup delta store's compaction, applied
    // to model partials): per-batch partials accumulate one directory
    // per trigger, so e241's merge fan-in grows O(N) with stream age
    // even though the merged cardinality is vocabulary-bounded. Every
    // `compactEvery` batches the partials fold into one pre-merged
    // checkpoint and the covered partials tombstone (checkpoint lands
    // first, so a crash between the two leaves residue the merged
    // view provably ignores — KnIncrementalSpec). Same oracle as
    // e239/e241 verbatim: compaction must be invisible in every
    // per-batch score.
    "e244_kn_compacted_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn_refresh_compact", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreCompacting(s, b, id, scratch,
            compactEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E246: the incremental refresh at TRIGRAM order — the model
    // production perplexity filters actually refresh (e241's
    // additive-partial pattern, one order up): each micro-batch
    // writes its PAIR of type-count partials (trigram types for the
    // top two interpolation levels, bigram types for the
    // continuation-unigram floor), version v_N merges each family
    // with one hash agg and applies the identical types→model
    // expression — bit-identical to a full prefix retrain, O(batch)
    // raw-doc work per trigger. Per-batch oracle: three unrolled
    // prefix-trained TRIGRAM CTE families.
    "e246_kn_trigram_incremental_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn3_refresh_inc", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreTrigramIncremental(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E249: the trigram incremental refresh WITH in-loop maintenance
    // of BOTH count families (VERDICT r18 #1 — e244's compaction,
    // applied to the trigram refresh through the generic
    // StoreFs.compact/mergedDirs pair): every second batch the
    // trigram and bigram type-count partials each fold into one
    // pre-merged checkpoint and the covered dirs tombstone, so the
    // per-trigger merge fan-in stays <= compactEvery + 1 sources per
    // family forever instead of growing O(N) with stream age.
    // Same oracle as e246 VERBATIM: compaction must be
    // score-invisible in every per-batch trigram score.
    "e249_kn_trigram_compacted_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn3_refresh_compact", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreTrigramCompacting(s, b, id, scratch,
            compactEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E252: the FULL store-maintenance KN refresh loop (VERDICT r18
    // #4) — e244's compaction plus model-version RETENTION: every
    // trigger writes model/v_N forever, so mid-stream GC keeps, among
    // versions at or below the committed horizon (batchId-1), only
    // the newest (serving) plus every keepEvery-th (rollback ladder).
    // The loop reads only the version it writes this trigger, so a
    // redelivered batch still finds everything it needs
    // (KnIncrementalSpec). Oracle: e239's per-batch prefix-trained
    // family at SIX batches — maintenance must be score-invisible.
    "e252_kn_maintained_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn_refresh_maint", dir)
      // SIX staged batches so mid-stream GC genuinely deletes (v1 at
      // batch 3, v3 at batch 5 with keepEvery = 2) before later
      // batches score
      graft.streaming.StagedReplay.stageFiles(
        (0 to 5).map(k => d.filter(col("doc_id") % 6 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreMaintained(s, b, id, scratch,
            compactEvery = 2, keepEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E255: the KN refresh loop SEEDED from an existing corpus and
    // run under FULL maintenance — the refresh-side twin of e254:
    // the base corpus (even doc_ids) reduces once to its bigram
    // type-count statistic and lands as counts/ckpt_-1; the stream
    // replays the odd doc_ids in three batches (doc_id % 6 = 1/3/5)
    // through the UNCHANGED maintained loop, so batch 0's model
    // already trains on seed + batch 0, the batch-1 compaction folds
    // the seed checkpoint into ckpt_1, and retention prunes the
    // version ladder. Oracle: each batch scored against the model
    // trained on evens + odd batches 0..k.
    "e255_kn_seeded_refresh_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("kn_refresh_seeded", dir)
      KneserNey.seedCountStore(s, d.filter(col("doc_id") % 2 === 0),
        scratch)
      graft.streaming.StagedReplay.stageFiles(
        Seq(1, 3, 5).map(m => d.filter(col("doc_id") % 6 === m)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          KneserNey.refreshAndScoreMaintained(s, b, id, scratch,
            compactEvery = 2, keepEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E253: the FULL store-maintenance curation loop (VERDICT r18
    // #4) — e247's two-store compaction plus retention of the two
    // forever-growing OUTPUT families: old model versions (newest +
    // every keepEvery-th at or below the committed horizon) and dead
    // curated batches (only a batch's OWN redelivery ever re-reads
    // curated/batch_N, so everything below this batch retires).
    // Same oracle as e240/e247 VERBATIM: maintenance must be
    // survivor-invisible.
    "e253_streaming_curation_maintained_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_maint", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchMaintained(s, b, id, scratch,
            compactEvery = 2, keepEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E250: the streaming curation loop SEEDED from an existing
    // corpus (VERDICT r18 #5 — the e57 bootstrap pattern applied to
    // the whole loop): the base corpus (doc_id % 10 <> 0) runs the
    // batch chain's dedup+quality stages ONCE and lands as
    // checkpoints at horizon -1 (fps/ckpt_-1 = its distinct
    // fingerprints, counts/ckpt_-1 = its kept docs' bigram counts);
    // the stream then replays the held-out tenth PLUS planted clones
    // of base docs (ids +100000, so dedup-against-the-seed provably
    // executes) through the UNCHANGED curateBatch loop — batch 0's
    // exclusive prior view (upTo = -1) resolves the seed checkpoint,
    // and each batch's model trains on seed-kept + kept batches 0..k.
    // Oracle: the e240 family over the union corpus with the seed as
    // "batch -1" (never emitted, always trained on).
    "e250_streaming_curation_seeded_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val seed = d0.filter(col("doc_id") % 10 =!= 0)
      val stream = d0.filter(col("doc_id") % 10 === 0)
        .unionByName(seed.filter(col("doc_id") % 5 === 1)
          .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_seeded", dir)
      Curation.seedCurationStore(s, seed, scratch)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => stream.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val st = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = st.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatch(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E254: the seeded loop under FULL store maintenance — e250's
    // bootstrap composed with e253's compaction + retention, pinning
    // the composition claim end-to-end: the seed's horizon -1
    // checkpoints fold into later checkpoints like any other source
    // (the batch-1 fingerprint fold retires fps/ckpt_-1 into ckpt_0;
    // the count fold retires counts/ckpt_-1 into ckpt_1), dead
    // curated batches and off-ladder model versions retire
    // mid-stream, and none of it is survivor-visible. Same oracle as
    // e250 VERBATIM.
    "e254_streaming_curation_seeded_maintained_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val seed = d0.filter(col("doc_id") % 10 =!= 0)
      val stream = d0.filter(col("doc_id") % 10 === 0)
        .unionByName(seed.filter(col("doc_id") % 5 === 1)
          .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_seeded_maint", dir)
      Curation.seedCurationStore(s, seed, scratch)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => stream.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val st = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = st.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchMaintained(s, b, id, scratch,
            compactEvery = 2, keepEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E243: the streaming curation loop with a CORPUS-GLOBAL running
    // quantile cut (VERDICT r17 #5) — same planted-clone corpus,
    // dedup, and quality stages as e240, but batch N is cut at the
    // median of the MERGED perplexity scores of kept batches 0..N
    // (each batch's scores frozen as recorded against its own version
    // model), maintained as per-batch score vectors in the store —
    // the running-quantile structure a long-lived ingest wants
    // instead of e240's per-shard batch median. The exact prefix
    // quantile is the gate contract; the e23a GK sketch rides along
    // over the same merged store and its rank-space ε-flag
    // (cut_within) is oracle-asserted as constant 1.
    "e243_streaming_curation_global_cut" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_global", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchGlobalCut(s, b, id, scratch)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E251: the global-cut curation loop (e243) with in-loop
    // maintenance of ALL THREE growing stores (VERDICT r18 #2's
    // second half): every second batch the fingerprint sets fold at
    // N-1 (exclusive-consumer horizon), and the count partials AND
    // score vectors fold at N (inclusive-consumer horizons) — the
    // score fold is a plain concatenation, since score rows are
    // per-doc facts, not mergeable partials. The prefix quantile then
    // reads ckpt + fresh partials instead of an O(N) listing. Same
    // oracle as e243 VERBATIM: compaction must be survivor- and
    // cut-invisible (the operative cut stays the exact prefix
    // quantile at this scale — the GK promotion threshold is the
    // documented 10^7).
    "e251_streaming_curation_global_cut_compacted" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_global_compact", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchGlobalCutCompacting(s, b, id, scratch,
            compactEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E256: the corpus-global quantile cut as a MERGED LOG-SPACED
    // HISTOGRAM (the 100 TB form of e243/e251): the running
    // quantile's state is additive per-bin count partials — each
    // trigger writes the batch's O(bins)-row histogram, the cut is
    // the smallest bin whose cumulative merged count reaches the
    // target rank, and survivors sit at or below that bin. The
    // quantile pass never reads score rows again (O(bins x fan-in)
    // per trigger vs the GK form's O(all docs ever)), the histogram
    // store compacts with the same summed fold as the count stores,
    // and the loop runs under full maintenance. Oracle: the e243
    // family with the cut re-derived bin-for-bin in SQL.
    "e256_streaming_curation_hist_cut" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_hist", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchHistCut(s, b, id, scratch,
            compactEvery = 2, keepEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E247: the streaming curation loop (e240) with in-loop
    // maintenance of BOTH growing stores — every second batch the
    // fingerprint sets fold into one DISTINCT checkpoint and the
    // count partials into one merged checkpoint, covered dirs
    // tombstoned, so the anti-join and model-merge fan-ins stay
    // bounded over a stream's life. Horizon asymmetry is the
    // load-bearing detail (fps at N-1 because its consumer view is
    // exclusive; counts at N because its view is inclusive —
    // CurationSpec pins the redelivery consequence). Same oracle as
    // e240 VERBATIM: compaction must be survivor-invisible.
    "e247_streaming_curation_compacted_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d0 = docs(s, dir)
      val d = d0.unionByName(d0.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val scratch = graft.Scratch.fresh("curation_compact", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(k => d.filter(col("doc_id") % 3 === k)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Curation.curateBatchCompacting(s, b, id, scratch,
            compactEvery = 2)
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E242: TRIGRAM KN serving with explicit OOV accounting (VERDICT
    // r17 #4) — e238's train/serve split one order up: the trigram
    // model trains on even doc_ids and scores the odd half, backing
    // off at serve time through the model's own lower-order tables,
    // P3 → P2c (continuation-bigram) → continuation unigram — the
    // KenLM-family chain — with per-level counts (n_oov3/n_oov2) and
    // never-seen tails (n_unk) excluded from the perplexity rate.
    // Three LEFT equi-joins + one per-doc agg; no cartesian
    // (PlanShapeSpec).
    "e242_kn_trigram_oov_serve" -> ((s, dir) => {
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val serve = d.filter(col("doc_id") % 2 =!= 0)
      KneserNey.finalizeOov3Scores(serve,
        KneserNey.docScoresOov3(serve,
          KneserNey.trigramLogProbs(train),
          KneserNey.continuationBigram(train),
          KneserNey.continuationUnigram(train)))
    }),

    // E238: KN serving with EXPLICIT OOV accounting (VERDICT r16 #3)
    // on a train/serve SPLIT corpus — the model trains on half the
    // docs (doc_id % 2 = 0) and scores the OTHER half, so model-absent
    // bigrams actually occur and the OOV paths execute: model hits
    // keep their KN lp, misses back off to the continuation-unigram
    // table the model already materializes (n1l/n1tot), and bigrams
    // whose right word was never a continuation are counted (n_unk)
    // and excluded from the perplexity rate instead of silently
    // biasing it. Two LEFT equi-joins + one per-doc agg.
    "e238_kn_oov_serve" -> ((s, dir) => {
      val d = docs(s, dir)
      val train = d.filter(col("doc_id") % 2 === 0)
      val serve = d.filter(col("doc_id") % 2 =!= 0)
      KneserNey.finalizeOovScores(serve,
        KneserNey.docScoresOov(serve,
          KneserNey.bigramLogProbs(train),
          KneserNey.continuationUnigram(train)))
    }),

    // E8: language-ID heuristic (marker stopword argmax)
    "e8_lang_id" -> ((s, dir) => TextAnalysis.languageId(docs(s, dir))),

    // E9: token counting (whitespace + BPE-ish regex)
    "e9_token_count" -> ((s, dir) => TextAnalysis.tokenCounts(docs(s, dir))),

    // E10: winnowing document fingerprints
    "e10_fingerprint_winnow" -> ((s, dir) =>
      TextAnalysis.fingerprints(docs(s, dir), 5, 4)),

    // E11: multimodal blob plumbing — binary payload + frame features
    "e11_multimodal_frames" -> ((s, dir) =>
      Multimodal.frameFeatures(Multimodal.asBlobTable(docs(s, dir)))),

    // E11 decode-path gate: the mapPartitions stub-decode (the seam a
    // real codec plugs into) aggregated per doc and hash-compared to an
    // oracle twin — frame count, byte total, and the additive byte
    // checksum are all deterministic, so the partition-local decode
    // topology is oracle-gated, not just spec-tested (payloads are
    // ASCII here, so the byte checksum equals the char-code sum the
    // oracle computes)
    "e47_multimodal_decode_agg" -> ((s, dir) => {
      val frames = Multimodal.decodeFrames(
        Multimodal.asBlobTable(docs(s, dir)))
      frames.toDF().groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("n_bytes")).cast("long").as("n_bytes"),
          sum(col("checksum")).as("checksum"))
    }),

    // E65: the REAL codec behind the multimodal seam (VERDICT r8 #6) —
    // synthetic PCM from a closed-form signal is ENCODED as mono-16-bit
    // WAV blobs, DECODED by the pure-JVM WavCodec chunk walker, and the
    // decoded samples' per-frame integer features are hash-compared to
    // a DuckDB oracle computing the same features from the formula
    // directly (never touching bytes): any header/endianness/offset
    // bug in the codec breaks the gate. Scale shape: encode, decode,
    // and featurize are all partition-local over the blob table — no
    // shuffle until the (tiny) result.
    "e65_wav_codec_frames" -> ((s, dir) =>
      Multimodal.decodeWavFrames(
          Multimodal.syntheticWav(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E73: first-occurrence-keeping exact line dedup — the canonical-
    // copy twin of e67 (Dolma-style duplicate-paragraph removal): a
    // repeated 8-word line survives in its smallest-(doc_id, pos)
    // occurrence only, so the corpus keeps exactly ONE copy of each
    // span instead of zero copies of frequent ones. Same linear
    // topology as e67: one line-key shuffle (min-struct aggregate),
    // equi-join back, one doc_id shuffle to reassemble.
    "e73_canonical_line_dedup" -> ((s, dir) =>
      TextAnalysis.canonicalLineDedup(docs(s, dir))),

    // E72: per-document span-duplication profile — the repeated-
    // substring curation signal (how much of each doc also appears
    // elsewhere): distinct k-shingle count, shingles shared with ≥2
    // docs, the most-viral shingle's corpus df, duplicated fraction.
    // Uncapped by design (boilerplate IS the signal); linear — df
    // shuffle + hash-join back + per-doc agg, no pair expansion.
    "e72_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpanProfile(docs(s, dir))),

    // E77: cross-document repeated spans WITH POSITIONS (VERDICT r10
    // #2) — the Lee-et-al memorization scan: maximal token spans
    // whose every k-shingle also occurs in ≥1 OTHER document, as
    // (doc_id, start_pos, n_tokens, n_shingles, max_df) rows a
    // surgical span-removal pass consumes. e72 says HOW MUCH of a doc
    // is duplicated; this says WHERE. Gaps-and-islands over
    // cross-doc-shared shingle positions; uncapped like e72 (df
    // join-back is 1:1 per position — no pair expansion), linear.
    "e77_cross_doc_spans" -> ((s, dir) =>
      Dedup.crossDocSpans(docs(s, dir))),

    // E82: cross-document repeated-span REMOVAL — the surgical remedy
    // consuming e77's detection (Lee-et-al: all but one occurrence of
    // each duplicated substring drop; the canonical smallest-doc_id
    // holder keeps its copy). Tokens covered by a cross-doc-shared
    // shingle occurrence in a non-canonical doc are removed and the
    // survivors reassembled in order. Linear: df/min-doc aggregation,
    // 1:1 join-back, k-fold explode of removable positions only,
    // e67/e73-style reassembly.
    "e82_cross_doc_scrub" -> ((s, dir) =>
      Dedup.crossDocSpanScrub(docs(s, dir))),

    // E85: EXACT cross-doc maximal matches (VERDICT r11 #3) — the
    // suffix-array-precise refinement of e77: one row per maximal
    // exact substring match between two documents (consecutive
    // shingle matches on one (doc, partner, diagonal) line are one
    // exact match — seed-and-extend). Closes e77's documented
    // over-merge: overlapping spans shared with different partners
    // stay separate. df-capped (2..100) — the pair expansion is
    // bounded per shingle bucket, never corpus²; e77 remains the
    // uncapped linear profile.
    "e85_cross_doc_exact_spans" -> ((s, dir) =>
      Dedup.crossDocExactSpans(docs(s, dir))),

    // E117: decode -> RESIZE -> extract — the thumbnail/normalization
    // step between codec and features: nearest-neighbor to 8x4 (pure
    // integer index math, so the oracle evaluates the resampled
    // pattern directly), partition-local end to end
    "e117_image_resize_rows" -> ((s, dir) =>
      Multimodal.decodeResizeRows(
          Multimodal.syntheticBmp(docs(s, dir).select(col("doc_id"))),
          ow = 8, oh = 4)
        .toDF()),

    // E116: REAL compressed-image codec gate — the PNG twin of e71:
    // the same closed-form pixels encoded through actual zlib DEFLATE
    // with the per-row filter cycle (None/Sub/Up/Average/Paeth all
    // exercised on every image), chunk-walked + CRC-verified +
    // inflated + filter-reconstructed back by the pure-JVM PngCodec.
    // Shares e71's oracle verbatim: same expected pixels, different
    // codec under test.
    "e116_png_codec_rows" -> ((s, dir) =>
      Multimodal.decodePngRows(
          Multimodal.syntheticPng(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E71: REAL image codec gate — the image twin of e65: synthetic
    // 24-bit pixels from a closed-form formula are encoded to actual
    // BMP bytes (bottom-up rows, 4-byte stride padding — widths cycle
    // every pad value) and decoded back by the pure-JVM BmpCodec;
    // per-scanline integer features hash-compare against the oracle's
    // direct formula evaluation. Partition-local iterator→iterator
    // decode, no shuffle before the output.
    "e71_bmp_codec_rows" -> ((s, dir) =>
      Multimodal.decodeBmpRows(
          Multimodal.syntheticBmp(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E78: REAL video codec gate (VERDICT r10 #5 — audio/image/video
    // all real now): synthetic 4:2:0 planes from a closed-form
    // formula are encoded to actual Y4M bytes (YUV4MPEG2 header,
    // FRAME-delimited planar frames) and decoded back by the pure-JVM
    // Y4mCodec; per-frame integer plane features hash-compare against
    // the oracle's direct formula evaluation. Dims AND frame counts
    // vary per doc, so no fixed layout can mask a stride/offset bug.
    // Partition-local iterator→iterator decode, no shuffle before
    // the output.
    "e78_y4m_codec_frames" -> ((s, dir) =>
      Multimodal.decodeY4mFrames(
          Multimodal.syntheticY4m(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E66: PII scrub — regex count + mask of emails/URLs/long digit
    // runs. The synthetic corpus contains no PII, so a deterministic
    // PII suffix is injected per doc_id on BOTH engines and the gate
    // compares real regex behavior (Java vs RE2 — patterns restricted
    // to the shared-semantics subset) including the sequential
    // three-pass masking. Pure map-side pass: no shuffle anywhere.
    "e66_pii_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@mail.example.org or see "),
          lit("http://ex.org/d/"), col("doc_id").cast("string"),
          lit(" ref "),
          (col("doc_id") + lit(1000000000L)).cast("string"))
          .as("text"))
      TextAnalysis.piiScrub(d)
    }),

    // E67: C4-style boilerplate-line removal — 8-word "lines" dropped
    // when they occur in ≥2 distinct docs corpus-wide, documents
    // reassembled in order (empty-but-present when fully boilerplate).
    // One line-key shuffle for the global frequency, anti-join against
    // the boilerplate minority, one doc_id shuffle to reassemble.
    "e67_boilerplate_lines" -> ((s, dir) =>
      TextAnalysis.boilerplateLineDedup(docs(s, dir))),

    // E68: INT8 scalar quantization (SQ8) error profile — the ANN
    // memory path (4× smaller than float32). sum_q is an EXACT integer
    // gate over every quantized value (floor(x+0.5) sidesteps the
    // engines' rounding-mode differences; the IEEE ops are
    // bit-identical); max_abs_err/mse bound the reconstruction error
    // per label. Dim stats are one tiny agg broadcast back — the
    // corpus shuffles only for the final label aggregation.
    "e68_scalar_quantize" -> ((s, dir) =>
      Similarity.scalarQuantizeError(emb(s, dir))),

    // E74: product quantization (PQ) error profile — the other half of
    // the FAISS IVF-PQ recipe next to e68's SQ8: m=4 subspaces of the
    // 64-dim embedding, each training its own k=8 codebook with the
    // SAME deterministic Lloyd machinery as e22/e54, vectors encoded
    // as 4 sub-codes. The integer code sum gates training + slicing +
    // assignment exactly; the error profile mirrors e68's shape.
    "e74_product_quantize" -> ((s, dir) => {
      val (cbs, l) = sharedCodebooks(s, dir)
      Similarity.productQuantizeErrorWith(emb(s, dir), cbs, l)
    }),

    // E75: PQ asymmetric-distance (ADC) top-k — the search half of
    // IVF-PQ (e54 probes cells, e74 profiles storage error, this
    // answers queries against the CODES-ONLY corpus). Same query set
    // as e5/e54 (vec_id < 10), distance = Σ_s ‖q_s − codebook[code_s]‖²
    // rounded, ties by n_id.
    "e75_pq_adc_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val (cbs, l) = sharedCodebooks(s, dir)
      Similarity.IvfPqModel(Nil, cbs, l)
        .adcTopK(e.filter(col("vec_id") < 10), e, 3)
    }),

    // E76: IVF-PQ composed top-k (VERDICT r10 #1) — the production
    // billion-scale recipe the triad builds toward: e54's trained
    // coarse quantizer probes nprobe=2 cells, e75's ADC ranks ONLY
    // those cells' codes. Cell pruning × code compression — the scan
    // touches nprobe/coarseK of the corpus at m bytes per vector.
    "e76_ivfpq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      sharedIvfPq(s, dir).topK(e.filter(col("vec_id") < 10), e, 3)
    }),

    // E79: measured recall of the PQ search paths against EXACT
    // squared-L2 brute force — the e52-style gate for the composed
    // path (ADC estimates L2, so cosine ground truth would conflate
    // metric mismatch with quantization loss). pq_adc isolates pure
    // quantization loss (whole-corpus scan); ivfpq adds the nprobe
    // cell-pruning loss on top. Integer set intersections of results
    // the e75/e76 gates already prove hash-identical, so the recall
    // is fully oracle-checked; AnnRecallSpec pins the floors.
    "e79_ivfpq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      // L2 ground truth — consumed by BOTH stats aggregates in one
      // job, so eagerly materialized (the multi-branch rebuild trap)
      val truth = Similarity.bruteForceL2Knn(q, e, 3)
        .select(col("q_id"), col("n_id")).cache()
      truth.count()
      def stats(method: String, retrieved: org.apache.spark.sql.DataFrame) = {
        val r = retrieved.select(col("q_id"), col("n_id"),
          lit(1).as("_m"))
        truth.join(r, Seq("q_id", "n_id"), "left")
          .agg(count(lit(1)).as("n_true"),
            coalesce(sum(col("_m")), lit(0)).cast("long").as("n_hit"))
          .select(lit(method).as("method"), lit(3L).as("k"),
            col("n_true"), col("n_hit"),
            Rounding.duckRound(
              col("n_hit").cast("double") / col("n_true"), 6)
              .as("recall"))
      }
      // ONE training for all three search paths — the production
      // split (train once, serve many) the IvfPqModel API exists for;
      // identical math to the self-contained e75/e76/e80 gates
      val model = sharedIvfPq(s, dir)
      val rmodel = sharedResid(s, dir)
      stats("pq_adc", model.adcTopK(q, e, 3))
        .unionByName(stats("ivfpq", model.topK(q, e, 3)))
        .unionByName(stats("ivfpq_rerank",
          model.rerankTopK(q, e, 3, 10)))
        .unionByName(stats("ivfpq_resid", rmodel.topK(q, e, 3)))
    }),

    // E80: IVF-PQ with an EXACT re-rank tail — the full FAISS serving
    // recipe (VERDICT r10 #1's optional re-rank): ADC over probed
    // cells picks R=10 candidates per query, then only those
    // candidates' full vectors are fetched and re-scored with exact
    // L2. Fixes quantization rank inversions inside the candidate
    // set; e79's ivfpq_rerank row measures the recall it buys.
    "e80_ivfpq_rerank_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      sharedIvfPq(s, dir)
        .rerankTopK(e.filter(col("vec_id") < 10), e, 3, 10)
    }),

    // E81: RESIDUAL IVF-PQ top-k — the true FAISS IVFPQ encoding:
    // codebooks trained on (vector - assigned coarse centroid)
    // residuals, queries subtract the probed cell's centroid, ADC is
    // cell-consistent. Residuals quantize finer than raw vectors at
    // the same codebook size; e79's ivfpq_resid row measures the
    // recall lift vs the raw composition.
    "e81_ivfpq_residual_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      sharedResid(s, dir).topK(e.filter(col("vec_id") < 10), e, 3)
    }),

    // E83: the PERSISTED index-build/serving split (VERDICT r11 #1) —
    // what makes IVF-PQ real at 10^9 vectors: the BUILD (train + encode
    // the corpus to m-byte codes) writes a parquet index (model halves
    // + the coded corpus partitioned by cell); the SERVE path then
    // loads the model state and answers top-k against the CODED frame
    // only — no raw corpus vector is read and nothing retrains
    // (the e51 SignatureIndex pattern for ANN). Parquet round-trips
    // doubles bit-exactly, so this is hash-identical to e76 and shares
    // its oracle verbatim — any build/persist/load divergence breaks
    // the gate.
    "e83_ivfpq_persisted_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val path = graft.Scratch.dir("ivfpq_index", dir)
      VectorIndex.writeOnce(s, sharedIvfPq(s, dir), e, path)
      val served = VectorIndex.read(s, path)
      served.topKFromCoded(e.filter(col("vec_id") < 10),
        VectorIndex.readCoded(s, path), 3)
    }),

    // E84: SERVING-GRADE recall (VERDICT r11 #2) — e79's floors
    // (0.17-0.40) prove the gate is honest, not that the operator is
    // usable; this measures a TUNED configuration (m=8 subspaces of
    // L=8, kCodes=16, nprobe=4, re-rank R=30 — 2x the code bits, 2x
    // the probed cells, 3x the re-rank budget) against the same
    // exact-L2 truth, alongside the untuned re-rank baseline. Measured
    // at sf0.01: 0.833 tuned-reranked vs 0.40 untuned — production
    // recall is a knob setting, not a different algorithm
    // (AnnRecallSpec pins tuned >= 0.8 > untuned). The composed-only
    // row shows WHERE the recall comes from: ADC top-3 alone plateaus
    // (~0.23 — quantization noise reorders near-ties regardless of
    // nprobe), so the exact tail is what converts candidate coverage
    // into recall.
    "e84_ivfpq_tuned_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      val truth = Similarity.bruteForceL2Knn(q, e, 3)
        .select(col("q_id"), col("n_id")).cache()
      truth.count()
      def stats(method: String, retrieved: DataFrame) = {
        val r = retrieved.select(col("q_id"), col("n_id"),
          lit(1).as("_m"))
        truth.join(r, Seq("q_id", "n_id"), "left")
          .agg(count(lit(1)).as("n_true"),
            coalesce(sum(col("_m")), lit(0)).cast("long").as("n_hit"))
          .select(lit(method).as("method"), lit(3L).as("k"),
            col("n_true"), col("n_hit"),
            Rounding.duckRound(
              col("n_hit").cast("double") / col("n_true"), 6)
              .as("recall"))
      }
      val (tcbs, tL) = ModelCache.cached(s"pqcb|$dir|m=8|k=16|it=2")(
        Similarity.trainPqCodebooks(emb(s, dir), 8, 16, 2))
      val tuned =
        Similarity.IvfPqModel(sharedCentroids(s, dir), tcbs, tL)
      stats("ivfpq_rerank", sharedIvfPq(s, dir).rerankTopK(q, e, 3, 10))
        .unionByName(stats("ivfpq_tuned", tuned.topK(q, e, 3, 4)))
        .unionByName(stats("ivfpq_tuned_rerank",
          tuned.rerankTopK(q, e, 3, 30, 4)))
    }),

    // E86: INCREMENTAL index update — the delta-dedup analog for ANN
    // and the third leg of the production story (e76 build, e83
    // persist/serve, this one UPDATE): the index is built and
    // persisted on the pre-append corpus (vec_id % 10 != 0), then the
    // new batch is encoded with the PERSISTED model halves — no
    // retraining, no corpus re-encode — and appended to the
    // cell-partitioned coded store; serving reads old ∪ new
    // transparently. Oracle: the composed chain with TRAINING
    // restricted to the old corpus and encode/serve over everything —
    // any append-path divergence (stale-model encode, partition
    // layout, read-back ordering) breaks the gate.
    "e86_ivfpq_append_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val batch = e.filter(col("vec_id") % 10 === 0)
      val model = ModelCache.cached(s"ivfpq|$dir|old10|ck=8|m=4|k=8|it=2")(
        Similarity.trainIvfPq(old))
      val path = graft.Scratch.dir("ivfpq_index_app", dir)
      VectorIndex.write(s, model, old, path)
      VectorIndex.append(s, path, batch)
      VectorIndex.read(s, path).topKFromCoded(
        e.filter(col("vec_id") < 10), VectorIndex.readCoded(s, path), 3)
    }),

    // E69: the multimodal decode seam on the STREAMING path — the
    // document stream replayed as three staged micro-batches, each
    // encoded→decoded→featurized by the same partition-local WavCodec
    // flow as e65 (stateless typed ops compose unchanged onto a
    // streaming Dataset — that is the point of the gate). The appended
    // union of an AvailableNow replay IS the batch result, so this
    // shares e65's closed-form oracle verbatim — the same
    // batch/streaming symmetry contract as g1/e1/u2/e33/e58.
    "e69_wav_streaming_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val d = docs(s, dir).select(col("doc_id"))
      val scratch = graft.Scratch.fresh("wav_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r => d.filter(col("doc_id") % 3 === r)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        Multimodal.decodeWavFrames(Multimodal.syntheticWav(stream))
          .toDF())
    }),

    // E14: embedding-cosine near-dup pairs, IVF-pruned by label cell
    // (testdata plants no true embedding dups — threshold 0.4 keeps the
    // operator's output non-trivial; at 0.95 it is correctly empty)
    "e14_dedup_embedding_cosine" -> ((s, dir) => {
      val v = emb(s, dir).select(col("vec_id"), col("label"),
        col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
      v.as("x").join(v.as("y"),
          col("x.label") === col("y.label") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
          Rounding.duckRound(Similarity.cosineWithNorms(col("x.embedding"),
            col("y.embedding"), col("x.nrm"), col("y.nrm")), 6).as("sim"))
        .filter(col("sim") >= 0.4)
    }),

    // E15: LSH-bucketed ANN — deterministic integer hyperplane sign bits
    "e15_lsh_ann_pairs" -> ((s, dir) =>
      Similarity.lshPairs(emb(s, dir), nBits = 8, minSim = 0.3)),

    // E52: measured recall of the pruned ANN paths against brute-force
    // ground truth (VERDICT r6 #2) — the number a user tuning
    // cells/tables actually needs. ivf_knn: fraction of brute-force
    // top-3 neighbors the cell-pruned search returns (recall@3);
    // lsh_pairs / lsh_multi: fraction of ALL true pairs at sim >= 0.3
    // the bucket join surfaces (single 8-bit table vs the 8x4-bit
    // OR-construction). All are integer set intersections of results
    // the e5/e6/e15/e53 gates already prove hash-identical, so the
    // recall is fully oracle-checked, not rows-only. Measured at
    // sf0.01: ivf 0.033 (label cells are NOT cosine neighborhoods in
    // this synthetic data — the honest number this gate exists to
    // surface), kmeans_ivf 0.90 (e54's TRAINED quantizer at nprobe=2
    // — cells that follow the distribution recover the recall the
    // label stand-in loses), lsh_pairs 0.037 (one AND-only table is a
    // weak net at sim 0.3), lsh_multi 0.454 (12x — the
    // OR-construction recall knob). AnnRecallSpec pins the floors.
    "e52_ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
      // brute-force ground truth — consumed by the label-ivf AND
      // kmeans-ivf aggregates in one job, so eagerly materialized
      val brute = Similarity.bruteForceKnn(q, e, 3)
        .select(col("q_id"), col("n_id"))
        .cache()
      brute.count()
      def topkStats(method: String, retrieved: DataFrame) = {
        val r = retrieved.select(col("q_id"), col("n_id"),
          lit(1).as("_m"))
        brute.join(r, Seq("q_id", "n_id"), "left")
          .agg(count(lit(1)).as("n_true"),
            coalesce(sum(col("_m")), lit(0)).cast("long").as("n_hit"))
          .select(lit(method).as("method"), lit(3L).as("k"),
            col("n_true"), col("n_hit"),
            Rounding.duckRound(
              col("n_hit").cast("double") / col("n_true"), 6)
              .as("recall"))
      }
      val ivfStats = topkStats("ivf_knn", Similarity.ivfKnn(q, e, 3))
      val cents = sharedCentroids(s, dir)
      // nprobe=1 vs nprobe=2: the slope of the knob, measured (0.80 →
      // 0.90 at sf0.01) — what a user sizing probe cost actually reads
      val kivf1Stats = topkStats("kmeans_ivf_p1",
        Similarity.kmeansIvfKnn(q, e, cents, k = 3, nprobe = 1))
      val kivfStats = topkStats("kmeans_ivf",
        Similarity.kmeansIvfKnn(q, e, cents, k = 3, nprobe = 2))
      val v = e.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      // all-pairs ground truth — consumed by BOTH lsh aggregates in one
      // job, so eagerly materialized (the multi-branch rebuild trap)
      val truePairs = v.as("x").join(v.as("y"),
          col("x.vec_id") < col("y.vec_id"))
        .filter(Rounding.duckRound(Similarity.cosineWithNorms(
          col("x.embedding"), col("y.embedding"),
          col("x.nrm"), col("y.nrm")), 6) >= 0.3)
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
        .cache()
      truePairs.count()
      val lsh = Similarity.lshPairs(e, nBits = 8, minSim = 0.3)
        .select(col("vec_a"), col("vec_b"), lit(1).as("_m"))
      val lshStats = truePairs.join(lsh, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("_m")), lit(0)).cast("long").as("n_hit"))
        .select(lit("lsh_pairs").as("method"), lit(8L).as("k"),
          col("n_true"), col("n_hit"),
          Rounding.duckRound(
            col("n_hit").cast("double") / col("n_true"), 6).as("recall"))
      val mlsh = Similarity.lshPairsMulti(e, nBits = 4, nTables = 8,
          minSim = 0.3)
        .select(col("vec_a"), col("vec_b"), lit(1).as("_m"))
      val mStats = truePairs.join(mlsh, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_true"),
          coalesce(sum(col("_m")), lit(0)).cast("long").as("n_hit"))
        .select(lit("lsh_multi").as("method"), lit(8L).as("k"),
          col("n_true"), col("n_hit"),
          Rounding.duckRound(
            col("n_hit").cast("double") / col("n_true"), 6).as("recall"))
      ivfStats.unionByName(kivf1Stats).unionByName(kivfStats)
        .unionByName(lshStats).unionByName(mStats)
    }),

    // E53: multi-table (OR-construction) LSH ANN pairs — the recall
    // knob: 8 independent 4-bit tables, candidates colliding in ANY
    // table, exact-cosine verified. e52 measures the recall this buys
    // (0.45 vs 0.04 single-table at sf0.01, sim >= 0.3).
    "e53_lsh_multi_pairs" -> ((s, dir) =>
      Similarity.lshPairsMulti(emb(s, dir), nBits = 4, nTables = 8,
        minSim = 0.3)),

    // E54: IVF with a TRAINED k-means quantizer and nprobe=2 — the real
    // IVF-Flat topology (e6's label quantizer is a stand-in; these
    // cells follow the vector distribution, and nprobe is the recall
    // knob). Centroids are e22's trained model; assignment and probing
    // are per-row expressions over centroid literals, and the probe set
    // broadcasts — the corpus never shuffles.
    "e54_kmeans_ivf_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.kmeansIvfKnn(e.filter(col("vec_id") < 10), e,
        sharedCentroids(s, dir), k = 3, nprobe = 2)
    }),

    // E61: SemDeDup — semantic near-dup pairs WITHIN trained-quantizer
    // cells (nearest of e54's k-means centroids), pairwise cosine only
    // inside a cell. The scale path for e14's label-bucketed cosine
    // dedup: cells follow the embedding distribution, so the quadratic
    // stage is bounded by cell size, which k controls.
    "e61_semantic_dedup" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.semanticDedupPairs(e, sharedCentroids(s, dir), 0.4)
    }),

    // E12: exact distinct counts per group
    "e12_distinct_users" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))),

    // E13: approximate distinct (HLL), ε-GATED (VERDICT r8 #3) — the
    // sketch value is engine-specific, but its error bound is not:
    // emit the exact count plus a flag that the HLL estimate sits
    // within 3× its default rsd (0.05), so the DuckDB oracle asserts
    // the bound (`1 AS within_bound`) and a sketch outside its
    // documented envelope hash-fails the gate. The scalable form of
    // E12: the HLL side never shuffles distinct values, only
    // fixed-size registers.
    "e13_approx_distinct_users" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val ap = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("n_approx"))
      exact.join(ap, Seq("event_type"))
        .select(col("event_type"), col("n_users"),
          (abs(col("n_approx") - col("n_users")) <=
            col("n_users") * lit(0.15)).cast("int").as("within_bound"))
    }),

    // E21: one-pass schema-driven dataset profile of the events table
    // (single global aggregation; the curation-stage quality snapshot)
    "e21_profile_events" -> ((s, dir) =>
      DataProfile.profile(Tables.load(s, dir, "events"))),

    // E22: k-means centroid training (k=8, 2 Lloyd iterations) over the
    // embeddings table — the IVF coarse-quantizer / curation-clustering
    // trainer; flattened (cluster_id, pos, c_val, n_members) output
    "e22_kmeans_centroids" -> ((s, dir) =>
      KMeans.centroidsFlat(emb(s, dir), k = 8, iters = 2)),

    // E21a: the profile with approx (HLL) string cardinalities — the
    // extreme-cardinality swap DataProfile.profile documents —
    // ε-GATED (VERDICT r8 #3): the exact profile plus per-sketched-
    // column bound flags, so the oracle asserts the HLL envelope
    // instead of recording rows-only.
    "e21_profile_events_approx" -> ((s, dir) =>
      DataProfile.profileApproxCheck(Tables.load(s, dir, "events"))),

    // E23: per-event-type exact quantile profile of `value` (drift
    // monitoring between curation stages)
    "e23_quantile_profile" -> ((s, dir) =>
      DataProfile.groupedQuantiles(Tables.load(s, dir, "events"),
        col("event_type"), col("value"))),

    // E23a: the mergeable percentile_approx form (Greenwald-Khanna
    // sketch) — per-group state is a fixed-size sketch, not a value
    // buffer, so group cardinality no longer bounds the operator.
    // ε-GATED (VERDICT r8 #3): per quantile, a flag that the GK
    // estimate's in-group RANK is within 10× its documented relative
    // rank error (1/accuracy) — checked in rank space, so the gate is
    // scale-invariant; the oracle asserts all-1 flags (the exact
    // VALUES are hash-gated by the e23 twin).
    "e23_quantile_profile_approx" -> ((s, dir) =>
      DataProfile.groupedQuantilesApproxCheck(
        Tables.load(s, dir, "events"), col("event_type"),
        col("value"))),

    // E33: streaming windowed-profile replay — the events stream pushed
    // through StreamingProfile.windowed (watermarked tumbling windows,
    // complete-mode AvailableNow replay, like g1's) and hash-compared
    // against a per-minute batch profile oracle. The HLL
    // `value_approx_distinct` column is excluded from the gate — it is
    // the engine-specific sketch (e13 class); every deterministic
    // column (counts, nulls, min/max, rounded avg) is hash-checked.
    // This closes the last of the four streaming operators' replay
    // gates (g1 resampler, e1 dedup, u2 bridge, e33 profile).
    "e33_streaming_profile_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val prof = graft.streaming.StreamingProfile.windowed(
        Tables.normalizeTs(stream), "value")
      StreamingOhlc.replayToBatch(s, prof)
        .select(col("window_start"), col("n_rows"), col("value_nulls"),
          col("value_min"), col("value_max"),
          Rounding.duckRound(col("value_avg"), 6).as("value_avg"))
    }),

    // E24: corpus vocabulary — top-100 tokens by frequency, the
    // tokenizer-training frequency pass
    "e24_vocab_top" -> ((s, dir) => TextAnalysis.topTokens(docs(s, dir))),

    // E24 streaming replay: streaming word-count — the complete-mode
    // windowless aggregation shape (state = one count per distinct
    // token, partial-aggregated per micro-batch into the state store).
    // The replayed count table then takes the batch top-k/rank exactly
    // as topTokens does; convergence to e24's oracle gates the
    // streaming aggregation, the batch side only orders its output.
    "e24_streaming_vocab_replay" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val counts = stream
        .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      StreamingOhlc.replayToBatch(s, counts)
        .orderBy(col("cnt").desc, col("tok"))
        .limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
    }),

    // E34: adjacent-pair frequencies — the counting pass of one BPE
    // merge iteration (top row = the merge rule the trainer picks);
    // map-side pair explode, partial-aggregated, TakeOrderedAndProject
    // top-k with a full tie-break
    "e34_bpe_merge_pairs" -> ((s, dir) =>
      TextAnalysis.bpeMergePairs(docs(s, dir), 50)),

    // E36: per-type winsorization — clamp `value` to its event-type's
    // [p5, p95]; the outlier-capping pass between curation stages. The
    // per-type bounds are a broadcast types-cardinality aggregate
    // joined back: no second pass over the data, no driver scalar.
    "e36_winsorize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val bounds = ev.groupBy(col("event_type")).agg(
        Rounding.duckRound(percentile(col("value"), lit(0.05)), 6)
          .as("lo"),
        Rounding.duckRound(percentile(col("value"), lit(0.95)), 6)
          .as("hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          Rounding.duckRound(
            greatest(col("lo"), least(col("hi"), col("value"))), 6)
            .as("value_w"))
    }),

    // E37: deterministic contrastive negative sampling — k pseudo-random
    // partner docs per document, derived entirely from md5 ranks (no
    // RNG: byte-identical on any cluster layout, the property that
    // makes a 100 TB negatives export reproducible). Scale shape: docs
    // hash into buckets, each doc pairs with the next k docs in md5
    // order WITHIN its bucket (circular) — a bucket-local rank
    // self-join, never a global window or cross join.
    "e37_negative_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val nBuckets = 16
      val ranked = docs(s, dir).select(col("doc_id"),
          Dedup.md5Long(col("doc_id").cast("string")).as("r"))
        .withColumn("bucket", pmod(col("r"), lit(nBuckets)))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("r"),
            col("doc_id"))))
        .withColumn("sz",
          count(lit(1)).over(Window.partitionBy(col("bucket"))))
      ranked
        .withColumn("j", explode(sequence(lit(1), lit(2))))
        .withColumn("nrank",
          (col("rank") - 1 + col("j")) % col("sz") + 1)
        .join(ranked.select(col("bucket"), col("rank").as("nrank"),
          col("doc_id").as("neg_id")), Seq("bucket", "nrank"))
        .filter(col("doc_id") =!= col("neg_id"))
        .select(col("doc_id"), col("j"), col("neg_id"))
    }),

    // E38: per-document top-3 TF-IDF terms — keyword extraction for
    // corpus slicing/labeling; ranked on the ROUNDED score so the
    // per-doc row_number is engine-independent
    "e38_tfidf_top_terms" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(docs(s, dir), 3)
        .withColumn("rk", col("rk").cast("long"))),

    // E39: ordered view→click→purchase funnel per user; later steps
    // NULL when unreached — every stage keys on user_id (one shared
    // hash partitioning, no corpus-wide window)
    "e39_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.load(s, dir, "events"))),

    // E40: cohort retention — users cohorted by first-event day,
    // distinct-user counts at day offsets 0..7; activity set is
    // deduped to (user, day) BEFORE the cohort join
    "e40_retention" -> ((s, dir) =>
      EventAnalytics.retention(Tables.load(s, dir, "events"), 7)),

    // E41: sliding-window chunk export (RAG/context-window cut):
    // 32-token chunks every 24 tokens — a pure map-side explode, the
    // no-shuffle shape a 100 TB chunk export needs
    "e41_chunk_sliding" -> ((s, dir) =>
      TextAnalysis.chunkSliding(docs(s, dir), 32, 24)),

    // E42: PMI collocations — bigram/unigram probability ratio over
    // broadcast corpus totals, min-count 10, top-50 by rounded PMI
    "e42_pmi_collocations" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), 50, 10L)),

    // E43: asymmetric shingle containment |A∩B|/|A| — catches short
    // docs embedded in long ones, which Jaccard's union denominator
    // hides; same df-capped candidate topology as e2
    "e43_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), 5, 0.8, 100)),

    // E44: per-(type, day) volume/value with a 3-day trailing mean —
    // the batch drift dashboard next to the e33 streaming profile; the
    // window runs over the aggregated daily frame only
    "e44_daily_type_stats" -> ((s, dir) =>
      EventAnalytics.dailyTypeStats(Tables.load(s, dir, "events"))),

    // E49: per-source trigram diversity (distinct / total 3-grams) —
    // the templated-text screen: a source whose diversity collapses is
    // emitting boilerplate. One explode + one partial-aggregated
    // groupBy on source; distinct runs inside the aggregate, and the
    // source domain is bounded so the final frame is tiny
    "e49_ngram_diversity" -> ((s, dir) => {
      val wl = docs(s, dir).select(col("source"),
          expr("filter(split(text, ' '), x -> x != '')").as("w"))
        .filter(size(col("w")) >= 3)
      val tri = wl.select(col("source"), explode(expr(
        """transform(sequence(0, size(w) - 3),
          |  i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))"""
          .stripMargin)).as("g"))
      val t = tri.groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"),
          count_distinct(col("g")).as("n_distinct_grams"))
      val d = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      d.join(t, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_grams"),
          col("n_distinct_grams"),
          Rounding.duckRound(col("n_distinct_grams").cast("double") /
            col("n_grams").cast("double"), 6).as("diversity"))
    }),

    // E50: per-source token-distribution KL divergence vs the corpus —
    // the distribution-drift measure a mix planner watches (a source
    // drifting from the corpus distribution shifts the training mix).
    // Same keyed-count topology as tf-idf: (source, tok) counts join
    // the corpus token counts; per-source totals broadcast; the KL sum
    // is a partial-aggregated groupBy on the bounded source domain.
    // Each term is ~1e-3 and the sum rounds at 6 decimals, so the
    // accumulation-order difference between engines is far below the
    // rounding floor.
    "e50_source_kl_divergence" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("source"),
        explode(expr("filter(split(text, ' '), x -> x != '')"))
          .as("tok"))
      val st = tok.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_st"))
      val ts = st.groupBy(col("source")).agg(sum(col("c_st")).as("t_s"))
      val ct = tok.groupBy(col("tok")).agg(count(lit(1)).as("c_t"))
      val tot = ct.agg(sum(col("c_t")).as("t"))
      val ps = col("c_st").cast("double") / col("t_s").cast("double")
      val pc = col("c_t").cast("double") / col("t").cast("double")
      st.join(broadcast(ts), Seq("source"))
        .join(ct, Seq("tok"))
        .crossJoin(broadcast(tot))
        .groupBy(col("source"))
        .agg(Rounding.duckRound(sum(ps * log(ps / pc)), 6).as("kl"))
    }),

    // E48: rolling 7-day active users per day (WAU) — windowed COUNT
    // DISTINCT via explode-to-as-of-days over the DEDUPED (user, day)
    // frame, never raw events
    "e48_rolling_active_users" -> ((s, dir) =>
      EventAnalytics.rollingActiveUsers(
        Tables.load(s, dir, "events"), 7)),

    // E45: weighted deterministic Bernoulli sample — per-row keep
    // probability from a quality proxy (n_chars/200 clamped to 1),
    // realized as an md5-permille threshold: reproducible on any
    // topology, no RNG
    "e45_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        col("doc_id"),
        col("n_chars").cast("double") / lit(200.0))),

    // E46: shard-packed text digests — md5-rank-ordered concat per
    // shard, published as (n_docs, packed_len, packed_md5): the
    // content-addressed manifest of a packed shard export
    "e46_packed_shards" -> ((s, dir) =>
      Packing.packedShards(docs(s, dir), 8)),

    // E36 streaming replay — the stream-STATIC join gate: the events
    // stream enriched against the batch-computed per-type winsorization
    // bounds via a broadcast stream-static join (THE standard streaming
    // enrichment topology: the dimension is bounded, the stream never
    // shuffles) and clamped row by row; the replay must converge to the
    // batch winsorization oracle exactly. Stateless, so append mode
    // emits every row once.
    "e36_streaming_winsorize_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
      val bounds = ev.groupBy(col("event_type")).agg(
        Rounding.duckRound(percentile(col("value"), lit(0.05)), 6)
          .as("lo"),
        Rounding.duckRound(percentile(col("value"), lit(0.95)), 6)
          .as("hi"))
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = Tables.normalizeTs(
        s.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
      val clamped = stream.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          Rounding.duckRound(
            greatest(col("lo"), least(col("hi"), col("value"))), 6)
            .as("value_w"))
      StreamingOhlc.replayToBatchAppend(s, clamped)
    }),

    // E39 streaming replay: the events stream pushed through the keyed
    // funnel state machine (flatMapGroupsWithState, append) — the
    // AvailableNow replay must converge to the batch funnel chain
    // exactly (same gate family as g1/e1/u2/w6/e33). Append mode emits
    // one refined chain per user per batch, so the replay keeps only
    // each user's LATEST emission (max emit_seq) — the gate no longer
    // depends on the fixture replaying as a single micro-batch (a
    // multi-file source or a maxFilesPerTrigger change yields stale
    // earlier emissions, which the dedup discards). Cross-batch
    // out-of-order clicks remain subject to the documented in-order
    // arrival contract.
    "e39_streaming_funnel_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val ins = Tables.normalizeTs(stream)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("event_type"))
        .as[graft.streaming.StreamingFunnel.EvIn]
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingFunnel.funnel(ins).toDF())
        .groupBy(col("user_id"))
        .agg(max(struct(col("emit_seq"), col("view_ts"), col("click_ts"),
          col("purchase_ts"))).as("m"))
        .select(col("user_id"), col("m.view_ts").as("view_ts"),
          col("m.click_ts").as("click_ts"),
          col("m.purchase_ts").as("purchase_ts"))
    }),

    // E25: deterministic shuffle-shard export assignment over documents
    "e25_shuffle_shards" -> ((s, dir) =>
      Sampling.shuffleShards(docs(s, dir).select(col("doc_id")),
        col("doc_id"), nShards = 16)),

    // E26: benchmark decontamination — corpus docs (id >= 10) sharing
    // 5-gram shingles with the "eval set" (id < 10)
    "e26_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(d.filter(col("doc_id") >= 10),
        d.filter(col("doc_id") < 10))
    }),

    // E27: Gopher-style repetition quality signals per document
    "e27_repetition_signals" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(docs(s, dir))),

    // E28: quality-threshold selection — keep docs at or above the
    // corpus p75 quality score; the threshold is a broadcast 1-row
    // aggregate joined back (no driver-side collect), the pattern for
    // any "top X% by score" curation cut
    "e28_quality_select" -> ((s, dir) => {
      val q = TextAnalysis.qualityScore(docs(s, dir))
        .select(col("doc_id"), col("quality"))
      val thr = q.agg(Rounding.duckRound(
        percentile(col("quality"), lit(0.75)), 6).as("thr"))
      q.crossJoin(broadcast(thr))
        .filter(col("quality") >= col("thr"))
        .select(col("doc_id"), col("quality"))
    }),

    // E31: per-label embedding outliers — the 3 vectors least similar
    // to their label centroid (mislabel / off-topic screen)
    "e31_embedding_outliers" -> ((s, dir) =>
      Similarity.labelOutliers(emb(s, dir), k = 3)),

    // E30: cross-source overlap matrix — distinct df-capped shingles
    // shared per source pair, the "which corpora duplicate each other"
    // curation diagnostic; same bucketed-join topology as e2
    "e30_source_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      val ssh = Dedup.cappedShingleHashes(d, 5, 100)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"), col("h")).distinct()
      ssh.as("x").join(ssh.as("y"),
          col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"),
          col("y.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared_shingles"))
    }),

    // E29: pretraining mix planner — per-source sampling rates/epochs
    // hitting a 20k-token budget at 30/20/uniform-rest weights
    "e29_mix_planner" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("source"),
        expr("size(filter(split(text, ' '), x -> x != ''))")
          .cast("long").as("n_toks"))
      Sampling.mixPlan(toks, Seq("src0" -> 0.3, "src1" -> 0.2),
        defaultWeight = 0.5 / 18.0, tokenBudget = 20000.0)
    }),

    // X1: warehouse star join — revenue per nation over
    // lineitem ⋈ orders ⋈ customer ⋈ nation. The big-big join
    // (lineitem⋈orders) shuffles on the order key; dimension joins
    // broadcast (nation explicitly — bounded domain; customer via AQE,
    // which at warehouse scale would flip to shuffle). Money sums
    // accumulate in DECIMAL — exact, order-independent, so the
    // cross-engine match needs no rounding — and cast back to double
    // at the end.
    "x1_star_revenue" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1.0).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))
      l.join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // X2: pricing summary (the classic scan-aggregate): one pass over
    // lineitem, all sums in exact DECIMAL, codegen'd end to end
    "x2_pricing_summary" -> ((s, dir) => {
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc1 = lit(1.0).cast("decimal(3,2)") -
        col("l_discount").cast("decimal(3,2)")
      val tax1 = lit(1.0).cast("decimal(3,2)") +
        col("l_tax").cast("decimal(3,2)")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integral: exact
          sum(price).cast("double").as("sum_base_price"),
          sum(price * disc1).cast("double").as("sum_disc_price"),
          sum(price * disc1 * tax1).cast("double").as("sum_charge"),
          Rounding.duckRound(avg(col("l_quantity")), 6).as("avg_qty"),
          Rounding.duckRound(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n_rows"))
    }),

    // X3: shipping-priority revenue (the classic 3-table join + top-k):
    // customer segment filter → orders date filter → lineitem, revenue
    // in exact DECIMAL, top-10 via TakeOrderedAndProject with a
    // deterministic l_orderkey tie-break. customer is the small side
    // after its segment filter — broadcast; the orders↔lineitem join
    // shuffles once on the order key.
    "x3_shipping_priority" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1.0).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderdate") <
              lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // X5: returned-item revenue report (the customer-grain top-k):
    // which customers drove the most returned revenue in a half-year
    // window. Fact side filters BEFORE the joins (returnflag on
    // lineitem, date on orders — both reach their scans), customer and
    // nation broadcast, and the top-20 is TakeOrderedAndProject over
    // the customer-grain aggregate with a deterministic key tie-break.
    "x5_returned_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1.0).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderdate") >=
                lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // X4: local-supplier volume (the 6-table snowflake with a
    // cross-dimension equality): revenue where the customer's nation IS
    // the supplier's nation, per nation, one region + one order-date
    // window. Scale shape: region⋈nation collapses to a broadcast dim;
    // supplier broadcasts; the only big shuffles are the fact-side
    // orders⋈lineitem keys. The c_nationkey = s_nationkey constraint
    // rides the supplier join as an extra equi-key, never a post-join
    // filter over an exploded frame.
    "x4_local_supplier_volume" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1.0).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))
      val asiaNations = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders")
            .filter(col("o_orderdate") >=
                lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // E16: duplicate clusters — connected components over the e4 SimHash
    // pair graph, min-id per component as the deterministic cluster id;
    // the "pick one canonical doc per dup group" step after any pairwise
    // dedup operator
    "e16_dup_clusters" -> ((s, dir) => {
      val cc = Clustering.connectedComponents(
        Dedup.simhashPairs(docs(s, dir), 3))
      val sizes = cc.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, Seq("label"))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"),
          when(col("id") === col("label"), 1L).otherwise(0L)
            .as("is_canonical"))
    }),

    // E63: exact dedup over NORMALIZED text (lowercase, non-alnum runs
    // → one space, trimmed) — the canonicalization pass production
    // dedup runs before fingerprinting; raw-text e1 keeps case/punct
    // variants apart. On this corpus (already lowercase word-space
    // text) the groups coincide with e1's; the divergent behavior is
    // pinned on a case/punct fixture in ExtOpsSpec.
    "e63_dedup_exact_normalized" -> ((s, dir) =>
      Dedup.exactNormalized(docs(s, dir))),

    // E64: duplicate-aware sampling weights — weight = 1/cluster_size
    // over the e16 duplicate graph, 1.0 for docs outside any cluster:
    // the "down-weight instead of drop" dedup policy (each duplicated
    // content contributes one document-equivalent of training mass in
    // expectation, without discarding variants).
    "e64_dup_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      val cc = Clustering.connectedComponents(Dedup.simhashPairs(d, 3))
      val sizes = cc.groupBy(col("label")).agg(count(lit(1)).as("cs"))
      val clustered = cc.join(sizes, Seq("label"))
        .select(col("id").as("doc_id"), col("cs"))
      d.select(col("doc_id"))
        .join(clustered, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cs"), lit(1L)).as("cluster_size"),
          graft.Rounding.duckRound(
            lit(1.0) / coalesce(col("cs"), lit(1L)), 6).as("weight"))
    }),

    // E16 star variant: the SAME cluster output computed by the
    // adversarial-diameter fallback — alternating large-star/small-star
    // contraction (Clustering.connectedComponentsStar) instead of
    // min-label propagation. Shares e16's oracle: both must reach the
    // identical (doc_id, cluster_id) fixpoint.
    "e16_star_dup_clusters" -> ((s, dir) => {
      val cc = Clustering.connectedComponentsStar(
        Dedup.simhashPairs(docs(s, dir), 3))
      val sizes = cc.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, Seq("label"))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"),
          when(col("id") === col("label"), 1L).otherwise(0L)
            .as("is_canonical"))
    }),

    // E17: concat-and-chunk sequence packing into 2048-token windows
    // (two-phase distributed prefix sum; see graft.ext.Packing)
    "e17_pack_sequences" -> ((s, dir) =>
      Packing.packSequences(
        docs(s, dir).select(col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x != ''))")
            .cast("long").as("n_tokens")),
        seqLen = 2048, nBuckets = 64)),

    // E19: BM25 query-relevance scoring (k1=1.2, b=0.75) — corpus stats
    // stay in-plan as a broadcast 1-row aggregate, no driver scalar
    "e19_bm25" -> ((s, dir) =>
      Relevance.bm25(docs(s, dir), Seq("the", "data", "model"))),

    // E60: BM25 over a query TABLE with per-query top-k (VERDICT r7
    // #6) — the retrieval-eval screen: rank every document against
    // each query's term set, keep the 3 best per query. Ranking is on
    // the 6-decimal-rounded score (then doc_id), so the rank itself is
    // cross-engine deterministic.
    "e60_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        (0L, "the"), (0L, "data"),
        (1L, "spark"), (1L, "window"),
        (2L, "join"), (2L, "vector"), (2L, "stream"))
        .toDF("query_id", "term")
      Relevance.bm25TopK(docs(s, dir), queries, 3)
    }),

    // E20: the composed dedup endgame — near-dup pairs → connected
    // components → ONE canonical doc per cluster, picked by the e7
    // quality score (tie-break: lowest doc_id via the negated-id struct
    // field). What a curation pipeline actually ships: a keep-list.
    "e20_canonical_docs" -> ((s, dir) => {
      val d = docs(s, dir)
      val cc = Clustering.connectedComponents(Dedup.simhashPairs(d, 3))
      val q = TextAnalysis.qualityScore(d)
        .select(col("doc_id"), col("quality"))
      val best = max(struct(col("quality").as("q"),
        (-col("doc_id")).as("negid")))
      cc.join(q, cc("id") === q("doc_id"))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"), best.as("_best"))
        .select(col("cluster_id"), col("cluster_size"),
          (-col("_best").getField("negid")).as("canonical_doc_id"),
          col("_best").getField("q").as("best_quality"))
    }),

    // E32: the curation pipeline END TO END in one plan — SimHash pair
    // graph → connected components → one canonical doc per dup cluster
    // (plus all singleton docs) → median-quality gate over the keep-set
    // → concat-and-chunk packing of the survivors into 2048-token
    // sequences. The LLM-side analogue of `pipeline_hybrid_full`:
    // proof the extension operators compose in a single lazy plan.
    "e32_curation_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val cc = Clustering.connectedComponents(Dedup.simhashPairs(d, 3))
      val q = TextAnalysis.qualityScore(d)
        .select(col("doc_id"), col("quality"))
      val best = max(struct(col("quality").as("q"),
        (-col("doc_id")).as("negid")))
      val canon = cc.join(q, cc("id") === q("doc_id"))
        .groupBy(col("label")).agg(best.as("_b"))
        .select((-col("_b").getField("negid")).as("doc_id"))
      val keep = d.select(col("doc_id"))
        .join(cc.select(col("id").as("doc_id")), Seq("doc_id"),
          "left_anti")
        .unionByName(canon)
      val kq = keep.join(q, Seq("doc_id"))
      val thr = kq.agg(Rounding.duckRound(
        percentile(col("quality"), lit(0.5)), 6).as("thr"))
      val survivors = kq.crossJoin(broadcast(thr))
        .filter(col("quality") >= col("thr")).select(col("doc_id"))
      val toks = d.select(col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x != ''))")
          .cast("long").as("n_tokens"))
      Packing.packSequences(survivors.join(toks, Seq("doc_id")),
        seqLen = 2048, nBuckets = 64)
    }),

    // E18: deterministic stratified sampling — md5-permille buckets with
    // per-length-stratum keep rates (downsample boilerplate-length docs,
    // keep the long tail)
    "e18_stratified_sample" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x != ''))")
          .cast("long").as("n_words"))
      val stratum = when(col("n_words") < 50, "short")
        .when(col("n_words") < 200, "medium").otherwise(lit("long"))
      Sampling.stratifiedSample(t, col("doc_id"), stratum,
          Seq("short" -> 200, "medium" -> 500), defaultPermille = 800)
        .select(col("doc_id"), col("n_words"), col("stratum"),
          col("bucket"))
    }),

    // E89: multi-level ROLLUP in one pass — leaf / subtotal / grand
    // total tagged by grouping_id (first rollup column = high bit on
    // both engines; verified numerically against DuckDB's GROUPING)
    "e89_rollup_stats" -> ((s, dir) =>
      EventAnalytics.rollupStats(Tables.load(s, dir, "events"))),

    // E90: day × type pivot matrix with the domain pinned (no
    // driver-side distinct job), absent cells 0 — FILTER-count semantics
    "e90_pivot_matrix" -> ((s, dir) =>
      EventAnalytics.typeMatrix(Tables.load(s, dir, "events"),
        Seq("click", "error", "purchase", "signup", "view"))),

    // E96: SCD type-2 history of each user's event-type state —
    // gaps-and-islands to validity intervals, last interval open
    "e96_scd2_history" -> ((s, dir) =>
      EventAnalytics.scd2History(Tables.load(s, dir, "events"))),

    // E95: deterministic weighted reservoir (Efraimidis–Spirakis) —
    // exactly-k sample with inclusion ∝ n_chars, hash-derived draws,
    // top-k as TakeOrderedAndProject (no global sort)
    "e95_weighted_reservoir" -> ((s, dir) =>
      Sampling.weightedReservoir(docs(s, dir), col("doc_id"),
          col("n_chars"), 50)
        .select(col("doc_id"), col("n_chars"),
          Rounding.duckRound(col("samp_key"), 6).as("samp_key"))),

    // E87: Bloom-pruned decontamination with an EXACT final answer —
    // the benchmark set compresses to 4096 bits that broadcast as a
    // literal into a codegen'd probe over the training scan; only
    // bf_hit candidates (true matches + the visible false-positive
    // rate) pay the exact fingerprint join. The scale shape when the
    // clean set is too big to broadcast raw but its bits are not.
    // Matching runs on the 5-word-PREFIX fingerprint (the n-gram-style
    // key real decontamination uses — raw-text md5 has zero collisions
    // in this corpus, prefix keys plant 9 true hits at sf0.01).
    "e87_bloom_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val prefixFp = md5(array_join(
        slice(split(col("text"), " "), 1, 5), " "))
      val bench = d.filter(col("doc_id") % 7 === 0)
        .select(prefixFp.as("fp"))
      val words = Sketches.bloomBuild(bench, col("fp")).toSeq
      val train = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), prefixFp.as("fp"))
        .withColumn("bf_hit",
          Sketches.bloomMightContain(words, col("fp")))
      // exact verify: candidate-sized join (AQE broadcasts the small
      // side); non-candidates are PROVEN clean by the no-false-negative
      // contract, so they skip the join entirely
      val verified = train.filter(col("bf_hit"))
        .join(bench.distinct().withColumn("hit", lit(true)),
          Seq("fp"), "left")
        .select(col("doc_id"),
          coalesce(col("hit"), lit(false)).as("contaminated"))
      train.join(verified, Seq("doc_id"), "left")
        .select(col("doc_id"), col("bf_hit"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"))
    }),

    // E88: count-min heavy hitters with exact verification — the d×w
    // counter table broadcasts as a literal, est >= t selects a
    // guaranteed SUPERSET of the true heavy users (CMS never
    // undercounts), and only those candidates pay the exact count.
    // The full per-key exact groupBy this avoids is the whole point
    // when the key space is corpus-sized.
    "e88_heavy_hitters_cms" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val key = col("user_id").cast("string")
      val counters = Sketches.cmsBuild(ev, key).toSeq
      val cand = ev.select(col("user_id")).distinct()
        .withColumn("cms_est", Sketches.cmsEstimate(counters, key))
        .filter(col("cms_est") >= 75L)
      ev.join(broadcast(cand), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("cms_est")).as("cms_est"),
          count(lit(1)).as("n_events"))
        .withColumn("is_heavy", col("n_events") >= 75L)
        .select(col("user_id"), col("cms_est"), col("n_events"),
          col("is_heavy"))
    }),

    // E91: PageRank over the customer↔supplier trade graph (distinct
    // order lines as undirected edges) — 5 power-iteration rounds,
    // each one co-partitioned join + one aggregation, per-round
    // lineage truncation. Ranks scaled by n for a stable rounding
    // magnitude.
    "e91_pagerank" -> ((s, dir) => {
      val pairs = tradePairs(s, dir)
      val edges = pairs
        .select(col("c").as("src"), (col("sp") + 1000000L).as("dst"))
        .unionByName(pairs.select((col("sp") + 1000000L).as("src"),
          col("c").as("dst")))
      val pr = GraphOps.pageRank(edges, iters = 5, damping = 0.85)
      // broadcast 1-row scalar (the repo's count-scalar idiom) — off
      // the CHECKPOINTED result frame, so the scaling pass never
      // re-derives the edge list from the raw tables
      val nn = pr.agg(count(lit(1)).cast("double").as("n"))
      pr.crossJoin(broadcast(nn))
        .withColumn("rank_scaled",
          Rounding.duckRound(col("rank") * col("n"), 6))
        .select(col("node"), col("rank_scaled"))
    }),

    // E92: Z-order layout scorecard — Morton-interleaved (user bucket,
    // value bucket) key vs the naive time layout, per-"file" min-max
    // envelopes from a deterministic row_number file map (the stats a
    // parquet footer would carry; the real writer is
    // Layout.zorderWrite, spec-pinned)
    "e92_zorder_layout" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val base = ev.select(col("event_id"), col("ts"),
          pmod(col("user_id"), lit(256L)).as("x"),
          least(lit(255L), floor(col("value") / 2)).as("y"))
        .withColumn("zkey", Layout.interleaveBits(col("x"), col("y")))
      Layout.fileStats(base, "zorder",
          Seq(col("zkey"), col("event_id")), 1000)
        .unionByName(Layout.fileStats(base, "time",
          Seq(col("ts"), col("event_id")), 1000))
    }),

    // E94: the ANN serving path AS A STREAM — query vectors arrive in
    // three staged micro-batches and each batch serves against the
    // PERSISTED index (model halves + coded corpus loaded once,
    // stream-static by construction inside foreachBatch; per-query
    // top-k composes trivially over query batches). The appended union
    // of the replay must equal the batch serve, so this shares e83's
    // oracle — the production shape: a long-lived serving job absorbing
    // query traffic against an index artifact it never rebuilds.
    "e94_streaming_ann_serve_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val e = emb(s, dir)
      // serve from e83's artifact (VERDICT r12 #4): same model + corpus
      // → identical index; whichever gate runs first pays the ONE build
      val path = graft.Scratch.dir("ivfpq_index", dir)
      VectorIndex.writeOnce(s, sharedIvfPq(s, dir), e, path)
      val model = VectorIndex.read(s, path)
      val coded = VectorIndex.readCoded(s, path)
      val scratch = graft.Scratch.fresh("ann_serve", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r => e.filter(col("vec_id") < 10 &&
          col("vec_id") % 3 === r)),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          model.topKFromCoded(b, coded, 3)
            .write.mode("overwrite").parquet(s"$scratch/out_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // explicit batch dirs, not a glob — FileStreamSink's metadata
      // probe logs a spurious FileNotFound stack trace on glob paths
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E231: streaming ANN serving WITH incremental index append
    // (VERDICT r15 #7 — e94's serving loop composed with e86's append
    // path as ONE continuous query): the index is built and persisted
    // on the pre-append corpus (vec_id % 10 != 0); the stream then
    // carries tagged records — micro-batches 0-1 APPEND the held-out
    // vectors (encoded with the persisted model halves, no retrain,
    // no re-encode of the old corpus), micro-batch 2 carries the
    // probes. Each batch appends BEFORE it serves and re-reads the
    // cell-partitioned coded store, so batch N+1's probes see batch
    // N's appends through nothing but the storage layer (the model
    // halves load once and never change — the production contract).
    // The probes therefore serve against the FULL corpus and the gate
    // shares e86's oracle; StreamingAnnAppendSpec additionally pins
    // MID-replay visibility (a probe between the appends sees exactly
    // the corpus-so-far).
    "e231_streaming_index_append_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val e = emb(s, dir)
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val model = ModelCache.cached(
        s"ivfpq|$dir|old10|ck=8|m=4|k=8|it=2")(
        Similarity.trainIvfPq(old))
      val scratch = graft.Scratch.fresh("ann_serve_append", dir)
      val path = s"$scratch/index"
      VectorIndex.write(s, model, old, path)
      val served = VectorIndex.read(s, path)
      graft.streaming.StagedReplay.stageFiles(Seq(
        e.filter(col("vec_id") % 20 === 0).withColumn("kind",
          lit("append")),
        e.filter(col("vec_id") % 10 === 0 &&
          col("vec_id") % 20 =!= 0).withColumn("kind", lit("append")),
        e.filter(col("vec_id") < 10).withColumn("kind", lit("query"))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          val adds = b.filter(col("kind") === "append").drop("kind")
          // appendOnce, not append: foreachBatch is at-least-once, and
          // a redelivered batch must not double its vectors (the
          // parquet sink below is overwrite-idempotent; the index
          // append needs the batchId marker — ADVICE r16)
          if (!adds.isEmpty) VectorIndex.appendOnce(s, path, adds, id)
          // re-read coded AFTER this batch's append: the serve sees
          // every vector appended so far, through storage alone
          served.topKFromCoded(b.filter(col("kind") === "query")
              .drop("kind"),
            VectorIndex.readCoded(s, path), 3)
            .write.mode("overwrite").parquet(s"$scratch/out_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(graft.StoreFs.batchDirs(s, scratch,
        prefix = "out_"): _*)
    }),

    // E93: exact all-pairs TF-IDF cosine ≥ 0.3 over 5-shingle features
    // via Bayardo prefix filtering — candidates from suffix-bounded
    // inverted-index prefixes only, then exact verification; the oracle
    // computes the UNPRUNED all-shared-term join, so any pair the
    // prefix filter loses breaks the gate
    "e93_allpairs_tfidf_cosine" -> ((s, dir) =>
      AllPairs.cosinePairs(docs(s, dir), tau = 0.3)),

    // E97: sorted-neighborhood blocking (the fourth candidate family)
    // — each doc against its 3 successors in normalized-text order,
    // realized WITHOUT a global window (range-partitioned local sorts
    // + prefix-summed rank offsets + an equi-join on rank+o), every
    // candidate exact-Jaccard verified
    "e97_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(docs(s, dir), window = 3)),

    // E98: snapshot CDC — the change log between two corpus versions
    // (deterministic synthetic v2: %11 deleted, %7 edited, %13 cloned
    // as additions) from one co-partitioned full-outer fingerprint
    // join
    "e98_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val v2 = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(col("text"), lit(" new"))))
      Cdc.snapshotDiff(d, v2).filter(col("status") =!= "unchanged")
    }),

    // E99: the count-min sketch maintained AS A STREAM — each event
    // micro-batch emits its (j, h, c) cell frame (sketch-sized, never
    // event-sized) into an append-only store; counts are additive, so
    // the summed store IS the batch sketch exactly and the replay
    // shares e88's oracle verbatim. The mergeability that makes
    // sketches the right shape for distributed and incremental
    // aggregation, demonstrated end-to-end.
    "e99_streaming_cms_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
      val key = col("user_id").cast("string")
      val scratch = graft.Scratch.fresh("cms_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r =>
          ev.filter(col("event_id") % 3 === r).select(col("user_id"))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Sketches.cmsCells(b, col("user_id").cast("string"))
            .write.mode("overwrite").parquet(s"$scratch/cells_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cellDirs = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("cells_")).map(_.getPath).sorted
      val merged = s.read.parquet(cellDirs.toIndexedSeq: _*)
        .groupBy(col("j"), col("h")).agg(sum(col("c")).as("c"))
      val counters = Sketches.cmsFromCells(merged).toSeq
      val cand = ev.select(col("user_id")).distinct()
        .withColumn("cms_est", Sketches.cmsEstimate(counters, key))
        .filter(col("cms_est") >= 75L)
      ev.join(broadcast(cand), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("cms_est")).as("cms_est"),
          count(lit(1)).as("n_events"))
        .withColumn("is_heavy", col("n_events") >= 75L)
        .select(col("user_id"), col("cms_est"), col("n_events"),
          col("is_heavy"))
    }),

    // E100: per-user EWMA (pandas ewm(adjust=True).mean()) as a ratio
    // of two rank-ordered running sums — deterministic fp accumulation,
    // no renormalization pass
    "e100_ewma" -> ((s, dir) =>
      EventAnalytics.ewma(Tables.load(s, dir, "events"), alpha = 0.1)),

    // E101: robust MAD outlier flags per event type — rounded-stat
    // comparisons so interpolation ulps can never flip a boundary row
    "e101_mad_outliers" -> ((s, dir) =>
      EventAnalytics.madOutliers(Tables.load(s, dir, "events"), k = 3.0)),

    // E103: equi-depth decile binning per event type — the
    // discretization feeding equi-depth histograms and PSI drift
    "e103_equidepth_bins" -> ((s, dir) =>
      EventAnalytics.equiDepthBins(Tables.load(s, dir, "events"))),

    // E104: Bollinger bands per user — trailing 20-row mean ± 2σ with
    // breach flags; NULL bands where the frame holds < 2 samples
    "e104_bollinger_bands" -> ((s, dir) =>
      EventAnalytics.bollingerBands(Tables.load(s, dir, "events"))),

    // E106: quiet-gap throttle — drop events within an hour of the
    // same user's previous event (lag form; microsecond integers)
    "e106_quiet_gap_filter" -> ((s, dir) =>
      EventAnalytics.quietGapFilter(Tables.load(s, dir, "events"))),

    // E114: entity resolution end-to-end — sorted-neighborhood
    // blocking (e97) → Jaccard ≥ 0.3 match edges → connected-component
    // closure → one entity id per doc (singletons are their own
    // entity). The record-linkage pipeline composed from
    // already-oracled stages; the oracle rebuilds the whole chain
    // including the recursive closure.
    "e114_entity_resolution" -> ((s, dir) => {
      val d = docs(s, dir)
      val edges = Dedup.sortedNeighborhoodPairs(d, window = 3)
        .filter(col("jaccard") >= 0.3)
        .select(col("doc_a"), col("doc_b"))
      val comp = Clustering.connectedComponents(edges)
      val assigned = d.select(col("doc_id"))
        .join(comp, d("doc_id") === comp("id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("entity_id"))
      val sizes = assigned.groupBy(col("entity_id"))
        .agg(count(lit(1)).as("entity_size"))
      assigned.join(sizes, Seq("entity_id"))
        .select(col("doc_id"), col("entity_id"), col("entity_size"))
    }),

    // E115: content-addressed dataset identity — an order-free
    // Merkle-style fingerprint (bit_xor of row hashes + count) per
    // table, so two 100 TB snapshots compare by exchanging 3 numbers
    // instead of data. Row serialization uses only exactly-stringable
    // columns (ints, strings, µs timestamps) — float columns would
    // need a canonical integer encoding first (the e98 CDC diff is
    // the row-level tool when fingerprints differ).
    "e115_dataset_fingerprint" -> ((s, dir) => {
      def fp(name: String, df: DataFrame,
             row: org.apache.spark.sql.Column) =
        df.select(Dedup.md5Long(row).as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_fp"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("xor_fp"))
      val d = docs(s, dir)
      val ev = Tables.load(s, dir, "events")
      fp("documents", d,
        concat_ws("|", col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
        .unionByName(fp("events", ev,
          concat_ws("|", col("event_id"), unix_micros(col("ts")),
            col("user_id"), col("event_type"), col("props"))))
    }),

    // E113: consistent-hash rebalancing scorecard — modulo vs ring
    // placement under 8 → 9 shards over the document keys (the
    // store-topology decision; ring moves ~1/9, modulo ~8/9)
    "e113_shard_rebalance" -> ((s, dir) =>
      ConsistentHash.rebalanceScore(
        docs(s, dir).select(col("doc_id").cast("string").as("k")), 8)),

    // E110: keep-anchored debounce — kept iff an hour since the last
    // KEPT event (a sequential per-key fold no window expresses;
    // typed flatMapGroups, recursive-CTE oracle)
    "e110_anchored_debounce" -> ((s, dir) =>
      EventAnalytics.anchoredDebounce(Tables.load(s, dir, "events"))),

    // E112: the anchored debounce AS A STREAM — one long of state per
    // key, the identical fold as the batch operator over time-staged
    // batches, so the replay shares e110's recursive-CTE oracle
    "e112_streaming_debounce_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"))
      val bounds = ev.agg(expr(
          "percentile(unix_micros(ts), array(0.33, 0.66))"))
        .head().getSeq[Double](0)
      val m = unix_micros(col("ts"))
      val scratch = graft.Scratch.fresh("debounce_stream", dir)
      graft.streaming.StagedReplay.stageFiles(Seq(
          ev.filter(m <= bounds(0)),
          ev.filter(m > bounds(0) && m <= bounds(1)),
          ev.filter(m > bounds(1))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingDebounce.debounce(
          stream.as[graft.streaming.StreamingDebounce.EventIn]).toDF())
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"))
    }),

    // E109: PSI drift between the first- and second-half snapshots
    // (median-ts split) per event type — reference-deciled bins,
    // Laplace-smoothed shares
    "e109_psi_drift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val mid = ev.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0)
      val kv = ev.select(col("event_type").as("key"), col("value"),
        unix_micros(col("ts")).as("m"))
      DataProfile.psiDrift(
          kv.filter(col("m") <= mid).select(col("key"), col("value")),
          kv.filter(col("m") > mid).select(col("key"), col("value")))
        .withColumnRenamed("key", "event_type")
    }),

    // E107: bipartite projection with the hot-key cap — suppliers
    // linked by >= 190 shared customers (the co-occurrence graph build)
    "e107_copurchase_projection" -> ((s, dir) =>
      GraphOps.bipartiteProjection(tradePairs(s, dir),
        minShared = 190L)),

    // E108: per-node triangle participation over the e107 projection —
    // the clustering-structure probe (compact-forward 3-way equi-join)
    "e108_triangle_count" -> ((s, dir) =>
      GraphOps.triangleParticipation(
        GraphOps.bipartiteProjection(tradePairs(s, dir),
          minShared = 190L))),

    // E105: hybrid retrieval via reciprocal rank fusion — the serving
    // pattern that combines a lexical arm (BM25 top-10) with a vector
    // arm (the SHARED composed IVF-PQ serve, top-10) into one ranking:
    // rrf = Σ 1/(60 + rank) over the arms a doc appears in, fused with
    // a full-outer join on (query, doc). Both arms are the
    // already-oracled operators, so the fusion gate checks only the
    // combination algebra — and the ranking runs on the ROUNDED score,
    // the cross-engine-deterministic rank contract of e60.
    "e105_rrf_fusion" -> ((s, dir) => rrfFused(s, dir)),

    // E111: nDCG@5 of the fused ranking against label relevance — the
    // graded-metric companion to the recall gates (e52/e79): dcg from
    // the served ranking, idcg from the per-query relevant count,
    // log2 discounts as ln/ln(2) on both engines, stats rounded
    // before the ratio
    "e111_ndcg_fusion" -> ((s, dir) => {
      val fused = rrfFused(s, dir)
      val lab = emb(s, dir).select(col("vec_id"), col("label"))
      val ql = lab.filter(col("vec_id") < 3)
        .select(col("vec_id").cast("long").as("query_id"),
          col("label").as("qlabel"))
      val rel = fused
        .join(lab, fused("doc_id") === lab("vec_id"))
        .join(broadcast(ql), Seq("query_id"))
        .withColumn("rel",
          when(col("label") === col("qlabel"), lit(1.0))
            .otherwise(lit(0.0)))
      val dcg = rel.groupBy(col("query_id"))
        .agg(Rounding.duckRound(sum(col("rel") /
          (log(col("rnk") + 1) / log(lit(2.0)))), 6).as("dcg"))
      val rcount = lab.join(broadcast(ql),
          col("label") === col("qlabel"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("r"))
      val idcg = rcount
        .withColumn("i", explode(sequence(lit(1), lit(5))))
        .filter(col("i") <= col("r"))
        .groupBy(col("query_id"))
        .agg(Rounding.duckRound(sum(lit(1.0) /
          (log(col("i") + 1) / log(lit(2.0)))), 6).as("idcg"))
      dcg.join(idcg, Seq("query_id"))
        .withColumn("ndcg",
          Rounding.duckRound(col("dcg") / col("idcg"), 6))
        .select(col("query_id"), col("dcg"), col("idcg"), col("ndcg"))
    }),

    // E102: the EWMA as a STATEFUL STREAM — flatMapGroupsWithState
    // keeps the batch form's two running sums as O(1) per-key state
    // and folds time-staged micro-batches with the SAME adds in the
    // same order, so the replay is bit-identical to e100's window form
    // (whose oracle gates it verbatim). Stage boundaries come from ts
    // percentiles (order-preserving under any data regeneration).
    "e102_streaming_ewma_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"))
      val bounds = ev.agg(expr(
          "percentile(unix_micros(ts), array(0.33, 0.66))"))
        .head().getSeq[Double](0)
      val m = unix_micros(col("ts"))
      val scratch = graft.Scratch.fresh("ewma_stream", dir)
      graft.streaming.StagedReplay.stageFiles(Seq(
          ev.filter(m <= bounds(0)),
          ev.filter(m > bounds(0) && m <= bounds(1)),
          ev.filter(m > bounds(1))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingEwma.ewma(
          stream.as[graft.streaming.StreamingEwma.EventIn]).toDF())
        .select(col("user_id"), col("event_id"), col("ts"),
          col("ewma_value"))
    }),

    // E118: per-user running-peak drawdown — peak, fractional fall,
    // and the CAUSAL worst-so-far (the streaming twin e125 folds the
    // identical sequence; see EventAnalytics.maxDrawdown)
    "e118_max_drawdown" -> ((s, dir) =>
      EventAnalytics.maxDrawdown(Tables.load(s, dir, "events"))),

    // E119: anchored VWAP per part in shipdate order — rank-ordered
    // running sums, bit-identical cross-engine before the one rounding
    "e119_anchored_vwap" -> ((s, dir) =>
      EventAnalytics.anchoredVwap(Tables.load(s, dir, "lineitem"))),

    // E120: per-type least-squares trend of value vs days — slope /
    // intercept / R² from round-before-use co-moments
    "e120_trend_regression" -> ((s, dir) =>
      EventAnalytics.trendRegression(Tables.load(s, dir, "events"))),

    // E121: pairwise Pearson matrix of the lineitem numerics — all six
    // coefficients from ONE partial-aggregated scan, then unpivoted
    "e121_corr_matrix" -> ((s, dir) =>
      DataProfile.corrMatrix(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // E122: first-order Markov transition matrix of per-user event
    // sequences — P(next | prev) with exact integer-count division
    "e122_markov_transitions" -> ((s, dir) =>
      EventAnalytics.markovTransitions(Tables.load(s, dir, "events"))),

    // E123: per-type autocorrelation at lags 1–3 — the seasonality /
    // momentum screen; corr skips leading NULL pairs on both engines
    "e123_acf" -> ((s, dir) =>
      EventAnalytics.acf(Tables.load(s, dir, "events"))),

    // E124: 2-D skyline (Pareto frontier) of distinct (price, qty),
    // both maximized — lossless bucket prune feeds the exact sorted
    // scan only survivors; the oracle runs the naive global form
    "e124_skyline" -> ((s, dir) =>
      Skyline.skylineMax2D(
        Tables.load(s, dir, "lineitem")
          .select(col("l_extendedprice").as("price"),
            col("l_quantity").as("qty")),
        "price", "qty")),

    // E125: the streaming drawdown twin — per-user GroupState folding
    // (peak, maxDd) over a three-stage time-ordered replay; gated by
    // the e118 oracle VERBATIM (bit-identical, not merely close)
    "e125_streaming_drawdown_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"))
      val bounds = ev.agg(expr(
          "percentile(unix_micros(ts), array(0.33, 0.66))"))
        .head().getSeq[Double](0)
      val m = unix_micros(col("ts"))
      val scratch = graft.Scratch.fresh("drawdown_stream", dir)
      graft.streaming.StagedReplay.stageFiles(Seq(
          ev.filter(m <= bounds(0)),
          ev.filter(m > bounds(0) && m <= bounds(1)),
          ev.filter(m > bounds(1))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingDrawdown.drawdown(
          stream.as[graft.streaming.StreamingDrawdown.EventIn]).toDF())
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"), col("peak"), col("drawdown"),
          col("max_drawdown"))
    }),

    // E126: k-core of the co-purchase graph — iterative peeling TO THE
    // FIXPOINT (settles in 2 on this graph, so the 6-round unrolled
    // oracle matches exactly: peels past the fixpoint are no-ops),
    // the pageRank checkpoint-per-round topology
    "e126_kcore" -> ((s, dir) =>
      GraphOps.kCore(
        GraphOps.bipartiteProjection(tradePairs(s, dir),
          minShared = 190L).select(col("node_a"), col("node_b")),
        k = 3)),

    // E127: BFS hop distance from the smallest supplier node —
    // frontier expansion with min-merge, stopping early at the
    // fixpoint (empty frontier); the hop budget 8 is SEMANTIC here
    // because the oracle's recursive CTE bounds at d < 8 identically
    "e127_hop_distance" -> ((s, dir) => {
      val edges = GraphOps.bipartiteProjection(tradePairs(s, dir),
        minShared = 190L).select(col("node_a"), col("node_b"))
      // seed = smallest node id; the minimum endpoint of any edge is
      // always a node_a (canonical ordering) — one bounded scalar,
      // like pageRank's node count. An empty graph (the shared-count
      // threshold is density-dependent across SFs) has no seed and an
      // empty reachability set.
      val row = edges.agg(min(col("node_a"))).head()
      if (row.isNullAt(0))
        s.range(0).select(col("id").as("node"), col("id").as("hops"))
      else GraphOps.hopDistance(edges, row.getLong(0), maxHops = 8)
    }),

    // E128: Zipf fit of the corpus frequency spectrum — ln(freq) vs
    // ln(rank) least squares over the e24 vocabulary
    "e128_zipf_fit" -> ((s, dir) =>
      TextAnalysis.zipfFit(docs(s, dir))),

    // E129: daily realized volatility per user — Σ(ln ratio)² of
    // within-day consecutive values; days are independent by
    // construction (the lag partitions on (user, day))
    "e129_realized_volatility" -> ((s, dir) =>
      EventAnalytics.realizedVolatility(Tables.load(s, dir, "events"))),

    // E130: per-type higher moments (stddev/skewness/excess kurtosis)
    // from explicitly computed scaled central moments — built-in
    // skew/kurtosis aggregates differ across engines (sample vs
    // population), so the moments are the shared truth
    "e130_moment_stats" -> ((s, dir) =>
      DataProfile.momentStats(Tables.load(s, dir, "events"),
        "event_type", "value")),

    // E131: market-basket association rules over the e107 candidate
    // set — support / confidence / lift from exact integer counts
    "e131_association_rules" -> ((s, dir) =>
      GraphOps.associationRules(tradePairs(s, dir), minShared = 190L)),

    // E132: quantile normalization of per-(lang, source) length
    // distributions onto the lang-wide reference deciles — the
    // batch-effect correction before mixing sources
    "e132_quantile_normalize" -> ((s, dir) =>
      DataProfile.quantileNormalize(docs(s, dir), "lang", "source",
        "doc_id", "n_chars")),

    // E133: daily TWAP per user — duration-weighted mean in int64
    // cents × microsecond fixed point (the e119 contract)
    "e133_twap" -> ((s, dir) =>
      EventAnalytics.twap(Tables.load(s, dir, "events"))),

    // E134: Benford first-digit screen of prices — exact digit from
    // the int64 cents string head, χ² terms per digit
    "e134_benford" -> ((s, dir) =>
      DataProfile.benfordDigits(Tables.load(s, dir, "lineitem"),
        "l_extendedprice")),

    // E135: two-sided CUSUM drift detector — the per-key sequential
    // fold (flatMapGroups), gated by a recursive-CTE walk of the
    // identical double arithmetic
    "e135_cusum" -> ((s, dir) =>
      EventAnalytics.cusum(Tables.load(s, dir, "events"))),

    // E136: the streaming CUSUM twin — (s⁺, s⁻) as GroupState, the
    // trained reference mean passed in; e135's oracle gates the
    // replay verbatim (bit-identical fold)
    "e136_streaming_cusum_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"))
      val meanS = graft.Rounding.duckRoundDouble(
        ev.agg(avg(col("value") / lit(100.0))).head().getDouble(0), 6)
      val bounds = ev.agg(expr(
          "percentile(unix_micros(ts), array(0.33, 0.66))"))
        .head().getSeq[Double](0)
      val m = unix_micros(col("ts"))
      val scratch = graft.Scratch.fresh("cusum_stream", dir)
      graft.streaming.StagedReplay.stageFiles(Seq(
          ev.filter(m <= bounds(0)),
          ev.filter(m > bounds(0) && m <= bounds(1)),
          ev.filter(m > bounds(1))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingCusum.cusum(
          stream.as[graft.streaming.StreamingCusum.EventIn],
          meanS).toDF())
        .select(col("user_id"), col("event_id"), col("ts"),
          col("s_pos"), col("s_neg"), col("alarm"))
    }),

    // E137: point-in-time dimension join — every event enriched with
    // its SCD2 state AS OF its own timestamp (the feature-store
    // correctness join that prevents label leakage), composed from
    // the already-oracled e96 history and the j5 as-of machinery
    "e137_pit_dimension_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val dim = EventAnalytics.scd2History(ev)
        .select(col("user_id"), col("valid_from"),
          col("event_type").as("state_type"))
      graft.ops.AsofJoin.asof(
          ev.select(col("user_id"), col("event_id"), col("ts")),
          dim, Seq("user_id"), "ts", "valid_from", Seq("state_type"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("asof_state_type").as("state_type"),
          col("asof_ts").as("valid_from"))
    }),

    // E138: last-touch attribution — purchases credit the latest
    // preceding view/click within 7 days via one causal
    // ignore-nulls window (no self-join, no pair expansion)
    "e138_attribution" -> ((s, dir) =>
      EventAnalytics.lastTouchAttribution(
        Tables.load(s, dir, "events"))),

    // E139: feature hashing — tokens into 64 signed slots, the
    // vocabulary-free fixed-width featurization
    "e139_feature_hash" -> ((s, dir) =>
      TextAnalysis.featureHash(docs(s, dir))),

    // E140: declarative expectations report — five rules, one scan;
    // the soft value<=100 rule FAILS at its 10% budget by design
    // (13.2% of values exceed 100), proving the verdict path
    "e140_expectations" -> ((s, dir) =>
      DataProfile.expectations(Tables.load(s, dir, "events"), Seq(
        ("value_positive", col("value") > 0, 0.0),
        ("value_le_100", col("value") <= lit(100.0), 0.10),
        ("known_event_type", col("event_type").isin(
          "view", "click", "purchase", "signup", "error"), 0.0),
        ("user_id_not_null", col("user_id").isNotNull, 0.0),
        ("ts_in_window",
          col("ts") >= lit("2024-01-01").cast("timestamp") &&
            col("ts") < lit("2024-02-01").cast("timestamp"), 0.0)))),

    // E141: per-type CDF transform — tie-broken cume_dist is exactly
    // rank/n on both engines
    "e141_cdf_transform" -> ((s, dir) =>
      EventAnalytics.cdfTransform(Tables.load(s, dir, "events"))),

    // E142: the streaming attribution twin — the last touch rides in
    // GroupState, purchases emit on arrival; e138's oracle gates the
    // replay verbatim
    "e142_streaming_attribution_replay" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
      val bounds = ev.agg(expr(
          "percentile(unix_micros(ts), array(0.33, 0.66))"))
        .head().getSeq[Double](0)
      val m = unix_micros(col("ts"))
      val scratch = graft.Scratch.fresh("attr_stream", dir)
      graft.streaming.StagedReplay.stageFiles(Seq(
          ev.filter(m <= bounds(0)),
          ev.filter(m > bounds(0) && m <= bounds(1)),
          ev.filter(m > bounds(1))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      StreamingOhlc.replayToBatchAppend(s,
        graft.streaming.StreamingAttribution.attribute(
          stream.as[graft.streaming.StreamingAttribution.EventIn])
          .toDF())
        .select(col("user_id"), col("event_id"), col("ts"),
          col("touch_type"), col("touch_event_id"))
    }),

    // E143: half-life-decayed trending suppliers — freshness-weighted
    // volume, ranked on the rounded score (the e60 contract)
    "e143_trending_decay" -> ((s, dir) =>
      EventAnalytics.decayTrending(Tables.load(s, dir, "lineitem"))),

    // E144: latest-wins state snapshot per user — the denormalized
    // current-state table beside the event log
    "e144_latest_state" -> ((s, dir) =>
      EventAnalytics.latestState(Tables.load(s, dir, "events"))),

    // E145: weekly growth-accounting matrix — new / retained /
    // resurrected / churned from presence-set algebra on (user, week)
    "e145_churn_matrix" -> ((s, dir) =>
      EventAnalytics.churnMatrix(Tables.load(s, dir, "events"))),

    // E146: χ² independence of event type × day-of-week — integer
    // epoch-day arithmetic (engine dayofweek conventions disagree)
    "e146_chisq_independence" -> ((s, dir) =>
      DataProfile.chisqIndependence(Tables.load(s, dir, "events"),
        "event_type", "ts")),

    // E147: exact phrase search over positional postings — the
    // adjacency walk tf alone cannot answer
    "e147_phrase_search" -> ((s, dir) =>
      TextAnalysis.phraseSearch(docs(s, dir), Seq("table", "hash"))),

    // E148: the CDC closure — apply the e98 diff to v1 and prove the
    // merge equals v2 by exchanging e115 fingerprints, not rows
    "e148_cdc_apply" -> ((s, dir) => {
      val d = docs(s, dir)
      val v2 = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(col("text"), lit(" new"))))
      val merged = Cdc.applyDiff(d, v2, Cdc.snapshotDiff(d, v2))
      def fp(df: DataFrame, nName: String, fName: String) =
        df.select(Dedup.md5Long(concat_ws("|", col("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars")))
            .as("h"))
          .agg(count(lit(1)).as(nName),
            expr("bit_xor(h)").as(fName))
      fp(merged, "n_merged", "fp_merged")
        .join(broadcast(fp(v2, "n_target", "fp_target")))
        .select(col("n_merged"), col("n_target"), col("fp_merged"),
          col("fp_target"),
          (col("n_merged") === col("n_target") &&
            col("fp_merged") === col("fp_target")).as("fp_match"))
    }),

    // E149: CUBE of (returnflag, linestatus) — every margin in one
    // Expand + one partial-aggregated shuffle
    "e149_cube_stats" -> ((s, dir) =>
      EventAnalytics.cubeStats(Tables.load(s, dir, "lineitem"))),

    // E150: leakage-safe trailing 24 h features for every purchase —
    // per-key RANGE frames on microsecond integers, cents-exact sums
    "e150_trailing_features" -> ((s, dir) =>
      EventAnalytics.trailingFeatures(Tables.load(s, dir, "events"))),

    // E151: Roll's effective-spread estimator — the bid-ask bounce
    // read out of the trade series alone via −cov(Δpₜ, Δpₜ₋₁)
    "e151_roll_spread" -> ((s, dir) =>
      EventAnalytics.rollSpread(Tables.load(s, dir, "events"))),

    // E152: Lo-MacKinlay variance ratio VR(4) — the random-walk test
    // (this corpus measures ≈ 0.25: i.i.d. noise, not a walk)
    "e152_variance_ratio" -> ((s, dir) =>
      EventAnalytics.varianceRatio(Tables.load(s, dir, "events"))),

    // E153: day-of-week seasonal indices — the deseasonalization
    // profile monitoring baselines divide out
    "e153_seasonal_index" -> ((s, dir) =>
      DataProfile.seasonalIndex(Tables.load(s, dir, "events"),
        "event_type", "ts", "value")),

    // E154: personalized PageRank seeded at the smallest node — rank
    // as PROXIMITY to the seed (the related-items walk); an empty
    // graph at other SFs degrades to an empty result (the e127 rule)
    "e154_personalized_pagerank" -> ((s, dir) => {
      val edges = GraphOps.bipartiteProjection(tradePairs(s, dir),
        minShared = 190L).select(col("node_a"), col("node_b"))
      val row = edges.agg(min(col("node_a"))).head()
      if (row.isNullAt(0))
        s.range(0).select(col("id").as("node"),
          col("id").cast("double").as("pprank"))
      else {
        val sym = edges
          .select(col("node_a").as("src"), col("node_b").as("dst"))
          .unionByName(edges.select(col("node_b").as("src"),
            col("node_a").as("dst")))
        GraphOps.personalizedPageRank(sym, Seq(row.getLong(0)))
          .select(col("node"),
            graft.Rounding.duckRound(col("rank"), 6).as("pprank"))
      }
    }),

    // E155: HITS hubs/authorities over the customer→supplier
    // bipartite memberships — L1-normalized mutual reinforcement
    "e155_hits" -> ((s, dir) =>
      GraphOps.hits(tradePairs(s, dir))),

    // E156: item-item cosine top-3 — the "customers also bought"
    // serving table from binary co-occurrence
    "e156_item_cf" -> ((s, dir) =>
      GraphOps.itemCosineTopK(tradePairs(s, dir), minShared = 150L)),

    // E157: per-user activity coverage — active days / span / longest
    // gap, the churned-vs-sparse discriminator
    "e157_activity_coverage" -> ((s, dir) =>
      EventAnalytics.activityCoverage(Tables.load(s, dir, "events"))),

    // E158: golden-record survivorship — the e16 simhash clusters
    // merged to one record per cluster with per-field survivor rules
    // (the MDM step after "these rows are the same thing")
    "e158_golden_record" -> ((s, dir) =>
      Clustering.survivorship(docs(s, dir),
        Clustering.connectedComponents(
          Dedup.simhashPairs(docs(s, dir), 3)))),

    // E159: view→purchase conversion-latency distribution over the
    // e39 funnel — count, interpolated P50/P90, mean
    "e159_conversion_latency" -> ((s, dir) => {
      val f = EventAnalytics.funnel(Tables.load(s, dir, "events"))
      f.filter(col("purchase_ts").isNotNull)
        .select(((unix_micros(col("purchase_ts")).cast("double") -
          unix_micros(col("view_ts")).cast("double")) /
          lit(1000000.0)).as("latency_s"))
        .agg(count(lit(1)).as("n_converted"),
          graft.Rounding.duckRound(
            expr("percentile(latency_s, 0.5)"), 6).as("p50_s"),
          graft.Rounding.duckRound(
            expr("percentile(latency_s, 0.9)"), 6).as("p90_s"),
          graft.Rounding.duckRound(avg(col("latency_s")), 6)
            .as("avg_s"))
    }),

    // E160: profile drift between snapshots — per-metric v1/v2/delta
    // rows with a relative-threshold flag (the schema-stats
    // companion of the e109 distribution-shape PSI)
    "e160_profile_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val v2 = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .withColumn("n_chars",
          when(col("doc_id") % 7 === 0, col("n_chars") + 3)
            .otherwise(col("n_chars")))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(col("text"), lit(" new")))
          .withColumn("n_chars", col("n_chars") + 4))
      def prof(df: DataFrame) = df.agg(
        count(lit(1)).cast("double").as("n_rows"),
        graft.Rounding.duckRound(avg(col("n_chars")), 6)
          .as("avg_n_chars"),
        countDistinct(col("lang")).cast("double").as("distinct_lang"),
        countDistinct(col("source")).cast("double")
          .as("distinct_source"))
      val p1 = prof(d)
      val p2 = prof(v2)
      val metrics = Seq("n_rows", "avg_n_chars", "distinct_lang",
        "distinct_source")
      val one = p1.join(broadcast(
        metrics.foldLeft(p2) { (df, m) =>
          df.withColumnRenamed(m, s"${m}_2")
        }))
      metrics.map { m =>
        val delta = graft.Rounding.duckRound(
          col(s"${m}_2") - col(m), 6)
        one.select(lit(m).as("metric"), col(m).as("v1"),
          col(s"${m}_2").as("v2"), delta.as("delta"),
          (abs(delta) > lit(0.01) * col(m)).as("drifted"))
      }.reduce(_.unionByName(_))
    }),

    // E161: two-proportion z-test between user-parity arms — the A/B
    // readout with the verdict on the rounded statistic
    "e161_ab_ztest" -> ((s, dir) =>
      EventAnalytics.abZTest(Tables.load(s, dir, "events"))),

    // E162: Kaplan-Meier survival of inter-event waits — the final
    // open gap correctly CENSORED, product-limit over exact ratios
    "e162_kaplan_meier" -> ((s, dir) =>
      EventAnalytics.kaplanMeier(Tables.load(s, dir, "events"))),

    // E163: Gini concentration of value per type — int64-cents rank
    // formula, exact until the one final division
    "e163_gini_concentration" -> ((s, dir) =>
      DataProfile.giniConcentration(Tables.load(s, dir, "events"))),

    // E164: Herfindahl concentration across sources — the "really N
    // sources or one megasource" number, by docs and by chars
    "e164_hhi_sources" -> ((s, dir) =>
      DataProfile.hhiSources(docs(s, dir))),

    // E165: per-user behavioral entropy + evenness — the
    // scripted-vs-organic screen (one-endpoint bots score near 0)
    "e165_behavior_entropy" -> ((s, dir) =>
      EventAnalytics.behaviorEntropy(Tables.load(s, dir, "events"))),

    // E166: mutual information of type × day-of-week — the
    // effect-size companion to the e146 χ² significance test
    "e166_mutual_information" -> ((s, dir) =>
      DataProfile.mutualInformation(Tables.load(s, dir, "events"),
        "event_type", "ts")),

    // E167: key reconciliation orders ↔ lineitem — the referential-
    // integrity audit (this corpus ships 257 childless orders)
    "e167_reconciliation" -> ((s, dir) =>
      DataProfile.reconcileKeys(
        Tables.load(s, dir, "lineitem").select(col("l_orderkey")),
        Tables.load(s, dir, "orders").select(col("o_orderkey")))),

    // E168: seasonal-naive forecast backtest — the baseline every
    // forecaster must beat, scored with MAE/WAPE in exact cents
    "e168_seasonal_naive_backtest" -> ((s, dir) =>
      EventAnalytics.seasonalNaiveBacktest(
        Tables.load(s, dir, "events"))),

    // E169: bootstrap CI for the per-type mean — md5-deterministic
    // resamples, cents-exact resample means, percentile interval
    "e169_bootstrap_ci" -> ((s, dir) =>
      DataProfile.bootstrapCI(Tables.load(s, dir, "events"))),

    // E170: Hill tail-index — how heavy is the tail (α ≤ 2 means
    // infinite variance: winsorize before averaging)
    "e170_hill_tail" -> ((s, dir) =>
      DataProfile.hillTail(Tables.load(s, dir, "events"))),

    // E171: steady state of the e122 Markov chain — power iteration
    // with round-boundary rounding; converges exactly by round 11
    "e171_markov_steady_state" -> ((s, dir) =>
      EventAnalytics.markovSteadyState(Tables.load(s, dir, "events"))),

    // E172: k-anonymity audit over (type, dow, value-decile) quasi-
    // identifiers — 92 of 350 cells re-identify at k=25 here
    "e172_k_anonymity" -> ((s, dir) =>
      DataProfile.kAnonymity(Tables.load(s, dir, "events"))),

    // E173: multi-iteration BPE training (VERDICT r12 #3) — 10 full
    // merge→re-segment→recount rounds emitting the learned merge
    // table; the oracle unrolls the identical 10 rounds (e91-style)
    // with greedy overlap resolution as island parity. The rules are
    // ModelCache-shared with the e175 apply gate (train once, use
    // twice — the e83/e94 index-sharing pattern for tokenizers).
    "e173_bpe_train" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      sharedBpeRules(s, dir)
        .toDF("merge_rank", "tok_a", "tok_b", "cnt")
    }),

    // E175: BPE APPLY — the tokenizer-serving half: the learned merge
    // table re-segments the corpus (rank-ordered map-side folds, no
    // shuffle) and per-doc compression stats come out; applying the
    // rules to the training corpus reproduces the training loop's
    // final state, so the oracle is the unrolled chain's LAST stage
    "e175_bpe_apply" -> ((s, dir) =>
      TextAnalysis.bpeApply(docs(s, dir),
        sharedBpeRules(s, dir).map(r => (r._2, r._3)))),

    // E195: BPE trained TO A TARGET VOCAB SIZE (VERDICT r13 #3) —
    // character-level over the distinct-(word, count) table (the
    // production BPE topology: training state is vocabulary-sized
    // after ONE corpus aggregation), run until |vocab| = base + 18
    // with the explicit vocab set and (count DESC, a, b) tie
    // priority. The oracle unrolls the identical 18 weighted rounds
    // (island-parity greedy within each word) and reconstructs the
    // vocab trajectory as base + rank; real ties occur in this corpus
    // (equal-count pair pools at several ranks), so the priority rule
    // is load-bearing, not decorative.
    "e195_bpe_vocab_train" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val (base, rules) = sharedBpeVocab(s, dir)
      rules.map(t => (t._1, t._2, t._3, t._4, t._5, base))
        .toDF("merge_rank", "tok_a", "tok_b", "cnt", "vocab_after",
          "base_vocab")
    }),

    // E177: mergeable histogram-quantile sketch — the DISTRIBUTION
    // member of the sketch family (Bloom membership, CMS frequency):
    // 32 fixed-width bin counts (partial-aggregated, sketch-sized
    // exchange), quantiles by cumulative walk + in-bin interpolation,
    // each estimate measured against the EXACT interpolated quantile
    // with the one-bin error bound asserted as a column
    "e177_histogram_quantiles" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Sketches.histQuantileScorecard(
        Sketches.histCells(ev, col("value")), ev, "value",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    }),

    // E178: the histogram sketch maintained AS A STREAM — per-batch
    // bin-count frames (sketch-sized, never event-sized) append into
    // a store; counts are additive, so the summed store IS the batch
    // histogram exactly and the replay shares e177's oracle verbatim
    // (the e99 mergeability contract, now for distributions)
    "e178_streaming_histogram_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
      val scratch = graft.Scratch.fresh("hist_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r =>
          ev.filter(col("event_id") % 3 === r).select(col("value"))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Sketches.histCells(b, col("value"))
            .write.mode("overwrite").parquet(s"$scratch/cells_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cellDirs = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("cells_")).map(_.getPath).sorted
      val merged = s.read.parquet(cellDirs.toIndexedSeq: _*)
        .groupBy(col("bin")).agg(sum(col("c")).as("c"))
      Sketches.histQuantileScorecard(merged, ev, "value",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    }),

    // E193: PER-GROUP histogram quantiles — the e177 sketch
    // partitioned by event type (per-tenant distribution summaries
    // from ≤ |types|·32 cells), each estimate next to the group's
    // exact interpolated quantile with the one-bin bound asserted
    "e193_grouped_histogram_quantiles" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Sketches.histQuantileScorecardBy(
          Sketches.histCellsBy(ev, col("event_type"), col("value")),
          ev, col("event_type"), "value", Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("grp", "event_type")
    }),

    // E192: 4:2:2 JPEG — the third chroma geometry (half-width,
    // FULL-height chroma; MCU = 2×1 luma blocks) through the same
    // decoder; no other gate exercises an asymmetric sampling factor
    "e192_jpeg_422_rows" -> ((s, dir) =>
      Multimodal.decodeJpegPlaneRows(
          Multimodal.syntheticJpeg422(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E191: REAL gzip text-blob ingest — the corpus as RFC 1952
    // members (the gzipped-JSONL/WET shape compressed text corpora
    // ship in), inflated back with CRC verification and
    // fingerprinted against the uncompressed base table
    "e191_gzip_text_blobs" -> ((s, dir) =>
      Multimodal.decodeGzipText(
          Multimodal.syntheticGzip(docs(s, dir)))
        .toDF()),

    // E189: per-type value percentiles (p50/p90/p99 + count) — the
    // telemetry latency table every ops dashboard serves; exact
    // interpolated percentiles, rounded before use (the e36 contract)
    "e189_latency_percentiles" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          Rounding.duckRound(expr("percentile(value, 0.5)"), 6)
            .as("p50"),
          Rounding.duckRound(expr("percentile(value, 0.9)"), 6)
            .as("p90"),
          Rounding.duckRound(expr("percentile(value, 0.99)"), 6)
            .as("p99"))),

    // E190: WINDOWED cardinality — per-day distinct users via
    // per-window HLL register frames (the e179 sketch partitioned by
    // day: mergeable across panes by register max, groups × 64 rows
    // of state), next to the exact per-day distinct count
    "e190_windowed_hll" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      Sketches.hllScorecardBy(
        Sketches.hllRegistersBy(ev, day, col("user_id").cast("string")),
        ev.groupBy(day.as("grp"))
          .agg(countDistinct(col("user_id")).as("n_exact")))
        .withColumnRenamed("grp", "dayord")
    }),

    // E196: SLIDING-window cardinality (VERDICT r13 #4) — overlapping
    // 3-day windows composed from e190's tumbling per-day panes by
    // register max (panes built once; the overlap shares them instead
    // of re-scanning events — the production sliding-distinct
    // topology). Estimate per window next to the exact distinct over
    // the same 3-day span; windows labeled by their last day.
    "e196_sliding_hll" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      val panes = Sketches.hllRegistersBy(ev, day,
        col("user_id").cast("string"))
      val slid = Sketches.hllSlidingRegisters(panes, 3)
      val wins = panes.select(col("grp")).distinct()
      val exact = ev.select(day.as("d"), col("user_id"))
        .withColumn("grp",
          explode(sequence(col("d"), col("d") + lit(2))))
        .join(wins, Seq("grp"), "left_semi")
        .groupBy(col("grp"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Sketches.hllScorecardBy(slid, exact)
        .withColumnRenamed("grp", "dayord")
    }),

    // E206: the sliding-CMS maintained AS A STREAM — per-batch cell
    // frames appended to a store and SUMMED (the e202 pattern with
    // the CMS merge law instead of register max); the summed store
    // IS the batch pane table exactly, so the replay shares e200's
    // oracle verbatim
    "e206_streaming_sliding_cms_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      val scratch = graft.Scratch.fresh("slcms_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r =>
          ev.filter(col("event_id") % 3 === r)
            .select(col("ts"), col("user_id"))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Sketches.cmsCellsBy(b,
              expr("unix_micros(ts) div 86400000000"),
              col("user_id").cast("string"))
            .write.mode("overwrite").parquet(s"$scratch/cells_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cellDirs = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("cells_")).map(_.getPath).sorted
      val panes = s.read.parquet(cellDirs.toIndexedSeq: _*)
        .groupBy(col("grp"), col("j"), col("h"))
        .agg(sum(col("c")).as("c"))
      val winCells = Sketches.cmsSlidingCells(panes, 3)
        .withColumnRenamed("grp", "w")
      val wins = winCells.select(col("w")).distinct()
      val evW = ev.select(day.as("d"), col("user_id"))
        .withColumn("w", explode(sequence(col("d"), col("d") + lit(2))))
        .join(wins, Seq("w"), "left_semi")
      val probe = evW.select(col("w"), col("user_id")).distinct()
        .select(col("w"), col("user_id"),
          posexplode(array((0 until Sketches.CmsDepth).map(j =>
            Sketches.cmsBucket(col("user_id").cast("string"),
              lit(j))): _*)).as(Seq("j", "h")))
      val est = probe.join(winCells, Seq("w", "j", "h"))
        .groupBy(col("w"), col("user_id"))
        .agg(min(col("c")).as("cms_est"))
        .filter(col("cms_est") >= 12L)
      val exact = evW.groupBy(col("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      est.join(exact, Seq("w", "user_id"))
        .select(col("w").as("dayord"), col("user_id"), col("cms_est"),
          col("n_events"), (col("n_events") >= 12L).as("is_heavy"))
    }),

    // E207: HLL SET OPERATIONS — audience overlap: the purchase
    // cohort vs the click cohort as register frames; the UNION is the
    // register MAX (exact sketch identity), the INTERSECTION is
    // inclusion-exclusion est(A)+est(B)-est(A∪B) — the standard
    // HLL-overlap estimator with its signed error priced against the
    // exact intersection as a measured column. All three register
    // sets are md5-exact, so the oracle rebuilds them bit-for-bit.
    "e207_hll_set_ops" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      def regs(t: String) = Sketches.hllRegisters(
        ev.filter(col("event_type") === t), col("user_id").cast("string"))
      val a = regs("purchase")
      val b = regs("click")
      val u = a.unionByName(b).groupBy(col("j"))
        .agg(max(col("m_rho")).as("m_rho"))
      def estOf(r: DataFrame, name: String) = r.agg(
        sum(call_function("shiftleft", lit(1L),
          (lit(55) - col("m_rho")).cast("int"))).as(s"sum_$name"),
        sum(when(col("m_rho") === 0, lit(1L)).otherwise(lit(0L)))
          .as(s"z_$name"))
      def est(sumC: Column, zC: Column): Column = {
        val raw = lit(0.709) * lit(4096.0) * lit(3.6028797018963968e16) /
          sumC.cast("double")
        when(raw <= lit(160.0) && zC > 0L,
          lit(64.0) * log(lit(64.0) / zC.cast("double"))).otherwise(raw)
      }
      val exact = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
        .join(ev.filter(col("event_type") === "click")
          .select(col("user_id")).distinct(), Seq("user_id"))
        .agg(count(lit(1)).as("n_exact_overlap"))
      val ix = est(col("sum_a"), col("z_a")) +
        est(col("sum_b"), col("z_b")) - est(col("sum_u"), col("z_u"))
      estOf(a, "a").crossJoin(estOf(b, "b")).crossJoin(estOf(u, "u"))
        .crossJoin(broadcast(exact))
        .select(col("n_exact_overlap"),
          Rounding.duckRound(est(col("sum_a"), col("z_a")), 6)
            .as("est_a"),
          Rounding.duckRound(est(col("sum_b"), col("z_b")), 6)
            .as("est_b"),
          Rounding.duckRound(est(col("sum_u"), col("z_u")), 6)
            .as("est_union"),
          Rounding.duckRound(ix, 6).as("est_overlap"),
          Rounding.duckRound(
            abs(ix - col("n_exact_overlap").cast("double")) /
              greatest(col("n_exact_overlap").cast("double"), lit(1.0)),
            6).as("rel_err"))
    }),

    // E205: SLIDING-window histogram quantiles — the DISTRIBUTION
    // member of the sliding-sketch trilogy (e196 HLL max-merge, e200
    // CMS sum-merge): per-day bin panes summed across overlapping
    // 3-day windows, each window's interpolated quantile estimates
    // next to the exact quantile over the same span with the one-bin
    // bound asserted
    "e205_sliding_histogram_quantiles" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      val panes = Sketches.histCellsBy(ev, day, col("value"))
      val slid = Sketches.histSlidingCells(panes, 3)
      val wins = panes.select(col("grp")).distinct()
      val evW = ev.select(day.as("d"), col("value"))
        .withColumn("grp",
          explode(sequence(col("d"), col("d") + lit(2))))
        .join(wins, Seq("grp"), "left_semi")
      Sketches.histQuantileScorecardBy(slid, evW, col("grp"), "value",
        Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("grp", "dayord")
    }),

    // E208: STEREO FLAC with mid/side decorrelation — the stereo
    // form of e204: left = the e181 signal, right = a correlated
    // derivation, frames alternating MID/SIDE and INDEPENDENT
    // assignments; both channels reconstruct through the exact
    // integer decorrelation ((mid<<1)|(side&1) restores L+R) and the
    // per-channel features are formula-evaluated by the oracle
    "e208_flac_stereo_frames" -> ((s, dir) =>
      Multimodal.decodeFlacStereoZcr(
          Multimodal.syntheticFlacStereo(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E209: FLAC LPC subframes — the last residual FLAC seam after
    // e204 (FIXED) and e208 (stereo): the e181 signal coded with
    // Levinson-Durbin-quantized linear predictors (orders 2..5 by
    // doc), decoded through the exact-integer LPC reconstruction
    // (64-bit coefficient sums, arithmetic shift); shares e181's
    // oracle verbatim — same expected rows, the LPC path under test
    "e209_flac_lpc_frames" -> ((s, dir) =>
      Multimodal.decodeFlacZcrEnergy(
          Multimodal.syntheticFlacLpc(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E204: FLAC codec gate (compressed audio — the seam left after
    // r13's JPEG and this round's H.264): the e181 oscillating signal
    // FLAC-encoded (rice-coded FIXED-predictor residuals, VERBATIM
    // every fifth doc, real CRC-8/CRC-16 + STREAMINFO MD5 verified on
    // decode) and decoded back to the identical per-frame features —
    // shares e181's oracle verbatim: same expected rows, different
    // codec under test (the e116/e71 precedent)
    "e204_flac_codec_frames" -> ((s, dir) =>
      Multimodal.decodeFlacZcrEnergy(
          Multimodal.syntheticFlacOsc(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E203: char-BPE APPLY at the learned vocab (the e195→serving
    // composition, the e173→e175 pattern at char level): the trained
    // merge table folds over the DISTINCT word table once, then
    // documents re-expand against it with a broadcast join — the
    // memoized production tokenizer; per-doc char/token/word counts
    "e203_bpe_vocab_apply" -> ((s, dir) => {
      val (_, rules) = sharedBpeVocab(s, dir)
      TextAnalysis.charBpeApplyStats(docs(s, dir),
        rules.map(r => (r._2, r._3)))
    }),

    // E202: the sliding-HLL maintained AS A STREAM — per-batch
    // register frames appended to a store (the e178 sketch-store
    // pattern, with MAX-merge instead of sum: registers are
    // max-mergeable, so the maxed store IS the batch register table
    // exactly), then the e196 pane→window merge; the replay shares
    // e196's oracle verbatim — mergeability proven at the hash level
    "e202_streaming_sliding_hll_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      val scratch = graft.Scratch.fresh("slhll_stream", dir)
      graft.streaming.StagedReplay.stageFiles(
        Seq(0, 1, 2).map(r =>
          ev.filter(col("event_id") % 3 === r)
            .select(col("ts"), col("user_id"))),
        s"$scratch/stages")
      val stream = s.readStream
        .schema(s.read.parquet(s"$scratch/stages").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/stages")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          Sketches.hllRegistersBy(b,
              expr("unix_micros(ts) div 86400000000"),
              col("user_id").cast("string"))
            .write.mode("overwrite").parquet(s"$scratch/regs_$id")
          ()
        }
        .option("checkpointLocation", s"$scratch/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val regDirs = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("regs_")).map(_.getPath).sorted
      val merged = s.read.parquet(regDirs.toIndexedSeq: _*)
        .groupBy(col("grp"), col("j"))
        .agg(max(col("m_rho")).as("m_rho"))
      val slid = Sketches.hllSlidingRegisters(merged, 3)
      val wins = merged.select(col("grp")).distinct()
      val exact = ev.select(day.as("d"), col("user_id"))
        .withColumn("grp",
          explode(sequence(col("d"), col("d") + lit(2))))
        .join(wins, Seq("grp"), "left_semi")
        .groupBy(col("grp"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Sketches.hllScorecardBy(slid, exact)
        .withColumnRenamed("grp", "dayord")
    }),

    // E201: label-propagation communities over the co-purchase
    // projection — the COMMUNITY member of the graph family (rank =
    // PageRank, reach = BFS/Bellman-Ford, cohesion = k-core,
    // components = CC): 6 synchronous rounds of (max neighbor-label
    // count, min label) adoption, a deterministic total order both
    // engines replay exactly; the cap is semantic (sync LPA can
    // 2-cycle), per the e127/e180 convention
    "e201_label_propagation" -> ((s, dir) => {
      val pairs = GraphOps.bipartiteProjection(tradePairs(s, dir),
        minShared = 190L)
      val edges = pairs
        .select(col("node_a").as("src"), col("node_b").as("dst"))
        .unionByName(pairs
          .select(col("node_b").as("src"), col("node_a").as("dst")))
      GraphOps.labelPropagation(edges, 6)
    }),

    // E200: SLIDING-window heavy hitters — the CMS member of the
    // sliding family (e196 is the HLL one): per-day cell panes summed
    // (counts are additive) across overlapping 3-day windows, probed
    // by the window's active users; est >= 12 selects a SUPERSET of
    // the true per-window heavies (min-of-rows never undercounts —
    // the gate output carries both collision-driven false positives
    // and the 153 true ones), exact window count as the measured
    // column
    "e200_sliding_cms_heavy" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val day = expr("unix_micros(ts) div 86400000000")
      val key = col("user_id").cast("string")
      val winCells = Sketches.cmsSlidingCells(
        Sketches.cmsCellsBy(ev, day, key), 3)
        .withColumnRenamed("grp", "w")
      val wins = winCells.select(col("w")).distinct()
      val evW = ev.select(day.as("d"), col("user_id"))
        .withColumn("w", explode(sequence(col("d"), col("d") + lit(2))))
        .join(wins, Seq("w"), "left_semi")
      val probe = evW.select(col("w"), col("user_id")).distinct()
        .select(col("w"), col("user_id"),
          posexplode(array((0 until Sketches.CmsDepth).map(j =>
            Sketches.cmsBucket(col("user_id").cast("string"),
              lit(j))): _*)).as(Seq("j", "h")))
      val est = probe.join(winCells, Seq("w", "j", "h"))
        .groupBy(col("w"), col("user_id"))
        .agg(min(col("c")).as("cms_est"))
        .filter(col("cms_est") >= 12L)
      val exact = evW.groupBy(col("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      est.join(exact, Seq("w", "user_id"))
        .select(col("w").as("dayord"), col("user_id"), col("cms_est"),
          col("n_events"), (col("n_events") >= 12L).as("is_heavy"))
    }),

    // E199: MFCC (the e194 stretch) — the spectral path extended
    // through the mel filterbank (20 HTK-constant triangles to the
    // 4 kHz Nyquist) + ln(1+E) compression + DCT-II. On the two-tone
    // gate signal the 2000 Hz tone straddles filters 14/15 (closed-
    // form triangle weights, expression trees mirrored in SQL);
    // Nyquist sits on the filterbank's outer edge with zero weight —
    // the standard convention, exercised rather than hidden. The +1
    // log floor makes empty filters EXACTLY 0 on both engines.
    "e199_audio_mfcc" -> ((s, dir) =>
      Multimodal.decodeWavMfcc(
          Multimodal.syntheticWavTone(docs(s, dir).select(col("doc_id"))))
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("coef_idx"),
          Rounding.duckRound(col("mfcc"), 6).as("mfcc"))),

    // E225: MIXED-CORPUS AUDIO DISPATCH — the triage operator a real
    // crawl needs before any audio analysis: sniff the container
    // magic (RIFF / fLaC / ID3 / MPEG sync with layer bits deciding
    // MP3 vs ADTS) and route each blob to the right codec/scanner,
    // emitting one unified inventory row per doc
    "e225_audio_dispatch" -> ((s, dir) =>
      Multimodal.dispatchAudioRows(
          Multimodal.syntheticAudioMixed(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E224: TFRECORD + PROTOBUF INGEST — the ML-dataset path:
    // TFRecord framing with BOTH masked-CRC32C checks verified per
    // record, then the protobuf wire walk (varints, length-delimited,
    // fixed64, unknown-field skip-by-wire-type); dyadic scores keep
    // the doubles engine-exact
    "e224_tfrecord_ingest" -> ((s, dir) =>
      Multimodal.decodeTfRecordRows(
          Multimodal.syntheticTfRecord(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E223: H.264 B-FRAME BI-PREDICTION — the third slice type:
    // list-0/list-1 single-list copies and the default-weight
    // bi-predicted average (predL0 + predL1 + 1) >> 1, per-list
    // median mvd prediction, non-reference NAL (no marking syntax);
    // oracle = clamped shift lookups and the rounded average
    "e223_h264_bframe_rows" -> ((s, dir) =>
      Multimodal.decodeH264FrameRows(
          Multimodal.syntheticH264BFrame(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E222: .TAR.GZ COMPOSITION — the distribution format for real:
    // gzip inflate (JDK zlib) feeding the ustar walk, with a
    // member-formula seed distinct from e220's
    "e222_targz_ingest" -> ((s, dir) =>
      Multimodal.enumerateTarGzRows(
          Multimodal.syntheticTarGz(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E221: ZIP ARCHIVE ENUMERATION — the end-first walk: backward
    // EOCD scan, central-directory entries by recorded local
    // offsets, STORED + DEFLATE members, CRC-32 verified per member;
    // the oracle evaluates the member formulas
    "e221_zip_ingest" -> ((s, dir) =>
      Multimodal.enumerateZipRows(
          Multimodal.syntheticZip(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E220: TAR ARCHIVE ENUMERATION — dataset bundles walked via
    // real ustar headers: octal size/mtime fields, the
    // checksum-as-spaces verification, 512-block padding; the oracle
    // evaluates the member formulas
    "e220_tar_ingest" -> ((s, dir) =>
      Multimodal.enumerateTarRows(
          Multimodal.syntheticTar(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E219: WARC CRAWL INGEST — the Common-Crawl composition in one
    // operator chain: WARC record walk (Content-Length framed, so
    // bodies with CRLFs or 'WARC/' strings can't derail it) → HTTP
    // status/header split → HTML boilerplate extraction on text/html
    // responses; the oracle evaluates every layer's formulas
    "e219_warc_ingest" -> ((s, dir) =>
      Multimodal.extractWarcRows(
          Multimodal.syntheticWarc(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E218: H.264 SUB-PEL MOTION — the P frame's middle rows move at
    // HALF-PEL positions, so the decoder runs the real 6-tap
    // (1,−5,20,20,−5,1) interpolation with +16>>5 rounding and edge
    // clamping; the oracle evaluates the identical filter in SQL
    // (horizontal taps row 1, vertical taps row 2)
    "e218_h264_subpel_rows" -> ((s, dir) =>
      Multimodal.decodeH264FrameRows(
          Multimodal.syntheticH264SubPel(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E217: H.264 P-FRAME MOTION COMPENSATION — the interframe seam:
    // a two-picture stream (I_PCM IDR + P frame) decoded through
    // real mb_skip_run coding, median motion-vector prediction, and
    // even-full-pel edge-clamped reference copies; the oracle
    // evaluates the shift formula per pixel on both frames
    "e217_h264_pframe_rows" -> ((s, dir) =>
      Multimodal.decodeH264FrameRows(
          Multimodal.syntheticH264PFrame(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E216: HTML TEXT/BOILERPLATE EXTRACTION — the crawl-curation
    // primitive: one linear scan strips markup, drops script/style
    // bodies (incl. scripts containing bare '<'), separates link
    // text from body text (link density, the boilerpipe signal),
    // captures the title; oracle evaluates the generation lengths
    "e216_html_extract" -> ((s, dir) =>
      Multimodal.extractHtmlRows(
          Multimodal.syntheticHtml(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E215: ID3v2.3 METADATA EXTRACTION — the tag [[Mp3Scan]] skips,
    // parsed for real: syncsafe tag size, plain-big-endian v2.3
    // frame sizes (the classic trap), text frames decoded, non-text
    // frames skipped by size, padding-terminated walk
    "e215_id3v2_text_frames" -> ((s, dir) =>
      Multimodal.extractId3Rows(
          Multimodal.syntheticMp3Tagged(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E214: AVRO OBJECT-CONTAINER INGEST — the data-lake interchange
    // format (CDC/Kafka hand-off) decoded from the public spec with
    // no Avro libraries: zigzag varints, schema-order field decode,
    // per-block sync verification, null + deflate codecs; dyadic
    // scores keep the doubles engine-exact
    "e214_avro_ingest" -> ((s, dir) =>
      Multimodal.decodeAvroRows(
          Multimodal.syntheticAvro(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E213: AAC ADTS SCAN — e212's companion for the other dominant
    // web-audio transport: explicit 13-bit frame-length walk,
    // sampling-frequency-index table, raw-data-block counting (1024
    // samples each → duration sums blocks, not frames), VBR marker
    // from the buffer-fullness field
    "e213_aac_adts_scan" -> ((s, dir) =>
      Multimodal.scanAacRows(
          Multimodal.syntheticAac(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E212: MP3 FRAME-HEADER SCAN — the audio-inventory operator a
    // corpus pipeline runs over raw .mp3 blobs without decoding:
    // ID3v2 syncsafe skip, MPEG-1 Layer III header fields, the
    // 144·bitrate/rate + padding frame walk (immune to false syncs
    // in payloads), CBR/VBR detection, duration from 1152
    // samples/frame; oracle evaluates the generation formulas
    "e212_mp3_frame_scan" -> ((s, dir) =>
      Multimodal.scanMp3Rows(
          Multimodal.syntheticMp3(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E210: H.264 CAVLC DC RESIDUALS — the post-r14 seam: I_16x16
    // MBs whose Intra16x16DCLevel carries one quantized coefficient,
    // parsed through real coeff_token VLC/FLC tables, trailing-one
    // signs, level prefix/suffix escapes, total_zeros, the inverse
    // Hadamard, and QP-26 dequantization; the oracle chains the
    // closed-form MB values (pred + ((13·L+2)//4 + 32)//64, clipped)
    "e210_h264_cavlc_residual_rows" -> ((s, dir) =>
      Multimodal.decodeH264Rows(
          Multimodal.syntheticH264DcResidual(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E211: H.264 I_4x4 PREDICTION — per-4x4-block Vertical /
    // Horizontal modes with the spec's most-probable-mode coding,
    // reconstructed block-by-block against per-pixel I_PCM anchors;
    // the oracle evaluates the copy-propagation closed form
    "e211_h264_i4x4_rows" -> ((s, dir) =>
      Multimodal.decodeH264Rows(
          Multimodal.syntheticH264I4x4(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E197: H.264 I-frame codec, all-I_PCM streams (VERDICT r13 #7) —
    // real Annex B bitstreams (start codes, NAL headers, emulation
    // prevention, Exp-Golomb SPS/PPS/slice headers) decoded by the
    // from-scratch H264Codec; the per-pixel pattern wraps through
    // 0x00..0x03 so the escaping path is content-exercised. The
    // oracle evaluates the pixel formula directly — any framing,
    // ue(v), alignment, or raster-offset bug breaks the hash.
    "e197_h264_ipcm_rows" -> ((s, dir) =>
      Multimodal.decodeH264Rows(
          Multimodal.syntheticH264Pcm(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E198: H.264 cross-MB INTRA PREDICTION — checkerboard streams
    // where odd MBs are DC-predicted I_16x16 (CAVLC all-zero DC block
    // with real nC derivation, I_PCM neighbors counting 16): the
    // decoder must reconstruct them from the spec's neighbor means
    // ((ΣL+ΣT+16)>>5 both, (Σ+8)>>4 one). Oracle: the same rounding
    // on the closed-form MB values.
    "e198_h264_intra_pred_rows" -> ((s, dir) =>
      Multimodal.decodeH264Rows(
          Multimodal.syntheticH264Checker(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E188: PROGRESSIVE JPEG codec gate — the same block-constant
    // planes as e174, but Huffman-coded through the SOF2 multi-scan
    // architecture (interleaved DC first pass at Al=1, DC refinement
    // at Ah=1, per-component AC band scans coded as EOBn runs over
    // non-interleaved block grids) and decoded by the cross-scan
    // coefficient accumulator; shares e174's oracle verbatim. General
    // progressive content (real successive-approximation AC
    // refinement) is spec-covered via the JDK writer's streams.
    "e188_jpeg_progressive_rows" -> ((s, dir) =>
      Multimodal.decodeJpegPlaneRows(
          Multimodal.syntheticJpegProgressive(
            docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E187: JPEG decoded all the way to RGB — replication 4:2:0
    // upsample + JFIF BT.601 on the lossless-roundtrip planes; the
    // oracle evaluates the same conversion in SQL (post-clamp, the
    // two engines' round conventions agree everywhere — negative
    // halves, the only divergence, clamp to 0 on both)
    "e187_jpeg_rgb_rows" -> ((s, dir) =>
      Multimodal.decodeJpegRgbRows(
          Multimodal.syntheticJpeg(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E184: top-20 event-type TRIGRAMS — 3-step behavioral patterns
    // the first-order Markov matrix (e122) is blind to; one per-user
    // window pass, counts bounded by |types|³
    "e184_event_trigrams" -> ((s, dir) =>
      EventAnalytics.eventTrigrams(Tables.load(s, dir, "events"), 20)),

    // E185: Luhn validation of card-number candidates — the stage
    // AFTER e66's digit-run detection: deterministic 16-digit
    // candidates per doc, classified by the mod-10 checksum (~1 in
    // 10 valid), pure map-side expression arithmetic
    "e185_luhn_card_validation" -> ((s, dir) => {
      val num = concat(lit("4"), lpad(
        ((col("doc_id") * 7919 + 123457) % 1000000000000000L)
          .cast("string"), 15, "0"))
      docs(s, dir).select(col("doc_id"), num.as("cc_candidate"),
        TextAnalysis.luhnValid16(num).as("luhn_valid"))
    }),

    // E186: schema-evolution read — two snapshot generations (v2
    // adds a column) written as real parquet and read back through
    // mergeSchema; v1 rows surface the new column as NULL. The
    // warehouse-ingestion reality check: schemas drift, readers
    // must reconcile.
    "e186_schema_evolution_read" -> ((s, dir) => {
      val d = docs(s, dir)
      val scratch = graft.Scratch.fresh("schema_evo", dir)
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$scratch/v1")
      d.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .write.mode("overwrite").parquet(s"$scratch/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$scratch/v1", s"$scratch/v2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // E183: edge-WEIGHTED PageRank over the co-purchase projection
    // (rank flows in proportion to n_shared — strong ties vs
    // threshold-grazers, which the unweighted e91 walk can't see);
    // same round topology, oracle unrolls the identical 5 iterations
    "e183_weighted_pagerank" -> ((s, dir) => {
      val e = GraphOps.bipartiteProjection(tradePairs(s, dir),
        minShared = 190L)
      val sym = e.select(col("node_a").as("src"),
          col("node_b").as("dst"), col("n_shared").as("w"))
        .unionByName(e.select(col("node_b").as("src"),
          col("node_a").as("dst"), col("n_shared").as("w")))
      GraphOps.weightedPageRank(sym, iters = 5)
        .select(col("node"),
          Rounding.duckRound(col("rank") * col("n_nodes"), 6)
            .as("wrank_scaled"))
    }),

    // E182: join-size estimation by CMS inner product — the planner's
    // question ("how big is this join?") answered from two
    // sketch-sized summaries without running the join; the guaranteed
    // overestimate property and the measured relative error are both
    // columns, with the exact join size computed alongside
    "e182_cms_join_cardinality" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val a = ev.filter(col("event_id") % 2 === 0)
      val b = ev.filter(col("event_id") % 2 =!= 0)
      val key = col("user_id").cast("string")
      val est = Sketches.cmsJoinCardinality(
        Sketches.cmsCells(a, key), Sketches.cmsCells(b, key))
      val exact = a.groupBy(col("user_id"))
        .agg(count(lit(1)).as("na"))
        .join(b.groupBy(col("user_id")).agg(count(lit(1)).as("nb")),
          Seq("user_id"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
          .as("exact_join"))
      est.crossJoin(broadcast(exact))
        .select(col("est_join"), col("exact_join"),
          (col("est_join") >= col("exact_join")).as("never_under"),
          Rounding.duckRound(
            (col("est_join").cast("double") -
              col("exact_join").cast("double")) /
              col("exact_join").cast("double"), 6)
            .as("rel_overestimate"))
    }),

    // E181: audio FEATURE extraction after the codec — per-frame
    // zero-crossing rate and exact Σs² energy over a fast-wrapping
    // sawtooth (the e65 signal is monotone per doc; this one actually
    // crosses), decoded by the real WavCodec; all-integer features,
    // partition-local end to end
    "e181_audio_zcr_energy" -> ((s, dir) =>
      Multimodal.decodeWavZcrEnergy(
          Multimodal.syntheticWavOsc(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E194: SPECTRAL audio features (VERDICT r13 #2) — the frequency-
    // domain stage after the codec: real WAV decode → from-scratch
    // radix-2 FFT per 256-sample frame → spectrogram stats (dominant
    // bin, spectral centroid, 85% rolloff bin, log power). The gate
    // signal is an EXACT two-tone (bins 64 and 128 are the only
    // frequencies whose cosines are integer-valued at N=256), so the
    // oracle evaluates the closed-form spectrum P[64]=(a1·128)²,
    // P[128]=(a2·256)² from doc_id directly — any FFT indexing,
    // twiddle, or framing bug shifts a bin and breaks the hash. FFT
    // noise budget: ~1e-15 relative per bin ≪ round-6 on the two
    // continuous columns; the discrete bins have ≥1e7 margin.
    "e194_audio_spectrum" -> ((s, dir) =>
      Multimodal.decodeWavSpectrum(
          Multimodal.syntheticWavTone(docs(s, dir).select(col("doc_id"))))
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_samples"),
          col("dominant_bin"),
          Rounding.duckRound(col("centroid"), 6).as("centroid"),
          col("rolloff_bin"),
          Rounding.duckRound(col("log_power"), 6).as("log_power"))),

    // E180: single-source MIN-COST paths over the weighted co-purchase
    // projection (Bellman-Ford relaxed to the fixpoint, hop budget as
    // oracle parity) — the weighted refinement of e127's BFS: integer
    // costs w = max(1, 201 − n_shared), so a chain of strong edges
    // can beat a weak direct edge and path sums stay exact
    "e180_weighted_shortest_path" -> ((s, dir) => {
      val edges = GraphOps.bipartiteProjection(tradePairs(s, dir),
          minShared = 190L)
        .select(col("node_a"), col("node_b"),
          greatest(lit(1L), lit(201L) - col("n_shared")).as("w"))
      val row = edges.agg(min(col("node_a"))).head()
      if (row.isNullAt(0))
        s.range(0).select(col("id").as("node"), col("id").as("cost"))
      // maxRounds=16 is SEMANTIC here (oracle-parity, as e127 does
      // with maxHops): the oracle unrolls exactly 16 relaxation
      // rounds, so the operator must cap at the same depth rather
      // than run to an arbitrarily deeper fixpoint. At sf0.01 the
      // projection's weighted diameter settles well before 16, so
      // cap == fixpoint there; the cap keeps the gate well-defined
      // at any scale factor.
      else GraphOps.weightedShortestPath(edges, row.getLong(0),
        maxRounds = 16)
    }),

    // E179: from-scratch HyperLogLog — the CARDINALITY member of the
    // sketch family, md5-derived end to end so the oracle rebuilds
    // the SAME 64 registers (register-level exact, unlike e13's
    // ε-gated built-in); two keys exercise both estimator branches
    // (user_id → small-range ln correction, event_id → raw harmonic)
    // with the relative error as a measured column
    "e179_hll_cardinality" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      def one(k: String) = Sketches.hllScorecard(
        Sketches.hllRegisters(ev, col(k).cast("string")),
        ev.agg(countDistinct(col(k)).as("n_exact")), k)
      one("user_id").unionByName(one("event_id"))
    }),

    // E174: REAL baseline-JPEG codec gate (VERDICT r12 #1) — the
    // entropy-coded lossy format every web-scraped image corpus
    // ships in: block-constant YCbCr planes (values chosen so DC
    // quantization is lossless — see JpegCodec's exactness contract)
    // are Huffman-coded through the full 4:2:0 JFIF pipeline and
    // decoded back by the pure-JVM JpegCodec; per-plane scanline
    // features hash-compare against the oracle's direct formula
    // evaluation. Any Huffman/zigzag/dequant/IDCT/MCU-layout bug
    // breaks the hash; general AC content is spec-covered via
    // ImageIO cross-decodes. Partition-local end to end.
    "e174_jpeg_codec_rows" -> ((s, dir) =>
      Multimodal.decodeJpegPlaneRows(
          Multimodal.syntheticJpeg(docs(s, dir).select(col("doc_id"))))
        .toDF()),

    // E176: JPEG decode → nearest-RESIZE → extract — the e117
    // thumbnail composition on the entropy-coded format (decode and
    // transform compose partition-locally; the lossless-roundtrip
    // pattern keeps the resampled features closed-form)
    "e176_jpeg_resize_rows" -> ((s, dir) =>
      Multimodal.decodeJpegResizeRows(
          Multimodal.syntheticJpeg(docs(s, dir).select(col("doc_id"))),
          ow = 8, oh = 4)
        .toDF())
  )

  /** Unrolled unigram-LM EM in SQL (e227/e228): the α/β forward-
    * backward DPs as recursive CTEs carrying a 3-wide sliding window
    * (piece length ≤ 3), one pair per EM round, with the EXACT
    * summation shapes of [[graft.ext.UnigramLm]] — (l1 + l2) + l3 per
    * position, ((α·p)·β)/Z·wc per occurrence, round-6 expected
    * counts, round-12 probabilities. β is α run on `reverse(word)`
    * against the reversed-piece model, the same trick the engine
    * fold uses. */
  private def unigramCtes(seedMulti: Int, rounds: Int,
                          keepMulti: Int): String =
    unigramSchedCtes(seedMulti, Seq(rounds -> keepMulti))

  /** The scheduled (iterative-prune) generalization (e230/e231 —
    * VERDICT r15 #4): per `(emPasses, keepMulti)` stage, that many
    * EM passes then a prune to alphabet + top-`keepMulti` multis with
    * renormalization, mirroring [[graft.ext.UnigramLm.trainSchedule]]
    * stage for stage. Model CTEs number sequentially across stages
    * (EM pass i: model$i; each prune adds one more); `ufinal` is
    * always the last model. */
  private def unigramSchedCtes(seedMulti: Int,
                               schedule: Seq[(Int, Int)]): String = {
    def alphaRec(name: String, wordExpr: String,
                 modelCte: String): String =
      s"""$name AS (
         |  SELECT word, 0 AS j, CAST(1 AS DOUBLE) AS a0,
         |         CAST(0 AS DOUBLE) AS a1, CAST(0 AS DOUBLE) AS a2
         |  FROM uwt
         |  UNION ALL
         |  SELECT a.word, a.j + 1,
         |    a.a0 * coalesce(p1.p, CAST(0 AS DOUBLE))
         |      + CASE WHEN a.j >= 1
         |          THEN a.a1 * coalesce(p2.p, CAST(0 AS DOUBLE))
         |          ELSE CAST(0 AS DOUBLE) END
         |      + CASE WHEN a.j >= 2
         |          THEN a.a2 * coalesce(p3.p, CAST(0 AS DOUBLE))
         |          ELSE CAST(0 AS DOUBLE) END AS a0,
         |    a.a0 AS a1, a.a1 AS a2
         |  FROM $name a
         |  JOIN uwt w ON w.word = a.word
         |  LEFT JOIN $modelCte p1
         |    ON p1.piece = substring($wordExpr, a.j + 1, 1)
         |  LEFT JOIN $modelCte p2
         |    ON a.j >= 1 AND p2.piece = substring($wordExpr, a.j, 2)
         |  LEFT JOIN $modelCte p3
         |    ON a.j >= 2 AND p3.piece = substring($wordExpr, a.j - 1, 3)
         |  WHERE a.j < length(w.word))""".stripMargin
    def emPass(r: Int): String =
      s"""${alphaRec(s"ualpha$r", "w.word", s"model${r - 1}")},
         |${alphaRec(s"ubeta$r", "reverse(w.word)", s"modelrev${r - 1}")},
         |uec$r AS MATERIALIZED (
         |  SELECT o.piece, round(sum(
         |    A.a0 * m.p * B.a0 / Z.a0 * CAST(o.wc AS DOUBLE)), 6) AS ec
         |  FROM uocc o
         |  JOIN model${r - 1} m ON m.piece = o.piece
         |  JOIN ualpha$r A ON A.word = o.word AND A.j = o.s - 1
         |  JOIN ubeta$r B ON B.word = o.word
         |    AND B.j = length(o.word) - (o.s + o.len - 1)
         |  JOIN ualpha$r Z ON Z.word = o.word AND Z.j = length(o.word)
         |  GROUP BY 1),
         |utot$r AS (
         |  SELECT round(sum(coalesce(e.ec, CAST(0 AS DOUBLE))), 6) AS t
         |  FROM model${r - 1} mm
         |  LEFT JOIN uec$r e ON e.piece = mm.piece),
         |model$r AS MATERIALIZED (
         |  SELECT mm.piece,
         |    round(coalesce(e.ec, CAST(0 AS DOUBLE)) / t.t, 12) AS p
         |  FROM model${r - 1} mm
         |  LEFT JOIN uec$r e ON e.piece = mm.piece
         |  CROSS JOIN utot$r t),
         |modelrev$r AS MATERIALIZED (
         |  SELECT reverse(piece) AS piece, p FROM model$r)"""
        .stripMargin
    def prune(r: Int, keepMulti: Int): String =
      s"""ukept$r AS (
         |  SELECT piece, p FROM model${r - 1} WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, p FROM (
         |    SELECT piece, p FROM model${r - 1} WHERE length(piece) > 1
         |    ORDER BY p DESC, piece LIMIT $keepMulti)),
         |utotk$r AS (SELECT round(sum(p), 12) AS t FROM ukept$r),
         |model$r AS MATERIALIZED (
         |  SELECT piece, round(p / t, 12) AS p
         |  FROM ukept$r CROSS JOIN utotk$r),
         |modelrev$r AS MATERIALIZED (
         |  SELECT reverse(piece) AS piece, p FROM model$r)"""
        .stripMargin
    var mi = 0
    val stages = schedule.map { case (emPasses, keepMulti) =>
      val passes = (1 to emPasses).map { _ =>
        mi += 1; emPass(mi)
      }
      mi += 1
      (passes :+ prune(mi, keepMulti)).mkString(",\n")
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |uwords AS (
       |  SELECT unnest(list_filter(string_split(text, ' '),
       |    x -> x != '')) AS word FROM documents),
       |uwt AS MATERIALIZED (
       |  SELECT word, count(*) AS wc FROM uwords GROUP BY 1),
       |uocc AS MATERIALIZED (
       |  SELECT word, wc, s, len, substring(word, s, len) AS piece
       |  FROM (SELECT word, wc,
       |          unnest(range(1, length(word) + 1)) AS s FROM uwt) a
       |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS len) l
       |  WHERE s + len - 1 <= length(word)),
       |ucnt AS (SELECT piece, len, sum(wc) AS cnt
       |         FROM uocc GROUP BY 1, 2),
       |useed AS (
       |  SELECT piece, cnt FROM ucnt WHERE len = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM ucnt WHERE len > 1
       |    ORDER BY cnt DESC, piece LIMIT $seedMulti)),
       |utot0 AS (SELECT sum(cnt) AS t FROM useed),
       |model0 AS MATERIALIZED (SELECT piece,
       |    round(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE), 12) AS p
       |  FROM useed CROSS JOIN utot0),
       |modelrev0 AS MATERIALIZED (
       |  SELECT reverse(piece) AS piece, p FROM model0),
       |$stages,
       |ufinal AS MATERIALIZED (SELECT piece, p FROM model$mi)"""
      .stripMargin
  }

  private lazy val unigramTrainOracle: String =
    s"""${unigramCtes(120, 2, 48)}
       |SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars,
       |  CAST(row_number() OVER (ORDER BY p DESC, piece) AS BIGINT)
       |    AS rank,
       |  round(p, 9) AS prob
       |FROM ufinal""".stripMargin

  /** Per-word Viterbi CTE chain over any model CTE prefix exposing
    * `ufinal`/`uwt` (e228/e229; e232 runs it on the SCHEDULED model). */
  private def vitCtesOn(modelCtes: String): String =
    s"""$modelCtes,
       |ulp AS MATERIALIZED (SELECT piece, round(ln(p), 9) AS lp FROM ufinal),
       |uvit AS (
       |  SELECT word, 0 AS j, CAST(0 AS DOUBLE) AS v0, 0 AS n0,
       |    CAST(0 AS DOUBLE) AS v1, 0 AS n1,
       |    CAST(0 AS DOUBLE) AS v2, 0 AS n2
       |  FROM uwt
       |  UNION ALL
       |  SELECT a.word, a.j + 1,
       |    CASE
       |      WHEN a.j >= 2 AND c3.lp IS NOT NULL
       |        AND (a.v2 + c3.lp) >= coalesce(
       |          CASE WHEN a.j >= 1 THEN a.v1 + c2.lp END,
       |          CAST('-infinity' AS DOUBLE))
       |        AND (a.v2 + c3.lp) >= (a.v0 + c1.lp)
       |      THEN a.v2 + c3.lp
       |      WHEN a.j >= 1 AND c2.lp IS NOT NULL
       |        AND (a.v1 + c2.lp) >= (a.v0 + c1.lp)
       |      THEN a.v1 + c2.lp
       |      ELSE a.v0 + c1.lp END AS v0,
       |    CASE
       |      WHEN a.j >= 2 AND c3.lp IS NOT NULL
       |        AND (a.v2 + c3.lp) >= coalesce(
       |          CASE WHEN a.j >= 1 THEN a.v1 + c2.lp END,
       |          CAST('-infinity' AS DOUBLE))
       |        AND (a.v2 + c3.lp) >= (a.v0 + c1.lp)
       |      THEN a.n2 + 1
       |      WHEN a.j >= 1 AND c2.lp IS NOT NULL
       |        AND (a.v1 + c2.lp) >= (a.v0 + c1.lp)
       |      THEN a.n1 + 1
       |      ELSE a.n0 + 1 END AS n0,
       |    a.v0 AS v1, a.n0 AS n1, a.v1 AS v2, a.n1 AS n2
       |  FROM uvit a JOIN uwt w ON w.word = a.word
       |  LEFT JOIN ulp c1 ON c1.piece = substring(w.word, a.j + 1, 1)
       |  LEFT JOIN ulp c2
       |    ON a.j >= 1 AND c2.piece = substring(w.word, a.j, 2)
       |  LEFT JOIN ulp c3
       |    ON a.j >= 2 AND c3.piece = substring(w.word, a.j - 1, 3)
       |  WHERE a.j < length(w.word))""".stripMargin

  private lazy val unigramVitCtes: String =
    vitCtesOn(unigramCtes(120, 2, 48))

  private val unigramVitSelect: String =
    s"""SELECT w.word AS word, w.wc, CAST(v.n0 AS BIGINT) AS n_pieces,
       |  round(v.v0, 6) AS best_lp
       |FROM uvit v JOIN uwt w
       |  ON w.word = v.word AND v.j = length(w.word)""".stripMargin

  private lazy val unigramViterbiOracle: String =
    s"$unigramVitCtes\n$unigramVitSelect"

  /** The e230/e232 training schedule: EM+prune stages walking the
    * multi-piece vocabulary 120 → 72 → 48 → 32 (VERDICT r15 #4 —
    * ≥2 prune rounds; the engine twin is
    * `UnigramLm.trainSchedule(docs, 120, UnigramSchedule)`). */
  private val unigramSchedule: Seq[(Int, Int)] =
    Seq(1 -> 72, 1 -> 48, 1 -> 32)

  private lazy val unigramSchedTrainOracle: String =
    s"""${unigramSchedCtes(120, unigramSchedule)}
       |SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars,
       |  CAST(row_number() OVER (ORDER BY p DESC, piece) AS BIGINT)
       |    AS rank,
       |  round(p, 9) AS prob
       |FROM ufinal""".stripMargin

  private lazy val unigramSchedViterbiOracle: String =
    s"${vitCtesOn(unigramSchedCtes(120, unigramSchedule))}\n" +
      unigramVitSelect

  /** e229: per-document serving stats — per-word best_lp snaps to 6
    * decimals BEFORE the doc sum, mirroring the engine's stateless
    * fold; the doc sum re-rounds at 6 (the one order-dependent
    * accumulation). */
  private lazy val unigramDocServeOracle: String =
    s"""$unigramVitCtes,
       |docw AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
       |    x -> x != '')) AS word FROM documents),
       |perw AS (
       |  SELECT d.doc_id, CAST(v.n0 AS BIGINT) AS np,
       |         round(v.v0, 6) AS lp6
       |  FROM docw d JOIN uvit v
       |    ON v.word = d.word AND v.j = length(d.word)),
       |dsum AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    CAST(sum(np) AS BIGINT) AS n_pieces,
       |    round(sum(lp6), 6) AS doc_lp
       |  FROM perw GROUP BY 1)
       |SELECT d0.doc_id,
       |  coalesce(w.n_words, 0) AS n_words,
       |  coalesce(w.n_pieces, 0) AS n_pieces,
       |  coalesce(w.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp
       |FROM documents d0 LEFT JOIN dsum w USING (doc_id)""".stripMargin

  /** Kneser-Ney bigram training + per-doc scoring as shared CTEs
    * (e233/e234), over an arbitrary (doc_id, text) source —
    * parametrized so e237's curation chain can run it over its
    * quality-surviving corpus: exact integer counts, ONE fixed
    * probability expression shape (matching [[graft.ext.KneserNey]]
    * term for term), round-9 per-bigram lp, round-6 per-doc sum. */
  private def knDocCtesFrom(src: String): String =
    s"""knw AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM $src),
      |knbig AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM knw)),
      |kntyp AS (SELECT w1, w2, count(*) AS cnt FROM knbig
      |          GROUP BY 1, 2),
      |knhist AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |           FROM kntyp GROUP BY 1),
      |knleft AS (SELECT w2, count(*) AS n1l FROM kntyp GROUP BY 1),
      |kntot AS (SELECT count(*) AS n1tot FROM kntyp),
      |knlp AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM kntyp t JOIN knhist h USING (w1) JOIN knleft l USING (w2)
      |  CROSS JOIN kntot s),
      |kndoc AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM knbig b JOIN knlp p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  GROUP BY 1)""".stripMargin

  private val knDocCtes: String = knDocCtesFrom("documents")

  /** Trigram interpolated KN on top of [[knDocCtes]] (e236): the
    * Chen-Goodman lower-order bigram from continuation counts, the
    * bigram-left continuation unigram at the bottom, ONE probability
    * expression mirroring [[graft.ext.KneserNey.trigramLogProbs]]
    * term for term. */
  private val kn3DocCtes: String =
    s"""$knDocCtes,
      |kn3tri AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
      |        FROM knw)),
      |kn3typ AS (SELECT w1, w2, w3, count(*) AS cnt FROM kn3tri
      |           GROUP BY 1, 2, 3),
      |kn3hist AS (SELECT w1, w2, sum(cnt) AS ctot, count(*) AS n1r
      |            FROM kn3typ GROUP BY 1, 2),
      |kn3cont AS (SELECT w2, w3, count(*) AS n1l3 FROM kn3typ
      |            GROUP BY 1, 2),
      |kn3mid AS (SELECT w2, sum(n1l3) AS nmid, count(*) AS n1rctx
      |           FROM kn3cont GROUP BY 1),
      |kn3leftb AS (SELECT w2 AS w3, count(*) AS n1lb FROM kntyp
      |             GROUP BY 1),
      |kn3totb AS (SELECT count(*) AS nbtot FROM kntyp),
      |kn3lp AS (
      |  SELECT t.w1, t.w2, t.w3, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (greatest(c.n1l3 - CAST(0.75 AS DOUBLE),
      |                  CAST(0 AS DOUBLE)) / m.nmid
      |        + CAST(0.75 AS DOUBLE) * m.n1rctx / m.nmid
      |        * (CAST(l.n1lb AS DOUBLE) / s.nbtot))), 9) AS lp
      |  FROM kn3typ t
      |  JOIN kn3hist h ON h.w1 = t.w1 AND h.w2 = t.w2
      |  JOIN kn3cont c ON c.w2 = t.w2 AND c.w3 = t.w3
      |  JOIN kn3mid m ON m.w2 = t.w2
      |  JOIN kn3leftb l ON l.w3 = t.w3
      |  CROSS JOIN kn3totb s),
      |kn3doc AS (
      |  SELECT b.doc_id, count(*) AS n_trigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM kn3tri b JOIN kn3lp p
      |    ON p.w1 = b.w1 AND p.w2 = b.w2 AND p.w3 = b.w3
      |  GROUP BY 1)""".stripMargin

  /** e238: the split-corpus OOV-serving oracle — trains the KN model
    * CTEs on even doc_ids only, scores odd doc_ids through the same
    * left-join + continuation-backoff shape as
    * [[graft.ext.KneserNey.docScoresOov]], term for term. */
  private val knOovServeOracle: String =
    """WITH knw AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM documents),
      |knbig AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM knw)),
      |kntyp AS (SELECT w1, w2, count(*) AS cnt FROM knbig
      |          WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      |knhist AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |           FROM kntyp GROUP BY 1),
      |knleft AS (SELECT w2, count(*) AS n1l FROM kntyp GROUP BY 1),
      |kntot AS (SELECT count(*) AS n1tot FROM kntyp),
      |knlp AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM kntyp t JOIN knhist h USING (w1) JOIN knleft l USING (w2)
      |  CROSS JOIN kntot s),
      |kncont AS (
      |  SELECT l.w2, round(ln(CAST(l.n1l AS DOUBLE) / s.n1tot), 9)
      |    AS clp
      |  FROM knleft l CROSS JOIN kntot s),
      |sjoin AS (
      |  SELECT b.doc_id, p.lp, c.clp
      |  FROM (SELECT * FROM knbig WHERE doc_id % 2 = 1) b
      |  LEFT JOIN knlp p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  LEFT JOIN kncont c ON c.w2 = b.w2),
      |sdoc AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    count(CASE WHEN lp IS NULL AND clp IS NOT NULL THEN 1 END)
      |      AS n_oov,
      |    count(CASE WHEN lp IS NULL AND clp IS NULL THEN 1 END)
      |      AS n_unk,
      |    round(coalesce(sum(coalesce(lp, clp)), CAST(0 AS DOUBLE)), 6)
      |      AS doc_lp
      |  FROM sjoin GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(k.n_bigrams, 0) AS n_bigrams,
      |  coalesce(k.n_oov, 0) AS n_oov,
      |  coalesce(k.n_unk, 0) AS n_unk,
      |  coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |  CASE WHEN k.n_bigrams IS NOT NULL AND k.n_bigrams - k.n_unk > 0
      |       THEN round(exp(-k.doc_lp / (k.n_bigrams - k.n_unk)), 6)
      |  END AS ppl
      |FROM documents d LEFT JOIN sdoc k USING (doc_id)
      |WHERE d.doc_id % 2 = 1""".stripMargin

  /** e237: the curation-chain oracle — chains the e1 dedup CTE, the
    * e7 quality CTEs (over the deduped corpus), and the e234 KN +
    * median-cut CTEs (over the quality survivors), exactly the stage
    * ordering [[graft.ext.Curation.chain]] runs. */
  private val curationChainOracle: String =
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
      |ded AS (
      |  SELECT min(doc_id) AS doc_id FROM alldocs GROUP BY md5(text)),
      |corpus AS (
      |  SELECT d.doc_id, d.text FROM alldocs d JOIN ded USING (doc_id)),
      |${qualityCtesFrom("corpus")},
      |kept AS (
      |  SELECT q.doc_id, q.n_words, q.quality, c.text
      |  FROM qual q JOIN corpus c USING (doc_id)
      |  WHERE q.quality >= CAST(0.5 AS DOUBLE)),
      |${knDocCtesFrom("kept")},
      |knfinal AS (
      |  SELECT t.doc_id,
      |    coalesce(k.n_bigrams, 0) AS n_bigrams,
      |    coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |    CASE WHEN k.n_bigrams IS NOT NULL
      |         THEN round(exp(-k.doc_lp / k.n_bigrams), 6) END AS ppl
      |  FROM kept t LEFT JOIN kndoc k USING (doc_id)),
      |kncut AS (SELECT quantile_cont(ppl, CAST(0.5 AS DOUBLE)) AS c
      |          FROM knfinal)
      |SELECT f.doc_id, t.n_words, t.quality,
      |  f.n_bigrams, f.doc_lp, f.ppl
      |FROM knfinal f JOIN kept t USING (doc_id) CROSS JOIN kncut
      |WHERE f.ppl <= kncut.c""".stripMargin

  /** e239: one batch's KN CTE family, every name suffixed with the
    * batch index — the model trains on the INCLUSIVE prefix
    * (doc_id % 3 <= k) and `kndoc<k>` scores exactly batch k's docs
    * against it, mirroring
    * [[graft.ext.KneserNey.refreshAndScore]]'s per-batch retrain. */
  private def knRefreshBatchCtes(k: Int, mod: Int = 3): String =
    s"""knw$k AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM documents WHERE doc_id % $mod <= $k),
      |knbig$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM knw$k)),
      |kntyp$k AS (SELECT w1, w2, count(*) AS cnt FROM knbig$k
      |            GROUP BY 1, 2),
      |knhist$k AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |             FROM kntyp$k GROUP BY 1),
      |knleft$k AS (SELECT w2, count(*) AS n1l FROM kntyp$k GROUP BY 1),
      |kntot$k AS (SELECT count(*) AS n1tot FROM kntyp$k),
      |knlp$k AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM kntyp$k t JOIN knhist$k h USING (w1)
      |  JOIN knleft$k l USING (w2)
      |  CROSS JOIN kntot$k s),
      |kndoc$k AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM knbig$k b JOIN knlp$k p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  WHERE b.doc_id % $mod = $k
      |  GROUP BY 1)""".stripMargin

  private def knRefreshBatchSelect(k: Int, mod: Int = 3): String =
    s"""SELECT $k AS batch, d.doc_id,
      |  coalesce(x.n_bigrams, 0) AS n_bigrams,
      |  coalesce(x.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |  CASE WHEN x.n_bigrams IS NOT NULL
      |       THEN round(exp(-x.doc_lp / x.n_bigrams), 6) END AS ppl
      |FROM (SELECT doc_id FROM documents WHERE doc_id % $mod = $k) d
      |LEFT JOIN kndoc$k x USING (doc_id)""".stripMargin

  /** e239: each batch scored against the model trained on its
    * inclusive prefix — three unrolled CTE families, one UNION ALL. */
  private val knRefreshOracle: String =
    s"""WITH ${(0 to 2).map(knRefreshBatchCtes(_)).mkString(",\n")}
      |${(0 to 2).map(knRefreshBatchSelect(_)).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e252: the maintained refresh runs SIX batches (doc_id % 6) so
    * the version-retention ladder actually deletes mid-stream (v1 at
    * batch 3, v3 at batch 5 with keepEvery = 2) — same per-batch
    * inclusive-prefix family as e239's, six unrolled instances. */
  private val knMaintainedRefreshOracle: String =
    s"""WITH ${(0 to 5).map(knRefreshBatchCtes(_, 6)).mkString(",\n")}
      |${(0 to 5).map(knRefreshBatchSelect(_, 6))
        .mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e255: the seeded refresh's per-batch CTE family — identical
    * model shape to [[knRefreshBatchCtes]], but batch k trains on the
    * SEED (even doc_ids) plus odd batches 0..k (doc_id % 6 ≤ 2k+1
    * picks odd batches 0..k among the odds) and scores exactly odd
    * batch k (doc_id % 6 = 2k+1). The seed itself is trained on but
    * never scored — the "batch −1" contract. */
  private def knSeededRefreshCtes(k: Int): String = {
    val m = 2 * k + 1
    s"""srw$k AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM documents
      |  WHERE doc_id % 2 = 0 OR doc_id % 6 <= $m),
      |srbig$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM srw$k)),
      |srtyp$k AS (SELECT w1, w2, count(*) AS cnt FROM srbig$k
      |            GROUP BY 1, 2),
      |srhist$k AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |             FROM srtyp$k GROUP BY 1),
      |srleft$k AS (SELECT w2, count(*) AS n1l FROM srtyp$k GROUP BY 1),
      |srtot$k AS (SELECT count(*) AS n1tot FROM srtyp$k),
      |srlp$k AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM srtyp$k t JOIN srhist$k h USING (w1)
      |  JOIN srleft$k l USING (w2)
      |  CROSS JOIN srtot$k s),
      |srdoc$k AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM srbig$k b JOIN srlp$k p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  WHERE b.doc_id % 6 = $m
      |  GROUP BY 1)""".stripMargin
  }

  private def knSeededRefreshSelect(k: Int): String = {
    val m = 2 * k + 1
    s"""SELECT $k AS batch, d.doc_id,
      |  coalesce(x.n_bigrams, 0) AS n_bigrams,
      |  coalesce(x.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |  CASE WHEN x.n_bigrams IS NOT NULL
      |       THEN round(exp(-x.doc_lp / x.n_bigrams), 6) END AS ppl
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 6 = $m) d
      |LEFT JOIN srdoc$k x USING (doc_id)""".stripMargin
  }

  private val knSeededRefreshOracle: String =
    s"""WITH ${(0 to 2).map(knSeededRefreshCtes).mkString(",\n")}
      |${(0 to 2).map(knSeededRefreshSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e246: one batch's TRIGRAM KN CTE family trained on the inclusive
    * prefix (doc_id % 3 <= k) — the kn3DocCtes expression, suffixed
    * and prefix-filtered; `t3doc<k>` scores exactly batch k's docs,
    * mirroring [[graft.ext.KneserNey.refreshAndScoreTrigramIncremental]]. */
  private def kn3RefreshBatchCtes(k: Int): String =
    s"""t3w$k AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM documents WHERE doc_id % 3 <= $k),
      |t3tri$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
      |        FROM t3w$k)),
      |t3big$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM t3w$k)),
      |t3typ$k AS (SELECT w1, w2, w3, count(*) AS cnt FROM t3tri$k
      |            GROUP BY 1, 2, 3),
      |t3hist$k AS (SELECT w1, w2, sum(cnt) AS ctot, count(*) AS n1r
      |             FROM t3typ$k GROUP BY 1, 2),
      |t3cont$k AS (SELECT w2, w3, count(*) AS n1l3 FROM t3typ$k
      |             GROUP BY 1, 2),
      |t3mid$k AS (SELECT w2, sum(n1l3) AS nmid, count(*) AS n1rctx
      |            FROM t3cont$k GROUP BY 1),
      |t3btyp$k AS (SELECT w1, w2, count(*) AS cnt FROM t3big$k
      |             GROUP BY 1, 2),
      |t3leftb$k AS (SELECT w2 AS w3, count(*) AS n1lb FROM t3btyp$k
      |              GROUP BY 1),
      |t3totb$k AS (SELECT count(*) AS nbtot FROM t3btyp$k),
      |t3lp$k AS (
      |  SELECT t.w1, t.w2, t.w3, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (greatest(c.n1l3 - CAST(0.75 AS DOUBLE),
      |                  CAST(0 AS DOUBLE)) / m.nmid
      |        + CAST(0.75 AS DOUBLE) * m.n1rctx / m.nmid
      |        * (CAST(l.n1lb AS DOUBLE) / s.nbtot))), 9) AS lp
      |  FROM t3typ$k t
      |  JOIN t3hist$k h ON h.w1 = t.w1 AND h.w2 = t.w2
      |  JOIN t3cont$k c ON c.w2 = t.w2 AND c.w3 = t.w3
      |  JOIN t3mid$k m ON m.w2 = t.w2
      |  JOIN t3leftb$k l ON l.w3 = t.w3
      |  CROSS JOIN t3totb$k s),
      |t3doc$k AS (
      |  SELECT b.doc_id, count(*) AS n_trigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM t3tri$k b JOIN t3lp$k p
      |    ON p.w1 = b.w1 AND p.w2 = b.w2 AND p.w3 = b.w3
      |  WHERE b.doc_id % 3 = $k
      |  GROUP BY 1)""".stripMargin

  private def kn3RefreshBatchSelect(k: Int): String =
    s"""SELECT $k AS batch, d.doc_id,
      |  coalesce(x.n_trigrams, 0) AS n_trigrams,
      |  coalesce(x.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |  CASE WHEN x.n_trigrams IS NOT NULL
      |       THEN round(exp(-x.doc_lp / x.n_trigrams), 6) END AS ppl
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = $k) d
      |LEFT JOIN t3doc$k x USING (doc_id)""".stripMargin

  /** e246: each batch scored against the TRIGRAM model trained on its
    * inclusive prefix. */
  private val kn3RefreshOracle: String =
    s"""WITH ${(0 to 2).map(kn3RefreshBatchCtes).mkString(",\n")}
      |${(0 to 2).map(kn3RefreshBatchSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e240/e243: one batch's prefix-trained KN CTE family over the
    * quality-surviving stream (`keptq`), names suffixed with the
    * batch index; `ckndoc<k>` scores exactly batch k's kept docs
    * against the model trained on kept batches 0..k, `cfin<k>` is the
    * batch's finalized score rows. Shared by the per-batch-median
    * (e240) and prefix-global (e243) cut variants. */
  private def knCurateBatchCoreCtes(k: Int): String =
    s"""cknw$k AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM keptq WHERE batch <= $k),
      |cknbig$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM cknw$k)),
      |ckntyp$k AS (SELECT w1, w2, count(*) AS cnt FROM cknbig$k
      |             GROUP BY 1, 2),
      |cknhist$k AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |              FROM ckntyp$k GROUP BY 1),
      |cknleft$k AS (SELECT w2, count(*) AS n1l FROM ckntyp$k
      |              GROUP BY 1),
      |ckntot$k AS (SELECT count(*) AS n1tot FROM ckntyp$k),
      |cknlp$k AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM ckntyp$k t JOIN cknhist$k h USING (w1)
      |  JOIN cknleft$k l USING (w2)
      |  CROSS JOIN ckntot$k s),
      |ckndoc$k AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM cknbig$k b JOIN cknlp$k p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  WHERE b.doc_id % 3 = $k
      |  GROUP BY 1),
      |cfin$k AS (
      |  SELECT q.batch, q.doc_id, q.n_words, q.quality,
      |    coalesce(x.n_bigrams, 0) AS n_bigrams,
      |    coalesce(x.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |    CASE WHEN x.n_bigrams IS NOT NULL
      |         THEN round(exp(-x.doc_lp / x.n_bigrams), 6) END AS ppl
      |  FROM (SELECT * FROM keptq WHERE batch = $k) q
      |  LEFT JOIN ckndoc$k x USING (doc_id))""".stripMargin

  /** e240: the core family plus the batch's OWN median cut. */
  private def knCurateBatchCtes(k: Int): String =
    s"""${knCurateBatchCoreCtes(k)},
      |ccut$k AS (SELECT quantile_cont(ppl, CAST(0.5 AS DOUBLE)) AS c
      |           FROM cfin$k)""".stripMargin

  /** e243: the core family plus the PREFIX-GLOBAL median cut — the
    * quantile of the merged score vectors of batches 0..k, each
    * batch's scores as recorded against its own version model. */
  private def knCurateGlobalBatchCtes(k: Int): String =
    s"""${knCurateBatchCoreCtes(k)},
      |gcut$k AS (SELECT quantile_cont(ppl, CAST(0.5 AS DOUBLE)) AS c
      |           FROM (${(0 to k).map(j => s"SELECT ppl FROM cfin$j")
        .mkString(" UNION ALL ")}))""".stripMargin

  private def knCurateBatchSelect(k: Int): String =
    s"""SELECT f.batch, f.doc_id, f.n_words, f.quality, f.n_bigrams,
      |  f.doc_lp, f.ppl
      |FROM cfin$k f CROSS JOIN ccut$k WHERE f.ppl <= ccut$k.c"""
      .stripMargin

  /** e240: the streaming-curation oracle — the same planted-clone
    * corpus, first-seen-wins dedup as ONE row_number window ordered
    * by (batch, doc_id), the shared quality CTEs over the survivor
    * stream, then three per-batch prefix-trained KN families with
    * per-batch median cuts. */
  private val streamingCurationOracle: String =
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
      |firsts AS (
      |  SELECT doc_id, text, doc_id % 3 AS batch,
      |    row_number() OVER (PARTITION BY md5(text)
      |                       ORDER BY doc_id % 3, doc_id) AS rn
      |  FROM alldocs),
      |surv AS (SELECT doc_id, text, batch FROM firsts WHERE rn = 1),
      |${qualityCtesFrom("surv")},
      |keptq AS (
      |  SELECT s.batch, q.doc_id, q.n_words, q.quality, s.text
      |  FROM qual q JOIN surv s USING (doc_id)
      |  WHERE q.quality >= CAST(0.5 AS DOUBLE)),
      |${(0 to 2).map(knCurateBatchCtes).mkString(",\n")}
      |${(0 to 2).map(knCurateBatchSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e256: the core family plus the MERGED-HISTOGRAM cut — per-batch
    * score vectors of batches 0..k binned at floor(ln(ppl)·20), the
    * cut bin the smallest whose cumulative count reaches the target
    * rank, survivors at or below it (the additive running-quantile
    * state re-derived bin-for-bin). */
  private def knCurateHistBatchCtes(k: Int): String =
    s"""${knCurateBatchCoreCtes(k)},
      |hbin$k AS (
      |  SELECT CAST(floor(ln(ppl) * 20) AS BIGINT) AS bin,
      |    count(*) AS cnt
      |  FROM (${(0 to k).map(j => s"SELECT ppl FROM cfin$j")
        .mkString(" UNION ALL ")})
      |  WHERE ppl IS NOT NULL GROUP BY 1),
      |hcut$k AS (
      |  SELECT min(bin) AS cb FROM (
      |    SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
      |      sum(cnt) OVER () AS n FROM hbin$k)
      |  WHERE cum >= CAST(0.5 AS DOUBLE) * n)""".stripMargin

  private def knCurateHistSelect(k: Int): String =
    s"""SELECT f.batch, f.doc_id, f.n_words, f.quality, f.n_bigrams,
      |  f.doc_lp, f.ppl
      |FROM cfin$k f CROSS JOIN hcut$k
      |WHERE f.ppl IS NOT NULL
      |  AND CAST(floor(ln(f.ppl) * 20) AS BIGINT) <= hcut$k.cb"""
      .stripMargin

  private val streamingCurationHistOracle: String =
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
      |firsts AS (
      |  SELECT doc_id, text, doc_id % 3 AS batch,
      |    row_number() OVER (PARTITION BY md5(text)
      |                       ORDER BY doc_id % 3, doc_id) AS rn
      |  FROM alldocs),
      |surv AS (SELECT doc_id, text, batch FROM firsts WHERE rn = 1),
      |${qualityCtesFrom("surv")},
      |keptq AS (
      |  SELECT s.batch, q.doc_id, q.n_words, q.quality, s.text
      |  FROM qual q JOIN surv s USING (doc_id)
      |  WHERE q.quality >= CAST(0.5 AS DOUBLE)),
      |${(0 to 2).map(knCurateHistBatchCtes).mkString(",\n")}
      |${(0 to 2).map(knCurateHistSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  private def knCurateGlobalSelect(k: Int): String =
    s"""SELECT f.batch, f.doc_id, f.n_words, f.quality, f.n_bigrams,
      |  f.doc_lp, f.ppl, 1 AS cut_within
      |FROM cfin$k f CROSS JOIN gcut$k WHERE f.ppl <= gcut$k.c"""
      .stripMargin

  /** e243: the global-cut streaming-curation oracle — identical
    * dedup/quality/per-batch-model families to e240's, but each
    * batch's cut is the quantile over the UNION of batches 0..k's
    * score rows, and the engine-side GK rank flag is asserted as the
    * constant 1 (the e23a ε-gate pattern: the exact VALUES are
    * hash-gated here, the sketch must sit inside its documented rank
    * bound). */
  private val streamingCurationGlobalOracle: String =
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
      |firsts AS (
      |  SELECT doc_id, text, doc_id % 3 AS batch,
      |    row_number() OVER (PARTITION BY md5(text)
      |                       ORDER BY doc_id % 3, doc_id) AS rn
      |  FROM alldocs),
      |surv AS (SELECT doc_id, text, batch FROM firsts WHERE rn = 1),
      |${qualityCtesFrom("surv")},
      |keptq AS (
      |  SELECT s.batch, q.doc_id, q.n_words, q.quality, s.text
      |  FROM qual q JOIN surv s USING (doc_id)
      |  WHERE q.quality >= CAST(0.5 AS DOUBLE)),
      |${(0 to 2).map(knCurateGlobalBatchCtes).mkString(",\n")}
      |${(0 to 2).map(knCurateGlobalSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e250: one batch's prefix-trained KN CTE family over the SEEDED
    * quality-surviving stream (`skeptq`, where the seed corpus rides
    * as batch −1): the model trains on kept batches −1..k, scoring
    * targets batch k's kept docs BY BATCH MEMBERSHIP (a seed doc may
    * share doc_id % 3 with the batch, so the e240 family's modulus
    * filter would be wrong here), and the cut is the batch's own
    * median. */
  private def knSeedCurateBatchCtes(k: Int): String =
    s"""sknw$k AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM skeptq WHERE batch <= $k),
      |sknbig$k AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM sknw$k)),
      |skntyp$k AS (SELECT w1, w2, count(*) AS cnt FROM sknbig$k
      |             GROUP BY 1, 2),
      |sknhist$k AS (SELECT w1, sum(cnt) AS ctot, count(*) AS n1r
      |              FROM skntyp$k GROUP BY 1),
      |sknleft$k AS (SELECT w2, count(*) AS n1l FROM skntyp$k
      |              GROUP BY 1),
      |skntot$k AS (SELECT count(*) AS n1tot FROM skntyp$k),
      |sknlp$k AS (
      |  SELECT t.w1, t.w2, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (CAST(l.n1l AS DOUBLE) / s.n1tot)), 9) AS lp
      |  FROM skntyp$k t JOIN sknhist$k h USING (w1)
      |  JOIN sknleft$k l USING (w2)
      |  CROSS JOIN skntot$k s),
      |skndoc$k AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    round(sum(p.lp), 6) AS doc_lp
      |  FROM sknbig$k b JOIN sknlp$k p ON p.w1 = b.w1 AND p.w2 = b.w2
      |  WHERE b.doc_id IN (SELECT doc_id FROM skeptq WHERE batch = $k)
      |  GROUP BY 1),
      |scfin$k AS (
      |  SELECT q.batch, q.doc_id, q.n_words, q.quality,
      |    coalesce(x.n_bigrams, 0) AS n_bigrams,
      |    coalesce(x.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |    CASE WHEN x.n_bigrams IS NOT NULL
      |         THEN round(exp(-x.doc_lp / x.n_bigrams), 6) END AS ppl
      |  FROM (SELECT * FROM skeptq WHERE batch = $k) q
      |  LEFT JOIN skndoc$k x USING (doc_id)),
      |sccut$k AS (SELECT quantile_cont(ppl, CAST(0.5 AS DOUBLE)) AS c
      |            FROM scfin$k)""".stripMargin

  private def knSeedCurateSelect(k: Int): String =
    s"""SELECT f.batch, f.doc_id, f.n_words, f.quality, f.n_bigrams,
      |  f.doc_lp, f.ppl
      |FROM scfin$k f CROSS JOIN sccut$k WHERE f.ppl <= sccut$k.c"""
      .stripMargin

  /** e250: the seeded streaming-curation oracle — the union corpus
    * with the base (doc_id % 10 <> 0) as batch −1, first-seen-wins
    * dedup as ONE row_number window ordered by (batch, doc_id) so the
    * seed always wins against stream clones, the shared quality CTEs
    * over the survivor stream, then three per-batch prefix-trained KN
    * families (prefix INCLUDES the seed) with per-batch median cuts —
    * the seed itself is trained on but never emitted. */
  private val streamingCurationSeededOracle: String =
    s"""WITH seedd AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
      |salldocs AS (
      |  SELECT doc_id, text, CAST(-1 AS BIGINT) AS batch FROM seedd
      |  UNION ALL
      |  SELECT doc_id, text, doc_id % 3 AS batch FROM documents
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000, text, (doc_id + 100000) % 3 AS batch
      |  FROM seedd WHERE doc_id % 5 = 1),
      |sfirsts AS (
      |  SELECT doc_id, text, batch,
      |    row_number() OVER (PARTITION BY md5(text)
      |                       ORDER BY batch, doc_id) AS rn
      |  FROM salldocs),
      |ssurv AS (SELECT doc_id, text, batch FROM sfirsts WHERE rn = 1),
      |${qualityCtesFrom("ssurv")},
      |skeptq AS (
      |  SELECT s.batch, q.doc_id, q.n_words, q.quality, s.text
      |  FROM qual q JOIN ssurv s USING (doc_id)
      |  WHERE q.quality >= CAST(0.5 AS DOUBLE)),
      |${(0 to 2).map(knSeedCurateBatchCtes).mkString(",\n")}
      |${(0 to 2).map(knSeedCurateSelect).mkString("\nUNION ALL\n")}"""
      .stripMargin

  /** e242: the trigram train/serve-split OOV-serving oracle — trains
    * the full trigram KN CTE family on even doc_ids, scores odd
    * doc_ids through the same three-level left-join backoff as
    * [[graft.ext.KneserNey.docScoresOov3]] (P3 → P2c → continuation
    * unigram), term for term. */
  private val knTrigramOovServeOracle: String =
    """WITH knw AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> x != '') AS ws
      |  FROM documents),
      |knbig AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM knw)),
      |kn3tri AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
      |        FROM knw)),
      |kntyp AS (SELECT w1, w2, count(*) AS cnt FROM knbig
      |          WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      |kn3typ AS (SELECT w1, w2, w3, count(*) AS cnt FROM kn3tri
      |           WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
      |kn3hist AS (SELECT w1, w2, sum(cnt) AS ctot, count(*) AS n1r
      |            FROM kn3typ GROUP BY 1, 2),
      |kn3cont AS (SELECT w2, w3, count(*) AS n1l3 FROM kn3typ
      |            GROUP BY 1, 2),
      |kn3mid AS (SELECT w2, sum(n1l3) AS nmid, count(*) AS n1rctx
      |           FROM kn3cont GROUP BY 1),
      |kn3leftb AS (SELECT w2 AS w3, count(*) AS n1lb FROM kntyp
      |             GROUP BY 1),
      |kn3totb AS (SELECT count(*) AS nbtot FROM kntyp),
      |kn3lp AS (
      |  SELECT t.w1, t.w2, t.w3, round(ln(
      |      greatest(t.cnt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / h.ctot
      |      + CAST(0.75 AS DOUBLE) * h.n1r / h.ctot
      |      * (greatest(c.n1l3 - CAST(0.75 AS DOUBLE),
      |                  CAST(0 AS DOUBLE)) / m.nmid
      |        + CAST(0.75 AS DOUBLE) * m.n1rctx / m.nmid
      |        * (CAST(l.n1lb AS DOUBLE) / s.nbtot))), 9) AS lp
      |  FROM kn3typ t
      |  JOIN kn3hist h ON h.w1 = t.w1 AND h.w2 = t.w2
      |  JOIN kn3cont c ON c.w2 = t.w2 AND c.w3 = t.w3
      |  JOIN kn3mid m ON m.w2 = t.w2
      |  JOIN kn3leftb l ON l.w3 = t.w3
      |  CROSS JOIN kn3totb s),
      |kn2clp AS (
      |  SELECT c.w2, c.w3, round(ln(
      |      greatest(c.n1l3 - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
      |        / m.nmid
      |      + CAST(0.75 AS DOUBLE) * m.n1rctx / m.nmid
      |      * (CAST(l.n1lb AS DOUBLE) / s.nbtot)), 9) AS lp2c
      |  FROM kn3cont c JOIN kn3mid m USING (w2)
      |  JOIN kn3leftb l USING (w3)
      |  CROSS JOIN kn3totb s),
      |knleft AS (SELECT w2, count(*) AS n1l FROM kntyp GROUP BY 1),
      |kntot AS (SELECT count(*) AS n1tot FROM kntyp),
      |kn1clp AS (
      |  SELECT l.w2 AS w3, round(ln(CAST(l.n1l AS DOUBLE) / s.n1tot), 9)
      |    AS clp
      |  FROM knleft l CROSS JOIN kntot s),
      |sjoin AS (
      |  SELECT b.doc_id, p.lp, c2.lp2c, c1.clp
      |  FROM (SELECT * FROM kn3tri WHERE doc_id % 2 = 1) b
      |  LEFT JOIN kn3lp p
      |    ON p.w1 = b.w1 AND p.w2 = b.w2 AND p.w3 = b.w3
      |  LEFT JOIN kn2clp c2 ON c2.w2 = b.w2 AND c2.w3 = b.w3
      |  LEFT JOIN kn1clp c1 ON c1.w3 = b.w3),
      |sdoc AS (
      |  SELECT doc_id, count(*) AS n_trigrams,
      |    count(CASE WHEN lp IS NULL AND lp2c IS NOT NULL THEN 1 END)
      |      AS n_oov3,
      |    count(CASE WHEN lp IS NULL AND lp2c IS NULL
      |               AND clp IS NOT NULL THEN 1 END) AS n_oov2,
      |    count(CASE WHEN lp IS NULL AND lp2c IS NULL
      |               AND clp IS NULL THEN 1 END) AS n_unk,
      |    round(coalesce(sum(coalesce(lp, lp2c, clp)),
      |                   CAST(0 AS DOUBLE)), 6) AS doc_lp
      |  FROM sjoin GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(k.n_trigrams, 0) AS n_trigrams,
      |  coalesce(k.n_oov3, 0) AS n_oov3,
      |  coalesce(k.n_oov2, 0) AS n_oov2,
      |  coalesce(k.n_unk, 0) AS n_unk,
      |  coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
      |  CASE WHEN k.n_trigrams IS NOT NULL
      |       AND k.n_trigrams - k.n_unk > 0
      |       THEN round(exp(-k.doc_lp / (k.n_trigrams - k.n_unk)), 6)
      |  END AS ppl
      |FROM documents d LEFT JOIN sdoc k USING (doc_id)
      |WHERE d.doc_id % 2 = 1""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "e237_curation_chain" -> curationChainOracle,

    "e239_kn_refresh_replay" -> knRefreshOracle,

    // the incremental refresh shares e239's oracle VERBATIM — the
    // gate is precisely "merged count partials give the identical
    // per-batch scores a full prefix retrain gives"
    "e241_kn_incremental_refresh_replay" -> knRefreshOracle,

    // compaction must be score-invisible: e239's oracle, verbatim
    "e244_kn_compacted_refresh_replay" -> knRefreshOracle,

    "e246_kn_trigram_incremental_refresh_replay" -> kn3RefreshOracle,

    // trigram-store compaction must be score-invisible: e246's
    // oracle, verbatim (VERDICT r18 #1)
    "e249_kn_trigram_compacted_refresh_replay" -> kn3RefreshOracle,

    // compaction + model-version retention must be score-invisible:
    // e239's per-batch family at six batches, so the ladder deletes
    // mid-stream (VERDICT r18 #4)
    "e252_kn_maintained_refresh_replay" -> knMaintainedRefreshOracle,

    // the seeded maintained refresh must equal per-batch models
    // trained on seed + odd batches 0..k, seed never scored
    // (the refresh-side batch -1 contract)
    "e255_kn_seeded_refresh_replay" -> knSeededRefreshOracle,

    "e240_streaming_curation_replay" -> streamingCurationOracle,

    // the seeded loop must equal the union-corpus per-batch oracle
    // with the seed as never-emitted "batch -1" (VERDICT r18 #5)
    "e250_streaming_curation_seeded_replay" ->
      streamingCurationSeededOracle,

    // seeding composed with full maintenance must still equal the
    // union-corpus oracle — e250's, verbatim (the seed checkpoints
    // fold like any other source)
    "e254_streaming_curation_seeded_maintained_replay" ->
      streamingCurationSeededOracle,

    "e243_streaming_curation_global_cut" -> streamingCurationGlobalOracle,

    // three-store compaction must be survivor- and cut-invisible:
    // e243's oracle, verbatim (VERDICT r18 #2)
    "e251_streaming_curation_global_cut_compacted" ->
      streamingCurationGlobalOracle,

    // the additive-histogram running quantile: the cut bin and the
    // bin membership of every survivor re-derived in SQL
    "e256_streaming_curation_hist_cut" -> streamingCurationHistOracle,

    // store compaction must be survivor-invisible: e240's oracle
    "e247_streaming_curation_compacted_replay" -> streamingCurationOracle,

    // compaction + model/curated retention must be survivor-
    // invisible: e240's oracle, verbatim (VERDICT r18 #4)
    "e253_streaming_curation_maintained_replay" ->
      streamingCurationOracle,

    "e238_kn_oov_serve" -> knOovServeOracle,

    "e242_kn_trigram_oov_serve" -> knTrigramOovServeOracle,

    // the streaming replay must converge to the batch OOV serve
    "e245_kn_streaming_oov_serve_replay" -> knOovServeOracle,

    "e248_kn_trigram_streaming_oov_serve_replay" ->
      knTrigramOovServeOracle,

    "e227_unigram_lm_train" -> unigramTrainOracle,

    "e228_unigram_lm_viterbi" -> unigramViterbiOracle,

    "e229_unigram_streaming_serve_replay" -> unigramDocServeOracle,

    "e230_unigram_target_vocab" -> unigramSchedTrainOracle,

    "e232_unigram_viterbi_join" -> unigramSchedViterbiOracle,

    "e233_kn_bigram_logprob" ->
      s"""WITH $knDocCtes
        |SELECT d.doc_id,
        |  coalesce(k.n_bigrams, 0) AS n_bigrams,
        |  coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
        |  CASE WHEN k.n_bigrams IS NOT NULL
        |       THEN round(exp(-k.doc_lp / k.n_bigrams), 6) END AS ppl
        |FROM documents d LEFT JOIN kndoc k USING (doc_id)""".stripMargin,

    // corpus-median exact-percentile cut over the SCORED rows (NULL
    // ppl rows drop — a rate-free doc has no quality evidence)
    "e234_kn_perplexity_filter" ->
      s"""WITH $knDocCtes,
        |knfinal AS (
        |  SELECT d.doc_id,
        |    coalesce(k.n_bigrams, 0) AS n_bigrams,
        |    coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
        |    CASE WHEN k.n_bigrams IS NOT NULL
        |         THEN round(exp(-k.doc_lp / k.n_bigrams), 6) END AS ppl
        |  FROM documents d LEFT JOIN kndoc k USING (doc_id)),
        |kncut AS (SELECT quantile_cont(ppl, CAST(0.5 AS DOUBLE)) AS c
        |          FROM knfinal)
        |SELECT f.* FROM knfinal f CROSS JOIN kncut
        |WHERE f.ppl <= kncut.c""".stripMargin,

    "e236_kn_trigram_logprob" ->
      s"""WITH $kn3DocCtes
        |SELECT d.doc_id,
        |  coalesce(k.n_trigrams, 0) AS n_trigrams,
        |  coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
        |  CASE WHEN k.n_trigrams IS NOT NULL
        |       THEN round(exp(-k.doc_lp / k.n_trigrams), 6) END AS ppl
        |FROM documents d LEFT JOIN kn3doc k USING (doc_id)""".stripMargin,

    // the stream-static-join replay converges to the batch scorer
    "e235_kn_streaming_serve_replay" ->
      s"""WITH $knDocCtes
        |SELECT d.doc_id,
        |  coalesce(k.n_bigrams, 0) AS n_bigrams,
        |  coalesce(k.doc_lp, CAST(0 AS DOUBLE)) AS doc_lp,
        |  CASE WHEN k.n_bigrams IS NOT NULL
        |       THEN round(exp(-k.doc_lp / k.n_bigrams), 6) END AS ppl
        |FROM documents d LEFT JOIN kndoc k USING (doc_id)""".stripMargin,

    "e1_dedup_exact" ->
      ("SELECT md5(text) AS fp, min(doc_id) AS keep_id, " +
        "count(*) AS n_copies FROM documents GROUP BY 1"),

    // the replayed stream must converge to the batch survivor set
    // (n_copies is rollover-only state in append mode — see the query)
    "e1_streaming_dedup_replay" ->
      ("SELECT md5(text) AS fp, min(doc_id) AS keep_id " +
        "FROM documents GROUP BY 1"),

    // bootstrap contract: new-batch survivors whose content the old
    // corpus has never indexed
    "e57_streaming_bootstrap_dedup_replay" ->
      """WITH oldf AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents
        |  WHERE doc_id % 10 <> 0)
        |SELECT md5(text) AS fp, min(doc_id) AS keep_id
        |FROM documents
        |WHERE doc_id % 10 = 0
        |  AND md5(text) NOT IN (SELECT fp FROM oldf)
        |GROUP BY 1""".stripMargin,

    // quantile_cont == Spark percentile (interpolated), both rounded;
    // the clamp itself is exact double arithmetic
    "e36_winsorize" ->
      """WITH q AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.05), 6) AS lo,
        |    round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  round(greatest(lo, least(hi, value)), 6) AS value_w
        |FROM events e JOIN q USING (event_type)""".stripMargin,

    // identical md5 rank arithmetic; row_number with the same (r,
    // doc_id) tie-break, circular rank join within each bucket
    "e37_negative_pairs" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS r
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, r, r % 16 AS bucket,
        |    row_number() OVER (PARTITION BY r % 16 ORDER BY r, doc_id)
        |      AS rank,
        |    count(*) OVER (PARTITION BY r % 16) AS sz
        |  FROM r)
        |SELECT a.doc_id, j.j, b.doc_id AS neg_id
        |FROM ranked a
        |CROSS JOIN (SELECT unnest(range(1, 3)) AS j) j
        |JOIN ranked b
        |  ON b.bucket = a.bucket
        | AND b.rank = (a.rank - 1 + j.j) % a.sz + 1
        |WHERE a.doc_id <> b.doc_id""".stripMargin,

    // 1-based list indexing; range(1, len) = 1..len-1, so pairs are
    // (w[i], w[i+1]) — the same adjacent pairs as Spark's 0-based
    // transform. Full ORDER BY tie-break makes the LIMIT deterministic
    // on both engines.
    "e34_bpe_merge_pairs" ->
      """WITH wl AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |p AS (
        |  SELECT w[i] AS tok_a, w[i + 1] AS tok_b
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i
        |        FROM wl WHERE len(w) >= 2) t)
        |SELECT tok_a, tok_b, count(*) AS cnt
        |FROM p GROUP BY 1, 2
        |ORDER BY cnt DESC, tok_a, tok_b
        |LIMIT 50""".stripMargin,

    // a fully-replayed windowed profile must equal the batch per-minute
    // profile on every deterministic column (tumbling 1-min window
    // starts are minute floors; min/max are order-independent and need
    // no rounding, avg is rounded on both sides)
    "e33_streaming_profile_replay" ->
      """SELECT date_trunc('minute', ts) AS window_start,
        |  count(*) AS n_rows,
        |  count(*) - count(value) AS value_nulls,
        |  min(value) AS value_min, max(value) AS value_max,
        |  round(avg(value), 6) AS value_avg
        |FROM events GROUP BY 1""".stripMargin,

    "e2_dedup_ngram_jaccard" -> ngramJaccardOracleSql,

    "e3_dedup_minhash_lsh" -> minhashLshOracleSql(""),

    // measured banding recall: exact pairs (e2 pipeline) vs
    // banding+verify pairs (e3 pipeline), nested as self-contained
    // CTE bodies; verified LSH ⊆ exact, so one inner join counts the
    // overlap
    "e70_lsh_dedup_recall" ->
      s"""WITH ex AS ($ngramJaccardOracleSql),
         |lsh AS (${minhashLshOracleSql("")}),
         |ne AS (SELECT count(*) AS n_exact FROM ex),
         |nl AS (SELECT count(*) AS n_lsh FROM lsh),
         |nb AS (SELECT count(*) AS n_both
         |       FROM ex JOIN lsh USING (doc_a, doc_b))
         |SELECT n_exact::BIGINT AS n_exact, n_lsh::BIGINT AS n_lsh,
         |  n_both::BIGINT AS n_both,
         |  CASE WHEN n_exact > 0
         |    THEN round(n_both / CAST(n_exact AS DOUBLE), 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS recall
         |FROM ne, nl, nb""".stripMargin,

    // the staged incremental replay (empty index + three absorbed
    // micro-batches, store update rule P' = (P \ affected) ∪ delta ∪
    // compaction) must converge to the ONE-SHOT full-corpus pair set —
    // e3's oracle verbatim, reached via a completely different
    // execution path
    "e58_streaming_neardup_replay" -> minhashLshOracleSql(""),

    // blast-radius statistics under the same old/batch split as e51:
    // flips = batch-touched shingles crossing the df cap, affected =
    // old docs containing one; counts only, no pair machinery
    "e59_compaction_cadence" ->
      s"""WITH $shinglesCte,
         |osh AS (SELECT * FROM sh0 WHERE doc_id % 10 <> 0),
         |bsh AS (SELECT * FROM sh0 WHERE doc_id % 10 = 0),
         |dfo AS (SELECT h, count(*) AS dfo FROM osh GROUP BY 1),
         |dfb AS (SELECT h, count(*) AS dfb FROM bsh GROUP BY 1),
         |flips AS (
         |  SELECT dfb.h FROM dfb LEFT JOIN dfo ON dfb.h = dfo.h
         |  WHERE coalesce(dfo, 0) <= 100 AND coalesce(dfo, 0) + dfb > 100),
         |aff AS (SELECT DISTINCT doc_id FROM osh JOIN flips USING (h)),
         |nb AS (SELECT count(DISTINCT doc_id) AS n_batch_docs
         |       FROM documents WHERE doc_id % 10 = 0),
         |nf AS (SELECT count(*) AS n_cap_flips FROM flips),
         |na AS (SELECT count(*) AS n_affected_docs FROM aff),
         |nod AS (SELECT count(DISTINCT doc_id) AS n_old_docs FROM osh)
         |SELECT n_batch_docs, n_cap_flips, n_affected_docs, n_old_docs,
         |  CASE WHEN n_old_docs > 0
         |    THEN round(n_affected_docs * CAST(100.0 AS DOUBLE)
         |      / n_old_docs, 6)
         |    ELSE CAST(0.0 AS DOUBLE) END AS blast_radius_pct
         |FROM nb, nf, na, nod""".stripMargin,

    // delta==full contract: the SAME full-corpus LSH pipeline as e3,
    // restricted to pairs touching the batch (doc_id % 10 = 0) — what
    // the incremental run against the persisted index must reproduce
    "e51_delta_dedup" -> minhashLshOracleSql(
      "\n  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)"),

    // the e3 pairs whose endpoints fall on opposite sides of the
    // 80/20 md5-bucket split
    "e56_split_leakage" -> minhashLshOracleSql(
      "\n  AND ((('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 15))" +
        "::BIGINT % 1000 < 800)" +
        "\n    <> (('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 15))" +
        "::BIGINT % 1000 < 800))"),

    // compaction==full contract: old↔old pairs where at least one side
    // contains a shingle the batch pushed over the df cap (`aff`) —
    // what the store-only re-evaluation must reproduce
    "e55_compaction_dedup" -> minhashLshOracleSql(
      "\n  AND doc_a % 10 <> 0 AND doc_b % 10 <> 0" +
        "\n  AND (doc_a IN (SELECT doc_id FROM aff)" +
        "\n       OR doc_b IN (SELECT doc_id FROM aff))",
      """
        |dfo AS (
        |  SELECT h, count(*) AS dfo FROM sh0
        |  WHERE doc_id % 10 <> 0 GROUP BY h),
        |dfn AS (SELECT h, count(*) AS dfn FROM sh0 GROUP BY h),
        |flips AS (
        |  SELECT h FROM dfo JOIN dfn USING (h)
        |  WHERE dfo <= 100 AND dfn > 100),
        |aff AS (
        |  SELECT DISTINCT doc_id FROM sh0 JOIN flips USING (h)
        |  WHERE doc_id % 10 <> 0),""".stripMargin),

    "e4_dedup_simhash" ->
      s"""WITH $simhashPairsCtes
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,

    // same chunk-bucket candidates gated by hamming <= 3 and the
    // length-difference prune before the DP; Levenshtein is the
    // classic DP in both engines, computed over substr(text, 1, 200)
    "e35_edit_distance_pairs" ->
      s"""WITH $simhashPairsCtes
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(substr(ta.text, 1, 200),
         |                   substr(tb.text, 1, 200)) AS BIGINT)
         |    AS edit_dist
         |FROM pairs
         |JOIN documents ta ON doc_a = ta.doc_id
         |JOIN documents tb ON doc_b = tb.doc_id
         |WHERE bit_count(xor(sa, sb)) <= 3
         |  AND abs(length(substr(ta.text, 1, 200))
         |          - length(substr(tb.text, 1, 200))) <= 20
         |  AND levenshtein(substr(ta.text, 1, 200),
         |                  substr(tb.text, 1, 200)) <= 20""".stripMargin,

    // connected components over the e4 pair graph: DuckDB reaches the
    // same fixpoint via a recursive transitive closure (tiny at sf0.01;
    // the Spark side is the iterative min-label propagation that scales)
    "e16_dup_clusters" -> e16OracleSql,

    // normalization folds case/punct variants BEFORE fingerprinting;
    // [^a-z0-9]+ → ' ' is a single global replace on both engines
    "e63_dedup_exact_normalized" ->
      ("SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', " +
        "'g'))) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY 1"),

    // weight 1/cluster_size over the same component closure as e16;
    // singletons (docs outside the pair graph) weigh 1.0
    "e64_dup_weights" ->
      s"""WITH RECURSIVE $ccCtes
         |SELECT d.doc_id,
         |  coalesce(sizes.cluster_size, 1)::BIGINT AS cluster_size,
         |  round(CAST(1.0 AS DOUBLE)
         |    / coalesce(sizes.cluster_size, 1), 6) AS weight
         |FROM documents d
         |LEFT JOIN comp ON d.doc_id = comp.id
         |LEFT JOIN sizes ON comp.cluster_id = sizes.cluster_id""".stripMargin,

    // the star-contraction backend must reach the identical fixpoint
    "e16_star_dup_clusters" -> e16OracleSql,
  ) ++ extraOracleSql

  /** The full-corpus MinHash+LSH pair pipeline (e3's oracle), with an
    * optional extra predicate appended to the final WHERE — the e51
    * delta gate restricts it to pairs touching the batch, the e55
    * compaction gate to old↔old pairs with an affected side (via
    * `extraCtes`, injected before the minhash chain). */
  /** The e2 exact n-gram-Jaccard pair pipeline as a self-contained
    * SELECT (own WITH) — shared by the e2 gate and, nested as a CTE
    * body, by the e70 recall measurement. */
  private def ngramJaccardOracleSql: String =
    s"""WITH $shinglesCte, $jaccardTailSql
       |SELECT doc_a, doc_b,
       |  n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN cnt ca ON doc_a = ca.doc_id
       |JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)
       |      >= CAST(0.5 AS DOUBLE)""".stripMargin

  private def minhashLshOracleSql(extraPred: String,
                                  extraCtes: String = ""): String =
    s"""WITH $shinglesCte, $jaccardTailSql,$extraCtes
       |h0s AS (
       |  SELECT doc_id, h % 2147483647 AS h0
       |  FROM sh),
       |mh AS (
       |  SELECT doc_id, seed,
       |    min((h0 * (seed * 2 + 1) + seed * 7919 + 13) % 2147483647)
       |      AS mh
       |  FROM h0s CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds
       |  GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, seed // 2 AS band,
       |    ('0x' || substr(md5(
       |      string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)
       |    ), 1, 15))::BIGINT AS band_key
       |  FROM mh GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b,
       |  n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
       |FROM cand
       |JOIN inter USING (doc_a, doc_b)
       |JOIN cnt ca ON doc_a = ca.doc_id
       |JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)
       |      >= CAST(0.5 AS DOUBLE)$extraPred""".stripMargin

  /** The e4 duplicate graph closed into components (recursive reach →
    * min-label comp → sizes) — shared by the e16 cluster oracles and
    * e64's weight oracle. Must run under WITH RECURSIVE. */
  private lazy val ccCtes: String =
      s"""$simhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3),
         |reach AS (
         |  SELECT a AS id, a AS r FROM edges
         |  UNION
         |  SELECT e.b AS id, reach.r AS r
         |  FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |sizes AS (
         |  SELECT cluster_id, count(*) AS cluster_size
         |  FROM comp GROUP BY 1)""".stripMargin

  private lazy val e16OracleSql: String =
      s"""WITH RECURSIVE $ccCtes
         |SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size,
         |  CASE WHEN comp.id = comp.cluster_id THEN 1 ELSE 0 END
         |    AS is_canonical
         |FROM comp JOIN sizes USING (cluster_id)""".stripMargin

  private lazy val extraOracleSql: Map[String, String] = Map(

    // column list mirrors DataProfile.profile's schema walk over the
    // events table (nulls everywhere; min/max/avg/std for numerics with
    // rounded float stats; min/max for ts; exact distinct for strings)
    "e21_profile_events" ->
      """SELECT count(*) AS n_rows,
        |  count(*) - count(event_id) AS event_id_nulls,
        |  min(event_id) AS event_id_min, max(event_id) AS event_id_max,
        |  round(avg(event_id), 6) AS event_id_avg,
        |  round(stddev_samp(event_id), 6) AS event_id_std,
        |  count(*) - count(ts) AS ts_nulls,
        |  min(ts) AS ts_min, max(ts) AS ts_max,
        |  count(*) - count(user_id) AS user_id_nulls,
        |  min(user_id) AS user_id_min, max(user_id) AS user_id_max,
        |  round(avg(user_id), 6) AS user_id_avg,
        |  round(stddev_samp(user_id), 6) AS user_id_std,
        |  count(*) - count(event_type) AS event_type_nulls,
        |  count(DISTINCT event_type) AS event_type_distinct,
        |  count(*) - count(value) AS value_nulls,
        |  min(value) AS value_min, max(value) AS value_max,
        |  round(avg(value), 6) AS value_avg,
        |  round(stddev_samp(value), 6) AS value_std,
        |  count(*) - count(props) AS props_nulls,
        |  count(DISTINCT props) AS props_distinct
        |FROM events""".stripMargin,

    // the e21 exact profile plus the asserted HLL bound flags
    "e21_profile_events_approx" ->
      """SELECT count(*) AS n_rows,
        |  count(*) - count(event_id) AS event_id_nulls,
        |  min(event_id) AS event_id_min, max(event_id) AS event_id_max,
        |  round(avg(event_id), 6) AS event_id_avg,
        |  round(stddev_samp(event_id), 6) AS event_id_std,
        |  count(*) - count(ts) AS ts_nulls,
        |  min(ts) AS ts_min, max(ts) AS ts_max,
        |  count(*) - count(user_id) AS user_id_nulls,
        |  min(user_id) AS user_id_min, max(user_id) AS user_id_max,
        |  round(avg(user_id), 6) AS user_id_avg,
        |  round(stddev_samp(user_id), 6) AS user_id_std,
        |  count(*) - count(event_type) AS event_type_nulls,
        |  count(DISTINCT event_type) AS event_type_distinct,
        |  count(*) - count(value) AS value_nulls,
        |  min(value) AS value_min, max(value) AS value_max,
        |  round(avg(value), 6) AS value_avg,
        |  round(stddev_samp(value), 6) AS value_std,
        |  count(*) - count(props) AS props_nulls,
        |  count(DISTINCT props) AS props_distinct,
        |  1 AS event_type_distinct_within,
        |  1 AS props_distinct_within
        |FROM events""".stripMargin,

    // two Lloyd iterations unrolled; distances rounded to 6 before the
    // argmin (ties → lowest cluster id) and centroid components rounded
    // to 6 per iteration — the exact contract of KMeans.centroidsFlat
    "e22_kmeans_centroids" ->
      s"""WITH $kmeansCtes
         |SELECT cluster_id, pos, c_val, n_members FROM f2""".stripMargin,

    // trained-quantizer IVF with nprobe=2: corpus assigned to its
    // nearest final centroid, queries probe their 2 nearest cells, the
    // same rounded-cosine / (sim desc, n_id) ranking as e5/e6
    "e54_kmeans_ivf_knn" ->
      s"""WITH $kmeansCtes,
         |$kmeansCellsCte,
         |qprobes AS (
         |  SELECT vec_id AS q_id, e AS qe, cluster_id AS cell,
         |    rn AS probe_rank FROM (
         |    SELECT emb.vec_id, emb.e, c2.cluster_id, row_number() OVER
         |      (PARTITION BY emb.vec_id ORDER BY
         |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
         |          i -> (emb.e[i] - c2.carr[i])
         |             * (emb.e[i] - c2.carr[i]))), 6),
         |        c2.cluster_id) AS rn
         |    FROM emb CROSS JOIN c2 WHERE emb.vec_id < 10) t
         |  WHERE rn <= 2),
         |kscored AS (
         |  SELECT q_id, n_id, ${duckCos("qe", "ne")} AS sim
         |  FROM qprobes p JOIN ccells n ON p.cell = n.cell
         |  WHERE q_id <> n_id),
         |kranked AS (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM kscored)
         |SELECT q_id, n_id, sim, rank FROM kranked
         |WHERE rank <= 3""".stripMargin,

    // within-cell pairwise cosine over the same trained cell
    // assignment as e54 — the SemDeDup screen, oracle-exact because
    // cells, cosine and the 0.4 gate all round identically
    "e61_semantic_dedup" ->
      s"""WITH $kmeansCtes,
         |$kmeansCellsCte
         |SELECT * FROM (
         |  SELECT x.cell, x.n_id AS vec_a, y.n_id AS vec_b,
         |    ${duckCos("x.ne", "y.ne")} AS sim
         |  FROM ccells x JOIN ccells y
         |    ON x.cell = y.cell AND x.n_id < y.n_id) t
         |WHERE sim >= CAST(0.4 AS DOUBLE)""".stripMargin,

    // uncapped shingle sets on both sides (decontamination must not drop
    // boilerplate overlaps); same md5-60-bit hash as the dedup suite
    "e26_decontaminate" ->
      """WITH ev AS (
        |  SELECT DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
        |  FROM (
        |    SELECT unnest(list_transform(
        |      range(1, greatest(len(w) - 3, 1)),
        |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
        |      AS s
        |    FROM (SELECT string_split(text, ' ') AS w
        |          FROM documents WHERE doc_id < 10) t
        |    WHERE len(w) >= 5) u),
        |co AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w) - 3, 1)),
        |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
        |      AS s
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents WHERE doc_id >= 10) t
        |    WHERE len(w) >= 5) u)
        |SELECT doc_id, count(*) AS n_shared_shingles
        |FROM co JOIN ev USING (h)
        |GROUP BY 1""".stripMargin,

    // fractions are single divisions of exact integer counts — no
    // rounding needed for parity
    "e27_repetition_signals" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(w)::BIGINT AS n_words,
        |    (len(grams) - len(list_distinct(grams)))::DOUBLE
        |      / len(grams) AS dup_2gram_frac
        |  FROM (SELECT doc_id, w, list_transform(range(1, len(w)),
        |          i -> concat(w[i], ' ', w[i+1])) AS grams
        |        FROM base WHERE len(w) >= 2) t),
        |top AS (
        |  SELECT doc_id, max(c) AS top_c FROM (
        |    SELECT doc_id, word, count(*) AS c
        |    FROM (SELECT doc_id, unnest(w) AS word FROM base) t
        |    GROUP BY 1, 2) u
        |  GROUP BY 1)
        |SELECT g.doc_id, n_words,
        |  top_c::DOUBLE / n_words AS top_word_frac, dup_2gram_frac
        |FROM g JOIN top USING (doc_id)""".stripMargin,

    "e28_quality_select" ->
      s"""WITH $qualityCtes,
         |thr AS (SELECT round(quantile_cont(quality,
         |  CAST(0.75 AS DOUBLE)), 6) AS thr FROM qual)
         |SELECT doc_id, quality FROM qual, thr
         |WHERE quality >= thr""".stripMargin,

    // centroid components rounded to 6 per the KMeans contract; cosine
    // rounded before ranking, ties by vec_id
    "e31_embedding_outliers" ->
      """WITH emb AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |f AS (
        |  SELECT label, i, round(avg(e[i]), 6) AS cv
        |  FROM (SELECT label, e, unnest(range(1, len(e) + 1)) AS i
        |        FROM emb) t
        |  GROUP BY 1, 2),
        |c AS (SELECT label, list(cv ORDER BY i) AS carr FROM f GROUP BY 1),
        |s AS (
        |  SELECT vec_id, emb.label,
        |    round(list_sum(list_transform(range(1, len(e) + 1),
        |        i -> e[i] * carr[i])) /
        |      (sqrt(list_sum(list_transform(range(1, len(e) + 1),
        |         i -> e[i] * e[i]))) *
        |       sqrt(list_sum(list_transform(range(1, len(carr) + 1),
        |         i -> carr[i] * carr[i])))), 6) AS sim
        |  FROM emb JOIN c ON emb.label = c.label),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY label ORDER BY sim, vec_id) AS rank FROM s)
        |SELECT vec_id, label, sim, rank FROM r
        |WHERE rank <= 3""".stripMargin,

    "e30_source_overlap" ->
      s"""WITH $shinglesCte,
         |ssh AS (SELECT DISTINCT d.source, s.h FROM sh s
         |        JOIN documents d USING (doc_id))
         |SELECT x.source AS source_a, y.source AS source_b,
         |  count(*) AS n_shared_shingles
         |FROM ssh x JOIN ssh y
         |  ON x.h = y.h AND x.source < y.source
         |GROUP BY 1, 2""".stripMargin,

    // identical scalar expression trees (weights, divisions) on exact
    // integer aggregates — no rounding needed
    "e29_mix_planner" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(list_filter(string_split(text, ' '),
        |      x -> x != '')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT *, CASE WHEN source = 'src0' THEN CAST(0.3 AS DOUBLE)
        |                 WHEN source = 'src1' THEN CAST(0.2 AS DOUBLE)
        |                 ELSE CAST(0.5 AS DOUBLE) / 18.0 END AS weight
        |  FROM t)
        |SELECT source, n_docs, n_tokens, weight,
        |  weight * CAST(20000.0 AS DOUBLE) AS target_tokens,
        |  least(CAST(1.0 AS DOUBLE),
        |    weight * CAST(20000.0 AS DOUBLE) / n_tokens) AS sample_rate,
        |  weight * CAST(20000.0 AS DOUBLE) / n_tokens AS epochs
        |FROM w""".stripMargin,

    // DECIMAL accumulation on both engines: exact and order-independent
    "x1_star_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "x2_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2))) *
        |    (CAST(1.0 AS DECIMAL(3,2)) +
        |     CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31'
        |GROUP BY 1, 2""".stripMargin,

    // same exact-DECIMAL revenue as x1/x2; full ORDER BY tie-break
    // (revenue is exact decimal cast to double, so ties are real ties)
    // makes the LIMIT deterministic on both engines
    "x3_shipping_priority" ->
      """SELECT l_orderkey,
        |  o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    // same exact-DECIMAL revenue; full ORDER BY tie-break for the LIMIT
    "x5_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // the cross-dimension equality (customer's nation = supplier's
    // nation) is part of the supplier join in both engines
    "x4_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(3,2)) -
        |     CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    // smoothed idf ln((N+1)/(df+1)); rank on the ROUNDED score then
    // token so row_number is engine-independent; rk cast BIGINT to
    // match Spark's long cast
    "e38_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok,
        |    round(CAST(tf AS DOUBLE) * ln((n_docs + 1.0) / (df + 1.0)),
        |      6) AS tfidf
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
        |rk AS (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, tok, tfidf FROM rk WHERE rk <= 3""".stripMargin,

    // each step's min-ts is conditioned on the PREVIOUS step's per-user
    // min — the same join-then-aggregate chain as the Spark plan
    "e39_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
        |  GROUP BY 1)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
        |FROM v LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin,

    // date_trunc returns DATE in DuckDB — cast to TIMESTAMP to match
    // Spark's date_trunc output type
    "e40_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |  date_diff('day', cohort_day, day) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |WHERE date_diff('day', cohort_day, day) <= 7
        |GROUP BY 1, 2""".stripMargin,

    // DuckDB list slicing is 1-based inclusive and clamps at the list
    // end — same semantics as Spark's slice(w, start+1, 32)
    "e41_chunk_sliding" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start
        |  FROM w WHERE len(w) >= 1)
        |SELECT doc_id, start // 24 AS chunk_id,
        |  least(32, len(w) - start) AS n_tok,
        |  array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text
        |FROM starts""".stripMargin,

    // the division chain is written exactly as the Spark expression so
    // ln sees the same IEEE double on both engines
    "e42_pmi_collocations" ->
      """WITH wl AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |uc AS (
        |  SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(w) AS tok FROM wl) GROUP BY 1),
        |bc AS (
        |  SELECT tok_a, tok_b, count(*) AS c_ab FROM (
        |    SELECT w[i] AS tok_a, w[i + 1] AS tok_b
        |    FROM (SELECT w, unnest(range(1, len(w))) AS i
        |          FROM wl WHERE len(w) >= 2))
        |  GROUP BY 1, 2 HAVING count(*) >= 10),
        |tot AS (SELECT (SELECT sum(c) FROM uc) AS n_tok,
        |               (SELECT sum(len(w) - 1) FROM wl WHERE len(w) >= 2)
        |                 AS n_bi)
        |SELECT tok_a, tok_b, c_ab,
        |  round(ln((CAST(c_ab AS DOUBLE) / CAST(n_bi AS DOUBLE)) /
        |    ((CAST(a.c AS DOUBLE) / CAST(n_tok AS DOUBLE)) *
        |     (CAST(b.c AS DOUBLE) / CAST(n_tok AS DOUBLE)))), 6) AS pmi
        |FROM bc JOIN uc a ON a.tok = tok_a
        |JOIN uc b ON b.tok = tok_b CROSS JOIN tot
        |ORDER BY pmi DESC, tok_a, tok_b LIMIT 50""".stripMargin,

    // the i<j intersection counts projected in both directions, each
    // divided by ITS source doc's shingle count — same capped shingle
    // sets as e2
    "e43_containment_pairs" ->
      s"""WITH $shinglesCte, $jaccardTailSql,
         |bidir AS (
         |  SELECT doc_a AS src, doc_b AS dst, n_inter FROM inter
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst, n_inter FROM inter)
         |SELECT src AS doc_a, dst AS doc_b,
         |  CAST(n_inter AS DOUBLE) / n_sh AS containment
         |FROM bidir JOIN cnt ON cnt.doc_id = bidir.src
         |WHERE CAST(n_inter AS DOUBLE) / n_sh
         |      >= CAST(0.8 AS DOUBLE)""".stripMargin,

    // daily sum rounded BEFORE the trailing window on both engines so
    // the 3-row mean sees identical inputs; date_trunc cast to
    // TIMESTAMP to match Spark's output type
    "e44_daily_type_stats" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    count(*) AS n_events, round(sum(value), 6) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events, sum_value,
        |  round(avg(sum_value) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
        |    AS sum_value_3d
        |FROM d""".stripMargin,

    // identical probability-ratio expression tree; per-term magnitude
    // ~1e-3 keeps accumulation-order noise far below the 6-decimal
    // rounding
    "e50_source_kl_divergence" ->
      """WITH tok AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |        AS tok
        |    FROM documents)),
        |st AS (SELECT source, tok, count(*) AS c_st FROM tok
        |       GROUP BY 1, 2),
        |s AS (SELECT source, sum(c_st) AS t_s FROM st GROUP BY 1),
        |ct AS (SELECT tok, count(*) AS c_t FROM tok GROUP BY 1),
        |tot AS (SELECT sum(c_t) AS t FROM ct)
        |SELECT source,
        |  round(sum((CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE)) *
        |    ln((CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE)) /
        |       (CAST(c_t AS DOUBLE) / CAST(t AS DOUBLE)))), 6) AS kl
        |FROM st JOIN s USING (source) JOIN ct USING (tok)
        |CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    // 1-based list indexing: range(1, len-1) = 1..len-2 gives the same
    // trigram set as Spark's 0-based sequence(0, size-3)
    "e49_ngram_diversity" ->
      """WITH wl AS (
        |  SELECT source,
        |    list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |tri AS (
        |  SELECT source, unnest(list_transform(range(1, len(w) - 1),
        |    i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))) AS g
        |  FROM wl WHERE len(w) >= 3),
        |t AS (
        |  SELECT source, count(*) AS n_grams,
        |    count(DISTINCT g) AS n_distinct_grams
        |  FROM tri GROUP BY 1),
        |d AS (SELECT source, count(*) AS n_docs FROM documents
        |      GROUP BY 1)
        |SELECT source, n_docs, n_grams, n_distinct_grams,
        |  round(CAST(n_distinct_grams AS DOUBLE) /
        |        CAST(n_grams AS DOUBLE), 6) AS diversity
        |FROM d JOIN t USING (source)""".stripMargin,

    // each (user, day) activity row contributes to 7 as-of days;
    // variable INTERVAL == Spark's timestampadd(DAY, ...) under the
    // shared UTC session
    "e48_rolling_active_users" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events),
        |span AS (
        |  SELECT CAST(day AS TIMESTAMP) + INTERVAL (o) DAY AS as_of_day,
        |    user_id
        |  FROM active CROSS JOIN (SELECT unnest(range(0, 7)) AS o) offs),
        |bounds AS (
        |  SELECT max(date_trunc('day', ts)) AS max_day FROM events)
        |SELECT CAST(as_of_day AS TIMESTAMP) AS as_of_day,
        |  count(DISTINCT user_id) AS wau
        |FROM span CROSS JOIN bounds
        |WHERE as_of_day <= CAST(max_day AS TIMESTAMP)
        |GROUP BY 1""".stripMargin,

    // identical md5-permille arithmetic as e18/e37; the weight chain is
    // single IEEE multiply/floor so no rounding is needed
    "e45_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    CAST(floor(CAST(1000 AS DOUBLE) *
        |      greatest(CAST(0 AS DOUBLE), least(CAST(1 AS DOUBLE),
        |        CAST(n_chars AS DOUBLE) / CAST(200 AS DOUBLE))))
        |      AS BIGINT) AS weight_p,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS bucket
        |  FROM documents)
        |SELECT doc_id, n_chars, weight_p, bucket
        |FROM w WHERE bucket < weight_p""".stripMargin,

    // string_agg ORDER BY (r, doc_id) == Spark's array_sort over
    // struct(r, doc_id, text); chr(10) keeps the separator out of the
    // SQL string literal
    "e46_packed_shards" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS r
        |  FROM documents)
        |SELECT r % 8 AS shard, count(*) AS n_docs,
        |  length(string_agg(text, chr(10) || chr(10)
        |    ORDER BY r, doc_id)) AS packed_len,
        |  md5(string_agg(text, chr(10) || chr(10)
        |    ORDER BY r, doc_id)) AS packed_md5
        |FROM t GROUP BY 1""".stripMargin,

    // the stream-static-join replay must converge to the batch
    // winsorization (e36's oracle verbatim)
    "e36_streaming_winsorize_replay" ->
      """WITH q AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.05), 6) AS lo,
        |    round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type,
        |  round(greatest(lo, least(hi, value)), 6) AS value_w
        |FROM events e JOIN q USING (event_type)""".stripMargin,

    // the replayed stream must converge to the batch funnel chain
    "e39_streaming_funnel_replay" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
        |  GROUP BY 1)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
        |FROM v LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin,

    // quantile_cont == Spark's exact interpolated percentile; quantile
    // literals cast to DOUBLE (DuckDB parses bare decimals as DECIMAL)
    "e23_quantile_profile" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, CAST(0.25 AS DOUBLE)), 6) AS p25,
        |  round(quantile_cont(value, CAST(0.5  AS DOUBLE)), 6) AS p50,
        |  round(quantile_cont(value, CAST(0.75 AS DOUBLE)), 6) AS p75,
        |  round(quantile_cont(value, CAST(0.9  AS DOUBLE)), 6) AS p90,
        |  round(quantile_cont(value, CAST(0.99 AS DOUBLE)), 6) AS p99
        |FROM events GROUP BY 1""".stripMargin,

    "e24_vocab_top" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x != '')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |ranked AS (SELECT tok, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM cnt)
        |SELECT tok, cnt, rank FROM ranked WHERE rank <= 100""".stripMargin,

    // the replayed streaming word-count must converge to the batch
    // vocabulary (e24's oracle verbatim)
    "e24_streaming_vocab_replay" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x != '')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |ranked AS (SELECT tok, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM cnt)
        |SELECT tok, cnt, rank FROM ranked WHERE rank <= 100""".stripMargin,

    // md5-derived 60-bit hash (same parity trick as the dedup suite)
    "e25_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents)
        |SELECT doc_id, h % 16 AS shard,
        |  row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
        |    AS pos_in_shard
        |FROM h""".stripMargin,

    // same component closure as e16, joined to the e7 quality CTE;
    // struct max over ('q', 'negid') is the deterministic argmax in
    // both engines (lexicographic struct comparison)
    "e20_canonical_docs" ->
      s"""WITH RECURSIVE $simhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3),
         |reach AS (
         |  SELECT a AS id, a AS r FROM edges
         |  UNION
         |  SELECT e.b AS id, reach.r AS r
         |  FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |$qualityCtes
         |SELECT cluster_id, count(*) AS cluster_size,
         |  -struct_extract(max({'q': quality, 'negid': -doc_id}),
         |                  'negid') AS canonical_doc_id,
         |  struct_extract(max({'q': quality, 'negid': -doc_id}), 'q')
         |    AS best_quality
         |FROM comp JOIN qual ON comp.id = qual.doc_id
         |GROUP BY cluster_id""".stripMargin,

    // e20's closure + canonical argmax, e28's quantile-gate shape, and
    // e17's prefix-sum packing, composed as one statement
    "e32_curation_pipeline" ->
      s"""WITH RECURSIVE $simhashPairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs
         |  WHERE bit_count(xor(sa, sb)) <= 3),
         |reach AS (
         |  SELECT a AS id, a AS r FROM edges
         |  UNION
         |  SELECT e.b AS id, reach.r AS r
         |  FROM reach JOIN edges e ON e.a = reach.id),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |$qualityCtes,
         |canon AS (
         |  SELECT -struct_extract(max({'q': quality, 'negid': -doc_id}),
         |                         'negid') AS doc_id
         |  FROM comp JOIN qual ON comp.id = qual.doc_id
         |  GROUP BY cluster_id),
         |keepset AS (
         |  SELECT doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT id FROM comp)
         |  UNION ALL
         |  SELECT doc_id FROM canon),
         |kq AS (SELECT k.doc_id, quality FROM keepset k
         |       JOIN qual USING (doc_id)),
         |thr AS (SELECT round(quantile_cont(quality,
         |  CAST(0.5 AS DOUBLE)), 6) AS thr FROM kq),
         |surv AS (SELECT doc_id FROM kq, thr WHERE quality >= thr),
         |t AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
         |      AS n_tokens
         |  FROM documents
         |  WHERE doc_id IN (SELECT doc_id FROM surv)),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS bef
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  bef // 2048 AS seq_id, bef % 2048 AS offset_in_seq
         |FROM c""".stripMargin,

    // the window sum is CAST from DuckDB's HUGEINT back to BIGINT —
    // pandas would otherwise read int128 as float64 and flap the hash
    "e17_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS bef
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  bef // 2048 AS seq_id, bef % 2048 AS offset_in_seq
        |FROM c""".stripMargin,

    // literal parity: the oracle COMPUTES k1+1 and 1−b from the same
    // base literals Spark uses (CAST(1.2 AS DOUBLE) + 1), so both
    // engines run identical IEEE operations; ln() differs by ≤1 ulp and
    // the 6-decimal round absorbs it
    "e19_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('the', 'data', 'model') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, count(*) AS n_terms_matched,
        |  round(sum(
        |    ln((n_docs - df + CAST(0.5 AS DOUBLE))
        |        / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        |    * (tf * (CAST(1.2 AS DOUBLE) + 1))
        |    / (tf + CAST(1.2 AS DOUBLE)
        |       * ((1 - CAST(0.75 AS DOUBLE))
        |          + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS bm25
        |FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
        |CROSS JOIN stats
        |GROUP BY doc_id""".stripMargin,

    // same BM25 arithmetic joined through a VALUES query table; the
    // rank runs on the ROUNDED score (then doc_id), identically on
    // both engines, so row_number is deterministic
    "e60_bm25_topk" ->
      """WITH q(query_id, term) AS (VALUES
        |    (0, 'the'), (0, 'data'),
        |    (1, 'spark'), (1, 'window'),
        |    (2, 'join'), (2, 'vector'), (2, 'stream')),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (
        |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN (SELECT term FROM q) GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT qq.query_id, tf.doc_id,
        |    round(sum(
        |      ln((n_docs - df + CAST(0.5 AS DOUBLE))
        |          / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        |      * (tf * (CAST(1.2 AS DOUBLE) + 1))
        |      / (tf + CAST(1.2 AS DOUBLE)
        |         * ((1 - CAST(0.75 AS DOUBLE))
        |            + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS bm25
        |  FROM tf JOIN q qq ON tf.tok = qq.term
        |  JOIN df USING (tok) JOIN dl USING (doc_id)
        |  CROSS JOIN stats
        |  GROUP BY 1, 2)
        |SELECT query_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY bm25 DESC, doc_id) AS rnk,
        |  doc_id, bm25
        |FROM scored
        |QUALIFY rnk <= 3""".stripMargin,

    "e18_stratified_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
        |      AS n_words
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words < 50 THEN 'short'
        |         WHEN n_words < 200 THEN 'medium'
        |         ELSE 'long' END AS stratum,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS bucket
        |  FROM t)
        |SELECT doc_id, n_words, stratum, bucket FROM s
        |WHERE bucket < CASE stratum WHEN 'short' THEN 200
        |               WHEN 'medium' THEN 500 ELSE 800 END""".stripMargin,

    "e5_knn_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id AS n_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS ce
        |  FROM embeddings),
        |scored AS (
        |  SELECT q_id, n_id, round(
        |    list_sum(list_transform(range(1, len(qe) + 1),
        |      i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
        |       i -> qe[i] * qe[i]))) *
        |     sqrt(list_sum(list_transform(range(1, len(ce) + 1),
        |       i -> ce[i] * ce[i])))), 6) AS sim
        |  FROM q CROSS JOIN c WHERE q_id <> n_id),
        |ranked AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3""".stripMargin,

    "e6_ivf_knn" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, label AS cell,
        |    list_transform(embedding, x -> x::DOUBLE) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id AS n_id, label AS cell,
        |    list_transform(embedding, x -> x::DOUBLE) AS ce
        |  FROM embeddings),
        |scored AS (
        |  SELECT q_id, q.cell AS cell, n_id, round(
        |    list_sum(list_transform(range(1, len(qe) + 1),
        |      i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
        |       i -> qe[i] * qe[i]))) *
        |     sqrt(list_sum(list_transform(range(1, len(ce) + 1),
        |       i -> ce[i] * ce[i])))), 6) AS sim
        |  FROM q JOIN c ON q.cell = c.cell WHERE q_id <> n_id),
        |ranked AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, cell, n_id, sim, rank FROM ranked
        |WHERE rank <= 3""".stripMargin,

    "e7_text_quality" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, n_words, avg_word_len, punct_ratio,
         |  stopword_ratio, quality
         |FROM qual""".stripMargin,

    // identical ln(freq/total) per token; avg is order-dependent in
    // the last ulps, absorbed by the 6-decimal round on both sides
    "e62_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1),
        |tot AS (SELECT sum(n_tok)::DOUBLE AS n_total FROM vocab)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(n_tok / n_total)), 6) AS avg_logprob
        |FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    "e8_lang_id" ->
      """WITH base AS (
        |  SELECT doc_id, lang AS actual_lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, actual_lang,
        |    len(list_filter(w,
        |      x -> x IN ('der', 'und', 'die', 'nicht', 'das'))) AS s_de,
        |    len(list_filter(w,
        |      x -> x IN ('the', 'and', 'of', 'is', 'that'))) AS s_en,
        |    len(list_filter(w,
        |      x -> x IN ('el', 'y', 'los', 'que', 'de'))) AS s_es,
        |    len(list_filter(w,
        |      x -> x IN ('le', 'et', 'les', 'que', 'des'))) AS s_fr,
        |    len(list_filter(w,
        |      x -> x IN ('的', '了', '是', '在', '我'))) AS s_zh
        |  FROM base)
        |SELECT doc_id, actual_lang, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE
        |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |    WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
        |    ELSE 'und' END AS pred_lang
        |FROM s""".stripMargin,

    "e9_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x != ''))
        |    AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "e10_fingerprint_winnow" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, u.pos AS pos, u.s AS s FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w) - 3, 1)),
        |      i -> {'pos': i - 1,
        |            's': concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
        |                           w[i+4])})) AS u
        |    FROM toks WHERE len(w) >= 5) t),
        |hashed AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
        |  FROM sh),
        |winm AS (
        |  SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS minh
        |  FROM hashed)
        |SELECT DISTINCT doc_id, minh AS fingerprint
        |FROM winm WHERE pos >= 3""".stripMargin,

    // per-doc aggregate of the stub-decoded frames; ASCII payloads make
    // the additive byte checksum equal the char-code sum
    "e47_multimodal_decode_agg" ->
      """SELECT doc_id,
        |  CAST(ceil(length(text) / CAST(64 AS DOUBLE)) AS BIGINT)
        |    AS n_frames,
        |  length(text)::BIGINT AS n_bytes,
        |  (SELECT sum(ascii(c))
        |   FROM unnest(string_split(text, '')) AS t(c))::BIGINT
        |    AS checksum
        |FROM documents WHERE length(text) > 0""".stripMargin,

    "e11_multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id, text::BLOB AS payload, lang FROM documents),
        |f AS (
        |  SELECT doc_id, octet_length(payload) AS byte_len,
        |    CAST(ceil(octet_length(payload) / CAST(64 AS DOUBLE))
        |      AS BIGINT) AS n_frames,
        |    payload, lang
        |  FROM b)
        |SELECT doc_id, byte_len, n_frames,
        |  CASE WHEN byte_len = 0 THEN 0
        |       ELSE least(64, byte_len - ((n_frames - 1) // 2) * 64)
        |  END AS mid_frame_len,
        |  'text/plain' AS mime, lang
        |FROM f""".stripMargin,

    // the synthetic signal recomputed in closed form — the engine side
    // must round-trip it through real WAV bytes to match
    "e65_wav_codec_frames" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(generate_series(0,
        |      CAST(300 + doc_id % 200 - 1 AS BIGINT))) AS i
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, i,
        |    ((doc_id*31 + i*7) % 65536) - 32768 AS smp
        |  FROM s)
        |SELECT doc_id, i // 256 AS frame_idx,
        |  count(*)::BIGINT AS n_samples,
        |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(smp)) AS BIGINT) AS peak,
        |  CAST(arg_min(smp, i) AS BIGINT) AS first_s,
        |  CAST(arg_max(smp, i) AS BIGINT) AS last_s
        |FROM v GROUP BY 1, 2""".stripMargin,

    // same segmentation as e67's oracle; the canonical occurrence is
    // row_number = 1 over (doc_id, pos) within each line
    "e73_canonical_line_dedup" ->
      """WITH segs AS (
        |  SELECT doc_id, unnest(generate_series(0,
        |      CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT)
        |        - 1)) AS pos,
        |    text
        |  FROM documents),
        |s2 AS (
        |  SELECT doc_id, pos,
        |    array_to_string(list_slice(string_split(text, ' '),
        |      pos*8 + 1, pos*8 + 8), ' ') AS line
        |  FROM segs),
        |kept AS (
        |  SELECT doc_id, pos, line FROM (
        |    SELECT doc_id, pos, line, row_number() OVER (
        |      PARTITION BY line ORDER BY doc_id, pos) AS rn
        |    FROM s2) r
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, ' ' ORDER BY pos) AS text_clean
        |  FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_total FROM s2 GROUP BY 1)
        |SELECT t.doc_id, coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |  (t.n_total - coalesce(a.n_kept, 0))::BIGINT AS n_dropped,
        |  coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // uncapped sh0 only (the cap CTEs in the shared chain go unused —
    // boilerplate is the signal here); df = plain count since sh0 is
    // already distinct per (doc, shingle)
    "e72_repeated_spans" ->
      s"""WITH $shinglesCte,
         |dfreq AS (SELECT h, count(*) AS df FROM sh0 GROUP BY h)
         |SELECT doc_id, count(*)::BIGINT AS n_sh,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rep,
         |  CAST(max(df) AS BIGINT) AS max_df,
         |  round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE), 6) AS dup_frac
         |FROM sh0 JOIN dfreq USING (h) GROUP BY 1""".stripMargin,

    // the scrub twin: removable = shared-shingle occurrences in
    // non-canonical docs, covered tokens = their k-offset fans,
    // survivors reassembled by position (coalesced empty when a doc
    // is entirely duplicated elsewhere)
    "e82_cross_doc_scrub" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok2 AS (
        |  SELECT doc_id, unnest(range(0, len(w))) AS j, w
        |  FROM ws),
        |tok3 AS (SELECT doc_id, j, w[j + 1] AS tok FROM tok2),
        |ps AS (
        |  SELECT doc_id, unnest(range(0, len(w) - 4)) AS pos, w
        |  FROM ws WHERE len(w) >= 5),
        |psh AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(concat_ws(' ', w[pos+1], w[pos+2],
        |      w[pos+3], w[pos+4], w[pos+5])), 1, 15))::BIGINT AS h
        |  FROM ps),
        |stats AS (
        |  SELECT h, count(DISTINCT doc_id) AS n_docs,
        |    min(doc_id) AS min_doc
        |  FROM psh GROUP BY 1),
        |covered AS (
        |  SELECT DISTINCT p.doc_id, p.pos + o.o AS j
        |  FROM psh p JOIN stats s USING (h)
        |  CROSS JOIN (SELECT unnest(range(0, 5)) AS o) o
        |  WHERE s.n_docs >= 2 AND p.doc_id <> s.min_doc),
        |kept AS (
        |  SELECT t.doc_id, t.j, t.tok
        |  FROM tok3 t LEFT JOIN covered c
        |    ON t.doc_id = c.doc_id AND t.j = c.j
        |  WHERE c.doc_id IS NULL),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY j) AS text_clean
        |  FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, len(w) AS n_tokens FROM ws)
        |SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
        |  coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |  CAST(t.n_tokens - coalesce(a.n_kept, 0) AS BIGINT)
        |    AS n_dropped,
        |  coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // positional shingles (one per token offset, not distinct),
    // cross-doc document frequency, then the gaps-and-islands
    // run-merge of shared positions — maximal spans with positions
    "e77_cross_doc_spans" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ps AS (
        |  SELECT doc_id, unnest(range(0, len(w) - 4)) AS pos, w
        |  FROM ws WHERE len(w) >= 5),
        |psh AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(concat_ws(' ', w[pos+1], w[pos+2],
        |      w[pos+3], w[pos+4], w[pos+5])), 1, 15))::BIGINT AS h
        |  FROM ps),
        |ddf AS (
        |  SELECT h, count(DISTINCT doc_id) AS n_docs
        |  FROM psh GROUP BY 1),
        |shared AS (
        |  SELECT p.doc_id, p.pos, d.n_docs
        |  FROM psh p JOIN ddf d USING (h) WHERE d.n_docs >= 2),
        |runs AS (
        |  SELECT doc_id, pos, n_docs,
        |    pos - row_number() OVER
        |      (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM shared)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
        |  CAST(max(pos) - min(pos) + 5 AS BIGINT) AS n_tokens,
        |  count(*)::BIGINT AS n_shingles,
        |  CAST(max(n_docs) AS BIGINT) AS max_df
        |FROM runs GROUP BY doc_id, grp""".stripMargin,

    // exact maximal matches: the diagonal (pos − partner_pos)
    // run-merge over df-capped shared shingle occurrences — any
    // divergence in the cap, the pair fan-out, or the island merge
    // breaks the gate
    "e85_cross_doc_exact_spans" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ps AS (
        |  SELECT doc_id, unnest(range(0, len(w) - 4)) AS pos, w
        |  FROM ws WHERE len(w) >= 5),
        |psh AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(concat_ws(' ', w[pos+1], w[pos+2],
        |      w[pos+3], w[pos+4], w[pos+5])), 1, 15))::BIGINT AS h
        |  FROM ps),
        |ddf AS (
        |  SELECT h, count(DISTINCT doc_id) AS n_docs
        |  FROM psh GROUP BY 1),
        |kept AS (
        |  SELECT p.doc_id, p.pos, p.h
        |  FROM psh p JOIN ddf d USING (h)
        |  WHERE d.n_docs BETWEEN 2 AND 100),
        |pr AS (
        |  SELECT a.doc_id, a.pos, b.doc_id AS partner_id,
        |    a.pos - b.pos AS diag, b.pos AS ppos
        |  FROM kept a JOIN kept b
        |    ON a.h = b.h AND a.doc_id <> b.doc_id),
        |runs AS (
        |  SELECT *, pos - row_number() OVER
        |    (PARTITION BY doc_id, partner_id, diag ORDER BY pos) AS grp
        |  FROM pr)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
        |  CAST(max(pos) - min(pos) + 5 AS BIGINT) AS n_tokens,
        |  partner_id, CAST(min(ppos) AS BIGINT) AS partner_pos
        |FROM runs GROUP BY doc_id, partner_id, diag, grp""".stripMargin,

    // the synthetic video recomputed in closed form — the engine side
    // must round-trip it through real Y4M bytes (header walk, FRAME
    // markers, planar 4:2:0 plane strides) to match; `//` is DuckDB
    // integer division (plain `/` would promote to DOUBLE)
    "e78_y4m_codec_frames" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(16 + 2 * (doc_id % 9) AS BIGINT) AS w,
        |    CAST(8 + 2 * (doc_id % 5) AS BIGINT) AS h,
        |    CAST(2 + doc_id % 3 AS BIGINT) AS nf
        |  FROM documents),
        |tt AS (
        |  SELECT doc_id, w, h,
        |    unnest(generate_series(0, nf - 1)) AS t
        |  FROM g),
        |yy AS (
        |  SELECT doc_id, w, h, t,
        |    unnest(generate_series(0, h - 1)) AS y
        |  FROM tt),
        |xx AS (
        |  SELECT doc_id, w, h, t, y,
        |    unnest(generate_series(0, w - 1)) AS x
        |  FROM yy),
        |yv AS (
        |  SELECT doc_id, w, h, t, x, y,
        |    (doc_id*7 + t*11 + x*3 + y*5) % 256 AS yval
        |  FROM xx),
        |ystat AS (
        |  SELECT doc_id, t AS frame_idx,
        |    count(*)::BIGINT AS n_y,
        |    CAST(sum(yval) AS BIGINT) AS sum_y,
        |    CAST(max(yval) AS BIGINT) AS max_y,
        |    CAST(max(CASE WHEN x = 0 AND y = 0 THEN yval END)
        |      AS BIGINT) AS first_y,
        |    CAST(max(CASE WHEN x = w - 1 AND y = h - 1 THEN yval END)
        |      AS BIGINT) AS last_y
        |  FROM yv GROUP BY 1, 2),
        |vv AS (
        |  SELECT doc_id, w // 2 AS cw, t,
        |    unnest(generate_series(0, h // 2 - 1)) AS v
        |  FROM tt),
        |cu AS (
        |  SELECT doc_id, t, v,
        |    unnest(generate_series(0, cw - 1)) AS u
        |  FROM vv),
        |cstat AS (
        |  SELECT doc_id, t AS frame_idx,
        |    CAST(sum((doc_id*13 + t*3 + u*5 + v*7) % 256) AS BIGINT)
        |      AS sum_cb,
        |    CAST(sum((doc_id*17 + t*5 + u*7 + v*3) % 256) AS BIGINT)
        |      AS sum_cr
        |  FROM cu GROUP BY 1, 2)
        |SELECT y.doc_id, y.frame_idx, y.n_y, y.sum_y, y.max_y,
        |  c.sum_cb, c.sum_cr, y.first_y, y.last_y
        |FROM ystat y JOIN cstat c USING (doc_id, frame_idx)"""
        .stripMargin,

    // the synthetic image recomputed in closed form — the engine side
    // must round-trip it through real BMP bytes (stride padding,
    // bottom-up rows, BGR channel order) to match
    // the resampled pattern evaluated directly: source index =
    // (x*w)//8, (y*h)//4 — the same floor math as resizeNearest
    "e117_image_resize_rows" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 17 AS BIGINT) AS w,
        |    CAST(8 + doc_id % 9 AS BIGINT) AS h
        |  FROM documents),
        |yy AS (
        |  SELECT doc_id, w, h,
        |    unnest(generate_series(0, 3)) AS y
        |  FROM g),
        |xx AS (
        |  SELECT doc_id, w, h, y,
        |    unnest(generate_series(0, 7)) AS x
        |  FROM yy),
        |px AS (
        |  SELECT doc_id, y, x,
        |    (doc_id*7 + ((x*w)//8)*3 + ((y*h)//4)*5) % 256 AS r,
        |    (doc_id*11 + ((x*w)//8) + ((y*h)//4)*2) % 256 AS gg,
        |    (doc_id*13 + ((x*w)//8)*4 + ((y*h)//4)) % 256 AS b
        |  FROM xx)
        |SELECT doc_id, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(gg) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max((299*r + 587*gg + 114*b) // 1000) AS BIGINT)
        |    AS max_lum,
        |  CAST(arg_min(r*65536 + gg*256 + b, x) AS BIGINT) AS first_px,
        |  CAST(arg_max(r*65536 + gg*256 + b, x) AS BIGINT) AS last_px
        |FROM px GROUP BY 1, 2""".stripMargin,

    "e71_bmp_codec_rows" -> imageCodecOracle,

    // same expected pixels, different codec under test (zlib +
    // adaptive filters instead of raw bottom-up rows)
    "e116_png_codec_rows" -> imageCodecOracle,


    "e66_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' reach user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.org or see http://ex.org/d/'
        |      || CAST(doc_id AS VARCHAR) || ' ref '
        |      || CAST(1000000000 + doc_id AS VARCHAR) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
        |    AS n_emails,
        |  len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT
        |    AS n_urls,
        |  len(regexp_extract_all(text, '\b[0-9]{9,}\b'))::BIGINT
        |    AS n_longnums,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<PII>', 'g'),
        |    'https?://[^ ]+', '<PII>', 'g'),
        |    '\b[0-9]{9,}\b', '<PII>', 'g') AS text_clean
        |FROM d""".stripMargin,

    "e67_boilerplate_lines" ->
      """WITH segs AS (
        |  SELECT doc_id, unnest(generate_series(0,
        |      CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT)
        |        - 1)) AS pos,
        |    text
        |  FROM documents),
        |s2 AS (
        |  SELECT doc_id, pos,
        |    array_to_string(list_slice(string_split(text, ' '),
        |      pos*8 + 1, pos*8 + 8), ' ') AS line
        |  FROM segs),
        |boiler AS (
        |  SELECT line FROM s2 GROUP BY 1
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        |  SELECT * FROM s2
        |  WHERE line NOT IN (SELECT line FROM boiler)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, ' ' ORDER BY pos) AS text_clean
        |  FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_total FROM s2 GROUP BY 1)
        |SELECT t.doc_id, coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |  (t.n_total - coalesce(a.n_kept, 0))::BIGINT AS n_dropped,
        |  coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // per-subspace Lloyd (the kmeansCtes chain with a subspace key s):
    // init = k lowest vec_ids' slices, two assignment/average rounds
    // at the shared 6-decimal rounding + lowest-cid tie-break, encode
    // against the FINAL codebook (the e54 cells pattern), then the
    // integer code-sum gate and e68-shaped error profile
    "e74_product_quantize" ->
      s"""WITH $pqCtes,
        |csum AS (
        |  SELECT label, (count(*) / 4)::BIGINT AS n_vecs,
        |    CAST(sum(cid) AS BIGINT) AS sum_code
        |  FROM enc GROUP BY 1),
        |perr AS (
        |  SELECT t.label, t.se[t.i] - c.carr[t.i] AS err
        |  FROM (SELECT label, s, cid, se,
        |          unnest(range(1, len(se) + 1)) AS i FROM enc) t
        |  JOIN pc2 c ON t.s = c.s AND t.cid = c.cid),
        |eprof AS (
        |  SELECT label, count(*)::BIGINT AS n_vals,
        |    round(max(abs(err)), 6) AS max_abs_err,
        |    round(avg(err * err), 9) AS mse
        |  FROM perr GROUP BY 1)
        |SELECT label, n_vecs, n_vals, sum_code, max_abs_err, mse
        |FROM csum JOIN eprof USING (label)""".stripMargin,

    // ADC over the shared PQ chain: query subvectors against the
    // FINAL codebook entries of each doc's codes; the per-(q, n) total
    // is list_sum over the s-ORDERED per-sub distances — the exact
    // left-fold order the engine's d0+d1+d2+d3 expression uses
    "e75_pq_adc_topk" ->
      s"""WITH $pqCtes,
        |q AS (SELECT vec_id AS q_id, e AS qe FROM emb4
        |      WHERE vec_id < 10),
        |qsub AS (
        |  SELECT q_id, s, list_slice(qe, s*16 + 1, s*16 + 16) AS qs
        |  FROM q CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
        |persub AS (
        |  SELECT qs.q_id, n.vec_id AS n_id, n.s,
        |    list_sum(list_transform(range(1, 16 + 1),
        |      i -> (qs.qs[i] - c.carr[i]) * (qs.qs[i] - c.carr[i])))
        |      AS d
        |  FROM enc n
        |  JOIN pc2 c ON n.s = c.s AND n.cid = c.cid
        |  JOIN qsub qs ON qs.s = n.s
        |  WHERE qs.q_id <> n.vec_id),
        |ascore AS (
        |  SELECT q_id, n_id,
        |    round(list_sum(list(d ORDER BY s)), 6) AS adc
        |  FROM persub GROUP BY 1, 2),
        |aranked AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY q_id ORDER BY adc, n_id) AS rank
        |  FROM ascore)
        |SELECT q_id, n_id, adc, rank FROM aranked
        |WHERE rank <= 3""".stripMargin,

    // composed IVF-PQ: the shared score chain ranked to top-3 — any
    // divergence in coarse training, cell probing, codebook training,
    // encoding, or the ADC fold breaks the gate
    "e76_ivfpq_topk" ->
      s"""WITH $ivfpqScoreCtes
        |SELECT q_id, n_id, adc, rank FROM aranked76
        |WHERE rank <= 3""".stripMargin,

    // the composed chain's top-10 ADC candidates re-scored with exact
    // L2 against the full vectors — any candidate-set or re-rank
    // divergence breaks the gate
    "e80_ivfpq_rerank_topk" ->
      s"""WITH $ivfpqScoreCtes,
        |$ivfpqRerankCtes
        |SELECT q_id, n_id, dist, rank FROM rranked
        |WHERE rank <= 3""".stripMargin,

    // the residual chain ranked to top-3 — any divergence in coarse
    // training, residual subtraction, residual-codebook training,
    // cell-consistent encoding, or the ADC fold breaks the gate
    "e81_ivfpq_residual_topk" ->
      s"""WITH $ivfpqScoreCtes,
        |$ivfpqResidCtes
        |SELECT q_id, n_id, adc, rank FROM raranked
        |WHERE rank <= 3""".stripMargin,

    // the persisted-index serve is HASH-IDENTICAL to the in-memory
    // composed chain (parquet round-trips doubles bit-exactly), so the
    // e76 oracle gates the whole build/write/load/serve cycle
    "e83_ivfpq_persisted_topk" ->
      s"""WITH $ivfpqScoreCtes
        |SELECT q_id, n_id, adc, rank FROM aranked76
        |WHERE rank <= 3""".stripMargin,

    // the streaming replay's appended union must equal the batch
    // serve of the same persisted index — per-query top-k composes
    // over query micro-batches, so e76's oracle gates the whole
    // stream-static serving path
    "e94_streaming_ann_serve_replay" ->
      s"""WITH $ivfpqScoreCtes
        |SELECT q_id, n_id, adc, rank FROM aranked76
        |WHERE rank <= 3""".stripMargin,

    // serving-grade recall: the tuned chain (m=8/L=8/kCodes=16/
    // nprobe=4/R=30) and the untuned re-rank baseline, both as
    // integer set intersections against the same exact-L2 truth
    "e84_ivfpq_tuned_recall" ->
      s"""WITH $ivfpqScoreCtes,
        |l2scored84 AS (
        |  SELECT q.q_id, n.vec_id AS n_id,
        |    round(list_sum(list_transform(range(1, len(q.qe) + 1),
        |      i -> (q.qe[i] - n.e[i]) * (q.qe[i] - n.e[i]))), 6)
        |      AS dist
        |  FROM q76 q CROSS JOIN emb4 n WHERE q.q_id <> n.vec_id),
        |l2brute84 AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY q_id ORDER BY dist, n_id) AS rank
        |    FROM l2scored84) t WHERE rank <= 3),
        |$ivfpqRerankCtes,
        |basetop AS (SELECT q_id, n_id FROM rranked WHERE rank <= 3),
        |basestats AS (
        |  SELECT 'ivfpq_rerank' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(r.q_id)::BIGINT AS n_hit,
        |    round(count(r.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute84 b LEFT JOIN basetop r
        |    ON b.q_id = r.q_id AND b.n_id = r.n_id),
        |$ivfpqTunedCtes,
        |tunedstats AS (
        |  SELECT 'ivfpq_tuned' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(t.q_id)::BIGINT AS n_hit,
        |    round(count(t.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute84 b LEFT JOIN ttop t
        |    ON b.q_id = t.q_id AND b.n_id = t.n_id),
        |tunedrstats AS (
        |  SELECT 'ivfpq_tuned_rerank' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(t.q_id)::BIGINT AS n_hit,
        |    round(count(t.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute84 b LEFT JOIN trtop t
        |    ON b.q_id = t.q_id AND b.n_id = t.n_id)
        |SELECT * FROM basestats
        |UNION ALL SELECT * FROM tunedstats
        |UNION ALL SELECT * FROM tunedrstats""".stripMargin,

    // the append gate: training CTEs restricted to the pre-append
    // corpus (vec_id % 10 <> 0), encode/serve over the full corpus —
    // exactly what "encode the batch with the persisted model" must
    // equal
    "e86_ivfpq_append_topk" ->
      s"""WITH emb4 AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |emb AS (SELECT vec_id, e FROM emb4),
        |${ivfpqChainCtes("ap", "vec_id % 10 <> 0", m = 4, L = 16,
           kc = 8, np = 2, rr = 0)}
        |SELECT q_id, n_id, adc, rank FROM apranked
        |WHERE rank <= 3""".stripMargin,

    // the streaming append-then-serve replay converges to the same
    // full-corpus serve as the batch append path — probes run after
    // every append lands, with the model frozen at the old-corpus
    // build, so e86's oracle gates the whole loop
    "e231_streaming_index_append_replay" ->
      s"""WITH emb4 AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |emb AS (SELECT vec_id, e FROM emb4),
        |${ivfpqChainCtes("ap", "vec_id % 10 <> 0", m = 4, L = 16,
           kc = 8, np = 2, rr = 0)}
        |SELECT q_id, n_id, adc, rank FROM apranked
        |WHERE rank <= 3""".stripMargin,

    // PQ-path recall vs exact-L2 brute force: whole-corpus ADC
    // (pq_adc — pure quantization loss) and the composed IVF-PQ
    // (ivfpq — plus nprobe pruning loss), both as integer set
    // intersections against the same ground truth
    "e79_ivfpq_recall" ->
      s"""WITH $ivfpqScoreCtes,
        |l2scored AS (
        |  SELECT q.q_id, n.vec_id AS n_id,
        |    round(list_sum(list_transform(range(1, len(q.qe) + 1),
        |      i -> (q.qe[i] - n.e[i]) * (q.qe[i] - n.e[i]))), 6)
        |      AS dist
        |  FROM q76 q CROSS JOIN emb4 n WHERE q.q_id <> n.vec_id),
        |l2brute AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY q_id ORDER BY dist, n_id) AS rank
        |    FROM l2scored) t WHERE rank <= 3),
        |persubw AS (
        |  SELECT qs.q_id, n.vec_id AS n_id, n.s,
        |    list_sum(list_transform(range(1, 16 + 1),
        |      i -> (qs.qs[i] - c.carr[i]) * (qs.qs[i] - c.carr[i])))
        |      AS d
        |  FROM enc n
        |  JOIN pc2 c ON n.s = c.s AND n.cid = c.cid
        |  JOIN qsub76 qs ON qs.s = n.s
        |  WHERE qs.q_id <> n.vec_id),
        |ascorew AS (
        |  SELECT q_id, n_id,
        |    round(list_sum(list(d ORDER BY s)), 6) AS adc
        |  FROM persubw GROUP BY 1, 2),
        |adcw AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY q_id ORDER BY adc, n_id) AS rank
        |    FROM ascorew) t WHERE rank <= 3),
        |ivfpqtop AS (
        |  SELECT q_id, n_id FROM aranked76 WHERE rank <= 3),
        |astats AS (
        |  SELECT 'pq_adc' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(a.q_id)::BIGINT AS n_hit,
        |    round(count(a.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute b LEFT JOIN adcw a
        |    ON b.q_id = a.q_id AND b.n_id = a.n_id),
        |istats AS (
        |  SELECT 'ivfpq' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(i.q_id)::BIGINT AS n_hit,
        |    round(count(i.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute b LEFT JOIN ivfpqtop i
        |    ON b.q_id = i.q_id AND b.n_id = i.n_id),
        |$ivfpqRerankCtes,
        |rtop AS (SELECT q_id, n_id FROM rranked WHERE rank <= 3),
        |rstats AS (
        |  SELECT 'ivfpq_rerank' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true, count(r.q_id)::BIGINT AS n_hit,
        |    round(count(r.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute b LEFT JOIN rtop r
        |    ON b.q_id = r.q_id AND b.n_id = r.n_id),
        |$ivfpqResidCtes,
        |residtop AS (SELECT q_id, n_id FROM raranked WHERE rank <= 3),
        |residstats AS (
        |  SELECT 'ivfpq_resid' AS method, 3::BIGINT AS k,
        |    count(*)::BIGINT AS n_true,
        |    count(rr.q_id)::BIGINT AS n_hit,
        |    round(count(rr.q_id)::DOUBLE / count(*), 6) AS recall
        |  FROM l2brute b LEFT JOIN residtop rr
        |    ON b.q_id = rr.q_id AND b.n_id = rr.n_id)
        |SELECT * FROM astats UNION ALL SELECT * FROM istats
        |UNION ALL SELECT * FROM rstats
        |UNION ALL SELECT * FROM residstats""".stripMargin,

    "e68_scalar_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding,
        |    unnest(generate_series(0,
        |      CAST(len(embedding) AS BIGINT) - 1)) AS pos
        |  FROM embeddings),
        |v AS (
        |  SELECT label, pos, embedding[pos + 1]::DOUBLE AS v FROM e),
        |st AS (SELECT pos, min(v) AS mn, max(v) AS mx
        |       FROM v GROUP BY 1),
        |q AS (
        |  SELECT label, v.v, st.mn, st.mx - st.mn AS scale,
        |    CASE WHEN st.mx - st.mn > 0
        |      THEN floor((v.v - st.mn) / (st.mx - st.mn) * 255.0 + 0.5)
        |      ELSE 0.0 END AS q
        |  FROM v JOIN st USING (pos)),
        |d AS (
        |  SELECT label, v, q,
        |    CASE WHEN scale > 0 THEN mn + q * scale / 255.0
        |         ELSE mn END AS deq
        |  FROM q)
        |SELECT label, count(*)::BIGINT AS n_vals,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  round(max(abs(v - deq)), 6) AS max_abs_err,
        |  round(avg((v - deq) * (v - deq)), 9) AS mse
        |FROM d GROUP BY 1""".stripMargin,

    // streaming replay of the WAV decode — appended union == batch, so
    // the closed-form e65 oracle applies verbatim
    "e69_wav_streaming_replay" ->
      """WITH s AS (
        |  SELECT doc_id, unnest(generate_series(0,
        |      CAST(300 + doc_id % 200 - 1 AS BIGINT))) AS i
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, i,
        |    ((doc_id*31 + i*7) % 65536) - 32768 AS smp
        |  FROM s)
        |SELECT doc_id, i // 256 AS frame_idx,
        |  count(*)::BIGINT AS n_samples,
        |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(smp)) AS BIGINT) AS peak,
        |  CAST(arg_min(smp, i) AS BIGINT) AS first_s,
        |  CAST(arg_max(smp, i) AS BIGINT) AS last_s
        |FROM v GROUP BY 1, 2""".stripMargin,

    "e12_distinct_users" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1"),

    // ε-gate oracles (VERDICT r8 #3): the sketch values stay
    // engine-side; the oracle asserts the documented error envelope
    // holds (all bound flags 1) over exactly the gated group keys
    "e13_approx_distinct_users" ->
      ("SELECT event_type, count(DISTINCT user_id) AS n_users, " +
        "1 AS within_bound FROM events GROUP BY 1"),

    "e23_quantile_profile_approx" ->
      ("SELECT event_type, count(*) AS n, 1 AS p25_within, " +
        "1 AS p50_within, 1 AS p75_within, 1 AS p90_within, " +
        "1 AS p99_within FROM events GROUP BY 1"),

    "e14_dedup_embedding_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round(
        |    list_sum(list_transform(range(1, len(a.e) + 1),
        |      i -> a.e[i] * b.e[i])) /
        |    (sqrt(list_sum(list_transform(range(1, len(a.e) + 1),
        |       i -> a.e[i] * a.e[i]))) *
        |     sqrt(list_sum(list_transform(range(1, len(b.e) + 1),
        |       i -> b.e[i] * b.e[i])))), 6) AS sim
        |  FROM v a JOIN v b
        |    ON a.label = b.label AND a.vec_id < b.vec_id) t
        |WHERE sim >= CAST(0.4 AS DOUBLE)""".stripMargin,

    "e15_lsh_ann_pairs" ->
      s"""WITH $lshBucketCtes
         |SELECT * FROM (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, round(
         |    list_sum(list_transform(range(1, len(x.e) + 1),
         |      i -> x.e[i] * y.e[i])) /
         |    (sqrt(list_sum(list_transform(range(1, len(x.e) + 1),
         |       i -> x.e[i] * x.e[i]))) *
         |     sqrt(list_sum(list_transform(range(1, len(y.e) + 1),
         |       i -> y.e[i] * y.e[i])))), 6) AS sim
         |  FROM bucketed x JOIN bucketed y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id) t
         |WHERE sim >= CAST(0.3 AS DOUBLE)""".stripMargin,

    // the two pruned ANN paths measured against brute-force ground
    // truth with the same similarity/tie rules — set intersections of
    // rows both engines already compute hash-identically (e5/e6/e15),
    // so the recall itself is oracle-exact
    "e52_ann_recall" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, label AS cell,
         |    list_transform(embedding, x -> x::DOUBLE) AS qe
         |  FROM embeddings WHERE vec_id < 10),
         |c AS (
         |  SELECT vec_id AS n_id, label AS cell,
         |    list_transform(embedding, x -> x::DOUBLE) AS ce
         |  FROM embeddings),
         |bscored AS (
         |  SELECT q_id, n_id, round(
         |    list_sum(list_transform(range(1, len(qe) + 1),
         |      i -> qe[i] * ce[i])) /
         |    (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
         |       i -> qe[i] * qe[i]))) *
         |     sqrt(list_sum(list_transform(range(1, len(ce) + 1),
         |       i -> ce[i] * ce[i])))), 6) AS sim
         |  FROM q CROSS JOIN c WHERE q_id <> n_id),
         |brute AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM bscored) WHERE rank <= 3),
         |iscored AS (
         |  SELECT q_id, n_id, round(
         |    list_sum(list_transform(range(1, len(qe) + 1),
         |      i -> qe[i] * ce[i])) /
         |    (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
         |       i -> qe[i] * qe[i]))) *
         |     sqrt(list_sum(list_transform(range(1, len(ce) + 1),
         |       i -> ce[i] * ce[i])))), 6) AS sim
         |  FROM q JOIN c ON q.cell = c.cell WHERE q_id <> n_id),
         |ivf AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM iscored) WHERE rank <= 3),
         |ivfstats AS (
         |  SELECT 'ivf_knn' AS method, 3::BIGINT AS k,
         |    count(*)::BIGINT AS n_true, count(i.q_id)::BIGINT AS n_hit,
         |    round(count(i.q_id)::DOUBLE / count(*), 6) AS recall
         |  FROM brute b LEFT JOIN ivf i
         |    ON b.q_id = i.q_id AND b.n_id = i.n_id),
         |$lshBucketCtes,
         |truep AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM v x JOIN v y ON x.vec_id < y.vec_id
         |  WHERE round(
         |    list_sum(list_transform(range(1, len(x.e) + 1),
         |      i -> x.e[i] * y.e[i])) /
         |    (sqrt(list_sum(list_transform(range(1, len(x.e) + 1),
         |       i -> x.e[i] * x.e[i]))) *
         |     sqrt(list_sum(list_transform(range(1, len(y.e) + 1),
         |       i -> y.e[i] * y.e[i])))), 6) >= CAST(0.3 AS DOUBLE)),
         |lshp AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bucketed x JOIN bucketed y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |lshstats AS (
         |  SELECT 'lsh_pairs' AS method, 8::BIGINT AS k,
         |    count(*)::BIGINT AS n_true, count(l.vec_a)::BIGINT AS n_hit,
         |    round(count(l.vec_a)::DOUBLE / count(*), 6) AS recall
         |  FROM truep t LEFT JOIN lshp l
         |    ON t.vec_a = l.vec_a AND t.vec_b = l.vec_b),
         |$lshMultiCtes,
         |mlshp AS (
         |  SELECT m.vec_a, m.vec_b
         |  FROM mcand m
         |  JOIN vm a ON m.vec_a = a.vec_id
         |  JOIN vm b ON m.vec_b = b.vec_id
         |  WHERE ${duckCos("a.e", "b.e")} >= CAST(0.3 AS DOUBLE)),
         |mstats AS (
         |  SELECT 'lsh_multi' AS method, 8::BIGINT AS k,
         |    count(*)::BIGINT AS n_true, count(l.vec_a)::BIGINT AS n_hit,
         |    round(count(l.vec_a)::DOUBLE / count(*), 6) AS recall
         |  FROM truep t LEFT JOIN mlshp l
         |    ON t.vec_a = l.vec_a AND t.vec_b = l.vec_b),
         |$kmeansCtes,
         |ccells AS (
         |  SELECT vec_id AS n_id, e AS ne, cluster_id AS cell FROM (
         |    SELECT emb.vec_id, emb.e, c2.cluster_id, row_number() OVER
         |      (PARTITION BY emb.vec_id ORDER BY
         |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
         |          i -> (emb.e[i] - c2.carr[i])
         |             * (emb.e[i] - c2.carr[i]))), 6),
         |        c2.cluster_id) AS rn
         |    FROM emb CROSS JOIN c2) t WHERE rn = 1),
         |qprobes AS (
         |  SELECT vec_id AS q_id, e AS qe, cluster_id AS cell,
         |    rn AS probe_rank FROM (
         |    SELECT emb.vec_id, emb.e, c2.cluster_id, row_number() OVER
         |      (PARTITION BY emb.vec_id ORDER BY
         |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
         |          i -> (emb.e[i] - c2.carr[i])
         |             * (emb.e[i] - c2.carr[i]))), 6),
         |        c2.cluster_id) AS rn
         |    FROM emb CROSS JOIN c2 WHERE emb.vec_id < 10) t
         |  WHERE rn <= 2),
         |kscored AS (
         |  SELECT q_id, n_id, ${duckCos("qe", "ne")} AS sim
         |  FROM qprobes p JOIN ccells n ON p.cell = n.cell
         |  WHERE q_id <> n_id),
         |kivf AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM kscored) WHERE rank <= 3),
         |kstats AS (
         |  SELECT 'kmeans_ivf' AS method, 3::BIGINT AS k,
         |    count(*)::BIGINT AS n_true, count(i.q_id)::BIGINT AS n_hit,
         |    round(count(i.q_id)::DOUBLE / count(*), 6) AS recall
         |  FROM brute b LEFT JOIN kivf i
         |    ON b.q_id = i.q_id AND b.n_id = i.n_id),
         |kscored1 AS (
         |  SELECT p.q_id, n.n_id AS n_id, ${duckCos("p.qe", "n.ne")}
         |    AS sim
         |  FROM qprobes p JOIN ccells n ON p.cell = n.cell
         |  WHERE p.q_id <> n.n_id AND p.probe_rank = 1),
         |kivf1 AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |    FROM kscored1) WHERE rank <= 3),
         |kstats1 AS (
         |  SELECT 'kmeans_ivf_p1' AS method, 3::BIGINT AS k,
         |    count(*)::BIGINT AS n_true, count(i.q_id)::BIGINT AS n_hit,
         |    round(count(i.q_id)::DOUBLE / count(*), 6) AS recall
         |  FROM brute b LEFT JOIN kivf1 i
         |    ON b.q_id = i.q_id AND b.n_id = i.n_id)
         |SELECT * FROM ivfstats UNION ALL SELECT * FROM kstats1
         |UNION ALL SELECT * FROM kstats
         |UNION ALL SELECT * FROM lshstats
         |UNION ALL SELECT * FROM mstats""".stripMargin,

    // the multi-table candidates verified by the same rounded cosine
    "e53_lsh_multi_pairs" ->
      s"""WITH $lshMultiCtes
         |SELECT m.vec_a, m.vec_b, ${duckCos("a.e", "b.e")} AS sim
         |FROM mcand m
         |JOIN vm a ON m.vec_a = a.vec_id
         |JOIN vm b ON m.vec_b = b.vec_id
         |WHERE ${duckCos("a.e", "b.e")} >= CAST(0.3 AS DOUBLE)"""
        .stripMargin,

    // GROUPING(event_type, day) = Spark's grouping_id (first column is
    // the high bit on both engines); sums rounded post-aggregate
    "e89_rollup_stats" ->
      """SELECT event_type, CAST(day AS TIMESTAMP) AS day,
        |  GROUPING(event_type, day) AS gid,
        |  count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM (SELECT event_type, value,
        |        date_trunc('day', ts) AS day FROM events) t
        |GROUP BY ROLLUP(event_type, day)""".stripMargin,

    // FILTER-count semantics: absent cells are 0, matching the pinned
    // pivot domain + fill on the Spark side
    "e90_pivot_matrix" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,

    // identical gaps-and-islands windows over the (ts, event_id) total
    // order; the last island per user stays open
    "e96_scd2_history" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS island
        |  FROM flagged),
        |grp AS (
        |  SELECT user_id, island, event_type,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER wi AS valid_to, n_events,
        |  lead(valid_from) OVER wi IS NULL AS is_current
        |FROM grp
        |WINDOW wi AS (PARTITION BY user_id ORDER BY island)""".stripMargin,

    // the Bloom bits rebuilt in SQL (same double-hashed positions, same
    // 32-bit words) — probe via LEFT JOIN on word id instead of the
    // literal-array lookup; contaminated = exact membership, which the
    // no-false-negative contract makes identical to the pruned join
    "e87_bloom_decontaminate" ->
      """WITH bfp AS (
        |  SELECT DISTINCT
        |    md5(array_to_string((string_split(text, ' '))[1:5], ' '))
        |      AS fp
        |  FROM documents WHERE doc_id % 7 = 0),
        |ii AS (SELECT unnest(range(0, 3)) AS i),
        |bpos AS (
        |  SELECT ((('0x' || substr(md5(fp), 1, 15))::BIGINT
        |    + i * ('0x' || substr(md5('bf|' || fp), 1, 15))::BIGINT)
        |    % 4096) AS pos
        |  FROM bfp, ii),
        |bfw AS (
        |  SELECT pos // 32 AS w,
        |    bit_or(1::BIGINT << (pos % 32)::INT) AS bits
        |  FROM bpos GROUP BY 1),
        |train AS (
        |  SELECT doc_id,
        |    md5(array_to_string((string_split(text, ' '))[1:5], ' '))
        |      AS fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |tpos AS (
        |  SELECT doc_id, fp,
        |    ((('0x' || substr(md5(fp), 1, 15))::BIGINT
        |      + i * ('0x' || substr(md5('bf|' || fp), 1, 15))::BIGINT)
        |      % 4096) AS pos
        |  FROM train, ii),
        |chk AS (
        |  SELECT t.doc_id, t.fp,
        |    count(*) FILTER (
        |      ((coalesce(b.bits, 0) >> (t.pos % 32)::INT) & 1) = 1)
        |      AS nset
        |  FROM tpos t LEFT JOIN bfw b ON b.w = t.pos // 32
        |  GROUP BY 1, 2)
        |SELECT doc_id, nset = 3 AS bf_hit,
        |  fp IN (SELECT fp FROM bfp) AS contaminated
        |FROM chk""".stripMargin,

    // the d×w counters rebuilt in SQL; est = min over rows; candidates
    // (est >= t, a CMS-guaranteed superset) exact-counted and flagged
    "e88_heavy_hitters_cms" -> cmsHeavyHittersOracle,

    // counts are additive, so the replayed per-batch cell store sums
    // to EXACTLY the batch sketch — e88's oracle gates the stream
    "e99_streaming_cms_replay" -> cmsHeavyHittersOracle,

    // the UNPRUNED ground truth: every pair sharing any shingle,
    // exact cosine, same ln/sqrt/rounding arithmetic — the prefix
    // filter must lose nothing against this
    "e93_allpairs_tfidf_cosine" ->
      """WITH sh AS (
        |  SELECT doc_id, s AS tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w) - 3, 1)),
        |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
        |        AS s
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents) t
        |    WHERE len(w) >= 5) u
        |  GROUP BY 1, 2),
        |dfc AS (SELECT tok, count(*) AS df FROM sh GROUP BY 1),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |w AS (
        |  SELECT doc_id, tok,
        |    tf * ln(CAST(1 AS DOUBLE) + nn.n / df) AS w
        |  FROM sh JOIN dfc USING (tok) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS s FROM w
        |        GROUP BY 1),
        |wnv AS (SELECT doc_id, tok, w / s AS wn
        |        FROM w JOIN nrm USING (doc_id))
        |SELECT * FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    round(sum(a.wn * b.wn), 6) AS sim
        |  FROM wnv a JOIN wnv b
        |    ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2) t
        |WHERE sim >= CAST(0.3 AS DOUBLE)""".stripMargin,

    // the oracle derives the SAME total order with one global
    // row_number — identical ranks to Spark's offset-composed form —
    // and verifies the same w-successor candidates with the same
    // distinct-shingle Jaccard
    "e97_sorted_neighborhood" ->
      s"""WITH $snnCtes
        |SELECT doc_a, doc_b, jaccard FROM snnj""".stripMargin,

    // the full linkage chain incl. the recursive closure rebuilt:
    // blocking candidates -> jaccard >= 0.3 edges -> min-label
    // components -> singleton backfill
    "e114_entity_resolution" ->
      s"""WITH RECURSIVE $snnCtes,
        |jedges AS (
        |  SELECT doc_a, doc_b FROM snnj
        |  WHERE jaccard >= CAST(0.3 AS DOUBLE)),
        |eedges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM jedges
        |  UNION SELECT doc_b, doc_a FROM jedges),
        |ereach AS (
        |  SELECT a AS id, a AS r FROM eedges
        |  UNION
        |  SELECT e.b AS id, ereach.r AS r
        |  FROM ereach JOIN eedges e ON e.a = ereach.id),
        |ecomp AS (SELECT id, min(r) AS cluster_id FROM ereach
        |          GROUP BY 1),
        |assigned AS (
        |  SELECT d.doc_id,
        |    coalesce(ecomp.cluster_id, d.doc_id) AS entity_id
        |  FROM documents d LEFT JOIN ecomp ON d.doc_id = ecomp.id),
        |esizes AS (
        |  SELECT entity_id, count(*) AS entity_size FROM assigned
        |  GROUP BY 1)
        |SELECT a.doc_id, a.entity_id, s.entity_size
        |FROM assigned a JOIN esizes s USING (entity_id)""".stripMargin,

    // the same row serialization and 60-bit hash; bit_xor is
    // order-free on both engines
    "e115_dataset_fingerprint" ->
      """SELECT 'documents' AS table_name, count(*) AS n_rows,
        |  bit_xor(('0x' || substr(md5(concat_ws('|', doc_id, text,
        |    lang, source, n_chars)), 1, 15))::BIGINT) AS xor_fp
        |FROM documents
        |UNION ALL
        |SELECT 'events', count(*),
        |  bit_xor(('0x' || substr(md5(concat_ws('|', event_id,
        |    epoch_us(ts), user_id, event_type, props)), 1, 15))
        |    ::BIGINT)
        |FROM events""".stripMargin,

    // 5 power-iteration rounds unrolled as CTEs with the IDENTICAL
    // double arithmetic ((1 - 0.85) evaluated in double space both
    // sides); ranks scaled by n and rounded post-iteration
    "e91_pagerank" -> {
      val iters = (1 to 5).map { k =>
        s"""r$k AS (
           |  SELECT n.node,
           |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           |      + CAST(0.85 AS DOUBLE)
           |        * coalesce(s.c, CAST(0 AS DOUBLE)) AS rank
           |  FROM nodes n CROSS JOIN nn LEFT JOIN (
           |    SELECT e.dst AS node, sum(r.rank / e.outdeg) AS c
           |    FROM topo e JOIN r${k - 1} r ON e.src = r.node
           |    GROUP BY 1) s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT c AS src, sp + 1000000 AS dst FROM pairs
         |  UNION ALL SELECT sp + 1000000 AS src, c AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |topo AS (SELECT e.src, e.dst, d.outdeg
         |         FROM edges e JOIN deg d USING (src)),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
         |       FROM nodes CROSS JOIN nn),
         |$iters
         |SELECT r5.node, round(r5.rank * nn.n, 6) AS rank_scaled
         |FROM r5 CROSS JOIN nn""".stripMargin
    },

    // the same Morton interleave (generated from one Scala source) and
    // the same deterministic row_number file map on both engines
    "e92_zorder_layout" -> {
      val z = graft.ext.Layout.interleaveSql("x", "y")
      s"""WITH base AS (
         |  SELECT event_id, ts, user_id % 256 AS x,
         |    least(255, CAST(floor(value / 2) AS BIGINT)) AS y
         |  FROM events),
         |z AS (SELECT event_id, ts, x, y, $z AS zkey FROM base),
         |zf AS (SELECT x, y,
         |    (row_number() OVER (ORDER BY zkey, event_id) - 1) // 1000
         |      AS file_id
         |  FROM z),
         |tf AS (SELECT x, y,
         |    (row_number() OVER (ORDER BY ts, event_id) - 1) // 1000
         |      AS file_id
         |  FROM z),
         |zs AS (SELECT 'zorder' AS layout, file_id,
         |    min(x) AS min_x, max(x) AS max_x,
         |    min(y) AS min_y, max(y) AS max_y, count(*) AS n_rows
         |  FROM zf GROUP BY 1, 2),
         |tsv AS (SELECT 'time' AS layout, file_id,
         |    min(x) AS min_x, max(x) AS max_x,
         |    min(y) AS min_y, max(y) AS max_y, count(*) AS n_rows
         |  FROM tf GROUP BY 1, 2)
         |SELECT * FROM zs UNION ALL SELECT * FROM tsv""".stripMargin
    },

    // identical weight arithmetic (1/(1-0.1) evaluated in double space
    // both sides) and identical rank-ordered running-sum accumulation
    "e100_ewma" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS j
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(value * power(CAST(1 AS DOUBLE) /
        |      (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)), j)) OVER w
        |      AS num,
        |    sum(power(CAST(1 AS DOUBLE) /
        |      (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)), j)) OVER w
        |      AS den
        |  FROM r
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts, round(num / den, 6)
        |  AS ewma_value
        |FROM s""".stripMargin,

    // the streaming replay folds the identical anchor sequence —
    // e110's recursive-CTE oracle gates it verbatim
    "e112_streaming_debounce_replay" -> anchoredDebounceOracle,

    // the ring rebuilt in SQL from the same md5 point set; the same
    // first-point-at-or-after-with-wrap lookup
    "e113_shard_rebalance" ->
      """WITH ks AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM documents),
        |pts AS (
        |  SELECT n, sh,
        |    ('0x' || substr(md5(concat('ring|s', CAST(sh AS VARCHAR),
        |      '|', CAST(v AS VARCHAR))), 1, 15))::BIGINT AS pos
        |  FROM (SELECT unnest(range(0, 9)) AS sh) s,
        |       (SELECT unnest(range(0, 8)) AS v) vv,
        |       (SELECT unnest([8, 9]) AS n) nn
        |  WHERE sh < n),
        |rings AS (
        |  SELECT n, list(pos ORDER BY pos) AS ps,
        |    list(sh ORDER BY pos) AS os
        |  FROM pts GROUP BY 1),
        |owned AS (
        |  SELECT k.h,
        |    CASE WHEN len(list_filter(r8.ps, p -> p < k.h))
        |              = len(r8.ps)
        |         THEN r8.os[1]
        |         ELSE r8.os[len(list_filter(r8.ps, p -> p < k.h)) + 1]
        |    END AS o8,
        |    CASE WHEN len(list_filter(r9.ps, p -> p < k.h))
        |              = len(r9.ps)
        |         THEN r9.os[1]
        |         ELSE r9.os[len(list_filter(r9.ps, p -> p < k.h)) + 1]
        |    END AS o9
        |  FROM ks k,
        |    (SELECT ps, os FROM rings WHERE n = 8) r8,
        |    (SELECT ps, os FROM rings WHERE n = 9) r9)
        |SELECT 'modulo' AS scheme, count(*) AS n_total,
        |  count(*) FILTER (h % 8 <> h % 9) AS n_moved,
        |  round(count(*) FILTER (h % 8 <> h % 9)::DOUBLE
        |    / count(*), 6) AS frac
        |FROM ks
        |UNION ALL
        |SELECT 'ring', count(*), count(*) FILTER (o8 <> o9),
        |  round(count(*) FILTER (o8 <> o9)::DOUBLE / count(*), 6)
        |FROM owned""".stripMargin,

    // the same fold as a recursive CTE: anchor advances only on kept
    // rows, walked in the same (ts, event_id) per-user order
    "e110_anchored_debounce" -> anchoredDebounceOracle,

    // the same median split, reference-decile boundaries (rounded
    // before binning), Laplace smoothing, and term sum
    "e109_psi_drift" ->
      """WITH cut AS (
        |  SELECT quantile_cont(epoch_us(ts), 0.5) AS mid FROM events),
        |ref AS (SELECT event_type, value FROM events, cut
        |        WHERE epoch_us(ts) <= mid),
        |cur AS (SELECT event_type, value FROM events, cut
        |        WHERE epoch_us(ts) > mid),
        |bnd AS (
        |  SELECT event_type,
        |    list_transform(quantile_cont(value,
        |      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |      b -> round(b, 6)) AS bs
        |  FROM ref GROUP BY 1),
        |rb AS (
        |  SELECT r.event_type,
        |    len(list_filter(b.bs, x -> r.value > x)) AS bin,
        |    count(*) AS c
        |  FROM ref r JOIN bnd b USING (event_type) GROUP BY 1, 2),
        |cb AS (
        |  SELECT r.event_type,
        |    len(list_filter(b.bs, x -> r.value > x)) AS bin,
        |    count(*) AS c
        |  FROM cur r JOIN bnd b USING (event_type) GROUP BY 1, 2),
        |f AS (
        |  SELECT coalesce(rb.event_type, cb.event_type) AS event_type,
        |    coalesce(rb.bin, cb.bin) AS bin,
        |    coalesce(rb.c, 0) AS c_r, coalesce(cb.c, 0) AS c_c
        |  FROM rb FULL OUTER JOIN cb
        |    ON rb.event_type = cb.event_type AND rb.bin = cb.bin),
        |n AS (
        |  SELECT event_type, sum(c_r)::DOUBLE AS n_r,
        |    sum(c_c)::DOUBLE AS n_c
        |  FROM f GROUP BY 1),
        |terms AS (
        |  SELECT f.event_type,
        |    (c_r + CAST(0.5 AS DOUBLE)) / (n_r + CAST(5 AS DOUBLE))
        |      AS p,
        |    (c_c + CAST(0.5 AS DOUBLE)) / (n_c + CAST(5 AS DOUBLE))
        |      AS q
        |  FROM f JOIN n USING (event_type))
        |SELECT event_type, round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM terms GROUP BY 1""".stripMargin,

    // the same lag window over the same (ts, event_id) order;
    // microsecond-integer comparison on both engines
    "e106_quiet_gap_filter" ->
      """SELECT user_id, event_id, ts, value FROM (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events) t
        |WHERE prev IS NULL
        |   OR epoch_us(ts) - epoch_us(prev)
        |        >= 3600::BIGINT * 1000000""".stripMargin,

    // the same degree cap (vacuous at this scale, semantic at 100 TB)
    // and the same shared-neighbor count
    "e107_copurchase_projection" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (SELECT c FROM pairs GROUP BY c
        |        HAVING count(*) <= 1000),
        |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg USING (c))
        |SELECT a.sp AS node_a, b.sp AS node_b, count(*) AS n_shared
        |FROM capped a JOIN capped b
        |  ON a.c = b.c AND a.sp < b.sp
        |GROUP BY 1, 2 HAVING count(*) >= 190""".stripMargin,

    // the same ordered 3-way join enumerates each triangle once;
    // corners credited via unnest
    "e108_triangle_count" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg AS (SELECT c FROM pairs GROUP BY c
        |        HAVING count(*) <= 1000),
        |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg USING (c)),
        |proj AS (
        |  SELECT a.sp AS node_a, b.sp AS node_b
        |  FROM capped a JOIN capped b
        |    ON a.c = b.c AND a.sp < b.sp
        |  GROUP BY 1, 2 HAVING count(*) >= 190),
        |tris AS (
        |  SELECT e1.node_a AS a, e1.node_b AS b, e2.node_b AS c
        |  FROM proj e1
        |  JOIN proj e2 ON e1.node_b = e2.node_a
        |  JOIN proj e3 ON e3.node_a = e1.node_a
        |             AND e3.node_b = e2.node_b)
        |SELECT node, count(*) AS n_triangles FROM (
        |  SELECT unnest([a, b, c]) AS node FROM tris) t
        |GROUP BY 1""".stripMargin,

    // both arms are the already-oracled chains (e60's BM25 at k=10,
    // aranked76's composed serve at rank<=10); the fusion is pure
    // integer-rank algebra ranked on the rounded score
    "e105_rrf_fusion" ->
      s"""WITH $rrfFusionCtes
        |SELECT query_id, rnk, doc_id, rrf, r_lex, r_vec
        |FROM fusedtop""".stripMargin,

    // nDCG@5 of the fused ranking against label relevance: the same
    // fused CTEs, rel = (doc label == query label), log2 via ln/ln(2),
    // ideal gain from the per-query relevant-doc count
    "e111_ndcg_fusion" ->
      s"""WITH $rrfFusionCtes,
        |lab AS (SELECT vec_id, label FROM embeddings),
        |ql AS (SELECT vec_id AS query_id, label AS qlabel FROM lab
        |       WHERE vec_id < 3),
        |rel AS (
        |  SELECT f.query_id, f.rnk,
        |    CASE WHEN l.label = q.qlabel THEN CAST(1 AS DOUBLE)
        |         ELSE CAST(0 AS DOUBLE) END AS rel
        |  FROM fusedtop f
        |  JOIN lab l ON l.vec_id = f.doc_id
        |  JOIN ql q ON q.query_id = f.query_id),
        |dcg AS (
        |  SELECT query_id,
        |    round(sum(rel / (ln(rnk + 1) / ln(CAST(2 AS DOUBLE)))), 6)
        |      AS dcg
        |  FROM rel GROUP BY 1),
        |rcount AS (
        |  SELECT q.query_id, count(*) AS r
        |  FROM lab l JOIN ql q ON l.label = q.qlabel
        |  GROUP BY 1),
        |idcg AS (
        |  SELECT query_id,
        |    round(sum(CAST(1 AS DOUBLE)
        |      / (ln(i + 1) / ln(CAST(2 AS DOUBLE)))), 6) AS idcg
        |  FROM rcount, (SELECT unnest(range(1, 6)) AS i) ii
        |  WHERE i <= r GROUP BY 1)
        |SELECT d.query_id, d.dcg, g.idcg,
        |  round(d.dcg / g.idcg, 6) AS ndcg
        |FROM dcg d JOIN idcg g USING (query_id)""".stripMargin,

    // identical trailing frame; stats rounded before the band
    // arithmetic and the breach comparison (Welford order differs)
    "e104_bollinger_bands" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts, value,
        |    round(avg(value) OVER w, 6) AS mid,
        |    round(stddev_samp(value) OVER w, 6) AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts, value, mid, sd,
        |  round(mid + CAST(2 AS DOUBLE) * sd, 6) AS hi,
        |  round(mid - CAST(2 AS DOUBLE) * sd, 6) AS lo,
        |  coalesce(value > round(mid + CAST(2 AS DOUBLE) * sd, 6)
        |    OR value < round(mid - CAST(2 AS DOUBLE) * sd, 6), false)
        |    AS breach
        |FROM b""".stripMargin,

    // standard NTILE fill rule over the same (value, event_id) total
    // order on both engines
    "e103_equidepth_bins" ->
      """SELECT event_id, event_type, value,
        |  ntile(10) OVER (PARTITION BY event_type
        |    ORDER BY value, event_id) AS bin
        |FROM events""".stripMargin,

    // the stateful replay folds the SAME running sums in the same
    // order as the batch window — e100's oracle gates it verbatim
    "e102_streaming_ewma_replay" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS j
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(value * power(CAST(1 AS DOUBLE) /
        |      (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)), j)) OVER w
        |      AS num,
        |    sum(power(CAST(1 AS DOUBLE) /
        |      (CAST(1 AS DOUBLE) - CAST(0.1 AS DOUBLE)), j)) OVER w
        |      AS den
        |  FROM r
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts, round(num / den, 6)
        |  AS ewma_value
        |FROM s""".stripMargin,

    // quantile_cont == Spark percentile (both rounded before use, the
    // e36 contract — applied to the median BEFORE the MAD pass too)
    "e101_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6)
        |    AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
        |  abs(e.value - m.med) > CAST(3 AS DOUBLE) * d.mad
        |    AS is_outlier
        |FROM events e JOIN med m USING (event_type)
        |JOIN mad d USING (event_type)""".stripMargin,

    // the same deterministic v2 construction and the same
    // null/fingerprint classification over a full-outer join
    "e98_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' new' FROM documents
        |  WHERE doc_id % 13 = 0),
        |o AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
        |n AS (SELECT doc_id, md5(text) AS fp_new FROM v2)
        |SELECT * FROM (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN fp_old <> fp_new THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) t
        |WHERE status <> 'unchanged'""".stripMargin,

    // the same hash-derived u and u^(1/w) key arithmetic; ordering runs
    // on the UNROUNDED key (unique md5 draws make the cut deterministic)
    "e95_weighted_reservoir" ->
      """SELECT doc_id, n_chars, round(samp_key, 6) AS samp_key
        |FROM (
        |  SELECT doc_id, n_chars,
        |    power(
        |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |         ::BIGINT % 1000000 + 1)::DOUBLE
        |        / CAST(1000001 AS DOUBLE),
        |      CAST(1 AS DOUBLE) / greatest(n_chars, 1)) AS samp_key
        |  FROM documents) t
        |ORDER BY t.samp_key DESC, doc_id LIMIT 50""".stripMargin,

    // running max is exact fp, the ratio is one identical expression
    // tree, and the running max of ROUNDED drawdowns is exact again
    "e118_max_drawdown" -> drawdownOracle,

    // money accumulates in int64 cents on both engines (exact; double
    // window sums tree their partials differently and flip round-6
    // boundaries) — one final division of identical operands
    "e119_anchored_vwap" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |               * CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS BIGINT)) OVER w * 100
        |           AS DOUBLE), 6) AS vwap
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_partkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin,

    // co-moments round to 6 BEFORE any use (the e36 contract); the
    // derived slope/intercept/R² are then identical expression trees
    "e120_trend_regression" ->
      """WITH m AS (SELECT min(ts) AS t0 FROM events),
        |x AS (
        |  SELECT event_type,
        |    (CAST(epoch_us(ts) AS DOUBLE) - CAST(epoch_us(t0) AS DOUBLE))
        |      / CAST(86400000000 AS DOUBLE) AS xd,
        |    value AS y
        |  FROM events, m),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |    round(avg(xd), 6) AS mx, round(avg(y), 6) AS my,
        |    round(covar_pop(y, xd), 6) AS cxy,
        |    round(var_pop(xd), 6) AS vx, round(var_pop(y), 6) AS vy
        |  FROM x GROUP BY 1)
        |SELECT event_type, n,
        |  round(cxy / vx, 6) AS slope,
        |  round(my - (cxy / vx) * mx, 6) AS intercept,
        |  round((cxy * cxy) / (vx * vy), 6) AS r2
        |FROM a""".stripMargin,

    // one aggregate row unpivoted to long form on both engines
    "e121_corr_matrix" ->
      """WITH c AS (
        |  SELECT round(corr(l_quantity, l_extendedprice), 6) AS qp,
        |         round(corr(l_quantity, l_discount), 6) AS qd,
        |         round(corr(l_quantity, l_tax), 6) AS qt,
        |         round(corr(l_extendedprice, l_discount), 6) AS pd,
        |         round(corr(l_extendedprice, l_tax), 6) AS pt,
        |         round(corr(l_discount, l_tax), 6) AS dt
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        |  qp AS pearson FROM c
        |UNION ALL SELECT 'l_quantity', 'l_discount', qd FROM c
        |UNION ALL SELECT 'l_quantity', 'l_tax', qt FROM c
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', pd FROM c
        |UNION ALL SELECT 'l_extendedprice', 'l_tax', pt FROM c
        |UNION ALL SELECT 'l_discount', 'l_tax', dt FROM c"""
        .stripMargin,

    // exact integer counts; the row-normalizing division is the same
    // double operands on both engines
    "e122_markov_transitions" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM r WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE)
        |        / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE),
        |    6) AS p
        |FROM t""".stripMargin,

    // corr skips NULL leading pairs identically; order-dependent
    // co-moment → round 6
    "e123_acf" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    lag(value, 1) OVER w AS l1,
        |    lag(value, 2) OVER w AS l2,
        |    lag(value, 3) OVER w AS l3
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        |SELECT event_type,
        |  round(corr(value, l1), 6) AS acf1,
        |  round(corr(value, l2), 6) AS acf2,
        |  round(corr(value, l3), 6) AS acf3
        |FROM r GROUP BY 1""".stripMargin,

    // the oracle runs the NAIVE global sorted scan — the Spark-side
    // bucket prune is lossless and must be invisible in the result
    "e124_skyline" ->
      """WITH p AS (
        |  SELECT DISTINCT l_extendedprice AS price, l_quantity AS qty
        |  FROM lineitem),
        |s AS (
        |  SELECT price, qty,
        |    max(qty) OVER (ORDER BY price DESC, qty DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS best_q
        |  FROM p)
        |SELECT price, qty FROM s
        |WHERE best_q IS NULL OR qty > best_q""".stripMargin,

    // the replayed stream folds the identical (peak, maxDd) sequence —
    // the e118 oracle gates it verbatim
    "e125_streaming_drawdown_replay" -> drawdownOracle,

    // the peel chain unrolled to the same fixed 6 rounds the operator
    // runs (fixpoint in 2 on this graph; extra rounds are no-ops)
    "e126_kcore" -> kCoreOracle(k = 3, rounds = 6),

    // the textbook recursive-CTE BFS; min() merges multi-path visits
    // exactly like the operator's min-merge
    "e127_hop_distance" ->
      s"""WITH RECURSIVE $graphEdgeCtes,
        |seedv AS (SELECT min(src) AS seed FROM sym
        |          HAVING min(src) IS NOT NULL),
        |bfs AS (
        |  SELECT seed AS node, 0 AS d FROM seedv
        |  UNION
        |  SELECT e.dst AS node, b.d + 1 AS d
        |  FROM bfs b JOIN sym e ON e.src = b.node
        |  WHERE b.d < 8)
        |SELECT node, min(d) AS hops FROM bfs GROUP BY 1""".stripMargin,

    // the e24 tokenization feeds the e120 round-before-use regression
    "e128_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x != '')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
        |ranked AS (SELECT cnt,
        |  row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM cnt),
        |xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x,
        |              ln(CAST(cnt AS DOUBLE)) AS y FROM ranked),
        |a AS (
        |  SELECT count(*) AS n_terms,
        |    round(avg(x), 6) AS mx, round(avg(y), 6) AS my,
        |    round(covar_pop(y, x), 6) AS cxy,
        |    round(var_pop(x), 6) AS vx, round(var_pop(y), 6) AS vy
        |  FROM xy)
        |SELECT n_terms,
        |  round(cxy / vx, 6) AS slope,
        |  round(my - (cxy / vx) * mx, 6) AS intercept,
        |  round((cxy * cxy) / (vx * vy), 6) AS r2
        |FROM a""".stripMargin,

    // identical ln-ratio trees; only the order-dependent sum of
    // squares rounds
    "e129_realized_volatility" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value,
        |    lag(value) OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |lr AS (
        |  SELECT user_id, day, ln(value / prev) AS lr
        |  FROM r WHERE prev IS NOT NULL)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        |  count(*) AS n_ret,
        |  round(sum(lr * lr), 6) AS rv
        |FROM lr GROUP BY 1, 2""".stripMargin,

    // scaled central moments round BEFORE the derived algebra —
    // built-in skew/kurt aggregates differ cross-engine by design
    "e130_moment_stats" ->
      """WITH m AS (
        |  SELECT event_type,
        |    round(avg(value), 6) AS mean,
        |    round(avg(value / CAST(100 AS DOUBLE)), 6) AS mean_s
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type,
        |    e.value / CAST(100 AS DOUBLE) - m.mean_s AS ds, m.mean
        |  FROM events e JOIN m ON e.event_type = m.event_type),
        |a AS (
        |  SELECT event_type, count(*) AS n, any_value(mean) AS mean,
        |    round(avg(ds * ds), 6) AS m2,
        |    round(avg(ds * ds * ds), 6) AS m3,
        |    round(avg(ds * ds * ds * ds), 6) AS m4
        |  FROM d GROUP BY 1)
        |SELECT event_type, n, mean,
        |  round(sqrt(m2) * 100, 6) AS stddev_pop,
        |  round(m3 / power(m2, CAST(1.5 AS DOUBLE)), 6) AS skewness,
        |  round(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess
        |FROM a""".stripMargin,

    // exact integer counts under the same hot-key cap; identical
    // double divisions
    "e131_association_rules" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg0 AS (SELECT c FROM pairs GROUP BY c
        |         HAVING count(*) <= 1000),
        |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg0 USING (c)),
        |co AS (
        |  SELECT a.sp AS node_a, b.sp AS node_b, count(*) AS n_shared
        |  FROM capped a JOIN capped b ON a.c = b.c AND a.sp < b.sp
        |  GROUP BY 1, 2 HAVING count(*) >= 190),
        |supp AS (SELECT sp, count(*) AS supp FROM capped GROUP BY 1),
        |nb AS (SELECT count(DISTINCT c) AS n_baskets FROM capped)
        |SELECT node_a, node_b, n_shared,
        |  sa.supp AS supp_a, sb.supp AS supp_b,
        |  round(CAST(n_shared AS DOUBLE) / CAST(sa.supp AS DOUBLE), 6)
        |    AS conf_ab,
        |  round(CAST(n_shared AS DOUBLE) / CAST(sb.supp AS DOUBLE), 6)
        |    AS conf_ba,
        |  round(CAST(n_shared * n_baskets AS DOUBLE)
        |        / CAST(sa.supp * sb.supp AS DOUBLE), 6) AS lift
        |FROM co JOIN supp sa ON co.node_a = sa.sp
        |        JOIN supp sb ON co.node_b = sb.sp
        |        CROSS JOIN nb""".stripMargin,

    // two NTILE windows over (value, id) total orders — bucket fills
    // deterministic cross-engine (the e103 contract)
    "e132_quantile_normalize" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    ntile(10) OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS ref_bin,
        |    ntile(10) OVER (PARTITION BY lang, source
        |      ORDER BY n_chars, doc_id) AS bin
        |  FROM documents),
        |rm AS (
        |  SELECT lang, ref_bin AS bin,
        |    round(avg(n_chars), 6) AS normalized
        |  FROM b GROUP BY 1, 2)
        |SELECT b.doc_id, b.lang, b.source, b.n_chars,
        |  CAST(b.bin AS BIGINT) AS bin, rm.normalized
        |FROM b JOIN rm ON b.lang = rm.lang AND b.bin = rm.bin"""
        .stripMargin,

    // int64 cents × microsecond durations — exact accumulation (the
    // e119 fixed-point contract); one identical final division
    "e133_twap" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    lead(epoch_us(ts)) OVER
        |      (PARTITION BY user_id, CAST(ts AS DATE)
        |       ORDER BY ts, event_id) - epoch_us(ts) AS dt
        |  FROM events)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        |  count(*) AS n_seg,
        |  round(CAST(sum(cents * dt) AS DOUBLE)
        |        / CAST(sum(dt) * 100 AS DOUBLE), 6) AS twap
        |FROM r WHERE dt IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // the leading digit comes from the int64 cents STRING head —
    // exact, where float log10 misclassifies powers of ten
    "e134_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(
        |      CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE l_extendedprice > 0),
        |o AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |w AS (SELECT digit, n_obs, sum(n_obs) OVER () AS n FROM o),
        |p AS (SELECT digit, n_obs, n,
        |  round(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
        |        / ln(CAST(10 AS DOUBLE)), 6) AS benford_p FROM w)
        |SELECT digit, n_obs,
        |  round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS share,
        |  benford_p,
        |  round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * benford_p)
        |    * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * benford_p)
        |    / (CAST(n AS DOUBLE) * benford_p), 6) AS chi2_term
        |FROM p""".stripMargin,

    // the recursive walk carries UNROUNDED (s⁺, s⁻) through the
    // identical double arithmetic — bit-identical fold, rounded only
    // at the output surface
    "e135_cusum" -> cusumOracle,

    // the replayed stream folds the identical (s⁺, s⁻) sequence —
    // e135's oracle gates it verbatim
    "e136_streaming_cusum_replay" -> cusumOracle,

    // the e96 history rebuilt, then the as-of pick: the interval with
    // the latest valid_from <= ts (intervals tile the timeline, so
    // as-of equals containment)
    "e137_pit_dimension_join" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS island
        |  FROM flagged),
        |grp AS (
        |  SELECT user_id, island, event_type AS state_type,
        |    min(ts) AS valid_from
        |  FROM isl GROUP BY 1, 2, 3),
        |pit AS (
        |  SELECT e.user_id, e.event_id, e.ts, g.state_type,
        |    g.valid_from,
        |    row_number() OVER (PARTITION BY e.user_id, e.event_id
        |      ORDER BY g.valid_from DESC) AS rn
        |  FROM events e JOIN grp g
        |    ON e.user_id = g.user_id AND g.valid_from <= e.ts)
        |SELECT user_id, event_id, ts, state_type, valid_from
        |FROM pit WHERE rn = 1""".stripMargin,

    // the same causal ignore-nulls carry; freshness on microsecond
    // integers
    "e138_attribution" -> attributionOracle,

    // the same md5-derived bucket and sign-bit integer arithmetic
    "e139_feature_hash" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
        |  FROM tok)
        |SELECT doc_id, hv % 64 AS bucket,
        |  count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END)
        |       AS BIGINT) AS signed_sum
        |FROM h GROUP BY 1, 2""".stripMargin,

    // verdicts compare the ROUNDED rate to each rule's threshold
    "e140_expectations" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN value > 0 THEN 0 ELSE 1 END)
        |         AS BIGINT) AS v0,
        |    CAST(sum(CASE WHEN value <= CAST(100 AS DOUBLE)
        |         THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN event_type IN
        |          ('view','click','purchase','signup','error')
        |         THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |    CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END)
        |         AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01'
        |              AND ts < TIMESTAMP '2024-02-01'
        |         THEN 0 ELSE 1 END) AS BIGINT) AS v4
        |  FROM events)
        |SELECT 'value_positive' AS rule_name, v0 AS n_violations,
        |  round(CAST(v0 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS violation_rate,
        |  round(CAST(v0 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    <= CAST(0 AS DOUBLE) AS passed FROM a
        |UNION ALL SELECT 'value_le_100', v1,
        |  round(CAST(v1 AS DOUBLE) / CAST(n AS DOUBLE), 6),
        |  round(CAST(v1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    <= CAST(0.1 AS DOUBLE) FROM a
        |UNION ALL SELECT 'known_event_type', v2,
        |  round(CAST(v2 AS DOUBLE) / CAST(n AS DOUBLE), 6),
        |  round(CAST(v2 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    <= CAST(0 AS DOUBLE) FROM a
        |UNION ALL SELECT 'user_id_not_null', v3,
        |  round(CAST(v3 AS DOUBLE) / CAST(n AS DOUBLE), 6),
        |  round(CAST(v3 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    <= CAST(0 AS DOUBLE) FROM a
        |UNION ALL SELECT 'ts_in_window', v4,
        |  round(CAST(v4 AS DOUBLE) / CAST(n AS DOUBLE), 6),
        |  round(CAST(v4 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    <= CAST(0 AS DOUBLE) FROM a""".stripMargin,

    // tie-broken cume_dist = rank/n exactly on both engines
    "e141_cdf_transform" ->
      """SELECT event_id, event_type, value,
        |  round(cume_dist() OVER (PARTITION BY event_type
        |    ORDER BY value, event_id), 6) AS cdf
        |FROM events""".stripMargin,

    // the replayed stream carries the identical last touch — e138's
    // oracle gates it verbatim
    "e142_streaming_attribution_replay" -> attributionOracle,

    // decay weights are identical trees off the broadcast anchor; the
    // rank runs on the rounded score with the key tie-break
    "e143_trending_decay" ->
      """WITH mx AS (
        |  SELECT max(epoch_us(l_shipdate)) AS mts FROM lineitem),
        |w AS (
        |  SELECT l_suppkey,
        |    power(CAST(0.5 AS DOUBLE),
        |      (CAST(mts AS DOUBLE)
        |        - CAST(epoch_us(l_shipdate) AS DOUBLE))
        |        / CAST(86400000000 AS DOUBLE)
        |        / CAST(7 AS DOUBLE)) AS wgt
        |  FROM lineitem CROSS JOIN mx),
        |s AS (
        |  SELECT l_suppkey, count(*) AS n_items,
        |    round(sum(wgt), 6) AS score
        |  FROM w GROUP BY 1),
        |r AS (
        |  SELECT l_suppkey, n_items, score,
        |    row_number() OVER (ORDER BY score DESC, l_suppkey)
        |      AS rnk
        |  FROM s)
        |SELECT l_suppkey, n_items, score, rnk FROM r
        |WHERE rnk <= 20""".stripMargin,

    // the same rank-1 pick over the (ts, event_id) total order
    "e144_latest_state" ->
      """WITH r AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        |  event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1""".stripMargin,

    // presence-set algebra on (user, week): the same 7-day-shifted
    // self-joins
    "e145_churn_matrix" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events),
        |firstwk AS (
        |  SELECT user_id, min(wk) AS first_wk FROM p GROUP BY 1),
        |cur AS (
        |  SELECT p.user_id, p.wk,
        |    (p.wk = f.first_wk) AS is_new,
        |    (prev.user_id IS NOT NULL) AS was_prev
        |  FROM p JOIN firstwk f USING (user_id)
        |  LEFT JOIN p prev ON prev.user_id = p.user_id
        |    AND prev.wk = p.wk - INTERVAL 7 DAY),
        |churn AS (
        |  SELECT a.wk + INTERVAL 7 DAY AS wk, count(*) AS n_churned
        |  FROM p a LEFT JOIN p b ON a.user_id = b.user_id
        |    AND b.wk = a.wk + INTERVAL 7 DAY
        |  WHERE b.user_id IS NULL
        |  GROUP BY 1),
        |agg AS (
        |  SELECT wk, count(*) AS n_active,
        |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN was_prev THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_retained,
        |    CAST(sum(CASE WHEN NOT is_new AND NOT was_prev
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM cur GROUP BY 1)
        |SELECT a.wk, n_active, n_new, n_retained, n_resurrected,
        |  coalesce(c.n_churned, 0) AS n_churned_in
        |FROM agg a LEFT JOIN churn c ON a.wk = c.wk""".stripMargin,

    // integer epoch-day arithmetic for day-of-week; marginals as
    // window sums over the tiny cell table
    "e146_chisq_independence" ->
      """WITH d AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
        |  FROM events),
        |o AS (SELECT event_type, dow, count(*) AS n_obs
        |      FROM d GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, dow, n_obs,
        |    sum(n_obs) OVER (PARTITION BY event_type) AS row_tot,
        |    sum(n_obs) OVER (PARTITION BY dow) AS col_tot,
        |    sum(n_obs) OVER () AS n
        |  FROM o),
        |e AS (
        |  SELECT event_type, dow, n_obs,
        |    round(CAST(row_tot * col_tot AS DOUBLE)
        |          / CAST(n AS DOUBLE), 6) AS expected
        |  FROM t)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, n_obs,
        |  expected,
        |  round((CAST(n_obs AS DOUBLE) - expected)
        |        * (CAST(n_obs AS DOUBLE) - expected) / expected, 6)
        |    AS chi2_term
        |FROM e""".stripMargin,

    // the same 1-based postings and pos+1 adjacency join
    "e147_phrase_search" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, i AS pos, w[i] AS tok
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
        |        FROM tok)),
        |m AS (
        |  SELECT a.doc_id, a.pos
        |  FROM post a JOIN post b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.tok = 'table' AND b.tok = 'hash')
        |SELECT doc_id, count(*) AS n_matches,
        |  CAST(min(pos) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1""".stripMargin,

    // the merge rebuilt in SQL; both fingerprints must agree AND
    // match each other (fp_match is the semantic verdict)
    "e148_cdc_apply" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
        |         ELSE text END AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' new', lang, source,
        |    n_chars
        |  FROM documents WHERE doc_id % 13 = 0),
        |o AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
        |n AS (SELECT doc_id, md5(text) AS fp_new FROM v2),
        |st AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN fp_old <> fp_new THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
        |merged AS (
        |  SELECT d.* FROM documents d
        |  WHERE d.doc_id NOT IN
        |    (SELECT doc_id FROM st
        |     WHERE status IN ('removed', 'changed'))
        |  UNION ALL
        |  SELECT v.* FROM v2 v
        |  WHERE v.doc_id IN
        |    (SELECT doc_id FROM st
        |     WHERE status IN ('added', 'changed'))),
        |fm AS (
        |  SELECT count(*) AS n_merged,
        |    CAST(bit_xor(('0x' || substr(md5(concat_ws('|', doc_id,
        |      text, lang, source, n_chars)), 1, 15))::BIGINT)
        |      AS BIGINT) AS fp_merged
        |  FROM merged),
        |ft AS (
        |  SELECT count(*) AS n_target,
        |    CAST(bit_xor(('0x' || substr(md5(concat_ws('|', doc_id,
        |      text, lang, source, n_chars)), 1, 15))::BIGINT)
        |      AS BIGINT) AS fp_target
        |  FROM v2)
        |SELECT n_merged, n_target, fp_merged, fp_target,
        |  (n_merged = n_target AND fp_merged = fp_target) AS fp_match
        |FROM fm CROSS JOIN ft""".stripMargin,

    // GROUPING = Spark grouping_id (first column high bit); sums
    // rounded post-aggregate — the e89 contract, CUBE form
    "e149_cube_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n_items, round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // the same µs RANGE frames; value sums in int64 cents (a RANGE
    // frame re-aggregates per row — exactly where double partials
    // tree differently across engines)
    "e150_trailing_features" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    count(*) OVER w AS n_events_24h,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER w AS BIGINT) AS n_view_24h,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER w AS BIGINT) AS n_click_24h,
        |    CAST(sum(cents) OVER w AS BIGINT) AS sum_cents
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts, n_events_24h, n_view_24h,
        |  n_click_24h,
        |  round(CAST(sum_cents AS DOUBLE)
        |        / CAST(n_events_24h * 100 AS DOUBLE), 6)
        |    AS avg_value_24h
        |FROM f WHERE event_type = 'purchase'""".stripMargin,

    // the covariance rounds before the √; positive autocovariance
    // clamps to zero on both engines
    "e151_roll_spread" ->
      """WITH d AS (
        |  SELECT user_id,
        |    value - lag(value) OVER w AS dp,
        |    lag(value) OVER w - lag(value, 2) OVER w AS dp_prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, count(*) AS n_pairs,
        |    round(covar_pop(dp, dp_prev), 6) AS cov_dp
        |  FROM d WHERE dp IS NOT NULL AND dp_prev IS NOT NULL
        |  GROUP BY 1)
        |SELECT user_id, n_pairs, cov_dp,
        |  round(2 * sqrt(greatest(CAST(0 AS DOUBLE), -cov_dp)), 6)
        |    AS roll_spread
        |FROM c""".stripMargin,

    // two rounded population variances, one identical division
    "e152_variance_ratio" ->
      """WITH r AS (
        |  SELECT event_type,
        |    value - lag(value, 1) OVER w AS d1,
        |    value - lag(value, 4) OVER w AS d4
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type
        |    ORDER BY ts, event_id)),
        |a AS (
        |  SELECT event_type,
        |    round(var_pop(d1), 6) AS v1,
        |    round(var_pop(d4), 6) AS v4
        |  FROM r GROUP BY 1)
        |SELECT event_type, v1, v4,
        |  round(v4 / (CAST(4 AS DOUBLE) * v1), 6) AS vr4
        |FROM a""".stripMargin,

    // the e91 unroll with the teleport term concentrated on the seed
    "e154_personalized_pagerank" -> pprOracle(iters = 5),

    // half-rounds unrolled; the L1 normalizer rounds before each
    // division (both engines divide by the identical scalar)
    "e155_hits" -> hitsOracle(iters = 3),

    // the association-rule counts, cosine-normalized, ranked per item
    "e156_item_cf" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |deg0 AS (SELECT c FROM pairs GROUP BY c
        |         HAVING count(*) <= 1000),
        |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg0 USING (c)),
        |co AS (
        |  SELECT a.sp AS node_a, b.sp AS node_b, count(*) AS n_shared
        |  FROM capped a JOIN capped b
        |    ON a.c = b.c AND a.sp <> b.sp
        |  GROUP BY 1, 2 HAVING count(*) >= 150),
        |supp AS (SELECT sp, count(*) AS supp FROM capped GROUP BY 1),
        |simt AS (
        |  SELECT node_a, node_b, n_shared,
        |    round(CAST(n_shared AS DOUBLE)
        |      / sqrt(CAST(sa.supp AS DOUBLE)
        |             * CAST(sb.supp AS DOUBLE)), 6) AS cosine
        |  FROM co JOIN supp sa ON co.node_a = sa.sp
        |          JOIN supp sb ON co.node_b = sb.sp),
        |rk AS (
        |  SELECT node_a, node_b, n_shared, cosine,
        |    row_number() OVER (PARTITION BY node_a
        |      ORDER BY cosine DESC, node_b) AS rnk
        |  FROM simt)
        |SELECT node_a, node_b, n_shared, cosine,
        |  CAST(rnk AS BIGINT) AS rnk
        |FROM rk WHERE rnk <= 3""".stripMargin,

    // the e16 CC closure extended with the per-field survivor rules;
    // singletons backfill via the left join
    "e158_golden_record" ->
      s"""WITH RECURSIVE $ccCtes,
        |assign AS (
        |  SELECT d.doc_id,
        |    coalesce(c.cluster_id, d.doc_id) AS cluster_id,
        |    d.n_chars, d.lang
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |rep AS (
        |  SELECT cluster_id, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM assign),
        |lv AS (SELECT cluster_id, lang, count(*) AS c
        |       FROM assign GROUP BY 1, 2),
        |lr AS (
        |  SELECT cluster_id, lang,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY c DESC, lang) AS rn
        |  FROM lv),
        |base AS (
        |  SELECT cluster_id, count(*) AS n_members,
        |    min(doc_id) AS keep_id
        |  FROM assign GROUP BY 1)
        |SELECT b.cluster_id, b.n_members, b.keep_id,
        |  r.doc_id AS rep_doc_id, r.n_chars AS rep_n_chars,
        |  l.lang AS majority_lang
        |FROM base b
        |JOIN rep r ON b.cluster_id = r.cluster_id AND r.rn = 1
        |JOIN lr l ON b.cluster_id = l.cluster_id AND l.rn = 1"""
        .stripMargin,

    // the e39 funnel chain feeding interpolated percentiles (the e36
    // quantile parity contract)
    "e159_conversion_latency" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
        |  GROUP BY 1),
        |lat AS (
        |  SELECT (CAST(epoch_us(p.purchase_ts) AS DOUBLE)
        |          - CAST(epoch_us(v.view_ts) AS DOUBLE))
        |         / CAST(1000000 AS DOUBLE) AS latency_s
        |  FROM v JOIN p USING (user_id))
        |SELECT count(*) AS n_converted,
        |  round(quantile_cont(latency_s, CAST(0.5 AS DOUBLE)), 6)
        |    AS p50_s,
        |  round(quantile_cont(latency_s, CAST(0.9 AS DOUBLE)), 6)
        |    AS p90_s,
        |  round(avg(latency_s), 6) AS avg_s
        |FROM lat""".stripMargin,

    // the same two 4-metric profiles; the drift flag compares the
    // ROUNDED delta to the relative threshold
    "e160_profile_drift" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
        |         ELSE text END AS text,
        |    lang, source,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 3
        |         ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' new', lang, source,
        |    n_chars + 4
        |  FROM documents WHERE doc_id % 13 = 0),
        |p1 AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
        |    round(avg(n_chars), 6) AS avg_n_chars,
        |    CAST(count(DISTINCT lang) AS DOUBLE) AS distinct_lang,
        |    CAST(count(DISTINCT source) AS DOUBLE) AS distinct_source
        |  FROM documents),
        |p2 AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
        |    round(avg(n_chars), 6) AS avg_n_chars,
        |    CAST(count(DISTINCT lang) AS DOUBLE) AS distinct_lang,
        |    CAST(count(DISTINCT source) AS DOUBLE) AS distinct_source
        |  FROM v2),
        |u AS (
        |  SELECT 'n_rows' AS metric, p1.n_rows AS v1, p2.n_rows AS v2
        |  FROM p1, p2
        |  UNION ALL SELECT 'avg_n_chars', p1.avg_n_chars,
        |    p2.avg_n_chars FROM p1, p2
        |  UNION ALL SELECT 'distinct_lang', p1.distinct_lang,
        |    p2.distinct_lang FROM p1, p2
        |  UNION ALL SELECT 'distinct_source', p1.distinct_source,
        |    p2.distinct_source FROM p1, p2)
        |SELECT metric, v1, v2, round(v2 - v1, 6) AS delta,
        |  abs(round(v2 - v1, 6)) > CAST(0.01 AS DOUBLE) * v1
        |    AS drifted
        |FROM u""".stripMargin,

    // exact integer counts; rates, pooled rate, and z all round
    // before use — the verdict can never flip on a last ulp
    "e161_ab_ztest" ->
      """WITH arms AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END) >= 15
        |         THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM arms),
        |r AS (
        |  SELECT n_a, conv_a, n_b, conv_b,
        |    round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
        |      AS rate_a,
        |    round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
        |      AS rate_b,
        |    round(CAST(conv_a + conv_b AS DOUBLE)
        |          / CAST(n_a + n_b AS DOUBLE), 6) AS pooled
        |  FROM s)
        |SELECT n_a, conv_a, n_b, conv_b, rate_a, rate_b,
        |  round((rate_a - rate_b)
        |    / sqrt(pooled * (1 - pooled)
        |      * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
        |    6) AS z,
        |  abs(round((rate_a - rate_b)
        |    / sqrt(pooled * (1 - pooled)
        |      * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
        |    6)) > CAST(1.96 AS DOUBLE) AS significant
        |FROM r""".stripMargin,

    // the product-limit walk over the aggregated duration table;
    // exact integer ratios inside ln, terminal zero guarded
    "e162_kaplan_meier" ->
      """WITH horizon AS (SELECT max(epoch_us(ts)) AS hus FROM events),
        |seq AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |obs AS (
        |  SELECT CASE WHEN next_us IS NOT NULL
        |         THEN (next_us - us) // 3600000000
        |         ELSE ((SELECT hus FROM horizon) - us) // 3600000000
        |         END AS t,
        |    CASE WHEN next_us IS NOT NULL THEN 1 ELSE 0 END AS died
        |  FROM seq),
        |n AS (SELECT count(*) AS n0 FROM obs),
        |ev AS (
        |  SELECT t, CAST(sum(died) AS BIGINT) AS d,
        |    count(*) AS leaving
        |  FROM obs GROUP BY 1),
        |risk AS (
        |  SELECT t, d,
        |    (SELECT n0 FROM n)
        |      - coalesce(sum(leaving) OVER (ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0) AS n_at_risk
        |  FROM ev),
        |km AS (
        |  SELECT t, d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |    CASE WHEN max(CASE WHEN n_at_risk = d AND d > 0
        |                  THEN 1 ELSE 0 END) OVER w = 1
        |         THEN CAST(0 AS DOUBLE)
        |         ELSE round(exp(sum(
        |           CASE WHEN n_at_risk > d
        |                THEN ln(CAST(n_at_risk - d AS DOUBLE)
        |                        / CAST(n_at_risk AS DOUBLE))
        |                ELSE CAST(0 AS DOUBLE) END) OVER w), 6)
        |    END AS survival
        |  FROM risk
        |  WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT t, d, n_at_risk, survival FROM km""".stripMargin,

    // int64-cents rank formula: wsum and tot exact, one division
    "e163_gini_concentration" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rk
        |  FROM c),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS tot,
        |    CAST(sum(rk * cents) AS BIGINT) AS wsum
        |  FROM r GROUP BY 1)
        |SELECT event_type, n,
        |  round(CAST(2 * wsum AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |        - (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |    AS gini
        |FROM a""".stripMargin,

    // exact integer masses; share squares sum over the source table
    "e164_hhi_sources" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nd,
        |             CAST(sum(chars) AS BIGINT) AS nc FROM s)
        |SELECT count(*) AS n_sources,
        |  round(sum((CAST(n_docs AS DOUBLE) / CAST(nd AS DOUBLE))
        |          * (CAST(n_docs AS DOUBLE) / CAST(nd AS DOUBLE))), 6)
        |    AS hhi_docs,
        |  round(sum((CAST(chars AS DOUBLE) / CAST(nc AS DOUBLE))
        |          * (CAST(chars AS DOUBLE) / CAST(nc AS DOUBLE))), 6)
        |    AS hhi_chars
        |FROM s CROSS JOIN t""".stripMargin,

    // exact counts; ln ratios identical trees; the evenness
    // denominator rounds before the division
    "e165_behavior_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt,
        |        count(*) AS n_types
        |        FROM c GROUP BY 1),
        |h AS (
        |  SELECT c.user_id,
        |    round(-sum((CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
        |            * ln(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))), 6)
        |      AS entropy,
        |    any_value(n_types) AS n_types, any_value(nt) AS n_events
        |  FROM c JOIN tot USING (user_id) GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_types AS BIGINT) AS n_types, entropy,
        |  CASE WHEN n_types = 1 THEN CAST(0 AS DOUBLE)
        |       ELSE round(entropy
        |         / round(ln(CAST(n_types AS DOUBLE)), 6), 6)
        |  END AS evenness
        |FROM h""".stripMargin,

    // the same cell table; marginals as window sums; one rounding
    "e166_mutual_information" ->
      """WITH d AS (
        |  SELECT event_type AS x,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS y
        |  FROM events),
        |j AS (SELECT x, y, count(*) AS nxy FROM d GROUP BY 1, 2),
        |t AS (
        |  SELECT x, y, nxy,
        |    sum(nxy) OVER (PARTITION BY x) AS nx,
        |    sum(nxy) OVER (PARTITION BY y) AS ny,
        |    sum(nxy) OVER () AS n
        |  FROM j)
        |SELECT round(sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
        |         / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 6)
        |    AS mutual_information,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(any_value(n) AS BIGINT) AS n_events
        |FROM t""".stripMargin,

    // the identical md5-derived draws (derived randomness, never
    // RNG); resample means in exact cents; percentile parity (e36)
    "e169_bootstrap_ci" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rk
        |  FROM events),
        |n AS (SELECT event_type, count(*) AS nt FROM r GROUP BY 1),
        |draws AS (
        |  SELECT r.event_type, b.b,
        |    ('0x' || substr(md5(concat('bs|', r.event_type, '|',
        |      CAST(b.b AS VARCHAR), '|', CAST(r.rk AS VARCHAR))),
        |      1, 15))::BIGINT % n.nt + 1 AS idx
        |  FROM r JOIN n USING (event_type)
        |  CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
        |picked AS (
        |  SELECT d.event_type, d.b, r2.cents
        |  FROM draws d JOIN r r2
        |    ON d.event_type = r2.event_type AND d.idx = r2.rk),
        |means AS (
        |  SELECT p.event_type, p.b,
        |    round(CAST(sum(cents) AS DOUBLE)
        |          / CAST(n.nt * 100 AS DOUBLE), 6) AS m
        |  FROM picked p JOIN n ON p.event_type = n.event_type
        |  GROUP BY 1, 2, n.nt),
        |base AS (
        |  SELECT event_type,
        |    round(CAST(sum(cents) AS DOUBLE)
        |          / CAST(count(*) * 100 AS DOUBLE), 6) AS mean_value
        |  FROM r GROUP BY 1)
        |SELECT m.event_type, any_value(base.mean_value) AS mean_value,
        |  round(quantile_cont(m, CAST(0.025 AS DOUBLE)), 6) AS ci_lo,
        |  round(quantile_cont(m, CAST(0.975 AS DOUBLE)), 6) AS ci_hi,
        |  count(*) AS n_resamples
        |FROM means m JOIN base ON m.event_type = base.event_type
        |GROUP BY 1""".stripMargin,

    // the k+1-rank threshold joined back; ln-sum rounds before the
    // one division
    "e170_hill_tail" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events),
        |xm AS (SELECT event_type, value AS xmin FROM r
        |       WHERE rk = 101),
        |s AS (
        |  SELECT r.event_type,
        |    round(sum(ln(r.value / xm.xmin)), 6) AS lnsum,
        |    any_value(xm.xmin) AS xmin
        |  FROM r JOIN xm USING (event_type)
        |  WHERE r.rk <= 100
        |  GROUP BY 1)
        |SELECT event_type, CAST(100 AS BIGINT) AS k, xmin,
        |  round(CAST(100 AS DOUBLE) / lnsum, 6) AS alpha_hat
        |FROM s""".stripMargin,

    // the identical unrolled rounds with round-boundary rounding
    "e171_markov_steady_state" -> markovSteadyOracle(rounds = 12),

    // the e103 NTILE bins; exact cell counts, one integer comparison
    "e172_k_anonymity" ->
      """WITH bins AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |    ntile(10) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS vbin
        |  FROM events)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(vbin AS BIGINT) AS vbin, count(*) AS n_rows,
        |  count(*) < 25 AS at_risk
        |FROM bins GROUP BY 1, 2, 3""".stripMargin,

    // the identical 10 merge rounds unrolled; greedy non-overlap =
    // take even offsets within each island of consecutive matches
    "e173_bpe_train" -> bpeTrainOracle(merges = 10),

    // the unrolled chain's FINAL stage vs s0 — rank-ordered rule
    // application equals the training loop's last state
    "e175_bpe_apply" -> bpeApplyOracle(merges = 10),
    "e195_bpe_vocab_train" -> charBpeVocabOracle(extra = 18),
    "e203_bpe_vocab_apply" -> charBpeApplyOracle(extra = 18),

    // the 32-bin histogram rebuilt in SQL; identical interpolation
    // trees, exact quantile via quantile_cont, rounded stats compared
    "e177_histogram_quantiles" -> histQuantileOracle,

    // additive bin counts: the merged per-batch store equals the
    // batch histogram exactly — e177's oracle verbatim
    "e178_streaming_histogram_replay" -> histQuantileOracle,

    // Bellman-Ford relaxation unrolled to 16 rounds (the graph
    // settles well inside; extra rounds are no-ops) over the
    // weighted symmetrized projection
    "e180_weighted_shortest_path" -> wspOracle(rounds = 16),
    "e201_label_propagation" -> lpaOracle(rounds = 6),

    // the BT.601 conversion evaluated from the block formulas at
    // replication-upsampled coords; round-then-clamp agrees across
    // the engines' rounding conventions (see the query comment)
    "e187_jpeg_rgb_rows" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    16*(1 + doc_id % 3) AS w, 16*(1 + doc_id % 2) AS h
        |  FROM documents),
        |yy AS (SELECT doc_id, w,
        |         unnest(generate_series(0, h - 1)) AS y FROM g),
        |xx AS (SELECT doc_id, w, y,
        |         unnest(generate_series(0, w - 1)) AS x FROM yy),
        |pv AS (
        |  SELECT doc_id, y, x,
        |    2*((doc_id*5 + 3*(x//8) + 7*(y//8)) % 128) AS yv,
        |    17*(((doc_id*3 + (x//2)//8 + 2*((y//2)//8)) % 15) - 7)
        |      AS cb_c,
        |    17*(((doc_id*11 + 2*((x//2)//8) + (y//2)//8) % 15) - 7)
        |      AS cr_c
        |  FROM xx),
        |ch AS (
        |  SELECT doc_id, y, x,
        |    least(255, greatest(0, CAST(round(
        |      yv + CAST(1.402 AS DOUBLE) * cr_c) AS BIGINT))) AS r,
        |    least(255, greatest(0, CAST(round(
        |      yv - CAST(0.344136 AS DOUBLE) * cb_c
        |         - CAST(0.714136 AS DOUBLE) * cr_c) AS BIGINT))) AS gg,
        |    least(255, greatest(0, CAST(round(
        |      yv + CAST(1.772 AS DOUBLE) * cb_c) AS BIGINT))) AS b
        |  FROM pv)
        |SELECT doc_id, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(gg) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max((299*r + 587*gg + 114*b) // 1000) AS BIGINT)
        |    AS max_lum,
        |  CAST(arg_min(r*65536 + gg*256 + b, x) AS BIGINT) AS first_px,
        |  CAST(arg_max(r*65536 + gg*256 + b, x) AS BIGINT) AS last_px
        |FROM ch GROUP BY 1, 2""".stripMargin,

    // the identical lead-chain trigram counts with the full tie-break
    "e184_event_trigrams" ->
      """WITH t AS (
        |  SELECT event_type AS t1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t3
        |  FROM events)
        |SELECT t1, t2, t3, count(*) AS cnt FROM t
        |WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, t1, t2, t3 LIMIT 20""".stripMargin,

    // the identical substring/CASE checksum arithmetic
    "e185_luhn_card_validation" -> {
      val terms = (1 to 16).map { i =>
        val d = s"CAST(substr(cc, $i, 1) AS INTEGER)"
        if (i % 2 == 1)
          s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
        else d
      }.mkString("\n      + ")
      s"""WITH c AS (
        |  SELECT doc_id,
        |    '4' || lpad(CAST((doc_id*7919 + 123457)
        |      % 1000000000000000 AS VARCHAR), 15, '0') AS cc
        |  FROM documents)
        |SELECT doc_id, cc AS cc_candidate,
        |  ($terms) % 10 = 0 AS luhn_valid
        |FROM c""".stripMargin
    },

    // union-by-name semantics derived from the base table: even docs
    // are the v1 generation (no lang column -> NULL)
    "e186_schema_evolution_read" ->
      """SELECT CASE WHEN doc_id % 2 = 1 THEN lang END AS lang,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,

    // the identical 5 weighted rounds unrolled; rank·w/sw mirrors the
    // operator's expression tree term for term
    "e183_weighted_pagerank" -> {
      val iters = (1 to 5).map { k =>
        s"""r$k AS (
          |  SELECT n.node,
          |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
          |      + CAST(0.85 AS DOUBLE)
          |        * coalesce(s.c, CAST(0 AS DOUBLE)) AS rank
          |  FROM nodes n CROSS JOIN nn LEFT JOIN (
          |    SELECT e.dst AS node, sum(r.rank * e.w / e.sw) AS c
          |    FROM topo e JOIN r${k - 1} r ON e.src = r.node
          |    GROUP BY 1) s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $graphEdgeCtes,
        |egw AS (
        |  SELECT a.sp AS node_a, b.sp AS node_b, count(*) AS n_shared
        |  FROM capped a JOIN capped b ON a.c = b.c AND a.sp < b.sp
        |  GROUP BY 1, 2 HAVING count(*) >= 190),
        |symw AS (
        |  SELECT node_a AS src, node_b AS dst, n_shared AS w FROM egw
        |  UNION ALL SELECT node_b, node_a, n_shared FROM egw),
        |outw AS (SELECT src, sum(w) AS sw FROM symw GROUP BY 1),
        |topo AS (SELECT s.src, s.dst, s.w, o.sw
        |         FROM symw s JOIN outw o USING (src)),
        |nodes AS (SELECT DISTINCT src AS node FROM symw),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
        |       FROM nodes CROSS JOIN nn),
        |$iters
        |SELECT r5.node, round(r5.rank * nn.n, 6) AS wrank_scaled
        |FROM r5 CROSS JOIN nn""".stripMargin
    },

    // both cell sets rebuilt in SQL (identical md5 buckets), the
    // inner product min'd over rows, exact join size alongside
    "e182_cms_join_cardinality" ->
      """WITH jj AS (SELECT unnest(range(0, 4)) AS j),
        |a AS (SELECT user_id FROM events WHERE event_id % 2 = 0),
        |b AS (SELECT user_id FROM events WHERE event_id % 2 != 0),
        |ca AS (
        |  SELECT j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h,
        |    count(*) AS c
        |  FROM a, jj GROUP BY 1, 2),
        |cb AS (
        |  SELECT j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h,
        |    count(*) AS c
        |  FROM b, jj GROUP BY 1, 2),
        |ip AS (
        |  SELECT ca.j, CAST(sum(ca.c * cb.c) AS BIGINT) AS ip
        |  FROM ca JOIN cb USING (j, h) GROUP BY 1),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join FROM ip),
        |ex AS (
        |  SELECT CAST(coalesce(sum(x.na * y.nb), 0) AS BIGINT)
        |    AS exact_join
        |  FROM (SELECT user_id, count(*) AS na FROM a GROUP BY 1) x
        |  JOIN (SELECT user_id, count(*) AS nb FROM b GROUP BY 1) y
        |    USING (user_id))
        |SELECT est_join, exact_join,
        |  est_join >= exact_join AS never_under,
        |  round((CAST(est_join AS DOUBLE) - CAST(exact_join AS DOUBLE))
        |        / CAST(exact_join AS DOUBLE), 6) AS rel_overestimate
        |FROM est CROSS JOIN ex""".stripMargin,

    // the oscillating signal's per-frame DSP features evaluated from
    // the formula directly (within-frame neighbor sign flips, exact
    // integer energy and peak)
    "e181_audio_zcr_energy" ->
      """WITH g AS (
        |  SELECT doc_id, 300 + doc_id % 200 AS len FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, len)) AS i FROM g),
        |v AS (SELECT doc_id, i,
        |        (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM s),
        |f AS (SELECT doc_id, i // 256 AS frame_idx, s,
        |        lag(s) OVER (PARTITION BY doc_id, i // 256 ORDER BY i)
        |          AS prev
        |      FROM v)
        |SELECT doc_id, frame_idx, count(*) AS n_samples,
        |  CAST(sum(CASE WHEN prev IS NOT NULL
        |                 AND ((prev < 0) != (s < 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM f GROUP BY 1, 2""".stripMargin,

    // the per-channel formula: left = the e181 signal, right =
    // truncating half minus a small sawtooth (DuckDB // truncates
    // toward zero, mirrored by Scala Int division)
    "e208_flac_stereo_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 300 + doc_id % 200 AS len FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, len)) AS i FROM g),
        |v AS (SELECT doc_id, i,
        |        (doc_id*31 + i*7919) % 65536 - 32768 AS l FROM s),
        |c AS (SELECT doc_id, i, 'l' AS channel, l AS s FROM v
        |      UNION ALL
        |      SELECT doc_id, i, 'r', (l // 2) - (i % 7) FROM v),
        |f AS (SELECT doc_id, channel, i // 256 AS frame_idx, s,
        |        lag(s) OVER (PARTITION BY doc_id, channel, i // 256
        |          ORDER BY i) AS prev
        |      FROM c)
        |SELECT doc_id, channel, frame_idx, count(*) AS n_samples,
        |  CAST(sum(CASE WHEN prev IS NOT NULL
        |                 AND ((prev < 0) != (s < 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM f GROUP BY 1, 2, 3""".stripMargin,

    // identical expected rows — the LPC-coded FLAC path decodes the
    // same signal (lossless for any coefficient choice)
    "e209_flac_lpc_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 300 + doc_id % 200 AS len FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, len)) AS i FROM g),
        |v AS (SELECT doc_id, i,
        |        (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM s),
        |f AS (SELECT doc_id, i // 256 AS frame_idx, s,
        |        lag(s) OVER (PARTITION BY doc_id, i // 256 ORDER BY i)
        |          AS prev
        |      FROM v)
        |SELECT doc_id, frame_idx, count(*) AS n_samples,
        |  CAST(sum(CASE WHEN prev IS NOT NULL
        |                 AND ((prev < 0) != (s < 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM f GROUP BY 1, 2""".stripMargin,

    // identical expected rows — the FLAC path decodes the same signal
    "e204_flac_codec_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 300 + doc_id % 200 AS len FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, len)) AS i FROM g),
        |v AS (SELECT doc_id, i,
        |        (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM s),
        |f AS (SELECT doc_id, i // 256 AS frame_idx, s,
        |        lag(s) OVER (PARTITION BY doc_id, i // 256 ORDER BY i)
        |          AS prev
        |      FROM v)
        |SELECT doc_id, frame_idx, count(*) AS n_samples,
        |  CAST(sum(CASE WHEN prev IS NOT NULL
        |                 AND ((prev < 0) != (s < 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  CAST(sum(s*s) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(s)) AS BIGINT) AS peak
        |FROM f GROUP BY 1, 2""".stripMargin,

    // e193's interpolation chain over window-summed panes, exact
    // quantile_cont over each 3-day span
    "e205_sliding_histogram_quantiles" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS grp, value
        |           FROM events),
        |wins AS (SELECT DISTINCT grp AS w FROM e),
        |pane AS (
        |  SELECT grp,
        |    least(31, CAST(floor(value / CAST(16 AS DOUBLE))
        |      AS BIGINT)) AS bin,
        |    count(*) AS c
        |  FROM e GROUP BY 1, 2),
        |cells AS (
        |  SELECT wins.w, pane.bin, CAST(sum(pane.c) AS BIGINT) AS c
        |  FROM pane JOIN wins
        |    ON pane.grp BETWEEN wins.w - 2 AND wins.w
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT w, bin, c,
        |    coalesce(sum(c) OVER (PARTITION BY w ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM cells),
        |n AS (SELECT w, CAST(sum(c) AS DOUBLE) AS n_rows FROM cells
        |      GROUP BY 1),
        |probs(i, prob) AS (VALUES (0, CAST(0.5 AS DOUBLE)),
        |  (1, CAST(0.9 AS DOUBLE)), (2, CAST(0.99 AS DOUBLE))),
        |t AS (SELECT n.w, p.i, p.prob, p.prob * n.n_rows AS target
        |      FROM n CROSS JOIN probs p),
        |ew AS (SELECT wins.w, e.value FROM e JOIN wins
        |       ON e.grp BETWEEN wins.w - 2 AND wins.w),
        |ex AS (SELECT w,
        |         quantile_cont(value, [CAST(0.5 AS DOUBLE),
        |           CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS qs
        |       FROM ew GROUP BY 1),
        |sel AS (
        |  SELECT t.w, t.i, t.prob, t.target, u.bin, u.c, u.cum_before
        |  FROM t JOIN cum u ON t.w = u.w
        |   AND CAST(u.cum_before AS DOUBLE) < t.target
        |   AND t.target <= CAST(u.cum_before + u.c AS DOUBLE))
        |SELECT s.w AS dayord, s.prob,
        |  round(CAST(16 AS DOUBLE) * s.bin
        |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
        |      / CAST(s.c AS DOUBLE), 6) AS est_q,
        |  round(ex.qs[s.i + 1], 6) AS exact_q,
        |  round(abs(CAST(16 AS DOUBLE) * s.bin
        |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
        |      / CAST(s.c AS DOUBLE) - ex.qs[s.i + 1]), 6)
        |    <= CAST(16 AS DOUBLE) AS within_bin
        |FROM sel s JOIN ex ON s.w = ex.w""".stripMargin,

    // the closed-form two-tone spectrum evaluated from doc_id: the
    // only nonzero bins are 64 (power (a1·128)²) and 128 ((a2·256)²),
    // so dominant/centroid/rolloff/log-power are exact integer
    // arithmetic + round-6 ratios
    "e194_audio_spectrum" ->
      """WITH g AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS k,
        |    2*(doc_id % 350) + 201 AS a1,
        |    100 + doc_id % 250 AS a2
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, k,
        |    CAST(a1*128 AS BIGINT) * CAST(a1*128 AS BIGINT) AS p1,
        |    CAST(a2*256 AS BIGINT) * CAST(a2*256 AS BIGINT) AS p2
        |  FROM g),
        |f AS (SELECT doc_id, unnest(range(0, k)) AS frame_idx, p1, p2
        |      FROM p)
        |SELECT doc_id, frame_idx, CAST(256 AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN p1 >= p2 THEN 64 ELSE 128 END AS BIGINT)
        |    AS dominant_bin,
        |  round((64*p1 + 128*p2) / CAST(p1 + p2 AS DOUBLE), 6)
        |    AS centroid,
        |  CAST(CASE WHEN p1 >= CAST(0.85 AS DOUBLE) * (p1 + p2)
        |       THEN 64 ELSE 128 END AS BIGINT) AS rolloff_bin,
        |  round(log10(CAST(p1 + p2 AS DOUBLE)), 6) AS log_power
        |FROM f""".stripMargin,

    // the identical 64 registers rebuilt in SQL (md5 hash parity,
    // integer CASE-chain rho, exact-integer harmonic sum)
    "e179_hll_cardinality" ->
      (hllOracleBranch("user_id") + "\nUNION ALL\n" +
        hllOracleBranch("event_id")),

    // the per-type histogram rebuilt in SQL (window partitioned by
    // group), identical interpolation trees, per-group quantile_cont
    "e193_grouped_histogram_quantiles" ->
      """WITH cells AS (
        |  SELECT event_type AS grp,
        |    least(31, CAST(floor(value / CAST(16 AS DOUBLE))
        |      AS BIGINT)) AS bin,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT grp, bin, c,
        |    coalesce(sum(c) OVER (PARTITION BY grp ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM cells),
        |n AS (SELECT grp, CAST(sum(c) AS DOUBLE) AS n_rows FROM cells
        |      GROUP BY 1),
        |probs(i, prob) AS (VALUES (0, CAST(0.5 AS DOUBLE)),
        |  (1, CAST(0.9 AS DOUBLE)), (2, CAST(0.99 AS DOUBLE))),
        |t AS (SELECT n.grp, p.i, p.prob, p.prob * n.n_rows AS target
        |      FROM n CROSS JOIN probs p),
        |ex AS (SELECT event_type AS grp,
        |         quantile_cont(value, [CAST(0.5 AS DOUBLE),
        |           CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS qs
        |       FROM events GROUP BY 1),
        |sel AS (
        |  SELECT t.grp, t.i, t.prob, t.target, u.bin, u.c, u.cum_before
        |  FROM t JOIN cum u ON t.grp = u.grp
        |   AND CAST(u.cum_before AS DOUBLE) < t.target
        |   AND t.target <= CAST(u.cum_before + u.c AS DOUBLE))
        |SELECT s.grp AS event_type, s.prob,
        |  round(CAST(16 AS DOUBLE) * s.bin
        |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
        |      / CAST(s.c AS DOUBLE), 6) AS est_q,
        |  round(ex.qs[s.i + 1], 6) AS exact_q,
        |  round(abs(CAST(16 AS DOUBLE) * s.bin
        |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
        |      / CAST(s.c AS DOUBLE) - ex.qs[s.i + 1]), 6)
        |    <= CAST(16 AS DOUBLE) AS within_bin
        |FROM sel s JOIN ex ON s.grp = ex.grp""".stripMargin,

    // the 4:2:2 plane formulas: chroma at half WIDTH, full height
    "e192_jpeg_422_rows" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    16*(1 + doc_id % 3) AS w, 8*(1 + doc_id % 2) AS h
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, 'y' AS plane, w AS pw, h AS ph FROM g
        |  UNION ALL SELECT doc_id, 'cb', w//2, h FROM g
        |  UNION ALL SELECT doc_id, 'cr', w//2, h FROM g),
        |yy AS (SELECT doc_id, plane, pw,
        |         unnest(generate_series(0, ph - 1)) AS y FROM pl),
        |xx AS (SELECT doc_id, plane, y,
        |         unnest(generate_series(0, pw - 1)) AS x FROM yy),
        |px AS (
        |  SELECT doc_id, plane, y, x,
        |    CASE plane
        |      WHEN 'y' THEN 2*((doc_id*5 + 3*(x//8) + 7*(y//8)) % 128)
        |      WHEN 'cb' THEN
        |        128 + 17*(((doc_id*3 + (x//8) + 2*(y//8)) % 15) - 7)
        |      ELSE 128 + 17*(((doc_id*11 + 2*(x//8) + (y//8)) % 15) - 7)
        |    END AS v
        |  FROM xx)
        |SELECT doc_id, plane, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(max(v) AS BIGINT) AS max_v,
        |  CAST(arg_min(v, x) AS BIGINT) AS first_v,
        |  CAST(arg_max(v, x) AS BIGINT) AS last_v
        |FROM px GROUP BY 1, 2, 3""".stripMargin,

    // the decoded text must fingerprint identically to the base
    // table (md5 over the same UTF-8 bytes; length in codepoints)
    "e191_gzip_text_blobs" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  md5(text) AS fp
        |FROM documents""".stripMargin,

    // identical exact interpolated percentiles, rounded before use
    "e189_latency_percentiles" ->
      """SELECT event_type, count(*) AS n_rows,
        |  round(quantile_cont(value, CAST(0.5 AS DOUBLE)), 6) AS p50,
        |  round(quantile_cont(value, CAST(0.9 AS DOUBLE)), 6) AS p90,
        |  round(quantile_cont(value, CAST(0.99 AS DOUBLE)), 6) AS p99
        |FROM events GROUP BY 1""".stripMargin,

    // the e179 registers partitioned by day — same hash, rho chain,
    // and exact-integer harmonic arithmetic, group-wise
    "e190_windowed_hll" -> hllWindowedOracle,
    "e196_sliding_hll" -> hllSlidingOracle,
    // max-merged per-batch partials == the batch registers exactly
    "e202_streaming_sliding_hll_replay" -> hllSlidingOracle,
    "e207_hll_set_ops" -> hllSetOpsOracle,

    // per-day cells rebuilt in SQL, summed over each 3-day window
    // (`pane.grp BETWEEN w−2 AND w` ≡ the Spark pane→windows
    // explode), min-of-rows probe, exact window counts
    "e200_sliding_cms_heavy" ->
      """WITH jj AS (SELECT unnest(range(0, 4)) AS j),
        |e AS (SELECT epoch_us(ts) // 86400000000 AS grp, user_id
        |      FROM events),
        |wins AS (SELECT DISTINCT grp AS w FROM e),
        |pane AS (
        |  SELECT grp, j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h,
        |    count(*) AS c
        |  FROM e, jj GROUP BY 1, 2, 3),
        |wc AS (SELECT wins.w, pane.j, pane.h,
        |         CAST(sum(pane.c) AS BIGINT) AS c
        |       FROM pane JOIN wins
        |         ON pane.grp BETWEEN wins.w - 2 AND wins.w
        |       GROUP BY 1, 2, 3),
        |wu AS (SELECT DISTINCT wins.w, e.user_id
        |       FROM e JOIN wins
        |         ON e.grp BETWEEN wins.w - 2 AND wins.w),
        |probe AS (
        |  SELECT w, user_id, j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h
        |  FROM wu, jj),
        |est AS (
        |  SELECT p.w, p.user_id, min(c.c) AS cms_est
        |  FROM probe p JOIN wc c USING (w, j, h)
        |  GROUP BY 1, 2),
        |exact AS (SELECT wins.w, e.user_id, count(*) AS n_events
        |          FROM e JOIN wins
        |            ON e.grp BETWEEN wins.w - 2 AND wins.w
        |          GROUP BY 1, 2)
        |SELECT est.w AS dayord, est.user_id, est.cms_est,
        |  exact.n_events, exact.n_events >= 12 AS is_heavy
        |FROM est JOIN exact
        |  ON est.w = exact.w AND est.user_id = exact.user_id
        |WHERE est.cms_est >= 12""".stripMargin,

    // per-batch cell partials summed == the batch panes exactly
    "e206_streaming_sliding_cms_replay" ->
      """WITH jj AS (SELECT unnest(range(0, 4)) AS j),
        |e AS (SELECT epoch_us(ts) // 86400000000 AS grp, user_id
        |      FROM events),
        |wins AS (SELECT DISTINCT grp AS w FROM e),
        |pane AS (
        |  SELECT grp, j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h,
        |    count(*) AS c
        |  FROM e, jj GROUP BY 1, 2, 3),
        |wc AS (SELECT wins.w, pane.j, pane.h,
        |         CAST(sum(pane.c) AS BIGINT) AS c
        |       FROM pane JOIN wins
        |         ON pane.grp BETWEEN wins.w - 2 AND wins.w
        |       GROUP BY 1, 2, 3),
        |wu AS (SELECT DISTINCT wins.w, e.user_id
        |       FROM e JOIN wins
        |         ON e.grp BETWEEN wins.w - 2 AND wins.w),
        |probe AS (
        |  SELECT w, user_id, j, ('0x' || substr(md5(concat('cms',
        |      CAST(j AS VARCHAR), '|', CAST(user_id AS VARCHAR))),
        |      1, 15))::BIGINT % 256 AS h
        |  FROM wu, jj),
        |est AS (
        |  SELECT p.w, p.user_id, min(c.c) AS cms_est
        |  FROM probe p JOIN wc c USING (w, j, h)
        |  GROUP BY 1, 2),
        |exact AS (SELECT wins.w, e.user_id, count(*) AS n_events
        |          FROM e JOIN wins
        |            ON e.grp BETWEEN wins.w - 2 AND wins.w
        |          GROUP BY 1, 2)
        |SELECT est.w AS dayord, est.user_id, est.cms_est,
        |  exact.n_events, exact.n_events >= 12 AS is_heavy
        |FROM est JOIN exact
        |  ON est.w = exact.w AND est.user_id = exact.user_id
        |WHERE est.cms_est >= 12""".stripMargin,

    // the closed-form two-tone MFCC: filter edges from the identical
    // mel expressions, triangle weights at 2000/4000 Hz, ln(1+E),
    // DCT-II — only the order-dependent DCT sum is rounded
    "e199_audio_mfcc" ->
      """WITH g AS (
        |  SELECT doc_id, 1 + doc_id % 3 AS k,
        |    2*(doc_id % 350) + 201 AS a1, 100 + doc_id % 250 AS a2
        |  FROM documents),
        |p AS (SELECT doc_id, k,
        |    CAST(CAST(a1*128 AS BIGINT) * CAST(a1*128 AS BIGINT)
        |      AS DOUBLE) AS p1,
        |    CAST(CAST(a2*256 AS BIGINT) * CAST(a2*256 AS BIGINT)
        |      AS DOUBLE) AS p2
        |  FROM g),
        |fr AS (SELECT doc_id, unnest(range(0, k)) AS frame_idx, p1, p2
        |       FROM p),
        |mm AS (SELECT 2595 * log10(1 + CAST(4000 AS DOUBLE) / 700)
        |         AS melmax),
        |flt AS (SELECT unnest(range(1, 21)) AS f),
        |edges AS (SELECT f,
        |    700 * (pow(10, (melmax * (f - 1)) / 21 / 2595) - 1) AS lft,
        |    700 * (pow(10, (melmax * f) / 21 / 2595) - 1) AS mid,
        |    700 * (pow(10, (melmax * (f + 1)) / 21 / 2595) - 1) AS rgt
        |  FROM flt CROSS JOIN mm),
        |w AS (SELECT f,
        |    CASE WHEN CAST(2000 AS DOUBLE) > lft
        |          AND CAST(2000 AS DOUBLE) <= mid
        |         THEN (CAST(2000 AS DOUBLE) - lft) / (mid - lft)
        |         WHEN CAST(2000 AS DOUBLE) > mid
        |          AND CAST(2000 AS DOUBLE) < rgt
        |         THEN (rgt - CAST(2000 AS DOUBLE)) / (rgt - mid)
        |         ELSE 0 END AS w64,
        |    CASE WHEN CAST(4000 AS DOUBLE) > lft
        |          AND CAST(4000 AS DOUBLE) <= mid
        |         THEN (CAST(4000 AS DOUBLE) - lft) / (mid - lft)
        |         WHEN CAST(4000 AS DOUBLE) > mid
        |          AND CAST(4000 AS DOUBLE) < rgt
        |         THEN (rgt - CAST(4000 AS DOUBLE)) / (rgt - mid)
        |         ELSE 0 END AS w128
        |  FROM edges),
        |lm AS (SELECT doc_id, frame_idx, f,
        |    ln(1 + (w64 * p1 + w128 * p2)) AS lmel
        |  FROM fr CROSS JOIN w)
        |SELECT doc_id, frame_idx, n AS coef_idx,
        |  round(sum(lmel * cos(pi() * n * (f - 0.5) / 20)), 6) AS mfcc
        |FROM lm CROSS JOIN range(0, 6) t(n)
        |GROUP BY 1, 2, 3""".stripMargin,

    // the I_PCM pixel formula evaluated directly per luma row
    // duplicates are exact re-deliveries, so the deduped stream is
    // the original event set
    "e226_streaming_native_dedup_replay" ->
      "SELECT ts, event_id, value FROM events",

    // the four per-format formulas selected by doc_id % 4
    "e225_audio_dispatch" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
        |    WHEN 2 THEN 'mp3' ELSE 'aac' END AS format,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN 8000 WHEN 1 THEN 8000
        |    WHEN 2 THEN CASE doc_id % 3 WHEN 0 THEN 44100
        |      WHEN 1 THEN 48000 ELSE 32000 END
        |    ELSE CASE doc_id % 3 WHEN 0 THEN 48000
        |      WHEN 1 THEN 44100 ELSE 32000 END
        |  END AS BIGINT) AS sample_rate,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN (300 + doc_id % 200) * 1000 // 8000
        |    WHEN 1 THEN (300 + doc_id % 200) * 1000 // 8000
        |    WHEN 2 THEN (5 + doc_id % 7) * 1152 * 1000
        |      // (CASE doc_id % 3 WHEN 0 THEN 44100
        |          WHEN 1 THEN 48000 ELSE 32000 END)
        |    ELSE ((6 + doc_id % 9) + (6 + doc_id % 9) // 2)
        |      * 1024 * 1000
        |      // (CASE doc_id % 3 WHEN 0 THEN 48000
        |          WHEN 1 THEN 44100 ELSE 32000 END)
        |  END AS BIGINT) AS duration_ms,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN 300 + doc_id % 200
        |    WHEN 1 THEN 300 + doc_id % 200
        |    WHEN 2 THEN 5 + doc_id % 7
        |    ELSE 6 + doc_id % 9
        |  END AS BIGINT) AS n_units
        |FROM documents""".stripMargin,

    // the record formulas; scores are dyadic (0.5/0.25 steps)
    "e224_tfrecord_ingest" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 4 AS nr
        |           FROM documents),
        |r AS (SELECT doc_id, unnest(range(0, nr)) AS ri FROM f)
        |SELECT doc_id, CAST(ri AS BIGINT) AS rec_idx,
        |  CAST(doc_id*1000 + ri AS BIGINT) AS msg_id,
        |  CAST(3 + (doc_id + ri) % 6 AS BIGINT) AS text_len,
        |  (doc_id % 50) * CAST(0.5 AS DOUBLE)
        |    + ri * CAST(0.25 AS DOUBLE) AS score
        |FROM r""".stripMargin,

    // the three B rows: +2 px (L0), the rounded ±2 px average (Bi),
    // 4 px up (L1) — frame 0 is the raw pattern
    "e223_h264_bframe_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |fr AS (SELECT doc_id, unnest([0, 1]) AS frame_idx FROM f),
        |rws AS (SELECT doc_id, frame_idx, unnest(range(0, 48)) AS y
        |        FROM fr),
        |px AS (SELECT doc_id, frame_idx, y, unnest(range(0, 48)) AS x
        |       FROM rws),
        |v AS (SELECT doc_id, frame_idx, y, x,
        |  CASE
        |    WHEN frame_idx = 0 THEN (doc_id*31 + (y*48 + x)*7) % 256
        |    WHEN y < 16
        |      THEN (doc_id*31 + (y*48 + LEAST(47, x + 2))*7) % 256
        |    WHEN y < 32 THEN (
        |        (doc_id*31 + (y*48 + LEAST(47, x + 2))*7) % 256
        |      + (doc_id*31 + (y*48 + GREATEST(0, x - 2))*7) % 256
        |      + 1) // 2
        |    ELSE (doc_id*31 + ((y - 4)*48 + x)*7) % 256
        |  END AS p FROM px)
        |SELECT doc_id, frame_idx, y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(p) AS BIGINT) AS sum_y,
        |  CAST(min(p) AS BIGINT) AS min_y,
        |  CAST(max(p) AS BIGINT) AS max_y
        |FROM v GROUP BY 1, 2, 3""".stripMargin,

    // the e222 member formulas (seeds distinct from e220)
    "e222_targz_ingest" ->
      """WITH f AS (SELECT doc_id, 1 + doc_id % 5 AS nm
        |           FROM documents),
        |m AS (SELECT doc_id, unnest(range(0, nm)) AS mi FROM f)
        |SELECT doc_id, CAST(mi AS BIGINT) AS member_idx,
        |  'g' || CAST(doc_id AS VARCHAR) || '/t'
        |    || CAST(mi AS VARCHAR) || '.txt' AS name,
        |  CAST(15 + (doc_id*2 + mi) % 40 AS BIGINT) AS size,
        |  CAST(1710000000 + doc_id + mi AS BIGINT) AS mtime,
        |  chr(CAST(97 + (doc_id + mi*5) % 26 AS INTEGER))
        |    AS first_char
        |FROM m""".stripMargin,

    // member formulas: alternating methods (0 stored / 8 deflate),
    // sizes 30 + (id+m)%70, fill char 'a' + (id·3+m)%26
    "e221_zip_ingest" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 4 AS nm
        |           FROM documents),
        |m AS (SELECT doc_id, unnest(range(0, nm)) AS mi FROM f)
        |SELECT doc_id, CAST(mi AS BIGINT) AS member_idx,
        |  'z' || CAST(doc_id AS VARCHAR) || '/m'
        |    || CAST(mi AS VARCHAR) || '.txt' AS name,
        |  CAST(30 + (doc_id + mi) % 70 AS BIGINT) AS size,
        |  CAST(CASE WHEN (doc_id + mi) % 2 = 0 THEN 8 ELSE 0 END
        |    AS BIGINT) AS method,
        |  chr(CAST(97 + (doc_id*3 + mi) % 26 AS INTEGER))
        |    AS first_char
        |FROM m""".stripMargin,

    // member formulas: names, sizes 20 + (id+m)%50, mtimes, and the
    // fill character 'a' + (id+m)%26
    "e220_tar_ingest" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 4 AS nm
        |           FROM documents),
        |m AS (SELECT doc_id, unnest(range(0, nm)) AS mi FROM f)
        |SELECT doc_id, CAST(mi AS BIGINT) AS member_idx,
        |  'd' || CAST(doc_id AS VARCHAR) || '/f'
        |    || CAST(mi AS VARCHAR) || '.txt' AS name,
        |  CAST(20 + (doc_id + mi) % 50 AS BIGINT) AS size,
        |  CAST(1700000000 + doc_id*60 + mi AS BIGINT) AS mtime,
        |  chr(CAST(97 + (doc_id + mi) % 26 AS INTEGER)) AS first_char
        |FROM m""".stripMargin,

    // every layer's generation formulas: the warcinfo row, per-record
    // URIs/status/content-type, and the e216 HTML metrics at the
    // per-record seed doc_id·7 + rr
    "e219_warc_ingest" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 3 AS nr
        |           FROM documents),
        |rs AS (SELECT doc_id, unnest(range(0, nr)) AS rr FROM f),
        |rx AS (SELECT doc_id, rr, doc_id*7 + rr AS s,
        |    CASE WHEN (doc_id + rr) % 4 = 0 THEN 1 ELSE 0 END AS nf
        |  FROM rs),
        |pc AS (SELECT doc_id, rr,
        |    CAST(sum(5 + (s + g) % 7) AS BIGINT) AS pchars
        |  FROM (SELECT doc_id, rr, s, unnest(range(0, 2 + s % 3)) AS g
        |        FROM rx) GROUP BY 1, 2),
        |lc AS (SELECT doc_id, rr,
        |    CAST(sum(2 + (s + g) % 3) AS BIGINT) AS lchars,
        |    CAST(count(*) AS BIGINT) AS nl
        |  FROM (SELECT doc_id, rr, s, unnest(range(0, 1 + s % 2)) AS g
        |        FROM rx) GROUP BY 1, 2),
        |resp AS (
        |  SELECT r.doc_id, r.rr + 1 AS rec_idx,
        |    'response' AS warc_type,
        |    'http://ex.test/d' || CAST(r.doc_id AS VARCHAR) || '/p'
        |      || CAST(r.rr AS VARCHAR) AS target_uri,
        |    CASE WHEN r.nf = 1 THEN 404 ELSE 200 END AS http_status,
        |    CASE WHEN r.nf = 1 THEN 'text/plain'
        |      ELSE 'text/html' END AS content_type,
        |    CASE WHEN r.nf = 1 THEN ''
        |      ELSE 'T' || CAST(r.s % 100 AS VARCHAR) END AS title,
        |    CASE WHEN r.nf = 1 THEN 0 ELSE lc.nl END AS n_links,
        |    CASE WHEN r.nf = 1
        |      THEN length('not found ' || CAST(r.doc_id AS VARCHAR))
        |      ELSE pc.pchars + lc.lchars END AS text_chars,
        |    CASE WHEN r.nf = 1 THEN 0 ELSE lc.lchars END AS link_chars,
        |    CASE WHEN r.nf = 1 THEN 0
        |      ELSE 100 * lc.lchars // (pc.pchars + lc.lchars) END
        |      AS link_density_pct
        |  FROM rx r JOIN pc ON pc.doc_id = r.doc_id AND pc.rr = r.rr
        |            JOIN lc ON lc.doc_id = r.doc_id AND lc.rr = r.rr)
        |SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx,
        |  'warcinfo' AS warc_type, '' AS target_uri,
        |  CAST(0 AS BIGINT) AS http_status, '' AS content_type,
        |  '' AS title, CAST(0 AS BIGINT) AS n_links,
        |  CAST(17 AS BIGINT) AS text_chars,
        |  CAST(0 AS BIGINT) AS link_chars,
        |  CAST(0 AS BIGINT) AS link_density_pct
        |FROM f
        |UNION ALL
        |SELECT doc_id, CAST(rec_idx AS BIGINT), warc_type, target_uri,
        |  CAST(http_status AS BIGINT), content_type, title,
        |  CAST(n_links AS BIGINT), CAST(text_chars AS BIGINT),
        |  CAST(link_chars AS BIGINT), CAST(link_density_pct AS BIGINT)
        |FROM resp""".stripMargin,

    // the 6-tap half-pel filter mirrored in SQL: row 1 horizontal
    // (x-taps clamped at the frame edge), row 2 vertical; the
    // GREATEST/LEAST clip commutes with // vs >> on negatives
    // because every negative shift result clips to 0 either way
    "e218_h264_subpel_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |fr AS (SELECT doc_id, unnest([0, 1]) AS frame_idx FROM f),
        |rws AS (SELECT doc_id, frame_idx, unnest(range(0, 48)) AS y
        |        FROM fr),
        |px AS (SELECT doc_id, frame_idx, y, unnest(range(0, 48)) AS x
        |       FROM rws),
        |v AS (SELECT doc_id, frame_idx, y, x,
        |  CASE
        |    WHEN frame_idx = 0 OR y < 16
        |      THEN (doc_id*31 + (y*48 + x)*7) % 256
        |    WHEN y < 32 THEN GREATEST(0, LEAST(255, (
        |        (doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16 - 3)))*7) % 256
        |      - 5*((doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16 - 2)))*7) % 256)
        |      + 20*((doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16 - 1)))*7) % 256)
        |      + 20*((doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16)))*7) % 256)
        |      - 5*((doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16 + 1)))*7) % 256)
        |      + ((doc_id*31 + ((y-10)*48
        |          + LEAST(47, GREATEST(0, x + x//16 + 2)))*7) % 256)
        |      + 16) // 32))
        |    ELSE GREATEST(0, LEAST(255, (
        |        (doc_id*31 + ((y-12)*48 + x)*7) % 256
        |      - 5*((doc_id*31 + ((y-11)*48 + x)*7) % 256)
        |      + 20*((doc_id*31 + ((y-10)*48 + x)*7) % 256)
        |      + 20*((doc_id*31 + ((y-9)*48 + x)*7) % 256)
        |      - 5*((doc_id*31 + ((y-8)*48 + x)*7) % 256)
        |      + ((doc_id*31 + ((y-7)*48 + x)*7) % 256)
        |      + 16) // 32))
        |  END AS p FROM px)
        |SELECT doc_id, frame_idx, y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(p) AS BIGINT) AS sum_y,
        |  CAST(min(p) AS BIGINT) AS min_y,
        |  CAST(max(p) AS BIGINT) AS max_y
        |FROM v GROUP BY 1, 2, 3""".stripMargin,

    // frame 0 = the I_PCM pattern; frame 1 rows 16..31 = the
    // edge-clamped shift (2·(mx−1), −10), skip rows = exact copies
    "e217_h264_pframe_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |fr AS (SELECT doc_id, unnest([0, 1]) AS frame_idx FROM f),
        |rws AS (SELECT doc_id, frame_idx, unnest(range(0, 48)) AS y
        |        FROM fr),
        |px AS (SELECT doc_id, frame_idx, y, unnest(range(0, 48)) AS x
        |       FROM rws),
        |v AS (SELECT doc_id, frame_idx, y, x,
        |  CASE
        |    WHEN frame_idx = 0 OR y < 16 OR y >= 32
        |      THEN (doc_id*31 + (y*48 + x)*7) % 256
        |    ELSE (doc_id*31 + ((y - 10)*48
        |      + LEAST(47, GREATEST(0, x + 2*(x // 16) - 2)))*7) % 256
        |  END AS p
        | FROM px)
        |SELECT doc_id, frame_idx, y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(p) AS BIGINT) AS sum_y,
        |  CAST(min(p) AS BIGINT) AS min_y,
        |  CAST(max(p) AS BIGINT) AS max_y
        |FROM v GROUP BY 1, 2, 3""".stripMargin,

    // paragraph and anchor text lengths summed from the generation
    // formulas; density = 100·link//text in BIGINT
    "e216_html_extract" ->
      """WITH f AS (SELECT doc_id, 2 + doc_id % 3 AS np,
        |             1 + doc_id % 2 AS nl FROM documents),
        |pc AS (SELECT doc_id,
        |         CAST(sum(5 + (doc_id + g) % 7) AS BIGINT) AS pchars
        |       FROM (SELECT doc_id, unnest(range(0, np)) AS g FROM f)
        |       GROUP BY 1),
        |lc AS (SELECT doc_id,
        |         CAST(sum(2 + (doc_id + g) % 3) AS BIGINT) AS lchars,
        |         CAST(count(*) AS BIGINT) AS nl
        |       FROM (SELECT doc_id, unnest(range(0, nl)) AS g FROM f)
        |       GROUP BY 1)
        |SELECT f.doc_id,
        |  'T' || CAST(f.doc_id % 100 AS VARCHAR) AS title,
        |  lc.nl AS n_links,
        |  pc.pchars + lc.lchars AS text_chars,
        |  lc.lchars AS link_chars,
        |  CAST(100 * lc.lchars // (pc.pchars + lc.lchars) AS BIGINT)
        |    AS link_density_pct
        |FROM f JOIN pc USING(doc_id) JOIN lc USING(doc_id)""".stripMargin,

    // the four text frames per doc, formula-evaluated
    "e215_id3v2_text_frames" ->
      """SELECT doc_id, frame_id,
        |  CASE frame_id
        |    WHEN 'TIT2' THEN 'Title ' || CAST(doc_id % 50 AS VARCHAR)
        |    WHEN 'TPE1' THEN 'Artist ' || CAST(doc_id % 20 AS VARCHAR)
        |    WHEN 'TALB' THEN 'Album ' || CAST(doc_id % 10 AS VARCHAR)
        |    ELSE CAST(1 + doc_id % 12 AS VARCHAR)
        |  END AS text_value
        |FROM documents
        |CROSS JOIN (SELECT unnest(['TIT2','TPE1','TALB','TRCK'])
        |            AS frame_id)""".stripMargin,

    // the record formulas re-evaluated; 0.5/0.25 are dyadic so the
    // double arithmetic is exact on both engines
    "e214_avro_ingest" ->
      """WITH f AS (SELECT doc_id, 3 + doc_id % 5 AS nrec
        |           FROM documents),
        |r AS (SELECT doc_id, unnest(range(0, nrec)) AS rid FROM f)
        |SELECT doc_id,
        |  CAST(doc_id*100 + rid AS BIGINT) AS rec_id,
        |  (doc_id % 97) * CAST(0.5 AS DOUBLE)
        |    + rid * CAST(0.25 AS DOUBLE) AS score,
        |  't' || CAST((doc_id + rid) % 10 AS VARCHAR) AS tag
        |FROM r""".stripMargin,

    // the ADTS synthesis formulas re-evaluated: explicit frame
    // lengths 57 + (id·7 + f·13)%400, alternating 1/2 raw data
    // blocks, duration over blocks at 1024 samples each
    "e213_aac_adts_scan" ->
      """WITH f AS (SELECT doc_id, 6 + doc_id % 9 AS nf,
        |    CASE doc_id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
        |      ELSE 32000 END AS rate,
        |    1 + doc_id % 2 AS ch,
        |    CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS vbr
        |  FROM documents),
        |fr AS (SELECT doc_id, nf, rate, ch, vbr,
        |         unnest(range(0, nf)) AS fi FROM f),
        |kk AS (SELECT doc_id, nf, rate, ch, vbr,
        |    57 + (doc_id*7 + fi*13) % 400 AS flen,
        |    fi % 2 + 1 AS blocks
        |  FROM fr)
        |SELECT doc_id,
        |  CAST(max(nf) AS BIGINT) AS n_frames,
        |  CAST(max(rate) AS BIGINT) AS sample_rate,
        |  CAST(max(ch) AS BIGINT) AS channels,
        |  CAST(sum(blocks) AS BIGINT) AS n_blocks,
        |  CAST(sum(blocks) * 1024 * 1000 // max(rate) AS BIGINT)
        |    AS duration_ms,
        |  CAST(min(flen) AS BIGINT) AS min_frame_len,
        |  CAST(max(flen) AS BIGINT) AS max_frame_len,
        |  CAST(max(vbr) AS BIGINT) AS vbr,
        |  CAST(sum(flen) AS BIGINT) AS total_bytes
        |FROM kk GROUP BY 1""".stripMargin,

    // the synthesis formulas re-evaluated: per-frame bitrates from
    // the Layer-III table, frame bytes 144000·kbps//rate + pad, the
    // ID3v2 tag 10 + 40 + doc_id%30 on every fourth doc
    "e212_mp3_frame_scan" ->
      """WITH f AS (SELECT doc_id, 5 + doc_id % 7 AS nf,
        |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |      ELSE 32000 END AS rate,
        |    CASE WHEN doc_id % 4 = 0 THEN 50 + doc_id % 30
        |      ELSE 0 END AS tag
        |  FROM documents),
        |fr AS (SELECT doc_id, nf, rate, tag, unnest(range(0, nf)) AS fi
        |       FROM f),
        |kk AS (SELECT doc_id, nf, rate, tag, fi,
        |    CASE WHEN doc_id % 5 = 0 THEN 128
        |      ELSE list_extract([32,40,48,56,64,80,96,112,128,160,
        |                         192,224,256,320],
        |        CAST(1 + (doc_id*3 + fi) % 14 AS INTEGER)) END AS kbps,
        |    CASE WHEN (doc_id + fi) % 3 = 0 THEN 1 ELSE 0 END AS pad
        |  FROM fr)
        |SELECT doc_id,
        |  CAST(max(nf) AS BIGINT) AS n_frames,
        |  CAST(max(rate) AS BIGINT) AS sample_rate,
        |  CAST(sum(pad) AS BIGINT) AS n_padded,
        |  CAST(min(kbps) AS BIGINT) AS min_kbps,
        |  CAST(max(kbps) AS BIGINT) AS max_kbps,
        |  CAST(CASE WHEN min(kbps) = max(kbps) THEN 1 ELSE 0 END
        |    AS BIGINT) AS cbr,
        |  CAST(max(nf) * 1152 * 1000 // max(rate) AS BIGINT)
        |    AS duration_ms,
        |  CAST(max(tag) + sum(144000 * kbps // rate + pad) AS BIGINT)
        |    AS total_bytes
        |FROM kk GROUP BY 1""".stripMargin,

    // the QP-26 dequant chain in closed form: r(L) = ((13·L + 2)//4
    // + 32)//64 (all terms non-negative, so // = the spec's
    // arithmetic shifts), MB values chained through the DC
    // prediction with LEAST(255,·) as the spec clip
    "e210_h264_cavlc_residual_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |base AS (SELECT doc_id,
        |  30 + (doc_id*7 + 0*31) % 200 AS p0,
        |  30 + (doc_id*7 + 1*31) % 200 AS p1,
        |  30 + (doc_id*7 + 2*31) % 200 AS p2,
        |  ((13*((doc_id*13 + 0*71 + 1*37) % 700) + 2) // 4 + 32) // 64 AS r01,
        |  ((13*((doc_id*13 + 1*71 + 1*37) % 700) + 2) // 4 + 32) // 64 AS r11,
        |  ((13*((doc_id*13 + 2*71 + 1*37) % 700) + 2) // 4 + 32) // 64 AS r21,
        |  ((13*((doc_id*13 + 0*71 + 2*37) % 700) + 2) // 4 + 32) // 64 AS r02,
        |  ((13*((doc_id*13 + 1*71 + 2*37) % 700) + 2) // 4 + 32) // 64 AS r12,
        |  ((13*((doc_id*13 + 2*71 + 2*37) % 700) + 2) // 4 + 32) // 64 AS r22
        | FROM f),
        |c1 AS (SELECT *, LEAST(255, p0 + r01) AS v01 FROM base),
        |c2 AS (SELECT *, LEAST(255, (v01 + p1 + 1)//2 + r11) AS v11 FROM c1),
        |c3 AS (SELECT *, LEAST(255, (v11 + p2 + 1)//2 + r21) AS v21 FROM c2),
        |c4 AS (SELECT *, LEAST(255, v01 + r02) AS v02 FROM c3),
        |c5 AS (SELECT *, LEAST(255, (v02 + v11 + 1)//2 + r12) AS v12 FROM c4),
        |c6 AS (SELECT *, LEAST(255, (v12 + v21 + 1)//2 + r22) AS v22 FROM c5),
        |cells AS (
        |  SELECT doc_id, 0 AS my, p0 AS v FROM c6
        |  UNION ALL SELECT doc_id, 0, p1 FROM c6
        |  UNION ALL SELECT doc_id, 0, p2 FROM c6
        |  UNION ALL SELECT doc_id, 1, v01 FROM c6
        |  UNION ALL SELECT doc_id, 1, v11 FROM c6
        |  UNION ALL SELECT doc_id, 1, v21 FROM c6
        |  UNION ALL SELECT doc_id, 2, v02 FROM c6
        |  UNION ALL SELECT doc_id, 2, v12 FROM c6
        |  UNION ALL SELECT doc_id, 2, v22 FROM c6),
        |rws AS (SELECT doc_id, unnest(range(0, 48)) AS y FROM f)
        |SELECT r.doc_id, r.y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(c.v * 16) AS BIGINT) AS sum_y,
        |  CAST(min(c.v) AS BIGINT) AS min_y,
        |  CAST(max(c.v) AS BIGINT) AS max_y
        |FROM rws r JOIN cells c ON c.doc_id = r.doc_id
        |  AND c.my = r.y // 16
        |GROUP BY 1, 2""".stripMargin,

    // copy-propagation closed form: V MBs repeat the bottom row of
    // the MB above, H MBs the right column of the MB left — the
    // interior therefore evaluates to three pattern lookups
    "e211_h264_i4x4_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |rws AS (SELECT doc_id, unnest(range(0, 48)) AS y FROM f),
        |px AS (SELECT doc_id, y, unnest(range(0, 48)) AS x FROM rws),
        |v AS (SELECT doc_id, y, x,
        |  CASE
        |    WHEN x < 16 OR y < 16 THEN (doc_id*31 + (y*48 + x)*7) % 256
        |    WHEN x < 32 AND y < 32
        |      THEN (doc_id*31 + (15*48 + x)*7) % 256
        |    WHEN y < 32 THEN (doc_id*31 + (15*48 + 31)*7) % 256
        |    WHEN x < 32 THEN (doc_id*31 + (y*48 + 15)*7) % 256
        |    ELSE (doc_id*31 + (15*48 + 31)*7) % 256
        |  END AS p
        | FROM px)
        |SELECT doc_id, y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(p) AS BIGINT) AS sum_y,
        |  CAST(min(p) AS BIGINT) AS min_y,
        |  CAST(max(p) AS BIGINT) AS max_y
        |FROM v GROUP BY 1, 2""".stripMargin,

    "e197_h264_ipcm_rows" ->
      """WITH f AS (SELECT doc_id, unnest(range(0, 48)) AS y
        |           FROM documents),
        |px AS (SELECT doc_id, y, unnest(range(0, 48)) AS x FROM f),
        |v AS (SELECT doc_id, y,
        |        (doc_id*31 + (y*48 + x)*7) % 256 AS p FROM px)
        |SELECT doc_id, y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(p) AS BIGINT) AS sum_y,
        |  CAST(min(p) AS BIGINT) AS min_y,
        |  CAST(max(p) AS BIGINT) AS max_y
        |FROM v GROUP BY 1, 2""".stripMargin,

    // the checkerboard MB values with the spec's DC-prediction
    // rounding: both neighbors → (VL+VT+1)>>1, one → pass-through
    // (all checkerboard neighbors are I_PCM constants)
    "e198_h264_intra_pred_rows" ->
      """WITH f AS (SELECT doc_id FROM documents),
        |mb AS (SELECT doc_id, mx, my,
        |    30 + (doc_id*7 + mx*31 + my*17) % 200 AS v,
        |    (mx + my) % 2 AS odd
        |  FROM f CROSS JOIN range(0,3) t1(mx)
        |         CROSS JOIN range(0,3) t2(my)),
        |vv AS (SELECT a.doc_id, a.mx, a.my,
        |    CASE WHEN a.odd = 0 THEN a.v
        |         WHEN a.mx > 0 AND a.my > 0 THEN (l.v + t.v + 1) // 2
        |         WHEN a.mx > 0 THEN l.v
        |         ELSE t.v END AS v
        |  FROM mb a
        |  LEFT JOIN mb l ON l.doc_id = a.doc_id AND l.mx = a.mx - 1
        |    AND l.my = a.my
        |  LEFT JOIN mb t ON t.doc_id = a.doc_id AND t.mx = a.mx
        |    AND t.my = a.my - 1),
        |rws AS (SELECT doc_id, unnest(range(0, 48)) AS y FROM f)
        |SELECT r.doc_id, r.y, CAST(48 AS BIGINT) AS n_px,
        |  CAST(sum(v.v * 16) AS BIGINT) AS sum_y,
        |  CAST(min(v.v) AS BIGINT) AS min_y,
        |  CAST(max(v.v) AS BIGINT) AS max_y
        |FROM rws r JOIN vv v ON v.doc_id = r.doc_id
        |  AND v.my = r.y // 16
        |GROUP BY 1, 2""".stripMargin,

    // the nearest-resampled pattern evaluated directly: source pixel
    // (x·pw//tw, y·ph//th), value from its 8x8 block's formula
    "e176_jpeg_resize_rows" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    16*(1 + doc_id % 3) AS w, 16*(1 + doc_id % 2) AS h
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, 'y' AS plane, w AS pw, h AS ph,
        |    8 AS tw, 4 AS th FROM g
        |  UNION ALL SELECT doc_id, 'cb', w//2, h//2, 4, 2 FROM g
        |  UNION ALL SELECT doc_id, 'cr', w//2, h//2, 4, 2 FROM g),
        |yy AS (SELECT doc_id, plane, pw, ph, tw, th,
        |         unnest(generate_series(0, th - 1)) AS y FROM pl),
        |xx AS (SELECT doc_id, plane, pw, ph, tw, th, y,
        |         unnest(generate_series(0, tw - 1)) AS x FROM yy),
        |px AS (
        |  SELECT doc_id, plane, y, x,
        |    (x * pw // tw) // 8 AS bx, (y * ph // th) // 8 AS by
        |  FROM xx),
        |pv AS (
        |  SELECT doc_id, plane, y, x,
        |    CASE plane
        |      WHEN 'y' THEN 2*((doc_id*5 + 3*bx + 7*by) % 128)
        |      WHEN 'cb' THEN
        |        128 + 17*(((doc_id*3 + bx + 2*by) % 15) - 7)
        |      ELSE 128 + 17*(((doc_id*11 + 2*bx + by) % 15) - 7)
        |    END AS v
        |  FROM px)
        |SELECT doc_id, plane, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(max(v) AS BIGINT) AS max_v,
        |  CAST(arg_min(v, x) AS BIGINT) AS first_v,
        |  CAST(arg_max(v, x) AS BIGINT) AS last_v
        |FROM pv GROUP BY 1, 2, 3""".stripMargin,

    // direct formula evaluation of the block-constant planes the
    // lossless-DC construction makes the real JPEG pipeline return
    // bit-exactly (luma full-res, both chromas at half dims)
    "e174_jpeg_codec_rows" -> jpegPlanesOracle,

    // the PROGRESSIVE scan architecture must land the identical
    // planes — e174's oracle verbatim
    "e188_jpeg_progressive_rows" -> jpegPlanesOracle,

    // the day-keyed self-join (dayord − 7), not a row lag; exact
    // int64-cents totals and errors, identical final divisions
    "e168_seasonal_naive_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS dayord,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT d.event_type,
        |    abs(d.cents - p.cents) AS abs_err_cents, d.cents
        |  FROM daily d JOIN daily p
        |    ON d.event_type = p.event_type
        |    AND p.dayord = d.dayord - 7)
        |SELECT event_type, count(*) AS n_days,
        |  round(CAST(sum(abs_err_cents) AS DOUBLE)
        |        / CAST(count(*) * 100 AS DOUBLE), 6) AS mae,
        |  round(CAST(sum(abs_err_cents) AS DOUBLE)
        |        / CAST(sum(cents) AS DOUBLE), 6) AS wape
        |FROM j GROUP BY 1""".stripMargin,

    // one full-outer over the distinct key sets
    "e167_reconciliation" ->
      """WITH lk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |ok AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |j AS (
        |  SELECT coalesce(lk.k, ok.k) AS k,
        |    lk.k IS NOT NULL AS in_l,
        |    ok.k IS NOT NULL AS in_r
        |  FROM lk FULL OUTER JOIN ok ON lk.k = ok.k)
        |SELECT
        |  CAST(sum(CASE WHEN in_l AND in_r THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN in_l AND NOT in_r THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_left_only,
        |  CAST(sum(CASE WHEN in_r AND NOT in_l THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_right_only,
        |  round(CAST(sum(CASE WHEN in_l AND in_r THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS match_rate
        |FROM j""".stripMargin,

    // integer epoch-day ordinals; the gap lag runs over the bounded
    // per-key day set
    "e157_activity_coverage" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS dayord
        |  FROM events),
        |g AS (
        |  SELECT user_id, dayord,
        |    dayord - lag(dayord) OVER
        |      (PARTITION BY user_id ORDER BY dayord) AS gap
        |  FROM d)
        |SELECT user_id, count(*) AS active_days,
        |  max(dayord) - min(dayord) + 1 AS span_days,
        |  round(CAST(count(*) AS DOUBLE)
        |        / CAST(max(dayord) - min(dayord) + 1 AS DOUBLE), 6)
        |    AS coverage,
        |  coalesce(CAST(max(gap) - 1 AS BIGINT), 0)
        |    AS longest_gap_days
        |FROM g GROUP BY 1""".stripMargin,

    // the same epoch-day dow; both means round before the ratio
    "e153_seasonal_index" ->
      """WITH d AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, value
        |  FROM events),
        |cell AS (
        |  SELECT event_type, dow, count(*) AS n_obs,
        |    round(avg(value), 6) AS cell_mean
        |  FROM d GROUP BY 1, 2),
        |tm AS (
        |  SELECT event_type, round(avg(value), 6) AS type_mean
        |  FROM d GROUP BY 1)
        |SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, n_obs,
        |  cell_mean, type_mean,
        |  round(cell_mean / type_mean, 6) AS seasonal_index
        |FROM cell c JOIN tm USING (event_type)""".stripMargin
  )

  /** Last-touch attribution as the causal ignore-nulls carry — shared
    * by the batch window form (e138) and its streaming replay
    * (e142). */
  private val attributionOracle =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN event_type IN ('view', 'click')
      |         THEN event_id END AS t_id,
      |    CASE WHEN event_type IN ('view', 'click')
      |         THEN event_type END AS t_type,
      |    CASE WHEN event_type IN ('view', 'click')
      |         THEN epoch_us(ts) END AS t_us
      |  FROM events),
      |carried AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    last_value(t_id IGNORE NULLS) OVER w AS touch_id,
      |    last_value(t_type IGNORE NULLS) OVER w AS touch_type0,
      |    last_value(t_us IGNORE NULLS) OVER w AS touch_us
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id, ts,
      |  CASE WHEN touch_us IS NOT NULL
      |        AND epoch_us(ts) - touch_us
      |            <= 7::BIGINT * 86400 * 1000000
      |       THEN touch_type0 ELSE 'direct' END AS touch_type,
      |  CASE WHEN touch_us IS NOT NULL
      |        AND epoch_us(ts) - touch_us
      |            <= 7::BIGINT * 86400 * 1000000
      |       THEN touch_id END AS touch_event_id
      |FROM carried WHERE event_type = 'purchase'""".stripMargin

  /** The two-sided CUSUM fold as a recursive per-key walk — shared by
    * the batch fold (e135) and its streaming replay (e136). */
  private val cusumOracle =
    """WITH RECURSIVE ms AS (
      |  SELECT round(avg(value / CAST(100 AS DOUBLE)), 6) AS mean_s
      |  FROM events),
      |seq AS (
      |  SELECT user_id, event_id, ts,
      |    value / CAST(100 AS DOUBLE) - mean_s AS dev,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events CROSS JOIN ms),
      |walk(user_id, rn, event_id, ts, splus, sminus) AS (
      |  SELECT user_id, rn, event_id, ts,
      |    greatest(CAST(0 AS DOUBLE), dev - CAST(0.05 AS DOUBLE)),
      |    greatest(CAST(0 AS DOUBLE), -dev - CAST(0.05 AS DOUBLE))
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.rn, s.event_id, s.ts,
      |    greatest(CAST(0 AS DOUBLE),
      |      w.splus + s.dev - CAST(0.05 AS DOUBLE)),
      |    greatest(CAST(0 AS DOUBLE),
      |      w.sminus - s.dev - CAST(0.05 AS DOUBLE))
      |  FROM walk w JOIN seq s
      |    ON s.user_id = w.user_id AND s.rn = w.rn + 1)
      |SELECT user_id, event_id, ts,
      |  round(splus, 6) AS s_pos, round(sminus, 6) AS s_neg,
      |  (splus > CAST(1 AS DOUBLE) OR sminus > CAST(1 AS DOUBLE))
      |    AS alarm
      |FROM walk""".stripMargin

  /** The e107 co-purchase graph as CTEs ending in `sym`, the
    * symmetrized directed edge list — shared by the k-core (e126) and
    * BFS (e127) oracles. */
  private val graphEdgeCtes =
    """pairs AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |deg0 AS (SELECT c FROM pairs GROUP BY c
      |         HAVING count(*) <= 1000),
      |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg0 USING (c)),
      |eg AS (
      |  SELECT a.sp AS node_a, b.sp AS node_b
      |  FROM capped a JOIN capped b ON a.c = b.c AND a.sp < b.sp
      |  GROUP BY 1, 2 HAVING count(*) >= 190),
      |sym AS (SELECT node_a AS src, node_b AS dst FROM eg
      |        UNION ALL SELECT node_b, node_a FROM eg)"""
      .stripMargin

  /** Personalized PageRank unrolled to `iters` CTE rounds over the
    * e126/e127 graph CTEs — the e91 chain with the teleport term
    * concentrated on the min-node seed. */
  private def pprOracle(iters: Int): String = {
    val restart =
      """CASE WHEN n.node = (SELECT seed FROM seeds)
        |              THEN CAST(1 AS DOUBLE)
        |              ELSE CAST(0 AS DOUBLE) END""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
        |  SELECT n.node,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
        |      * ($restart)
        |      + CAST(0.85 AS DOUBLE)
        |        * coalesce(s.c, CAST(0 AS DOUBLE)) AS rank
        |  FROM nodes n LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.rank / e.outdeg) AS c
        |    FROM topo e JOIN r${k - 1} r ON e.src = r.node
        |    GROUP BY 1) s ON n.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgeCtes,
      |outd AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY 1),
      |topo AS (SELECT s.src, s.dst, o.outdeg
      |         FROM sym s JOIN outd o USING (src)),
      |nodes AS (SELECT DISTINCT src AS node FROM sym),
      |seeds AS (SELECT min(src) AS seed FROM sym),
      |r0 AS (
      |  SELECT n.node, $restart AS rank
      |  FROM nodes n),
      |$rounds
      |SELECT node, round(rank, 6) AS pprank FROM r$iters"""
      .stripMargin
  }

  /** HITS unrolled to `iters` auth/hub half-round pairs over the
    * capped bipartite memberships; each L1 normalizer rounds before
    * its division. */
  private def hitsOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""a${k}0 AS (
        |  SELECT sp, sum(h.hub) AS a
        |  FROM capped c JOIN h${k - 1} h USING (c) GROUP BY 1),
        |an$k AS (SELECT round(sum(a), 6) AS s FROM a${k}0),
        |a$k AS (SELECT sp, a / (SELECT s FROM an$k) AS auth
        |        FROM a${k}0),
        |h${k}0 AS (
        |  SELECT cc.c, sum(a.auth) AS hh
        |  FROM capped cc JOIN a$k a USING (sp) GROUP BY 1),
        |hn$k AS (SELECT round(sum(hh), 6) AS s FROM h${k}0),
        |h$k AS (SELECT c, hh / (SELECT s FROM hn$k) AS hub
        |        FROM h${k}0)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |deg0 AS (SELECT c FROM pairs GROUP BY c
      |         HAVING count(*) <= 1000),
      |capped AS (SELECT p.c, p.sp FROM pairs p JOIN deg0 USING (c)),
      |h0 AS (SELECT DISTINCT c, CAST(1 AS DOUBLE) AS hub
      |       FROM capped),
      |$rounds
      |SELECT 'auth' AS side, sp AS node, round(auth, 6) AS score
      |FROM a$iters
      |UNION ALL
      |SELECT 'hub', c, round(hub, 6) FROM h$iters""".stripMargin
  }

  /** The e122 Markov chain's power iteration unrolled to `rounds`
    * CTE stages, entries rounded at every round boundary (the
    * operator's exact fixed-round semantics). */
  private def markovSteadyOracle(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""pi$r AS (
        |  SELECT p.next_type AS s, round(sum(q.pi * p.p), 6) AS pi
        |  FROM pi${r - 1} q JOIN p ON q.s = p.prev_type
        |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |cnt AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT prev_type, next_type,
      |    CAST(n AS DOUBLE)
      |      / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
      |      AS p
      |  FROM cnt),
      |states AS (SELECT DISTINCT prev_type AS s FROM cnt),
      |ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
      |pi0 AS (SELECT s, CAST(1 AS DOUBLE) / ns.k AS pi
      |        FROM states CROSS JOIN ns),
      |$stages
      |SELECT s AS state, pi AS steady_p FROM pi$rounds""".stripMargin
  }

  /** The k-core peel unrolled to `rounds` CTE stages — the exact chain
    * GraphOps.kCore runs (sᵣ = nodes whose degree among sᵣ₋₁ is ≥ k;
    * the final degree count runs over the surviving set). */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      val p = r - 1
      s"""d$r AS (SELECT s.src, count(*) AS deg FROM sym s
        |  JOIN s$p a ON s.src = a.node
        |  JOIN s$p b ON s.dst = b.node GROUP BY 1),
        |s$r AS (SELECT src AS node FROM d$r WHERE deg >= $k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgeCtes,
      |s0 AS (SELECT DISTINCT src AS node FROM sym),
      |$stages
      |SELECT s.src AS node, count(*) AS core_deg FROM sym s
      |  JOIN s$rounds a ON s.src = a.node
      |  JOIN s$rounds b ON s.dst = b.node
      |GROUP BY 1""".stripMargin
  }

  /** The BPE training loop unrolled to `merges` CTE rounds — round r
    * picks the top adjacent pair of s(r−1) under the identical
    * (cnt DESC, a, b) total order, then re-segments: positions whose
    * (sym, next) match the pair are `hit`s; consecutive hits form
    * islands (only possible when a = b), and greedy left-to-right
    * non-overlap takes the EVEN offsets within each island — exactly
    * the operator's fold semantics. A taken position emits the fused
    * "a b" symbol and its successor drops. `MATERIALIZED` is
    * load-bearing: each round references s(r−1) twice, so inlined
    * CTEs would re-derive the chain 2^r times. */
  private def bpeTrainOracle(merges: Int): String = {
    s"""WITH ${bpeRoundCtes(merges)}
      |${(1 to merges).map { r =>
         s"""SELECT CAST($r AS BIGINT) AS merge_rank, a AS tok_a,
           |  b AS tok_b, cnt FROM t$r""".stripMargin
       }.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** The 32-bin histogram-quantile scorecard in SQL — shared verbatim
    * by the batch gate (e177) and the streaming replay (e178): bin
    * counts are additive, so the merged per-batch store equals the
    * batch histogram exactly. Estimate/exact/error expression trees
    * mirror the Spark side operation-for-operation. */
  private val histQuantileOracle: String =
    """WITH cells AS (
      |  SELECT least(31, CAST(floor(value / CAST(16 AS DOUBLE))
      |    AS BIGINT)) AS bin, count(*) AS c
      |  FROM events GROUP BY 1),
      |cum AS (
      |  SELECT bin, c,
      |    coalesce(sum(c) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM cells),
      |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n_rows FROM cells),
      |probs(i, prob) AS (VALUES
      |  (0, CAST(0.25 AS DOUBLE)), (1, CAST(0.5 AS DOUBLE)),
      |  (2, CAST(0.75 AS DOUBLE)), (3, CAST(0.9 AS DOUBLE)),
      |  (4, CAST(0.99 AS DOUBLE))),
      |ex AS (SELECT quantile_cont(value, [CAST(0.25 AS DOUBLE),
      |  CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE),
      |  CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS qs FROM events),
      |sel AS (
      |  SELECT p.prob, p.i, u.bin, u.c, u.cum_before,
      |    p.prob * n.n_rows AS target
      |  FROM probs p CROSS JOIN n JOIN cum u
      |    ON CAST(u.cum_before AS DOUBLE) < p.prob * n.n_rows
      |   AND p.prob * n.n_rows <= CAST(u.cum_before + u.c AS DOUBLE))
      |SELECT s.prob,
      |  round(CAST(16 AS DOUBLE) * s.bin
      |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
      |      / CAST(s.c AS DOUBLE), 6) AS est_q,
      |  round(ex.qs[s.i + 1], 6) AS exact_q,
      |  round(abs(CAST(16 AS DOUBLE) * s.bin
      |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
      |      / CAST(s.c AS DOUBLE) - ex.qs[s.i + 1]), 6) AS abs_err,
      |  round(abs(CAST(16 AS DOUBLE) * s.bin
      |    + CAST(16 AS DOUBLE) * (s.target - CAST(s.cum_before AS DOUBLE))
      |      / CAST(s.c AS DOUBLE) - ex.qs[s.i + 1]), 6)
      |    <= CAST(16 AS DOUBLE) AS within_bin
      |FROM sel s CROSS JOIN ex""".stripMargin

  /** Bellman-Ford unrolled to `rounds` relaxation stages over the
    * weighted co-purchase projection (integer weights
    * max(1, 201 − n_shared), so path costs are exact). MATERIALIZED
    * per stage — each references its predecessor twice. */
  private def wspOracle(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      val p = r - 1
      s"""d$r AS MATERIALIZED (
        |  SELECT node, min(cost) AS cost FROM (
        |    SELECT node, cost FROM d$p
        |    UNION ALL
        |    SELECT e.dst AS node, d.cost + e.w AS cost
        |    FROM symw e JOIN d$p d ON e.src = d.node) u
        |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgeCtes,
      |egw AS (
      |  SELECT a.sp AS node_a, b.sp AS node_b, count(*) AS n_shared
      |  FROM capped a JOIN capped b ON a.c = b.c AND a.sp < b.sp
      |  GROUP BY 1, 2 HAVING count(*) >= 190),
      |symw AS (
      |  SELECT node_a AS src, node_b AS dst,
      |    greatest(1, 201 - n_shared) AS w FROM egw
      |  UNION ALL
      |  SELECT node_b, node_a, greatest(1, 201 - n_shared) FROM egw),
      |seedv AS (SELECT min(src) AS seed FROM symw
      |          HAVING min(src) IS NOT NULL),
      |d0 AS MATERIALIZED (
      |  SELECT seed AS node, CAST(0 AS BIGINT) AS cost FROM seedv),
      |$stages
      |SELECT node, cost FROM d$rounds""".stripMargin
  }

  /** The e201 oracle: 6 unrolled synchronous LPA rounds over the
    * symmetrized min_shared=190 co-purchase projection — per round
    * the neighbor-label counts, the per-node max, and the min label
    * attaining it (all integer logic, no rounding anywhere). */
  private def lpaOracle(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      val p = r - 1
      s"""n$r AS (
        |  SELECT e.dst AS node, l.lbl, count(*) AS c
        |  FROM symlp e JOIN l$p l ON e.src = l.node GROUP BY 1, 2),
        |m$r AS (SELECT node, max(c) AS mc FROM n$r GROUP BY 1),
        |l$r AS MATERIALIZED (
        |  SELECT n.node, min(n.lbl) AS lbl
        |  FROM n$r n JOIN m$r m ON n.node = m.node AND n.c = m.mc
        |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphEdgeCtes,
      |eglp AS (
      |  SELECT a.sp AS node_a, b.sp AS node_b
      |  FROM capped a JOIN capped b ON a.c = b.c AND a.sp < b.sp
      |  GROUP BY 1, 2 HAVING count(*) >= 190),
      |symlp AS (
      |  SELECT node_a AS src, node_b AS dst FROM eglp
      |  UNION ALL SELECT node_b, node_a FROM eglp),
      |l0 AS MATERIALIZED (
      |  SELECT DISTINCT src AS node, src AS lbl FROM symlp),
      |$stages,
      |sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS comm_size
      |          FROM l$rounds GROUP BY 1)
      |SELECT l.node, l.lbl AS label, s.comm_size
      |FROM l$rounds l JOIN sizes s ON l.lbl = s.lbl""".stripMargin
  }

  /** Direct formula evaluation of the block-constant planes the
    * lossless-DC construction makes the real JPEG pipeline return
    * bit-exactly — shared verbatim by the baseline gate (e174) and
    * the PROGRESSIVE gate (e188): same expected planes, different
    * scan architecture under test. */
  private val jpegPlanesOracle: String =
    """WITH g AS (
        |  SELECT doc_id,
        |    16*(1 + doc_id % 3) AS w, 16*(1 + doc_id % 2) AS h
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id, 'y' AS plane, w AS pw, h AS ph FROM g
        |  UNION ALL SELECT doc_id, 'cb', w//2, h//2 FROM g
        |  UNION ALL SELECT doc_id, 'cr', w//2, h//2 FROM g),
        |yy AS (SELECT doc_id, plane, pw,
        |         unnest(generate_series(0, ph - 1)) AS y FROM pl),
        |xx AS (SELECT doc_id, plane, y,
        |         unnest(generate_series(0, pw - 1)) AS x FROM yy),
        |px AS (
        |  SELECT doc_id, plane, y, x,
        |    CASE plane
        |      WHEN 'y' THEN 2*((doc_id*5 + 3*(x//8) + 7*(y//8)) % 128)
        |      WHEN 'cb' THEN
        |        128 + 17*(((doc_id*3 + (x//8) + 2*(y//8)) % 15) - 7)
        |      ELSE 128 + 17*(((doc_id*11 + 2*(x//8) + (y//8)) % 15) - 7)
        |    END AS v
        |  FROM xx)
        |SELECT doc_id, plane, y, count(*)::BIGINT AS n_px,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(max(v) AS BIGINT) AS max_v,
        |  CAST(arg_min(v, x) AS BIGINT) AS first_v,
        |  CAST(arg_max(v, x) AS BIGINT) AS last_v
        |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** The e190 windowed-HLL oracle: the e179 register chain with a
    * day group key — same md5 hash, integer CASE-chain rho, and
    * exact-integer harmonic sum, aggregated group-wise. */
  private def hllWindowedOracle: String = {
    val rho = "CASE WHEN w = 0 THEN 55 " +
      (53 to 0 by -1).map(k =>
        s"WHEN w >= ${1L << k} THEN ${54 - k}").mkString(" ") + " END"
    val raw = """CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
      |                  / CAST(a.sum_int AS DOUBLE)""".stripMargin
    val est = s"""CASE WHEN $raw <= CAST(160 AS DOUBLE)
      |              AND a.v_zeros > 0
      |             THEN CAST(64 AS DOUBLE)
      |                  * ln(CAST(64 AS DOUBLE)
      |                       / CAST(a.v_zeros AS DOUBLE))
      |             ELSE $raw END""".stripMargin
    s"""WITH h AS (
      |  SELECT epoch_us(ts) // 86400000000 AS grp,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |      ::BIGINT AS h
      |  FROM events),
      |jw AS (SELECT grp, h & 63 AS j, h >> 6 AS w FROM h),
      |r0 AS (SELECT grp, j, max($rho) AS m_rho FROM jw GROUP BY 1, 2),
      |grps AS (SELECT DISTINCT grp FROM h),
      |regs AS (SELECT g.grp, t.j, coalesce(r0.m_rho, 0) AS m_rho
      |         FROM grps g CROSS JOIN range(0, 64) t(j)
      |         LEFT JOIN r0 USING (grp, j)),
      |a AS (SELECT grp,
      |    CAST(sum(1::BIGINT << (55 - m_rho)) AS BIGINT) AS sum_int,
      |    CAST(sum(CASE WHEN m_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_zeros
      |  FROM regs GROUP BY 1),
      |n AS (SELECT epoch_us(ts) // 86400000000 AS grp,
      |        count(DISTINCT user_id) AS n_exact FROM events
      |      GROUP BY 1)
      |SELECT a.grp AS dayord, n.n_exact, a.v_zeros, a.sum_int,
      |  round($est, 6) AS hll_est,
      |  round(abs($est - CAST(n.n_exact AS DOUBLE))
      |        / CAST(n.n_exact AS DOUBLE), 6) AS rel_err
      |FROM a JOIN n USING (grp)""".stripMargin
  }

  /** The e196 sliding-HLL oracle: e190's per-day register chain,
    * then each 3-day window (labeled by its last existing day) takes
    * the register MAX over the panes it covers — `r0.grp BETWEEN
    * w−2 AND w` is exactly the Spark side's pane→windows explode —
    * next to the exact distinct over the same span. */
  private def hllSlidingOracle: String = {
    val rho = "CASE WHEN w = 0 THEN 55 " +
      (53 to 0 by -1).map(k =>
        s"WHEN w >= ${1L << k} THEN ${54 - k}").mkString(" ") + " END"
    val raw = """CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
      |                  / CAST(a.sum_int AS DOUBLE)""".stripMargin
    val est = s"""CASE WHEN $raw <= CAST(160 AS DOUBLE)
      |              AND a.v_zeros > 0
      |             THEN CAST(64 AS DOUBLE)
      |                  * ln(CAST(64 AS DOUBLE)
      |                       / CAST(a.v_zeros AS DOUBLE))
      |             ELSE $raw END""".stripMargin
    s"""WITH h AS (
      |  SELECT epoch_us(ts) // 86400000000 AS grp,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |      ::BIGINT AS h
      |  FROM events),
      |jw AS (SELECT grp, h & 63 AS j, h >> 6 AS w FROM h),
      |r0 AS (SELECT grp, j, max($rho) AS m_rho FROM jw GROUP BY 1, 2),
      |wins AS (SELECT DISTINCT grp AS w FROM h),
      |sl AS (SELECT wins.w, r0.j, max(r0.m_rho) AS m_rho
      |       FROM r0 JOIN wins ON r0.grp BETWEEN wins.w - 2 AND wins.w
      |       GROUP BY 1, 2),
      |regs AS (SELECT wi.w, t.j, coalesce(sl.m_rho, 0) AS m_rho
      |         FROM wins wi CROSS JOIN range(0, 64) t(j)
      |         LEFT JOIN sl ON sl.w = wi.w AND sl.j = t.j),
      |a AS (SELECT w,
      |    CAST(sum(1::BIGINT << (55 - m_rho)) AS BIGINT) AS sum_int,
      |    CAST(sum(CASE WHEN m_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_zeros
      |  FROM regs GROUP BY 1),
      |ev AS (SELECT epoch_us(ts) // 86400000000 AS grp, user_id
      |       FROM events),
      |n AS (SELECT wins.w, count(DISTINCT ev.user_id) AS n_exact
      |      FROM ev JOIN wins ON ev.grp BETWEEN wins.w - 2 AND wins.w
      |      GROUP BY 1)
      |SELECT a.w AS dayord, n.n_exact, a.v_zeros, a.sum_int,
      |  round($est, 6) AS hll_est,
      |  round(abs($est - CAST(n.n_exact AS DOUBLE))
      |        / CAST(n.n_exact AS DOUBLE), 6) AS rel_err
      |FROM a JOIN n USING (w)""".stripMargin
  }


  /** The e207 oracle: three md5-exact register sets (purchase
    * cohort, click cohort, their union = registers over the combined
    * rows), the identical branchy estimator per set, and the
    * inclusion-exclusion overlap next to the exact intersection. */
  private def hllSetOpsOracle: String = {
    val rho = "CASE WHEN w = 0 THEN 55 " +
      (53 to 0 by -1).map(k =>
        s"WHEN w >= ${1L << k} THEN ${54 - k}").mkString(" ") + " END"
    def setCtes(x: String, where: String) =
      s"""h$x AS (
        |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM events $where),
        |jw$x AS (SELECT h & 63 AS j, h >> 6 AS w FROM h$x),
        |r$x AS (SELECT j, max($rho) AS m_rho FROM jw$x GROUP BY 1),
        |g$x AS (SELECT t.j, coalesce(r$x.m_rho, 0) AS m_rho
        |        FROM range(0, 64) t(j) LEFT JOIN r$x USING (j)),
        |a$x AS (SELECT
        |    CAST(sum(1::BIGINT << (55 - m_rho)) AS BIGINT) AS sum_int,
        |    CAST(sum(CASE WHEN m_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_zeros
        |  FROM g$x)""".stripMargin
    def est(x: String) = {
      val raw = s"""CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
        |      / CAST(a$x.sum_int AS DOUBLE)""".stripMargin
      s"""CASE WHEN $raw <= CAST(160 AS DOUBLE) AND a$x.v_zeros > 0
        |     THEN CAST(64 AS DOUBLE)
        |          * ln(CAST(64 AS DOUBLE) / CAST(a$x.v_zeros AS DOUBLE))
        |     ELSE $raw END""".stripMargin
    }
    val ix = s"(${est("a")}) + (${est("b")}) - (${est("u")})"
    s"""WITH ${setCtes("a", "WHERE event_type = 'purchase'")},
      |${setCtes("b", "WHERE event_type = 'click'")},
      |${setCtes("u", "WHERE event_type IN ('purchase', 'click')")},
      |ex AS (
      |  SELECT count(*) AS n_exact_overlap FROM (
      |    SELECT DISTINCT user_id FROM events
      |    WHERE event_type = 'purchase') pa
      |  JOIN (SELECT DISTINCT user_id FROM events
      |        WHERE event_type = 'click') cl USING (user_id))
      |SELECT ex.n_exact_overlap,
      |  round(${est("a")}, 6) AS est_a,
      |  round(${est("b")}, 6) AS est_b,
      |  round(${est("u")}, 6) AS est_union,
      |  round($ix, 6) AS est_overlap,
      |  round(abs(($ix) - CAST(ex.n_exact_overlap AS DOUBLE))
      |    / greatest(CAST(ex.n_exact_overlap AS DOUBLE),
      |               CAST(1 AS DOUBLE)), 6) AS rel_err
      |FROM aa CROSS JOIN ab CROSS JOIN au CROSS JOIN ex""".stripMargin
  }

  /** One HLL scorecard branch in SQL: md5-parity hash, the integer
    * CASE-chain rho (floats would flip at exact powers of two), max
    * per register over the full 0..63 range, the EXACT-integer
    * harmonic sum in units of 2^-55, and the branchy estimator with
    * identical expression tree as [[Sketches.hllScorecard]]. */
  private def hllOracleBranch(keyCol: String): String = {
    val rho = "CASE WHEN w = 0 THEN 55 " +
      (53 to 0 by -1).map(k =>
        s"WHEN w >= ${1L << k} THEN ${54 - k}").mkString(" ") + " END"
    val raw = """CAST(0.709 AS DOUBLE) * 4096 * 36028797018963968
      |                  / CAST(a.sum_int AS DOUBLE)""".stripMargin
    val est = s"""CASE WHEN $raw <= CAST(160 AS DOUBLE)
      |              AND a.v_zeros > 0
      |             THEN CAST(64 AS DOUBLE)
      |                  * ln(CAST(64 AS DOUBLE)
      |                       / CAST(a.v_zeros AS DOUBLE))
      |             ELSE $raw END""".stripMargin
    s"""(
      |WITH h AS (
      |  SELECT ('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 15))
      |    ::BIGINT AS h
      |  FROM events),
      |jw AS (SELECT h & 63 AS j, h >> 6 AS w FROM h),
      |r0 AS (SELECT j, max($rho) AS m_rho FROM jw GROUP BY 1),
      |regs AS (SELECT t.j, coalesce(r0.m_rho, 0) AS m_rho
      |         FROM range(0, 64) t(j) LEFT JOIN r0 USING (j)),
      |a AS (SELECT
      |    CAST(sum(1::BIGINT << (55 - m_rho)) AS BIGINT) AS sum_int,
      |    CAST(sum(CASE WHEN m_rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS v_zeros
      |  FROM regs),
      |n AS (SELECT count(DISTINCT $keyCol) AS n_exact FROM events)
      |SELECT '$keyCol' AS key_col, n.n_exact, a.v_zeros, a.sum_int,
      |  round($est, 6) AS hll_est,
      |  round(abs($est - CAST(n.n_exact AS DOUBLE))
      |        / CAST(n.n_exact AS DOUBLE), 6) AS rel_err
      |FROM a CROSS JOIN n)""".stripMargin
  }

  /** The e175 apply oracle: per-doc token counts before (s0) and
    * after (the chain's LAST stage) — applying the learned rules to
    * the training corpus IS the training loop's final state. LEFT
    * join + coalesce keeps zero-token docs (they vanish from the
    * unnest-based stages but trivially re-segment to themselves). */
  private def bpeApplyOracle(merges: Int): String =
    s"""WITH ${bpeRoundCtes(merges)}
      |SELECT s0.sid AS doc_id,
      |  CAST(len(s0.w) AS BIGINT) AS n_before,
      |  CAST(coalesce(len(f.w), len(s0.w)) AS BIGINT) AS n_after,
      |  CAST(len(s0.w) - coalesce(len(f.w), len(s0.w)) AS BIGINT)
      |    AS n_merged
      |FROM s0 LEFT JOIN s$merges f ON s0.sid = f.sid""".stripMargin

  private def bpeRoundCtes(merges: Int): String = {
    val rounds = (1 to merges).map { r =>
      val p = r - 1
      s"""p$r AS (
        |  SELECT w[i] AS a, w[i + 1] AS b
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i
        |        FROM s$p WHERE len(w) >= 2) t),
        |t$r AS MATERIALIZED (
        |  SELECT a, b, count(*) AS cnt FROM p$r GROUP BY 1, 2
        |  ORDER BY cnt DESC, a, b LIMIT 1),
        |x$r AS (
        |  SELECT sid, i, w[i] AS sym
        |  FROM (SELECT sid, w, unnest(range(1, len(w) + 1)) AS i
        |        FROM s$p) q),
        |m$r AS (
        |  SELECT sid, i, sym,
        |    CASE WHEN sym = (SELECT a FROM t$r)
        |          AND lead(sym) OVER (PARTITION BY sid ORDER BY i)
        |              = (SELECT b FROM t$r)
        |         THEN 1 ELSE 0 END AS hit
        |  FROM x$r),
        |g$r AS (
        |  SELECT sid, i, sym, hit,
        |    i - row_number() OVER (PARTITION BY sid, hit ORDER BY i)
        |      AS grp
        |  FROM m$r),
        |k$r AS (
        |  SELECT sid, i, sym, hit,
        |    CASE WHEN hit = 1
        |          AND (i - min(i) OVER (PARTITION BY sid, hit, grp))
        |              % 2 = 0
        |         THEN 1 ELSE 0 END AS taken
        |  FROM g$r),
        |z$r AS (
        |  SELECT sid, i,
        |    CASE WHEN taken = 1 THEN (SELECT a || ' ' || b FROM t$r)
        |         ELSE sym END AS sym,
        |    lag(taken) OVER (PARTITION BY sid ORDER BY i) AS prev_taken
        |  FROM k$r),
        |s$r AS MATERIALIZED (
        |  SELECT sid, list(sym ORDER BY i) AS w FROM z$r
        |  WHERE coalesce(prev_taken, 0) = 0 GROUP BY sid)"""
        .stripMargin
    }.mkString(",\n")
    s"""s0 AS MATERIALIZED (
      |  SELECT doc_id AS sid,
      |    list_filter(string_split(text, ' '), x -> x != '') AS w
      |  FROM documents),
      |$rounds""".stripMargin
  }

  /** The e195 oracle: `extra` unrolled CHARACTER-level merge rounds
    * over the distinct-(word, wc) table — the same island-parity
    * greedy re-segmentation as [[bpeRoundCtes]] but weighted by word
    * count and partitioned by word, with the vocab trajectory
    * reconstructed as base + rank (the operator enforces novel-symbol
    * adoption, so +1 per rank is exact, never assumed). */
  private def charBpeRoundCtes(extra: Int): String = {
    val rounds = (1 to extra).map { r =>
      val p = r - 1
      s"""p$r AS (
        |  SELECT w[i] AS a, w[i + 1] AS b, wc
        |  FROM (SELECT w, wc, unnest(range(1, len(w))) AS i
        |        FROM s$p WHERE len(w) >= 2) t),
        |t$r AS MATERIALIZED (
        |  SELECT a, b, CAST(sum(wc) AS BIGINT) AS cnt FROM p$r
        |  GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
        |x$r AS (
        |  SELECT word, wc, i, w[i] AS sym
        |  FROM (SELECT word, wc, w, unnest(range(1, len(w) + 1)) AS i
        |        FROM s$p) q),
        |m$r AS (
        |  SELECT word, wc, i, sym,
        |    CASE WHEN sym = (SELECT a FROM t$r)
        |          AND lead(sym) OVER (PARTITION BY word ORDER BY i)
        |              = (SELECT b FROM t$r)
        |         THEN 1 ELSE 0 END AS hit
        |  FROM x$r),
        |g$r AS (
        |  SELECT word, wc, i, sym, hit,
        |    i - row_number() OVER (PARTITION BY word, hit ORDER BY i)
        |      AS grp
        |  FROM m$r),
        |k$r AS (
        |  SELECT word, wc, i, sym, hit,
        |    CASE WHEN hit = 1
        |          AND (i - min(i) OVER (PARTITION BY word, hit, grp))
        |              % 2 = 0
        |         THEN 1 ELSE 0 END AS taken
        |  FROM g$r),
        |z$r AS (
        |  SELECT word, wc, i,
        |    CASE WHEN taken = 1 THEN (SELECT a || ' ' || b FROM t$r)
        |         ELSE sym END AS sym,
        |    lag(taken) OVER (PARTITION BY word ORDER BY i)
        |      AS prev_taken
        |  FROM k$r),
        |s$r AS MATERIALIZED (
        |  SELECT word, wc, list(sym ORDER BY i) AS w FROM z$r
        |  WHERE coalesce(prev_taken, 0) = 0 GROUP BY word, wc)"""
        .stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
      |  SELECT word, count(*) AS wc FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '),
      |      x -> x != '')) AS word
      |    FROM documents) GROUP BY 1),
      |s0 AS MATERIALIZED (
      |  SELECT word, wc,
      |    list_transform(range(1, len(word) + 1), i -> word[i:i]) AS w
      |  FROM w0),
      |$rounds""".stripMargin
  }

  private def charBpeVocabOracle(extra: Int): String = {
    val union = (1 to extra).map(r =>
      s"SELECT $r AS merge_rank, a AS tok_a, b AS tok_b, cnt FROM t$r")
      .mkString("\nUNION ALL\n")
    s"""WITH ${charBpeRoundCtes(extra)},
      |base AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS bv
      |         FROM (SELECT unnest(w) AS c FROM s0)),
      |rules AS ($union)
      |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, tok_a, tok_b,
      |  cnt, CAST(bv + merge_rank AS BIGINT) AS vocab_after,
      |  bv AS base_vocab
      |FROM rules CROSS JOIN base""".stripMargin
  }

  /** The e203 apply oracle: the chain's FINAL segmentation (s<extra>)
    * gives tokens-per-word; documents re-expand their word lists
    * against it (the memoized word-table serving shape, mirrored). */
  private def charBpeApplyOracle(extra: Int): String =
    s"""WITH ${charBpeRoundCtes(extra)},
      |tok AS (SELECT word, CAST(len(w) AS BIGINT) AS n_tok
      |        FROM s$extra),
      |dw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |    x -> x != '')) AS word FROM documents),
      |ag AS (SELECT dw.doc_id,
      |    CAST(sum(len(dw.word)) AS BIGINT) AS n_word_chars,
      |    CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_words
      |  FROM dw JOIN tok t USING (word) GROUP BY 1)
      |SELECT d.doc_id, coalesce(ag.n_word_chars, 0) AS n_word_chars,
      |  coalesce(ag.n_tokens, 0) AS n_tokens,
      |  coalesce(ag.n_words, 0) AS n_words
      |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id""".stripMargin

  /** Causal drawdown chain shared by the batch operator (e118) and its
    * streaming replay (e125): peak = running max, drawdown = rounded
    * identical ratio, max_drawdown = running max of the rounded
    * values — every stage exact cross-engine. */
  private val drawdownOracle =
    """WITH r AS (
      |  SELECT user_id, event_id, ts, value,
      |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM events),
      |d AS (
      |  SELECT user_id, event_id, ts, value, peak,
      |    round((peak - value) / peak, 6) AS drawdown
      |  FROM r)
      |SELECT user_id, event_id, ts, value, peak, drawdown,
      |  max(drawdown) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS max_drawdown
      |FROM d""".stripMargin

  /** The e22 k-means pipeline as a DuckDB CTE chain: emb → seed c0 →
    * assign a1 → means f1 → c1 → assign a2 → final means f2 (with
    * n_members) → final centroid arrays c2. Shared by the e22 oracle
    * and e54's trained-quantizer IVF. */
  /** The e74/e75 product-quantization chain: the [[kmeansCtes]] Lloyd
    * machinery with a subspace key `s` (m=4 slices of 16 dims, k=8,
    * 2 iterations, same rounding/tie rules) ending in `enc` — each
    * (vec_id, s) assigned to its FINAL codebook entry `cid` — plus
    * `emb4` (full vectors with label) and `pc2` (the final codebooks). */
  private lazy val pqCtes: String =
    """emb4 AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings),
      |subv AS (
      |  SELECT vec_id, label, s,
      |    list_slice(e, s*16 + 1, s*16 + 16) AS se
      |  FROM emb4 CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
      |pc0 AS (SELECT s, vec_id AS cid, se AS carr
      |        FROM subv WHERE vec_id < 8),
      |pa1 AS (
      |  SELECT vec_id, s, se, cid, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
      |  FROM (
      |    SELECT subv.vec_id, subv.s, subv.se, pc0.cid,
      |      round(list_sum(list_transform(range(1, len(subv.se) + 1),
      |        i -> (subv.se[i] - pc0.carr[i])
      |           * (subv.se[i] - pc0.carr[i]))), 6) AS d
      |    FROM subv JOIN pc0 ON subv.s = pc0.s) t),
      |pf1 AS (
      |  SELECT s, cid, i - 1 AS pos, round(avg(se[i]), 6) AS c_val
      |  FROM (SELECT s, cid, se, unnest(range(1, len(se) + 1)) AS i
      |        FROM pa1 WHERE rn = 1) t
      |  GROUP BY 1, 2, 3),
      |pc1 AS (SELECT s, cid, list(c_val ORDER BY pos) AS carr
      |        FROM pf1 GROUP BY 1, 2),
      |pa2 AS (
      |  SELECT vec_id, s, se, cid, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
      |  FROM (
      |    SELECT subv.vec_id, subv.s, subv.se, pc1.cid,
      |      round(list_sum(list_transform(range(1, len(subv.se) + 1),
      |        i -> (subv.se[i] - pc1.carr[i])
      |           * (subv.se[i] - pc1.carr[i]))), 6) AS d
      |    FROM subv JOIN pc1 ON subv.s = pc1.s) t),
      |pf2 AS (
      |  SELECT s, cid, i - 1 AS pos, round(avg(se[i]), 6) AS c_val
      |  FROM (SELECT s, cid, se, unnest(range(1, len(se) + 1)) AS i
      |        FROM pa2 WHERE rn = 1) t
      |  GROUP BY 1, 2, 3),
      |pc2 AS (SELECT s, cid, list(c_val ORDER BY pos) AS carr
      |        FROM pf2 GROUP BY 1, 2),
      |enc AS (
      |  SELECT vec_id, label, s, se, cid FROM (
      |    SELECT subv.vec_id, subv.label, subv.s, subv.se, pc2.cid,
      |      row_number() OVER (PARTITION BY subv.vec_id, subv.s
      |        ORDER BY
      |        round(list_sum(list_transform(range(1, len(subv.se) + 1),
      |          i -> (subv.se[i] - pc2.carr[i])
      |             * (subv.se[i] - pc2.carr[i]))), 6),
      |        pc2.cid) AS rn
      |    FROM subv JOIN pc2 ON subv.s = pc2.s) t WHERE rn = 1)"""
      .stripMargin

  /** The e76/e79 composed IVF-PQ chain: the [[kmeansCtes]] coarse
    * quantizer + [[kmeansCellsCte]] corpus cells + [[pqCtes]] codebooks
    * /codes, then the query side (vec_id < 10): per-subspace query
    * slices `qsub76`, the 2 nearest coarse cells `qprobes76` (e54's
    * probe shape), candidates = probed cells' members `cand76`, and
    * the ADC score over ONLY those candidates' codes, ranked
    * (adc asc, n_id) in `aranked76`. */
  private lazy val ivfpqScoreCtes: String =
    s"""$kmeansCtes,
       |$kmeansCellsCte,
       |$pqCtes,
       |q76 AS (SELECT vec_id AS q_id, e AS qe FROM emb4
       |        WHERE vec_id < 10),
       |qsub76 AS (
       |  SELECT q_id, s, list_slice(qe, s*16 + 1, s*16 + 16) AS qs
       |  FROM q76 CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
       |qprobes76 AS (
       |  SELECT vec_id AS q_id, cluster_id AS cell FROM (
       |    SELECT emb.vec_id, c2.cluster_id, row_number() OVER
       |      (PARTITION BY emb.vec_id ORDER BY
       |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
       |          i -> (emb.e[i] - c2.carr[i])
       |             * (emb.e[i] - c2.carr[i]))), 6),
       |        c2.cluster_id) AS rn
       |    FROM emb CROSS JOIN c2 WHERE emb.vec_id < 10) t
       |  WHERE rn <= 2),
       |cand76 AS (
       |  SELECT p.q_id, cc.n_id
       |  FROM qprobes76 p JOIN ccells cc ON p.cell = cc.cell
       |  WHERE p.q_id <> cc.n_id),
       |persub76 AS (
       |  SELECT cd.q_id, cd.n_id, n.s,
       |    list_sum(list_transform(range(1, 16 + 1),
       |      i -> (qs.qs[i] - c.carr[i]) * (qs.qs[i] - c.carr[i])))
       |      AS d
       |  FROM cand76 cd
       |  JOIN enc n ON n.vec_id = cd.n_id
       |  JOIN pc2 c ON n.s = c.s AND n.cid = c.cid
       |  JOIN qsub76 qs ON qs.q_id = cd.q_id AND qs.s = n.s),
       |ascore76 AS (
       |  SELECT q_id, n_id,
       |    round(list_sum(list(d ORDER BY s)), 6) AS adc
       |  FROM persub76 GROUP BY 1, 2),
       |aranked76 AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY adc, n_id) AS rank
       |  FROM ascore76)""".stripMargin

  /** The e80/e79 exact-re-rank tail over [[ivfpqScoreCtes]]:
    * `rcand` = each query's top-10 ADC candidates, `rranked` = those
    * candidates re-scored with exact squared-L2 against the full
    * vectors and re-ranked (dist asc, n_id). */
  private lazy val ivfpqRerankCtes: String =
    """rcand AS (SELECT q_id, n_id FROM aranked76 WHERE rank <= 10),
      |rscore AS (
      |  SELECT rc.q_id, rc.n_id,
      |    round(list_sum(list_transform(range(1, len(q.qe) + 1),
      |      i -> (q.qe[i] - n.e[i]) * (q.qe[i] - n.e[i]))), 6)
      |      AS dist
      |  FROM rcand rc
      |  JOIN q76 q ON q.q_id = rc.q_id
      |  JOIN emb4 n ON n.vec_id = rc.n_id),
      |rranked AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY q_id ORDER BY dist, n_id) AS rank
      |  FROM rscore)""".stripMargin

  /** The e81/e79 RESIDUAL IVF-PQ chain over [[ivfpqScoreCtes]]'s
    * kmeans/cells/query CTEs: residuals = corpus vector minus its
    * assigned (final) coarse centroid, the pqCtes-shaped per-subspace
    * Lloyd chain retrained on them (cell carried through to `renc`),
    * query residuals PER PROBED CELL, and the cell-consistent ADC
    * ranking in `raranked`. Chains the non-residual CTEs reference
    * but this one does not (enc, pc2, …) are pruned by the engine. */
  private lazy val ivfpqResidCtes: String =
    """resid AS (
      |  SELECT cc.n_id AS vec_id, cc.cell,
      |    list_transform(range(1, len(cc.ne) + 1),
      |      i -> cc.ne[i] - cg.carr[i]) AS re
      |  FROM ccells cc JOIN c2 cg ON cc.cell = cg.cluster_id),
      |rsubv AS (
      |  SELECT vec_id, cell, s,
      |    list_slice(re, s*16 + 1, s*16 + 16) AS se
      |  FROM resid CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
      |rpc0 AS (SELECT s, vec_id AS cid, se AS carr
      |         FROM rsubv WHERE vec_id < 8),
      |rpa1 AS (
      |  SELECT vec_id, s, se, cid, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
      |  FROM (
      |    SELECT rsubv.vec_id, rsubv.s, rsubv.se, rpc0.cid,
      |      round(list_sum(list_transform(range(1, len(rsubv.se) + 1),
      |        i -> (rsubv.se[i] - rpc0.carr[i])
      |           * (rsubv.se[i] - rpc0.carr[i]))), 6) AS d
      |    FROM rsubv JOIN rpc0 ON rsubv.s = rpc0.s) t),
      |rpf1 AS (
      |  SELECT s, cid, i - 1 AS pos, round(avg(se[i]), 6) AS c_val
      |  FROM (SELECT s, cid, se, unnest(range(1, len(se) + 1)) AS i
      |        FROM rpa1 WHERE rn = 1) t
      |  GROUP BY 1, 2, 3),
      |rpc1 AS (SELECT s, cid, list(c_val ORDER BY pos) AS carr
      |         FROM rpf1 GROUP BY 1, 2),
      |rpa2 AS (
      |  SELECT vec_id, s, se, cid, row_number() OVER
      |    (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
      |  FROM (
      |    SELECT rsubv.vec_id, rsubv.s, rsubv.se, rpc1.cid,
      |      round(list_sum(list_transform(range(1, len(rsubv.se) + 1),
      |        i -> (rsubv.se[i] - rpc1.carr[i])
      |           * (rsubv.se[i] - rpc1.carr[i]))), 6) AS d
      |    FROM rsubv JOIN rpc1 ON rsubv.s = rpc1.s) t),
      |rpf2 AS (
      |  SELECT s, cid, i - 1 AS pos, round(avg(se[i]), 6) AS c_val
      |  FROM (SELECT s, cid, se, unnest(range(1, len(se) + 1)) AS i
      |        FROM rpa2 WHERE rn = 1) t
      |  GROUP BY 1, 2, 3),
      |rpc2 AS (SELECT s, cid, list(c_val ORDER BY pos) AS carr
      |         FROM rpf2 GROUP BY 1, 2),
      |renc AS (
      |  SELECT vec_id, cell, s, se, cid FROM (
      |    SELECT rsubv.vec_id, rsubv.cell, rsubv.s, rsubv.se,
      |      rpc2.cid,
      |      row_number() OVER (PARTITION BY rsubv.vec_id, rsubv.s
      |        ORDER BY
      |        round(list_sum(list_transform(range(1, len(rsubv.se) + 1),
      |          i -> (rsubv.se[i] - rpc2.carr[i])
      |             * (rsubv.se[i] - rpc2.carr[i]))), 6),
      |        rpc2.cid) AS rn
      |    FROM rsubv JOIN rpc2 ON rsubv.s = rpc2.s) t WHERE rn = 1),
      |qres AS (
      |  SELECT q.q_id, p.cell,
      |    list_transform(range(1, len(q.qe) + 1),
      |      i -> q.qe[i] - cg.carr[i]) AS qre
      |  FROM q76 q JOIN qprobes76 p ON p.q_id = q.q_id
      |  JOIN c2 cg ON p.cell = cg.cluster_id),
      |qrsub AS (
      |  SELECT q_id, cell, s,
      |    list_slice(qre, s*16 + 1, s*16 + 16) AS qs
      |  FROM qres CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss),
      |rpersub AS (
      |  SELECT qs.q_id, n.vec_id AS n_id, n.s,
      |    list_sum(list_transform(range(1, 16 + 1),
      |      i -> (qs.qs[i] - c.carr[i]) * (qs.qs[i] - c.carr[i])))
      |      AS d
      |  FROM renc n
      |  JOIN rpc2 c ON n.s = c.s AND n.cid = c.cid
      |  JOIN qrsub qs ON qs.s = n.s AND qs.cell = n.cell
      |  WHERE qs.q_id <> n.vec_id),
      |rascore AS (
      |  SELECT q_id, n_id,
      |    round(list_sum(list(d ORDER BY s)), 6) AS adc
      |  FROM rpersub GROUP BY 1, 2),
      |raranked AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY q_id ORDER BY adc, n_id) AS rank
      |  FROM rascore)""".stripMargin

  /** Parameterized composed IVF-PQ oracle chain: coarse k-means
    * (k=8, 2 Lloyd iterations) and per-subspace PQ codebooks trained
    * on the vectors satisfying `trainPred`, the WHOLE corpus
    * cell-assigned and encoded against them, queries (vec_id < 10)
    * probing `np` cells, ADC-ranked; with `rr` > 0, an exact-L2
    * re-rank over the top `rr` candidates. Emits CTEs prefixed `px`,
    * ending in `${px}top` (composed top-3) and — when re-ranking —
    * `${px}rtop`. Instantiated for the e84 tuned chain (train = all,
    * m=8/L=8/kCodes=16/np=4/rr=30) and the e86 append gate (train =
    * the pre-append corpus, library defaults). Same rounding/tie
    * rules as every other chain. */
  private def ivfpqChainCtes(px: String, trainPred: String, m: Int,
      L: Int, kc: Int, np: Int, rr: Int): String = {
    val lloyd = (cIn: String, sub: String, out: String) =>
      s"""${px}$out AS (
         |  SELECT vec_id, s, se, cid, row_number() OVER
         |    (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
         |  FROM (
         |    SELECT t.vec_id, t.s, t.se, c.cid,
         |      round(list_sum(list_transform(range(1, len(t.se) + 1),
         |        i -> (t.se[i] - c.carr[i])
         |           * (t.se[i] - c.carr[i]))), 6) AS d
         |    FROM ${px}$sub t JOIN ${px}$cIn c ON t.s = c.s) t)"""
        .stripMargin
    val means = (aIn: String, out: String) =>
      s"""${px}${out}f AS (
         |  SELECT s, cid, i - 1 AS pos, round(avg(se[i]), 6) AS c_val
         |  FROM (SELECT s, cid, se, unnest(range(1, len(se) + 1)) AS i
         |        FROM ${px}$aIn WHERE rn = 1) t
         |  GROUP BY 1, 2, 3),
         |${px}$out AS (SELECT s, cid, list(c_val ORDER BY pos) AS carr
         |         FROM ${px}${out}f GROUP BY 1, 2)""".stripMargin
    val rerank = if (rr <= 0) "" else s""",
       |${px}rcand AS (SELECT q_id, n_id FROM ${px}ranked
       |               WHERE rank <= $rr),
       |${px}rscore AS (
       |  SELECT rc.q_id, rc.n_id,
       |    round(list_sum(list_transform(range(1, len(q.qe) + 1),
       |      i -> (q.qe[i] - n.e[i]) * (q.qe[i] - n.e[i]))), 6)
       |      AS dist
       |  FROM ${px}rcand rc
       |  JOIN ${px}q q ON q.q_id = rc.q_id
       |  JOIN emb4 n ON n.vec_id = rc.n_id),
       |${px}rranked AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY dist, n_id) AS rank
       |  FROM ${px}rscore),
       |${px}rtop AS (SELECT q_id, n_id FROM ${px}rranked
       |              WHERE rank <= 3)"""
    s"""${px}tr AS (SELECT vec_id, e FROM emb WHERE $trainPred),
       |${px}c0 AS (SELECT vec_id AS cluster_id, e AS carr
       |            FROM ${px}tr WHERE vec_id < 8),
       |${px}a1 AS (
       |  SELECT vec_id, e, cluster_id, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
       |  FROM (
       |    SELECT t.vec_id, t.e, c.cluster_id,
       |      round(list_sum(list_transform(range(1, len(t.e) + 1),
       |        i -> (t.e[i] - c.carr[i]) * (t.e[i] - c.carr[i]))),
       |        6) AS d
       |    FROM ${px}tr t CROSS JOIN ${px}c0 c) t),
       |${px}f1 AS (
       |  SELECT cluster_id, i - 1 AS pos, round(avg(e[i]), 6) AS c_val
       |  FROM (SELECT cluster_id, e, unnest(range(1, len(e) + 1)) AS i
       |        FROM ${px}a1 WHERE rn = 1) t
       |  GROUP BY 1, 2),
       |${px}c1 AS (SELECT cluster_id, list(c_val ORDER BY pos) AS carr
       |            FROM ${px}f1 GROUP BY 1),
       |${px}a2 AS (
       |  SELECT vec_id, e, cluster_id, row_number() OVER
       |    (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
       |  FROM (
       |    SELECT t.vec_id, t.e, c.cluster_id,
       |      round(list_sum(list_transform(range(1, len(t.e) + 1),
       |        i -> (t.e[i] - c.carr[i]) * (t.e[i] - c.carr[i]))),
       |        6) AS d
       |    FROM ${px}tr t CROSS JOIN ${px}c1 c) t),
       |${px}f2 AS (
       |  SELECT cluster_id, i - 1 AS pos, round(avg(e[i]), 6) AS c_val
       |  FROM (SELECT cluster_id, e, unnest(range(1, len(e) + 1)) AS i
       |        FROM ${px}a2 WHERE rn = 1) t
       |  GROUP BY 1, 2),
       |${px}c2 AS (SELECT cluster_id, list(c_val ORDER BY pos) AS carr
       |            FROM ${px}f2 GROUP BY 1),
       |${px}cells AS (
       |  SELECT vec_id AS n_id, e AS ne, cluster_id AS cell FROM (
       |    SELECT emb.vec_id, emb.e, c.cluster_id, row_number() OVER
       |      (PARTITION BY emb.vec_id ORDER BY
       |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
       |          i -> (emb.e[i] - c.carr[i])
       |             * (emb.e[i] - c.carr[i]))), 6),
       |        c.cluster_id) AS rn
       |    FROM emb CROSS JOIN ${px}c2 c) t WHERE rn = 1),
       |${px}trsub AS (
       |  SELECT vec_id, s, list_slice(e, s*$L + 1, s*$L + $L) AS se
       |  FROM ${px}tr CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |${px}pc0 AS (SELECT s, vec_id AS cid, se AS carr
       |             FROM ${px}trsub WHERE vec_id < $kc),
       |${lloyd("pc0", "trsub", "pa1")},
       |${means("pa1", "pc1")},
       |${lloyd("pc1", "trsub", "pa2")},
       |${means("pa2", "pc2")},
       |${px}esub AS (
       |  SELECT vec_id, s, list_slice(e, s*$L + 1, s*$L + $L) AS se
       |  FROM emb4 CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |${lloyd("pc2", "esub", "enc0")},
       |${px}enc AS (SELECT vec_id, s, se, cid FROM ${px}enc0
       |             WHERE rn = 1),
       |${px}q AS (SELECT vec_id AS q_id, e AS qe FROM emb4
       |           WHERE vec_id < 10),
       |${px}qsub AS (
       |  SELECT q_id, s, list_slice(qe, s*$L + 1, s*$L + $L) AS qs
       |  FROM ${px}q CROSS JOIN (SELECT unnest(range(0, $m)) AS s) ss),
       |${px}qprobes AS (
       |  SELECT vec_id AS q_id, cluster_id AS cell FROM (
       |    SELECT emb.vec_id, c.cluster_id, row_number() OVER
       |      (PARTITION BY emb.vec_id ORDER BY
       |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
       |          i -> (emb.e[i] - c.carr[i])
       |             * (emb.e[i] - c.carr[i]))), 6),
       |        c.cluster_id) AS rn
       |    FROM emb CROSS JOIN ${px}c2 c WHERE emb.vec_id < 10) t
       |  WHERE rn <= $np),
       |${px}cand AS (
       |  SELECT p.q_id, cc.n_id
       |  FROM ${px}qprobes p JOIN ${px}cells cc ON p.cell = cc.cell
       |  WHERE p.q_id <> cc.n_id),
       |${px}persub AS (
       |  SELECT cd.q_id, cd.n_id, n.s,
       |    list_sum(list_transform(range(1, $L + 1),
       |      i -> (qs.qs[i] - c.carr[i]) * (qs.qs[i] - c.carr[i])))
       |      AS d
       |  FROM ${px}cand cd
       |  JOIN ${px}enc n ON n.vec_id = cd.n_id
       |  JOIN ${px}pc2 c ON n.s = c.s AND n.cid = c.cid
       |  JOIN ${px}qsub qs ON qs.q_id = cd.q_id AND qs.s = n.s),
       |${px}ascore AS (
       |  SELECT q_id, n_id,
       |    round(list_sum(list(d ORDER BY s)), 6) AS adc
       |  FROM ${px}persub GROUP BY 1, 2),
       |${px}ranked AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id ORDER BY adc, n_id) AS rank
       |  FROM ${px}ascore),
       |${px}top AS (SELECT q_id, n_id FROM ${px}ranked
       |             WHERE rank <= 3)$rerank""".stripMargin
  }

  /** The e84 tuned chain: [[ivfpqChainCtes]] at train = all,
    * m=8/L=8/kCodes=16/nprobe=4/re-rank R=30 (prefix `t` — ends in
    * ttop/trtop). */
  private lazy val ivfpqTunedCtes: String =
    ivfpqChainCtes("t", "TRUE", m = 8, L = 8, kc = 16, np = 4, rr = 30)

  private lazy val kmeansCtes: String =
    """emb AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cluster_id, e AS carr
      |       FROM emb WHERE vec_id < 8),
      |a1 AS (
      |  SELECT vec_id, e, cluster_id, row_number() OVER
      |    (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
      |  FROM (
      |    SELECT emb.vec_id, emb.e, c0.cluster_id,
      |      round(list_sum(list_transform(range(1, len(emb.e) + 1),
      |        i -> (emb.e[i] - c0.carr[i]) * (emb.e[i] - c0.carr[i]))),
      |        6) AS d
      |    FROM emb CROSS JOIN c0) t),
      |f1 AS (
      |  SELECT cluster_id, i - 1 AS pos, round(avg(e[i]), 6) AS c_val
      |  FROM (SELECT cluster_id, e, unnest(range(1, len(e) + 1)) AS i
      |        FROM a1 WHERE rn = 1) t
      |  GROUP BY 1, 2),
      |c1 AS (SELECT cluster_id, list(c_val ORDER BY pos) AS carr
      |       FROM f1 GROUP BY 1),
      |a2 AS (
      |  SELECT vec_id, e, cluster_id, row_number() OVER
      |    (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
      |  FROM (
      |    SELECT emb.vec_id, emb.e, c1.cluster_id,
      |      round(list_sum(list_transform(range(1, len(emb.e) + 1),
      |        i -> (emb.e[i] - c1.carr[i]) * (emb.e[i] - c1.carr[i]))),
      |        6) AS d
      |    FROM emb CROSS JOIN c1) t),
      |f2 AS (
      |  SELECT cluster_id, i - 1 AS pos, round(avg(e[i]), 6) AS c_val,
      |    count(*) AS n_members
      |  FROM (SELECT cluster_id, e, unnest(range(1, len(e) + 1)) AS i
      |        FROM a2 WHERE rn = 1) t
      |  GROUP BY 1, 2),
      |c2 AS (SELECT cluster_id, list(c_val ORDER BY pos) AS carr
      |       FROM f2 GROUP BY 1)""".stripMargin

  /** Corpus assignment to the nearest FINAL k-means centroid (rounded
    * squared distance, centroid-id tie-break) — shared by e54's IVF
    * corpus side and e61's SemDeDup cells. Emits (n_id, ne, cell). */
  private lazy val kmeansCellsCte: String =
    """ccells AS (
      |  SELECT vec_id AS n_id, e AS ne, cluster_id AS cell FROM (
      |    SELECT emb.vec_id, emb.e, c2.cluster_id, row_number() OVER
      |      (PARTITION BY emb.vec_id ORDER BY
      |        round(list_sum(list_transform(range(1, len(emb.e) + 1),
      |          i -> (emb.e[i] - c2.carr[i])
      |             * (emb.e[i] - c2.carr[i]))), 6),
      |        c2.cluster_id) AS rn
      |    FROM emb CROSS JOIN c2) t WHERE rn = 1)""".stripMargin

  /** Rounded cosine between two DuckDB double-list columns — the SQL
    * twin of Similarity.cosine + duckRound(…, 6). */
  private def duckCos(ae: String, be: String): String =
    s"""round(
       |    list_sum(list_transform(range(1, len($ae) + 1),
       |      i -> $ae[i] * $be[i])) /
       |    (sqrt(list_sum(list_transform(range(1, len($ae) + 1),
       |       i -> $ae[i] * $ae[i]))) *
       |     sqrt(list_sum(list_transform(range(1, len($be) + 1),
       |       i -> $be[i] * $be[i])))), 6)""".stripMargin

  /** DuckDB twin of [[graft.ext.Similarity.lshPairsMulti]]'s candidate
    * generation at nBits=4, nTables=8: 32 hyperplane dots, 8 per-table
    * 4-bit buckets, the (table, bucket) unpivot, and the distinct
    * candidate pairs — CTEs ending in `vm` (vectors) and `mcand`. */
  private lazy val lshMultiCtes: String = {
    val nBits = 4
    val nTables = 8
    val dots = (0 until nBits * nTables).map(j =>
      s"""list_sum(list_transform(range(0, len(e)),
         |      i -> e[i + 1] * (((i * 31 + $j * 17) % 7) - 3))) AS d$j"""
        .stripMargin).mkString(",\n    ")
    val entries = (0 until nTables).map { t =>
      val b = (0 until nBits).map(j =>
        s"(CASE WHEN d${t * nBits + j} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"{'t': $t, 'b': $b}"
    }.mkString(",\n      ")
    s"""vm AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings),
       |dottedm AS (
       |  SELECT vec_id, e,
       |    $dots
       |  FROM vm),
       |tbm AS (
       |  SELECT vec_id, u.t AS t, u.b AS b FROM (
       |    SELECT vec_id, unnest([
       |      $entries]) AS u
       |    FROM dottedm) z),
       |mcand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM tbm x JOIN tbm y
       |    ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id)"""
      .stripMargin
  }

  /** DuckDB twin of [[graft.ext.Similarity.lshBucket]]: the 8
    * deterministic hyperplane dots and the sign-bit bucket id, as CTEs
    * ending in `bucketed (vec_id, e, bucket)`. Shared by the e15 oracle
    * and e52's recall denominator. */
  private lazy val lshBucketCtes: String = {
    val dots = (0 until 8).map(j =>
      s"""list_sum(list_transform(range(0, len(e)),
         |      i -> e[i + 1] * (((i * 31 + $j * 17) % 7) - 3))) AS d$j"""
        .stripMargin).mkString(",\n    ")
    val bucket = (0 until 8).map(j =>
      s"(CASE WHEN d$j > 0 THEN ${1 << j} ELSE 0 END)").mkString(" + ")
    s"""v AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings),
       |dotted AS (
       |  SELECT vec_id, e,
       |    $dots
       |  FROM v),
       |bucketed AS (
       |  SELECT vec_id, e, $bucket AS bucket FROM dotted)""".stripMargin
  }
}
