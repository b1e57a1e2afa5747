package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Encoding-drift canary (VERDICT r9 #3).
  *
  * The driver regenerated `/root/testdata` mid-round-9 with `events.ts`
  * switched from parquet TIMESTAMP(NANOS) to µs TIMESTAMP_NTZ, and every
  * seam that assumed the nanos encoding broke (watermarks, unix_micros,
  * Row.getTimestamp, DataProfile's type match) — 8 queries failed. This
  * suite regenerates the SAME events fixture in all three physical
  * encodings seen so far and pins every timestamp-consuming seam to
  * produce value-identical output on each, so the next footer-encoding
  * flip fails here, by name, before it reaches the driver gate:
  *
  *  - `nanos`: INT64 `ts` (what TIMESTAMP(NANOS) surfaces as under the
  *    `nanosAsLong` legacy conf), with non-zero sub-µs remainders so
  *    the div-1000 truncation direction is pinned too;
  *  - `ntz`:   µs TIMESTAMP_NTZ (pyarrow `timestamp[us]`, the current
  *    driver encoding);
  *  - `tz`:    µs TIMESTAMP (isAdjustedToUTC — Spark's native write).
  */
class EncodingCanarySpec extends SparkSpec {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  /** Canonical fixture rows keyed by an epoch-µs `usec` column every
    * encoding derives its `ts` from. 120 rows, 7 users, inter-event
    * gaps that straddle the 30-min session cut both ways (the %11
    * wiggle swings ± multiples of 1900 s around a 97 s base step). */
  private def baseFrame: DataFrame = spark.range(120).select(
    (col("id") + 1).as("event_id"),
    (lit(1709251200000000L) + col("id") * lit(97000003L) +
      (col("id") % 11) * lit(1900L * 1000000L)).as("usec"),
    (col("id") % 7).as("user_id"),
    concat(lit("type_"), (col("id") % 3).cast("string")).as("event_type"),
    (lit(100.0) + (col("id") % 13) * lit(0.25) -
      (col("id") % 5) * lit(0.1)).as("value"),
    concat(lit("""{"k":"""), col("id") % 5, lit("}")).as("props"))

  /** Write `df` as a single FILE `<dir>/events.parquet` — the driver
    * testdata layout (file streams glob it by exact name, so a
    * directory-shaped parquet would list zero matching files). */
  private def writeEventsFile(df: DataFrame, dir: Path): Unit = {
    Files.createDirectories(dir)
    val stage = dir.resolve("_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val listing = Files.list(stage)
    val part =
      try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst.orElseThrow()
      finally listing.close()
    Files.move(part, dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Scratch.deleteRecursively(stage)
  }

  private val outCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  private lazy val dirs: Map[String, String] = {
    val root = Paths.get("target", "test-fixtures", "enc_canary")
      .toAbsolutePath
    val b = baseFrame
    val byEnc = Map(
      // +event_id%997 plants sub-µs remainders the div-1000 must drop
      "nanos" -> b.withColumn("ts",
        col("usec") * 1000L + col("event_id") % 997),
      "ntz" -> b.withColumn("ts",
        timestamp_micros(col("usec")).cast("timestamp_ntz")),
      "tz" -> b.withColumn("ts", timestamp_micros(col("usec"))))
    byEnc.map { case (enc, df) =>
      val d = root.resolve(enc)
      writeEventsFile(df.select(outCols.map(col): _*), d)
      enc -> d.toString
    }
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    rows(df.orderBy(df.columns.map(col).toSeq: _*))

  test("a DECIMAL-encoded value column normalizes to DoubleType at " +
    "load and is profile- and query-invariant (VERDICT r10 #7: the " +
    "decimal canary)") {
    // the same events fixture with `value` written as DECIMAL(12,4).
    // baseFrame's values are multiples of 0.05 — NOT all exactly
    // binary-representable, which is the point: the decimal→double
    // cast must land on the same double the driver's float64 write
    // produces for the same decimal string (both are
    // nearest-double(exact rational)), so value identity holds
    // end-to-end rather than only for lucky values
    val root = Paths.get("target", "test-fixtures", "enc_canary_dec")
      .toAbsolutePath
    val decDir = root.resolve("decimal")
    val dblDir = root.resolve("double")
    val b = baseFrame.withColumn("ts", timestamp_micros(col("usec")))
    writeEventsFile(b.withColumn("value",
      col("value").cast(DecimalType(12, 4)))
      .select(outCols.map(col): _*), decDir)
    writeEventsFile(b.select(outCols.map(col): _*), dblDir)
    // the flip the canary exists for: parquet really carries DECIMAL
    val raw = spark.read.parquet(decDir.resolve("events.parquet").toString)
    assert(raw.schema("value").dataType == DecimalType(12, 4))
    // load-time contract: numerics are doubles
    val loadedDec = Tables.load(spark, decDir.toString, "events")
    assert(loadedDec.schema("value").dataType == DoubleType,
      s"decimal survived load as ${loadedDec.schema("value").dataType}" +
        " — Spark decimal arithmetic would silently replace the " +
        "float64 oracle contract")
    assert(sortedRows(loadedDec) ==
      sortedRows(Tables.load(spark, dblDir.toString, "events")))
    // schema-driven profiling treats it as the numeric it is: the
    // full stats set, including the avg/std a non-numeric match arm
    // would drop
    val prof = ext.DataProfile.profile(loadedDec).columns.toSet
    assert(Set("value_min", "value_max", "value_avg", "value_std")
      .subsetOf(prof),
      s"decimal-sourced value lost numeric profile stats: $prof")
    // and a registered numeric-consuming query is encoding-invariant
    val qDec = try sortedRows(
      SparkEntry.queries("e21_profile_events")(spark, decDir.toString))
    finally spark.sharedState.cacheManager.clearCache()
    val qDbl = try sortedRows(
      SparkEntry.queries("e21_profile_events")(spark, dblDir.toString))
    finally spark.sharedState.cacheManager.clearCache()
    assert(qDec.nonEmpty && qDec == qDbl,
      "e21 diverges between DECIMAL and double value encodings")
  }

  test("Tables.load normalizes every encoding to the same TimestampType " +
    "values") {
    val loaded = dirs.view.mapValues(Tables.load(spark, _, "events")).toMap
    loaded.foreach { case (enc, df) =>
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: ts is ${df.schema("ts").dataType}, not TimestampType")
    }
    val collected = loaded.view.mapValues(sortedRows).toMap
    collected.foreach { case (enc, rs) =>
      assert(rs == collected("tz"), s"$enc diverges from tz under load")
    }
  }

  test("DataProfile.profile keeps ts_min/ts_max under a RAW NTZ frame " +
    "(belt-and-braces below the load-time normalization)") {
    val raw = spark.read.parquet(dirs("ntz") + "/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val cols = ext.DataProfile.profile(raw).columns.toSet
    assert(cols.contains("ts_min") && cols.contains("ts_max"),
      s"raw-NTZ profile lost ts_min/ts_max: $cols")
  }

  // every timestamp-consuming seam, driven through the REGISTERED query
  // (what the driver actually runs): batch load + unix_micros sessionize,
  // as-of tolerance (unix_micros on joined ts), schema-driven profile,
  // the streaming raw-schema watermark path, and the staged late-data
  // replay (Row.getTimestamp + watermark eviction).
  Seq("e21_profile_events", "w6_sessionize", "j5_asof_tolerance",
    "g1_streaming_replay", "g10_streaming_late_replay").foreach { name =>
    test(s"$name is encoding-invariant") {
      val results = dirs.toSeq.sortBy(_._1).map { case (enc, d) =>
        val r = try enc -> sortedRows(SparkEntry.queries(name)(spark, d))
        finally spark.sharedState.cacheManager.clearCache()
        r
      }
      val (refEnc, ref) = results.head
      assert(ref.nonEmpty, s"$refEnc produced no rows")
      results.tail.foreach { case (enc, rs) =>
        assert(rs == ref, s"$name: $enc diverges from $refEnc")
      }
    }
  }
}
