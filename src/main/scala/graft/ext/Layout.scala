package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order (Morton)
  * interleaving.
  *
  * A 100 TB table is only as fast as what its scans can SKIP. Parquet
  * readers prune row groups / files by min-max column stats, but a
  * single-column sort only clusters ONE dimension — a predicate on any
  * other column touches every file. Interleaving the bits of two (or
  * more) bucketed dimensions into one sort key makes each contiguous key
  * range a near-square region of the (x, y) space, so per-file min-max
  * envelopes stay tight on BOTH dimensions and either predicate prunes
  * ~√F of F files instead of none — the standard lakehouse OPTIMIZE
  * ZORDER BY layout, built here from plain codegen'd bit arithmetic.
  *
  * The production write path is [[zorderWrite]]:
  * `repartitionByRange(zkey) + sortWithinPartitions` — a parallel
  * range-partitioned sort whose partition boundaries come from Spark's
  * reservoir sampling (cluster-grade, but boundary placement is not
  * bit-reproducible across engines). The ORACLE-facing twin
  * [[fileStats]] therefore simulates the same layout with an explicit
  * `row_number`-derived file id: deterministic, so DuckDB rebuilds the
  * identical file map. The simulation's global window is gate-only
  * machinery — at scale the file map IS the range partitioner's output,
  * never a single-task sort (LayoutSpec pins that zorderWrite's real
  * files beat the time layout's envelopes too).
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative bucket
    * columns: x takes even bit positions, y odd. 2·bits-wide key, pure
    * literal-shift arithmetic — fully codegen'd, no shuffle, identical
    * cross-engine. */
  def interleaveBits(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _)

  /** The DuckDB twin of [[interleaveBits]] as a SQL expression over
    * column names `x` and `y`. */
  def interleaveSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Deterministic layout simulation: assign rows to fixed-size "files"
    * in `orderBy` order and report each file's min-max envelope on both
    * dimensions — the exact stats a parquet footer would carry, so the
    * pruning win of a layout is measurable (and oracle-checkable)
    * without depending on writer partition boundaries. `tieBreak` must
    * complete a total order for cross-engine determinism. */
  def fileStats(df: DataFrame, layout: String, orderBy: Seq[Column],
                rowsPerFile: Int): DataFrame = {
    val w = Window.orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("file_id", expr(s"(rn - 1) DIV $rowsPerFile"))
      .groupBy(col("file_id"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        count(lit(1)).as("n_rows"))
      .withColumn("layout", lit(layout))
      .select(col("layout"), col("file_id"), col("min_x"), col("max_x"),
        col("min_y"), col("max_y"), col("n_rows"))
  }

  /** The real cluster write: range-repartition on the Z-key (parallel
    * sampled boundaries — no global sort) and sort within partitions so
    * every output file covers one tight Z-range. Each task writes its
    * own file; footer min-max stats then prune scans on either
    * dimension. */
  def zorderWrite(df: DataFrame, zkey: Column, numFiles: Int,
                  path: String): Unit =
    df.withColumn("zkey", zkey)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)

  /** Files a range predicate lo <= dim <= hi must scan under each
    * layout, from the [[fileStats]] envelopes — the pruning scorecard:
    * `n_scanned / n_files` is the fraction of the table the predicate
    * reads. */
  def pruningScore(stats: DataFrame, dim: String, lo: Long,
                   hi: Long): DataFrame =
    stats.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col(s"min_$dim") <= hi && col(s"max_$dim") >= lo, 1L)
          .otherwise(0L)).as("n_scanned"))
}
