package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid fusion: J1–J3, P9, F7, F8 from SURVEY.md §2.4 — the heart of the
  * reference's "Hybrid Fusion" (`hybrid_merger.py:184-202`).
  *
  * pandas expresses these as index alignments (`reindex`,
  * `combine_first`); relationally they are equi-joins on the minute
  * timestamp. Catalyst picks the physical join: when one side is a bounded
  * candle history it is broadcastable; two tick-scale sides get a sort-merge
  * join on the shuffle key — either survives a 100× scale-up, and adding a
  * symbol key to `keys` co-partitions everything downstream.
  */
object FusionOps {

  /** J1: `df_m1.reindex(df_ticks.index)` — for each tick-candle minute,
    * fetch the matching M1 row or NULL (`hybrid_merger.py:186`).
    * A plain left equi-join.
    */
  def reindexAlign(ticks: DataFrame, m1: DataFrame,
                   keys: Seq[String] = Seq("datetime")): DataFrame =
    ticks.join(m1, keys, "left")

  /** F7 (+P9, J1): consensus check — aligned minutes where
    * `abs(tick.close - m1.close) > threshold` are "catastrophic mismatches"
    * (`hybrid_merger.py:188-190`, threshold 0.01 ≈ 100 pips).
    * Returns the offending minutes (key columns + both closes + diff).
    */
  def catastrophes(ticks: DataFrame, m1: DataFrame, threshold: Double = 0.01,
                   keys: Seq[String] = Seq("datetime")): DataFrame = {
    val m1Sel = m1.select((keys.map(col) :+
      col("close").as("m1_close")): _*)
    ticks.select((keys.map(col) :+ col("close").as("tick_close")): _*)
      .join(m1Sel, keys, "left")
      .withColumn("close_diff", abs(col("tick_close") - col("m1_close")))
      .filter(col("close_diff") > threshold)
  }

  /** F8: reject catastrophe minutes from the tick frame —
    * `df_ticks.drop(catastrophes.index)` (`hybrid_merger.py:197`) — a left
    * anti join on the minute key. */
  def rejectCatastrophes(ticks: DataFrame, cata: DataFrame,
                         keys: Seq[String] = Seq("datetime")): DataFrame =
    ticks.join(cata.select(keys.map(col): _*), keys, "left_anti")

  /** J2: `combine_first` — the canonical hybrid-fusion operator
    * (`hybrid_merger.py:202`): union of both minute sets; per cell prefer
    * the tick value, fall back to M1 where the tick cell is NULL/absent.
    * Full outer join + per-column coalesce. pandas treats NaN as missing,
    * so `coalesce` is an exact equivalence (SURVEY §7 trap #2).
    */
  def combineFirst(ticks: DataFrame, m1: DataFrame,
                   keys: Seq[String] = Seq("datetime")): DataFrame = {
    val valueCols = ticks.columns.filterNot(keys.contains)
    val m1Only = m1.columns.filterNot(keys.contains)
      .filterNot(valueCols.contains)
    val t = valueCols.foldLeft(ticks)((d, c) =>
      d.withColumnRenamed(c, s"_t_$c"))
    val m = m1.columns.filterNot(keys.contains).foldLeft(m1)((d, c) =>
      d.withColumnRenamed(c, s"_m_$c"))
    val joined = t.join(m, keys, "full_outer")
    val merged = valueCols.map { c =>
      if (joined.columns.contains(s"_m_$c"))
        coalesce(col(s"_t_$c"), col(s"_m_$c")).as(c)
      else col(s"_t_$c").as(c)
    } ++ m1Only.map(c => col(s"_m_$c").as(c))
    joined.select((keys.map(col) ++ merged): _*)
  }

  /** J3: index intersection (`validator.py:14-16`) — inner join on the
    * minute key, both closes side by side for the forensic diff. */
  def intersectAlign(newDf: DataFrame, oldDf: DataFrame,
                     keys: Seq[String] = Seq("datetime")): DataFrame =
    newDf.join(oldDf, keys, "inner")
}
