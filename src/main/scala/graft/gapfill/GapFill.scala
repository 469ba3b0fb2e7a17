package graft.gapfill

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid densification + gap handling, reproducing the reference's
  * imputation stage (OPSD `time_series` imputation.py: `find_nan` NaN-run
  * detection, `interpolate` of short gaps, forward-fill for selected
  * columns, marker bookkeeping — SURVEY.md §2.2 P5, §2.4 A5, §2.5 W1/W2).
  *
  * All ops are per-series window functions over `(partitionBy series,
  * orderBy ts)`. Scale invariant: a series NEVER spans Spark partitions —
  * upstream partitioning is by series hash-bucket — so `WindowExec`'s sort
  * is partition-local and the fill is deterministic at any cluster size.
  * The sort is paid once and reused by every windowed op in this file
  * (Catalyst collapses adjacent windows with the same ordering).
  */
object GapFill {

  /** Grid densify (reference `df.reindex(pd.date_range(...))` — P5):
    * one row per (series, grid tick) between each series' min and max
    * observed tick, values null where no observation exists.
    *
    * `sequence` + `explode` generates ticks per series — the per-series
    * range keeps the explode bounded (a series' lifetime / period), and a
    * left join brings observations back. Join keys are (series, ts), i.e.
    * co-partitioned with the upstream tier shuffle.
    */
  def densify(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      periodSec: Long
  ): DataFrame = {
    // One explicit exchange, reused three times: HashPartitioning(series)
    // satisfies the span-agg's, the join's (ClusteredDistribution over
    // series+epoch), and every downstream gap-fill window's distribution,
    // so spans, grid (Generate preserves partitioning), join and windows
    // all run shuffle-free on top of this single repartition.
    val parted = df.repartition(seriesCols.map(col): _*)
    val spans = parted.groupBy(seriesCols.map(col): _*)
      .agg(min(col(epochCol)).as("_t0"), max(col(epochCol)).as("_t1"))
    val grid = spans.select(
      (seriesCols.map(col) :+
        explode(sequence(col("_t0"), col("_t1"), lit(periodSec)))
          .as(epochCol)): _*)
    grid.join(parted, seriesCols :+ epochCol, "left_outer")
  }

  private def w(seriesCols: Seq[String], epochCol: String) =
    Window.partitionBy(seriesCols.map(col): _*).orderBy(col(epochCol))

  /** "Next observation" lookups run as RUNNING frames over DESCENDING
    * order instead of (currentRow, unboundedFollowing) frames: Spark
    * executes unbounded-following frames by re-evaluating the aggregate
    * for every row — O(n^2) per partition — while running frames
    * accumulate in O(n). Cost: one extra partition-local sort, no shuffle.
    */
  private def wDesc(seriesCols: Seq[String], epochCol: String) =
    Window.partitionBy(seriesCols.map(col): _*).orderBy(col(epochCol).desc)

  /** Annotate each row with the identity of its null-run: `_run_pos` =
    * 1-based position inside the current null run (0 for observed rows),
    * `_gap_len` = total length of the run the row belongs to.
    *
    * Gaps-and-islands via row numbers, all over the SAME series-partitioned
    * window — one shuffle + one sort for everything (re-partitioning by
    * (series, run-id) would double the shuffle cost at scale):
    *   run_pos = rn - rn(last observation)      (0-based from the obs)
    *   gap_len = rn(next observation) - rn(last observation) - 1,
    *             falling back to the partition edge for head/tail runs.
    */
  def annotateRuns(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String
  ): DataFrame = {
    val ws = w(seriesCols, epochCol)
    val prevW = ws.rowsBetween(Window.unboundedPreceding, 0)
    val nextW = wDesc(seriesCols, epochCol).rowsBetween(Window.unboundedPreceding, 0)
    val allW = Window.partitionBy(seriesCols.map(col): _*)
    val obsRn = when(col(valueCol).isNotNull, col("_rn"))
    df
      .withColumn("_rn", row_number().over(ws))
      .withColumn("_prev_rn", last(obsRn, ignoreNulls = true).over(prevW))
      .withColumn("_next_rn", last(obsRn, ignoreNulls = true).over(nextW))
      .withColumn("_n_rows", count(lit(1)).over(allW))
      .withColumn(
        "_run_pos",
        when(col(valueCol).isNotNull, lit(0L))
          .otherwise(col("_rn") - coalesce(col("_prev_rn"), lit(0L))))
      .withColumn(
        "_gap_len",
        when(col(valueCol).isNotNull, lit(0L))
          .otherwise(
            coalesce(col("_next_rn"), col("_n_rows") + 1) -
              coalesce(col("_prev_rn"), lit(0L)) - 1))
      .withColumn("_run_id", coalesce(col("_prev_rn"), lit(0L)))
      .drop("_rn", "_prev_rn", "_next_rn", "_n_rows")
  }

  /** Forward fill with a run-length limit (reference
    * `fillna(method='ffill', limit=...)` — W2). Fills a null only when its
    * position inside the null run is <= `limit`. Adds `markerName + "_ffill"`
    * to `markersOut` for filled rows.
    */
  def ffill(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      limit: Int,
      markerExpr: Column,
      denseGridPeriod: Option[Long] = None
  ): DataFrame = denseGridPeriod match {
    case Some(p) =>
      // Dense-grid fast path: on a densified grid (one row per tick) the
      // null-run position is pure time arithmetic, (t - tPrev)/p, so the
      // whole fill is ONE ascending window pass — one partition-local sort
      // instead of annotateRuns' ASC+DESC cascade. Row-for-row identical
      // to the generic path on densified input (GapFillSpec).
      val prevW = w(seriesCols, epochCol).rowsBetween(Window.unboundedPreceding, 0)
      val prevV = last(col(valueCol), ignoreNulls = true).over(prevW)
      val prevT = last(when(col(valueCol).isNotNull, col(epochCol)),
        ignoreNulls = true).over(prevW)
      df
        .withColumn("_pv", prevV)
        .withColumn("_pt", prevT)
        .withColumn("_do_fill",
          col(valueCol).isNull && col("_pv").isNotNull &&
            (col(epochCol) - col("_pt")) / p <= limit)
        .withColumn("value_filled",
          when(col("_do_fill"), col("_pv")).otherwise(col(valueCol)))
        .withColumn("markers",
          when(col("_do_fill"), array(markerExpr)).otherwise(array().cast("array<string>")))
        .drop("_pv", "_pt", "_do_fill")
    case None =>
      val ws = w(seriesCols, epochCol)
      val prevW = ws.rowsBetween(Window.unboundedPreceding, 0)
      val ann = annotateRuns(df, seriesCols, epochCol, valueCol)
      val filledVal = last(col(valueCol), ignoreNulls = true).over(prevW)
      ann
        .withColumn("_do_fill",
          col(valueCol).isNull && col("_run_pos") <= limit && filledVal.isNotNull)
        .withColumn("value_filled",
          when(col("_do_fill"), filledVal).otherwise(col(valueCol)))
        .withColumn("markers",
          when(col("_do_fill"), array(markerExpr)).otherwise(array().cast("array<string>")))
        .drop("_run_id", "_run_pos", "_gap_len", "_do_fill")
  }

  /** Linear interpolation of short gaps (reference
    * `interpolate(method='time')` limited to runs <= maxGapPeriods — W1).
    * Fill = prev + (next - prev) * (t - tPrev) / (tNext - tPrev), only when
    * the whole run is <= `maxGapPeriods` and both neighbors exist (interior
    * gaps only — head/tail runs stay null, as in pandas interpolate with
    * limit_area='inside' semantics the reference relies on).
    */
  def interpolate(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      maxGapPeriods: Int,
      markerExpr: Column,
      denseGridPeriod: Option[Long] = None
  ): DataFrame = denseGridPeriod match {
    case Some(p) =>
      // Dense-grid fast path: gap length between the two neighbors is
      // (tNext - tPrev)/p - 1, so the fill needs exactly TWO window
      // passes — one ascending (prev obs), one descending (next obs as a
      // running frame, O(n)) — i.e. two partition-local sorts instead of
      // the generic path's six. Row-for-row identical to the generic path
      // on densified input (GapFillSpec asserts it).
      val prevW = w(seriesCols, epochCol).rowsBetween(Window.unboundedPreceding, 0)
      val nextW = wDesc(seriesCols, epochCol).rowsBetween(Window.unboundedPreceding, 0)
      val asc = df
        .withColumn("_pv", last(col(valueCol), ignoreNulls = true).over(prevW))
        .withColumn("_pt", last(when(col(valueCol).isNotNull, col(epochCol)),
          ignoreNulls = true).over(prevW))
      val both = asc
        .withColumn("_nv", last(col(valueCol), ignoreNulls = true).over(nextW))
        .withColumn("_nt", last(when(col(valueCol).isNotNull, col(epochCol)),
          ignoreNulls = true).over(nextW))
      val doFill = col(valueCol).isNull &&
        col("_pv").isNotNull && col("_nv").isNotNull &&
        (col("_nt") - col("_pt")) / p - 1 <= maxGapPeriods
      val interp = col("_pv") +
        (col("_nv") - col("_pv")) * (col(epochCol) - col("_pt")).cast("double") /
          (col("_nt") - col("_pt")).cast("double")
      both
        .withColumn("_do_fill", doFill)
        .withColumn("value_filled",
          when(col("_do_fill"), interp).otherwise(col(valueCol)))
        .withColumn("markers",
          when(col("_do_fill"), array(markerExpr)).otherwise(array().cast("array<string>")))
        .drop("_pv", "_pt", "_nv", "_nt", "_do_fill")
    case None =>
      val ws = w(seriesCols, epochCol)
      val prevW = ws.rowsBetween(Window.unboundedPreceding, 0)
      val nextW = wDesc(seriesCols, epochCol).rowsBetween(Window.unboundedPreceding, 0)
      val ann = annotateRuns(df, seriesCols, epochCol, valueCol)
      val prevV = last(col(valueCol), ignoreNulls = true).over(prevW)
      val prevT = last(when(col(valueCol).isNotNull, col(epochCol)), ignoreNulls = true).over(prevW)
      val nextV = last(col(valueCol), ignoreNulls = true).over(nextW)
      val nextT = last(when(col(valueCol).isNotNull, col(epochCol)), ignoreNulls = true).over(nextW)
      val doFill = col(valueCol).isNull &&
        col("_gap_len") <= maxGapPeriods &&
        prevV.isNotNull && nextV.isNotNull
      val interp = prevV +
        (nextV - prevV) * (col(epochCol) - prevT).cast("double") /
          (nextT - prevT).cast("double")
      ann
        .withColumn("_do_fill", doFill)
        .withColumn("value_filled",
          when(col("_do_fill"), interp).otherwise(col(valueCol)))
        .withColumn("markers",
          when(col("_do_fill"), array(markerExpr)).otherwise(array().cast("array<string>")))
        .drop("_run_id", "_run_pos", "_gap_len", "_do_fill")
  }

  /** FUSED densify + linear interpolation: one ascending window pass over
    * the OBSERVED rows (lead of the next observation), then each
    * observation explodes into itself plus its trailing gap ticks with the
    * interpolated (or null, when the run exceeds `maxGapPeriods`) value.
    *
    * Equivalent to `interpolate(densify(obs), …, denseGridPeriod=Some(p))`
    * for grid-aligned, non-null observations (GapFillSpec asserts bitwise
    * equality; `q_interp_fused` shares `q_interp`'s oracle) — but the plan
    * is ONE shuffle + ONE partition-local sort + a Generate, instead of
    * densify's span-agg + grid explode + join + two window sorts. At 100 TB
    * this halves the gap-fill stage's sort work and removes the join.
    *
    * Interior-only semantics are inherited structurally: generated ticks
    * exist only BETWEEN observations, so head/tail runs cannot occur.
    */
  def interpolateFused(
      obs: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      maxGapPeriods: Int,
      markerExpr: Column,
      periodSec: Long
  ): DataFrame = {
    val ws = w(seriesCols, epochCol)
    val base = obs
      .select((seriesCols.map(col) :+ col(epochCol) :+ col(valueCol)): _*)
      .withColumn("_nt", lead(col(epochCol), 1).over(ws))
      .withColumn("_nv", lead(col(valueCol), 1).over(ws))
      .withColumn("_gap",
        // clamped at 0: a duplicate or off-grid next observation closer
        // than one period would make the raw gap negative, and
        // sequence(0, -1) fabricates a descending phantom tick whose
        // interpolation divides by zero — clamping degrades such rows to
        // plain observations instead of corrupting output
        greatest(lit(0L),
          when(col("_nt").isNotNull,
            ((col("_nt") - col(epochCol)) / periodSec).cast("long") - 1)
            .otherwise(lit(0L))))
    val exploded = base
      .withColumn("_k", explode(sequence(lit(0L), col("_gap"))))
      .withColumn("_tick", col(epochCol) + col("_k") * periodSec)
    val isObs = col("_k") === 0L
    val doFill = !isObs && col("_gap") <= maxGapPeriods
    // identical expression shape to the dense-grid path (prev = this obs,
    // next = the led obs), so the doubles are bitwise equal
    val interp = col(valueCol) +
      (col("_nv") - col(valueCol)) * (col("_tick") - col(epochCol)).cast("double") /
        (col("_nt") - col(epochCol)).cast("double")
    val out = exploded
      .withColumn("value_filled",
        when(isObs, col(valueCol))
          .when(doFill, interp)
          .otherwise(lit(null).cast("double")))
      .withColumn("markers",
        when(doFill, array(markerExpr)).otherwise(array().cast("array<string>")))
      .withColumn(valueCol, when(isObs, col(valueCol)))
    out.select((seriesCols.map(col) :+
      col("_tick").as(epochCol) :+ col(valueCol) :+
      col("value_filled") :+ col("markers")): _*)
  }

  /** NaN-run report (reference `find_nan` — A5): one row per null run per
    * series with start/end tick and length. Drives imputation QA.
    */
  def gapRuns(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String
  ): DataFrame = {
    annotateRuns(df, seriesCols, epochCol, valueCol)
      .filter(col(valueCol).isNull)
      .groupBy((seriesCols.map(col) :+ col("_run_id")): _*)
      .agg(
        min(col(epochCol)).as("gap_start"),
        max(col(epochCol)).as("gap_end"),
        count(lit(1)).as("gap_len"))
      .drop("_run_id")
  }
}
