package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core rollup / downsample operators, column-generic so they apply to any
  * long-format point table (a `Dataset[Point]`, the driver's `events`
  * fixture, or the synthesized `pages` stream).
  *
  * Semantics reproduce the reference pipeline's resample stage
  * (OPSD `time_series` main.ipynb: `df.resample('60min').mean()` plus
  * per-column `.sum()`/`.last()` policies, and `resample_markers` for the
  * marker column — SURVEY.md §2.4 A1–A3). Spark realization: hash
  * aggregation over `(series, floor(ts / period))`, which Catalyst executes
  * as partial (map-side) + final aggregation — the "two-phase windowed
  * aggregation" demanded by the north rule, with no custom code.
  *
  * Scale notes:
  *  - Tiers store algebraic partials `(sum, n)`; a higher tier aggregates
  *    the CHILD tier (hourly from 15-min partials, daily from hourly), so
  *    the raw table is read exactly once no matter how many tiers exist,
  *    and tier chaining is exact (no mean-of-means error).
  *  - All grouping keys are (series, bucket): with input partitioned by a
  *    series hash-bucket, AQE coalesces the post-shuffle side; a hot
  *    series is handled by the salted variant (see `saltedTier`).
  */
object TimeSeriesOps {

  /** Window start for a period, on an epoch-seconds column. Inputs are
    * non-negative epochs, so long division floors correctly.
    */
  def bucketStart(epochSec: Column, periodSec: Long): Column =
    (epochSec.cast("long") / periodSec).cast("long") * periodSec

  /** Tier-0 aggregation: raw points -> one row per (series, window) with
    * algebraic partials. `valueCol` must already be exact (integer-scaled)
    * when bitwise cross-engine match is required.
    *
    * Output: seriesCols ++ (bucket_ts, n, sum_v, mean_v).
    */
  def tier(
      points: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      periodSec: Long
  ): DataFrame = {
    points
      .groupBy((seriesCols.map(col) :+
        bucketStart(col(epochCol), periodSec).as("bucket_ts")): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol)).as("sum_v")
      )
      .withColumn("mean_v", col("sum_v") / col("n"))
  }

  /** Chain a child tier up one level: hourly from 15-min, daily from hourly.
    * Exact because it sums the stored partials (sum of sums, sum of counts)
    * rather than averaging averages.
    */
  def chainTier(
      childTier: DataFrame,
      seriesCols: Seq[String],
      parentPeriodSec: Long
  ): DataFrame = {
    childTier
      .groupBy((seriesCols.map(col) :+
        bucketStart(col("bucket_ts"), parentPeriodSec).as("bucket_ts")): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v")
      )
      .withColumn("mean_v", col("sum_v") / col("n"))
  }

  /** Salted two-phase aggregation for skewed series (the hot-domain case:
    * one domain can dominate a zipf-distributed crawl). Phase 1 aggregates
    * per (series, bucket, salt) — spreading one hot key over `salts`
    * reducers — phase 2 merges the partials without the salt. Algebraic
    * partials make the two-phase exactly equal to the direct aggregation.
    */
  def saltedTier(
      points: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      periodSec: Long,
      salts: Int,
      saltSource: String
  ): DataFrame = {
    val salted = points.withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salts)))
    val phase1 = salted
      .groupBy((seriesCols.map(col) :+
        bucketStart(col(epochCol), periodSec).as("bucket_ts") :+
        col("_salt")): _*)
      .agg(count(col(valueCol)).as("n"), sum(col(valueCol)).as("sum_v"))
    phase1
      .groupBy((seriesCols.map(col) :+ col("bucket_ts")): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
      .withColumn("mean_v", col("sum_v") / col("n"))
  }

  /** Marker resample (reference `resample_markers`/`glue_markers`):
    * sorted, deduped union of marker arrays within the parent window.
    * `sort_array` makes the result deterministic under any partitioning.
    */
  def rollupMarkers(markersCol: Column): Column =
    sort_array(array_distinct(flatten(collect_list(markersCol))))

  /** Render a marker array the way the reference renders its
    * `interpolated_values` column: entries joined by " | ".
    */
  def renderMarkers(markersCol: Column): Column =
    concat_ws(" | ", markersCol)

  /** Priority de-duplication (reference `~index.duplicated()` on DST
    * doubles / file overlaps — SURVEY.md §2.2 P6): keep, per (series, ts),
    * the single row ranked first by `priority`.
    */
  def dedupe(
      df: DataFrame,
      keyCols: Seq[String],
      priority: Column
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(priority)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Priority patch (reference `combine_first` — SURVEY.md §2.3 J3): keep
    * the left value where present, fill from the right. Realized as a
    * full-outer join on the key + `coalesce`, which Catalyst plans as a
    * shuffle join on the (already co-partitioned) series keys.
    */
  def combineFirst(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val l = left.select((keyCols.map(col) :+ col(valueCol).as("_lv")): _*)
    val r = right.select((keyCols.map(col) :+ col(valueCol).as("_rv")): _*)
    l.join(r, keyCols, "full_outer")
      .withColumn(valueCol, coalesce(col("_lv"), col("_rv")))
      .withColumn("patched", col("_lv").isNull && col("_rv").isNotNull)
      .drop("_lv", "_rv")
  }

  /** Lead/trail trim (reference drops all-NaN head/tail rows — P4):
    * per series, the first/last non-null timestamp and non-null count.
    */
  def trimStats(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String
  ): DataFrame =
    df.groupBy(seriesCols.map(col): _*)
      .agg(
        min(when(col(valueCol).isNotNull, col(epochCol))).as("first_ts"),
        max(when(col(valueCol).isNotNull, col(epochCol))).as("last_ts"),
        count(col(valueCol)).as("n_obs"),
        count(lit(1)).as("n_rows")
      )
}
