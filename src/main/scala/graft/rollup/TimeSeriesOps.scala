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

  /** As-of join: attach to each left row the LATEST right observation at
    * or before its timestamp (ties include the observation) within
    * `toleranceSec`, per key — "what was the last completed rollup when
    * this event arrived". Appends `asof_ts` plus `asof_<v>` for every
    * value column (all null when no in-tolerance observation exists).
    *
    * Spark-first, skew-safe shape: tag + union + ONE window pass
    * partitioned by (key, TIME BUCKET) — never by the key alone, whose
    * cardinality may be tiny (a 5-key corpus would serialize on 5 tasks).
    * Cross-bucket carry-in is resolved on the per-(key, bucket) TAIL
    * table (one row per bucket — thousands of rows, not billions), then
    * broadcast back. Total cost: one shuffle+sort of |L|+|R| rows on
    * (key, bucket) + a partial-agg pass — no inequality join (which
    * Catalyst would plan as a nested-loop blow-up).
    *
    * Contract: right rows unique per (keys, ts), right values non-null.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      toleranceSec: Long,
      bucketSec: Long = 86400L
  ): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    val rSel = right.select(
      (keyCols.map(col) :+ col(rightTsCol).cast("long").as("_ats")) ++
        valueCols.map(v => col(v).as(s"_rv_$v")): _*)
    val lAligned = valueCols.foldLeft(
        left.withColumn("_ats", col(leftTsCol).cast("long"))
          .withColumn("_is_l", lit(1))) { (d, v) =>
        d.withColumn(s"_rv_$v", lit(null).cast(rSel.schema(s"_rv_$v").dataType))
      }
    val rAligned = leftCols.filterNot(keyCols.contains).foldLeft(
        rSel.withColumn("_is_l", lit(0))) { (d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val u = lAligned
      .unionByName(rAligned.select(lAligned.columns.map(col).toIndexedSeq: _*))
      .withColumn("_bkt", floor(col("_ats") / bucketSec).cast("long"))
    // within-bucket running carry (right rows sort before left ties)
    val wb = Window.partitionBy((keyCols :+ "_bkt").map(col): _*)
      .orderBy(col("_ats"), col("_is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = valueCols.foldLeft(
        u.withColumn("_in_ts",
          last(when(col("_is_l") === 0, col("_ats")), ignoreNulls = true)
            .over(wb))) { (d, v) =>
        d.withColumn(s"_in_$v", last(col(s"_rv_$v"), ignoreNulls = true).over(wb))
      }
    // per-(key, bucket) tails of the right side, over ALL buckets present
    val tails = u.groupBy((keyCols :+ "_bkt").map(col): _*)
      .agg(
        max(when(col("_is_l") === 0, col("_ats"))).as("_t_last"),
        valueCols.map(v =>
          max_by(col(s"_rv_$v"), when(col("_is_l") === 0, col("_ats")))
            .as(s"_v_$v")): _*)
    // carry-in = latest tail of any STRICTLY EARLIER bucket (tiny frame:
    // one row per key x bucket)
    val wc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = valueCols.foldLeft(
        tails.withColumn("_c_ts", last(col("_t_last"), ignoreNulls = true).over(wc))) {
        (d, v) => d.withColumn(s"_c_$v", last(col(s"_v_$v"), ignoreNulls = true).over(wc))
      }
      .select((keyCols :+ "_bkt").map(col) ++
        (col("_c_ts") +: valueCols.map(v => col(s"_c_$v"))): _*)
    val joined = inBucket.filter(col("_is_l") === 1)
      .join(broadcast(carry), keyCols :+ "_bkt", "left")
    val asofTs = coalesce(col("_in_ts"), col("_c_ts"))
    val inTol = asofTs.isNotNull && (col("_ats") - asofTs) <= toleranceSec
    val out = valueCols.foldLeft(
        joined.withColumn("asof_ts", when(inTol, asofTs))) { (d, v) =>
        d.withColumn(s"asof_$v",
          when(inTol, when(col("_in_ts").isNotNull, col(s"_in_$v"))
            .otherwise(col(s"_c_$v"))))
      }
    out.select((leftCols.map(col) :+ col("asof_ts")) ++
      valueCols.map(v => col(s"asof_$v")): _*)
  }

  /** Trailing rolling aggregate over a TIME RANGE (not a row count): for
    * each tier row, count/sum/mean of `valueCol` over
    * [ts - windowSec + 1, ts] within its series — a RANGE window, so
    * missing buckets shorten the trailing set instead of silently
    * stretching it. Runs over TIER rows (bounded: one row per bucket per
    * series), so per-series window partitions stay small even at raw-data
    * scales where per-key windows over events would skew.
    */
  def rollingWindow(
      df: DataFrame,
      seriesCols: Seq[String],
      epochCol: String,
      valueCol: String,
      windowSec: Long
  ): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(epochCol).cast("long"))
      .rangeBetween(-(windowSec - 1), Window.currentRow)
    df.withColumn("roll_n", count(col(valueCol)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
  }

  /** Gap-based sessionization: per key, a new session starts when the gap
    * to the previous event exceeds `gapSec`; emits `session_seq`
    * (1-based per key, in (ts, tiebreak) order). One window pass
    * partitioned by the key — keys are high-cardinality entities (users),
    * so the partitions are small and many; the lag and the running sum
    * share one sort.
    */
  def sessionize(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tiebreakCol: String,
      gapSec: Long
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tiebreakCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_sess",
        (col("_prev_ts").isNull ||
          (col(tsCol) - col("_prev_ts")) > gapSec).cast("long"))
      .withColumn("session_seq", sum(col("_new_sess")).over(wRun))
      .drop("_prev_ts", "_new_sess")
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
