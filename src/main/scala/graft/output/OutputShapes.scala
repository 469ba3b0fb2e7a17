package graft.output

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output shaping — the reference publishes each resolution in three CSV
  * shapes (singleindex wide / multiindex / stacked long) plus xlsx/sqlite
  * (SURVEY.md §2.1 S5–S7). The engine keeps data long internally and
  * renders shapes only at the export edge:
  *
  *  - stacked: one row per (series, ts, value) — scales to any series count;
  *  - singleindex: one column per flattened series name — inherently
  *    bounded (a CSV for humans), so it pivots with an explicit guard on
  *    the series count rather than pretending a 10^9-column frame exists;
  *  - multiindex/xlsx: out of scope (no offline xlsx writer); the column
  *    metadata that would populate the 6 header rows is emitted by
  *    Metadata.dataPackage instead.
  *
  * Timestamps render like the reference: `utc_timestamp` ISO-8601 Z plus
  * `cet_cest_timestamp` (Europe/Berlin local with offset, covering the DST
  * rendering the reference does with tz_convert).
  */
object OutputShapes {

  def utcIso(epochSec: Column): Column =
    date_format(timestamp_seconds(epochSec), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  def cetCestIso(epochSec: Column): Column =
    date_format(
      from_utc_timestamp(timestamp_seconds(epochSec), "Europe/Berlin"),
      "yyyy-MM-dd'T'HH:mm:ss")

  /** Stacked long export: (series_flat, utc_timestamp, cet_cest_timestamp,
    * value, markers-rendered).
    */
  def stacked(
      tier: DataFrame,
      seriesFlat: Column,
      epochCol: String,
      valueCol: String
  ): DataFrame =
    tier.select(
      seriesFlat.as("series"),
      utcIso(col(epochCol)).as("utc_timestamp"),
      cetCestIso(col(epochCol)).as("cet_cest_timestamp"),
      col(valueCol).as("value"))

  /** Singleindex wide export: one row per timestamp, one column per series.
    * Guarded: refuses to pivot an unbounded series set (this shape exists
    * for human-scale publication, not for the raw corpus).
    */
  def singleIndex(
      tier: DataFrame,
      seriesFlat: Column,
      epochCol: String,
      valueCol: String,
      maxSeries: Int = 10000
  ): DataFrame = {
    val named = tier.select(col(epochCol).as("_ts"), seriesFlat.as("_series"),
      col(valueCol).as("_v"))
    val series = named.select("_series").distinct()
      .orderBy("_series").collect().map(_.getString(0))
    require(series.length <= maxSeries,
      s"singleindex export over ${series.length} series (> $maxSeries); use stacked")
    named.groupBy(col("_ts"))
      .pivot("_series", series.toSeq)
      .agg(first(col("_v")))
      .withColumn("utc_timestamp", utcIso(col("_ts")))
      .withColumn("cet_cest_timestamp", cetCestIso(col("_ts")))
      .drop("_ts")
      .select((Seq(col("utc_timestamp"), col("cet_cest_timestamp")) ++
        series.map(col)): _*)
  }

  /** CSV sink (header, deterministic order via caller's sort). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
