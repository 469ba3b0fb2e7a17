package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rollup.TimeSeriesOps
import graft.gapfill.GapFill

/** Driver-verifiable time-series queries over the `events` fixture
  * (series key = event_type). Each entry has a bitwise-matching DuckDB
  * oracle: all aggregates run over exact integers (`cents` =
  * round(value*100)), buckets are epoch-second longs, and every
  * floating-point expression has the same shape on both sides.
  */
object EventQueries {

  /** Canonical long-format view of events:
    * (event_type, user_id, event_id, epoch_s, cents).
    */
  def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet").select(
      col("event_type"), col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"),
      round(col("value") * 100).cast("long").as("cents"))

  /** Same view in DuckDB SQL (a FROM-able subquery). */
  val EV: String =
    "(SELECT event_type, user_id, event_id, epoch_us(ts)//1000000 AS epoch_s, " +
      "CAST(round(value*100) AS BIGINT) AS cents FROM events)"

  private def withMean(df: DataFrame): DataFrame =
    df.withColumn("mean_v",
      col("sum_cents").cast("double") / col("n") / lit(100.0))

  private def tierAt(s: SparkSession, dir: String, period: Long): DataFrame =
    withMean(
      TimeSeriesOps.tier(base(s, dir), Seq("event_type"), "epoch_s", "cents", period)
        .withColumnRenamed("sum_v", "sum_cents").drop("mean_v"))

  private def chain(df: DataFrame, period: Long): DataFrame =
    withMean(
      TimeSeriesOps.chainTier(
        df.withColumnRenamed("sum_cents", "sum_v"), Seq("event_type"), period)
        .withColumnRenamed("sum_v", "sum_cents").drop("mean_v"))

  /** SQL for the 15-min tier as a CTE body. */
  private val T15 =
    s"SELECT event_type, epoch_s//900*900 AS bucket_ts, count(cents) AS n, " +
      s"CAST(sum(cents) AS BIGINT) AS sum_cents FROM $EV e GROUP BY 1, 2"
  private val T1H =
    s"SELECT event_type, bucket_ts//3600*3600 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
      s"CAST(sum(sum_cents) AS BIGINT) AS sum_cents FROM ($T15) t15 GROUP BY 1, 2"
  private val T1D =
    s"SELECT event_type, bucket_ts//86400*86400 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
      s"CAST(sum(sum_cents) AS BIGINT) AS sum_cents FROM ($T1H) t1h GROUP BY 1, 2"
  private def meanSel(from: String) =
    s"SELECT event_type, bucket_ts, n, sum_cents, " +
      s"CAST(sum_cents AS DOUBLE)/n/100.0 AS mean_v FROM ($from) f"

  /** Hourly grid per event_type, densified (nulls where no events). */
  private def hourlyGrid(s: SparkSession, dir: String): DataFrame = {
    val hourly = tierAt(s, dir, 3600).select(
      col("event_type"), col("bucket_ts"), col("sum_cents"))
    GapFill.densify(hourly, Seq("event_type"), "bucket_ts", 3600)
  }

  /** Oracle CTE prefix for the densified hourly grid, annotated with
    * rn/prev/next observation row numbers — mirrors GapFill.annotateRuns.
    */
  private val GRID_ANN =
    s"""WITH h AS ($T1H),
       |span AS (SELECT event_type, min(bucket_ts) AS t0, max(bucket_ts) AS t1 FROM h GROUP BY 1),
       |grid AS (SELECT event_type, UNNEST(generate_series(t0, t1, 3600)) AS bucket_ts FROM span),
       |g AS (SELECT grid.event_type, grid.bucket_ts, h.sum_cents FROM grid LEFT JOIN h USING (event_type, bucket_ts)),
       |a1 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn FROM g),
       |a2 AS (SELECT *,
       |  last_value(CASE WHEN sum_cents IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS prev_rn,
       |  last_value(CASE WHEN sum_cents IS NOT NULL THEN sum_cents END IGNORE NULLS) OVER wp AS prev_v,
       |  last_value(CASE WHEN sum_cents IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wp AS prev_t,
       |  first_value(CASE WHEN sum_cents IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS next_rn,
       |  first_value(CASE WHEN sum_cents IS NOT NULL THEN sum_cents END IGNORE NULLS) OVER wn AS next_v,
       |  first_value(CASE WHEN sum_cents IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wn AS next_t
       |  FROM a1
       |  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wn AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |""".stripMargin

  // -------------------------------------------------------------------
  // queries
  // -------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-ORDER clustering + zone-map skipping: events laid out on the
    // Morton interleave of (user_id, time), then a two-predicate box
    // query answered from the zone sidecar — only file groups whose
    // (user, time) box intersects the query are listed/scanned
    // (SkippingSpec asserts the pruning; a 1-D layout can't prune both)
    "q_zorder_prune" -> ((s, dir) => {
      val root = Scratch.dir("zorder")
      val ev = base(s, dir)
      // layout bounds from ONE bounded agg (they shape the clustering
      // only — the query answer never depends on them)
      val r = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("epoch_s")), max(col("epoch_s"))).head()
      graft.table.Skipping.writeZOrdered(
        ev, "user_id", r.getLong(0), r.getLong(1),
        "epoch_s", r.getLong(2), r.getLong(3), root)
      val t0 = 1704067200L // 2024-01-01, the events fixture epoch
      graft.table.Skipping.readZBox(
          s, root, "user_id", 30, 69,
          "epoch_s", t0 + 8 * 86400, t0 + 15 * 86400 - 1)
        ._1
        .select("event_type", "user_id", "event_id", "epoch_s", "cents")
    }),

    // Z-ORDER APPEND maintenance: the store is built from the first two
    // weeks, the rest lands via appendZOrdered (appended files + a
    // driver-side widen of the bounded zone map — old files never
    // rewritten, SkippingSpec asserts byte-stability); the box read
    // straddles the append cut so the answer mixes base + appended rows
    "q_zorder_append" -> ((s, dir) => {
      val root = Scratch.dir("zorder_app")
      val ev = base(s, dir)
      val t0 = 1704067200L
      val cut = t0 + 15 * 86400
      val r = ev.agg(min(col("user_id")), max(col("user_id")),
        min(col("epoch_s")), max(col("epoch_s"))).head()
      graft.table.Skipping.writeZOrdered(
        ev.filter(col("epoch_s") < cut), "user_id", r.getLong(0), r.getLong(1),
        "epoch_s", r.getLong(2), r.getLong(3), root)
      graft.table.Skipping.appendZOrdered(
        ev.filter(col("epoch_s") >= cut), "user_id", r.getLong(0), r.getLong(1),
        "epoch_s", r.getLong(2), r.getLong(3), root)
      graft.table.Skipping.readZBox(
          s, root, "user_id", 30, 69,
          "epoch_s", t0 + 12 * 86400, t0 + 20 * 86400 - 1)
        ._1
        .select("event_type", "user_id", "event_id", "epoch_s", "cents")
    }),

    "q_tier_15min" -> ((s, dir) => tierAt(s, dir, 900)),
    // OPSD's third native resolution (data_sets carries 15/30/60min)
    "q_tier_30min" -> ((s, dir) => chain(tierAt(s, dir, 900).drop("mean_v"), 1800)),
    "q_tier_1h" -> ((s, dir) => chain(tierAt(s, dir, 900).drop("mean_v"), 3600)),
    // distinct aggregation over the series dimension (exact; the at-scale
    // variant is approx_count_distinct = HLL++, not oracle-matchable)
    "q_distinct_users" -> ((s, dir) =>
      base(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),
    // the at-scale distinct variant: HLL++ sketch (mergeable, one pass, no
    // exact-distinct shuffle of the key space). Deterministic for a fixed
    // input (sketch merge is commutative) but not DuckDB-matchable ->
    // rows-only driver check + TierSpec relative-error bound vs exact.
    "q_distinct_users_approx" -> ((s, dir) =>
      base(s, dir).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"))),

    "q_tier_1d" -> ((s, dir) =>
      chain(chain(tierAt(s, dir, 900).drop("mean_v"), 3600).drop("mean_v"), 86400)),

    // salted two-phase aggregation must equal the direct hourly tier
    "q_salted_1h" -> ((s, dir) =>
      withMean(
        TimeSeriesOps.saltedTier(base(s, dir), Seq("event_type"), "epoch_s",
            "cents", 3600, salts = 8, saltSource = "user_id")
          .withColumnRenamed("sum_v", "sum_cents").drop("mean_v"))),

    "q_ffill" -> ((s, dir) => {
      val g = hourlyGrid(s, dir)
      GapFill.ffill(g, Seq("event_type"), "bucket_ts", "sum_cents",
          limit = 2, markerExpr = concat(col("event_type"), lit("_ffill")),
          denseGridPeriod = Some(3600L))
        .select(col("event_type"), col("bucket_ts"),
          col("sum_cents").as("value"), col("value_filled"),
          TimeSeriesOps.renderMarkers(col("markers")).as("marker"))
    }),

    "q_interp" -> ((s, dir) => {
      val g = hourlyGrid(s, dir)
      GapFill.interpolate(g, Seq("event_type"), "bucket_ts", "sum_cents",
          maxGapPeriods = 4,
          markerExpr = concat(col("event_type"), lit("_interpolated")),
          denseGridPeriod = Some(3600L))
        .select(col("event_type"), col("bucket_ts"),
          col("sum_cents").as("value"),
          col("value_filled").cast("double").as("value_filled"),
          TimeSeriesOps.renderMarkers(col("markers")).as("marker"))
    }),

    // fused densify+interpolate (one window + Generate, no grid join) —
    // must hash-match the same oracle as the two-step q_interp
    "q_interp_fused" -> ((s, dir) => {
      val hourly = tierAt(s, dir, 3600).select(
        col("event_type"), col("bucket_ts"), col("sum_cents"))
      GapFill.interpolateFused(hourly, Seq("event_type"), "bucket_ts",
          "sum_cents", maxGapPeriods = 4,
          markerExpr = concat(col("event_type"), lit("_interpolated")),
          periodSec = 3600L)
        .select(col("event_type"), col("bucket_ts"),
          col("sum_cents").as("value"),
          col("value_filled").cast("double").as("value_filled"),
          TimeSeriesOps.renderMarkers(col("markers")).as("marker"))
    }),

    "q_gap_report" -> ((s, dir) =>
      GapFill.gapRuns(hourlyGrid(s, dir), Seq("event_type"), "bucket_ts",
        "sum_cents")),

    "q_markers_daily" -> ((s, dir) => {
      val g = hourlyGrid(s, dir)
      val interp = GapFill.interpolate(g, Seq("event_type"), "bucket_ts",
        "sum_cents", maxGapPeriods = 4,
        markerExpr = concat(col("event_type"), lit("_interpolated")),
        denseGridPeriod = Some(3600L))
      interp
        .groupBy(col("event_type"),
          TimeSeriesOps.bucketStart(col("bucket_ts"), 86400).as("bucket_ts"))
        .agg(TimeSeriesOps.rollupMarkers(col("markers")).as("markers"))
        .select(col("event_type"), col("bucket_ts"),
          TimeSeriesOps.renderMarkers(col("markers")).as("markers_day"))
    }),

    "q_dedupe_latest" -> ((s, dir) =>
      TimeSeriesOps.dedupe(
        base(s, dir).withColumn("bucket_ts",
          TimeSeriesOps.bucketStart(col("epoch_s"), 900)),
        Seq("user_id", "bucket_ts"), col("event_id").desc)
        .select(col("user_id"), col("bucket_ts"), col("event_id"), col("cents"))),

    "q_combine_first" -> ((s, dir) => {
      val b = base(s, dir)
      def hourlyOf(t: String) =
        TimeSeriesOps.tier(b.filter(col("event_type") === t),
            Seq.empty, "epoch_s", "cents", 3600)
          .select(col("bucket_ts"), col("sum_v"))
      TimeSeriesOps.combineFirst(
          hourlyOf("click"), hourlyOf("view"), Seq("bucket_ts"), "sum_v")
        .select(col("bucket_ts"), col("sum_v").as("value"), col("patched"))
    }),

    "q_trim_stats" -> ((s, dir) =>
      TimeSeriesOps.trimStats(
        base(s, dir).withColumn("value_n",
          when(col("cents") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("cents"))),
        Seq("event_type"), "epoch_s", "value_n")),

    "q_shift_delta" -> ((s, dir) => {
      val h = tierAt(s, dir, 3600)
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_ts"))
      h.select(col("event_type"), col("bucket_ts"), col("sum_cents"),
        (col("sum_cents") - lag(col("sum_cents"), 1).over(w)).as("delta"))
    }),

    "q_cumsum" -> ((s, dir) => {
      val h = tierAt(s, dir, 3600)
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, 0)
      h.select(col("event_type"), col("bucket_ts"), col("sum_cents"),
        sum(col("sum_cents")).over(w).as("running"))
    }),

    // Last-value downsample policy (reference resamples capacity columns
    // with .last() — A2)
    "q_tier_last" -> ((s, dir) =>
      TimeSeriesOps.dedupe(
        base(s, dir).withColumn("bucket_ts",
          TimeSeriesOps.bucketStart(col("epoch_s"), 3600)),
        Seq("event_type", "bucket_ts"),
        struct(col("epoch_s"), col("event_id")).desc)
        .select(col("event_type"), col("bucket_ts"),
          col("cents").as("last_cents"))),

    // summary/QA stats (reference notebook describe() — A6)
    "q_summary" -> ((s, dir) =>
      base(s, dir).groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        sum(col("cents")).as("sum_cents"),
        min(col("epoch_s")).as("first_ts"),
        max(col("epoch_s")).as("last_ts"))),

    // stacked CSV export shape with UTC + CET/CEST rendering (S5 + F2 DST)
    "q_stacked_export" -> ((s, dir) => {
      val h = tierAt(s, dir, 3600)
      graft.output.OutputShapes.stacked(
        h, concat(col("event_type"), lit("_cents_sum")), "bucket_ts", "sum_cents")
    }),

    // S7 JDBC sink, driver-gated: hourly tier -> write.jdbc into embedded
    // Derby (ships with Spark) -> read.jdbc back. Oracle recomputes the
    // tier from the events table.
    "q_jdbc_roundtrip" -> ((s, dir) => {
      val tier = tierAt(s, dir, 3600)
        .select("event_type", "bucket_ts", "n", "sum_cents")
      val db = Scratch.dir("jdbc_derby")
      graft.output.JdbcSink.roundTrip(tier, s"jdbc:derby:$db;create=true", "tier_1h")
        .select(col("event_type"), col("bucket_ts").cast("long").as("bucket_ts"),
          col("n").cast("long").as("n"),
          col("sum_cents").cast("long").as("sum_cents"))
    }),

    // S8 datapackage metadata, driver-gated: export a deterministic CSV,
    // emit the descriptor, return its (resource, bytes, sha256) rows; the
    // oracle hashes the SAME file independently via read_blob.
    "q_datapackage" -> ((s, dir) => {
      import s.implicits._
      val stacked = graft.output.OutputShapes.stacked(
          tierAt(s, dir, 3600),
          concat(col("event_type"), lit("_cents_sum")), "bucket_ts", "sum_cents")
        .orderBy("series", "utc_timestamp").coalesce(1)
      val root = Scratch.dir("dpkg")
      graft.output.OutputShapes.writeCsv(stacked, s"$root/stacked")
      graft.output.Metadata.dataPackage("verify-export", root,
        Seq(("stacked", stacked)))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(
        java.nio.file.Files.readString(java.nio.file.Paths.get(s"$root/datapackage.json")))
      val rows = for {
        i <- 0 until node.get("resources").size()
        r = node.get("resources").get(i)
        j <- 0 until r.get("files").size()
        f = r.get("files").get(j)
      } yield (r.get("path").asText(), f.get("bytes").asLong(), f.get("sha256").asText())
      rows.toDF("resource", "bytes", "sha256")
    }),

    // per-COLUMN source metadata in the descriptor ([pub: make_json.py]):
    // the engine emits one series descriptor per exported series carrying
    // all six header levels; the oracle derives the same list from the
    // events table independently
    "q_datapackage_fields" -> ((s, dir) => {
      import s.implicits._
      val h = tierAt(s, dir, 3600)
      val stacked = graft.output.OutputShapes.stacked(
          h, concat(col("event_type"), lit("_cents_sum")), "bucket_ts", "sum_cents")
        .orderBy("series", "utc_timestamp").coalesce(1)
      val root = Scratch.dir("dpkg_fields")
      graft.output.OutputShapes.writeCsv(stacked, s"$root/stacked")
      val keys = h.select("event_type").distinct().as[String].collect().sorted
        .map(et => graft.model.SeriesKey(et, "cents", "sum", "events",
          s"https://graft.example/docs/$et", "cents"))
      graft.output.Metadata.dataPackage("verify-export-fields", root,
        Seq(("stacked", stacked)), Map("stacked" -> keys.toSeq))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/datapackage.json")))
      val rows = for {
        i <- 0 until node.get("resources").size()
        r = node.get("resources").get(i)
        if r.has("series")
        j <- 0 until r.get("series").size()
        k = r.get("series").get(j)
      } yield (k.get("name").asText(), k.get("region").asText(),
        k.get("variable").asText(), k.get("attribute").asText(),
        k.get("source").asText(), k.get("web").asText(), k.get("unit").asText())
      rows.toDF("series", "region", "variable", "attribute", "source", "web", "unit")
    }),

    // singleindex wide export (one column per series), driver-gated: the
    // guarded pivot renders the publication shape the reference's
    // *_singleindex.csv carries
    "q_singleindex_export" -> ((s, dir) =>
      graft.output.OutputShapes.singleIndex(
        tierAt(s, dir, 3600),
        concat(col("event_type"), lit("_cents_sum")), "bucket_ts", "sum_cents")),

    // multiindex export round-trip: hourly tier -> 6-level-header wide CSV
    // file -> structural parse back to long. Proves the reference's
    // signature publication shape (incl. the documentation-only `web`
    // level, which labels columns but never joins flat names) renders and
    // re-reads value-exactly.
    "q_multiindex_export" -> ((s, dir) => {
      val h = tierAt(s, dir, 3600)
      val key = struct(
        col("event_type").as("domain"), lit("cents").as("metric"),
        lit("sum").as("attribute"), lit("events").as("source"),
        concat(lit("https://graft.example/docs/"), col("event_type")).as("web"),
        lit("cents").as("unit"))
      val (body, headers) = graft.output.OutputShapes.multiIndex(
        h, key, "bucket_ts", "sum_cents")
      val file = Scratch.dir("multiindex/hourly.csv")
      graft.output.OutputShapes.writeMultiIndexCsv(body, headers, file)
      graft.output.OutputShapes.readMultiIndexCsv(s, file)
        .select(col("series"), col("utc_timestamp"), col("cet_cest_timestamp"),
          col("value").cast("long").as("value"))
    }),

    // as-of join: each event attaches the latest hourly rollup at or
    // before its timestamp (<= 2h old) for its event_type — skew-safe
    // (key, time-bucket)-partitioned windows + broadcast carry, oracle =
    // DuckDB's native ASOF LEFT JOIN
    "q_asof_tier" -> ((s, dir) => {
      val hourly = tierAt(s, dir, 3600)
        .select(col("event_type"), col("bucket_ts"), col("sum_cents"))
      TimeSeriesOps.asofJoin(base(s, dir), hourly, Seq("event_type"),
          "epoch_s", "bucket_ts", Seq("sum_cents"),
          toleranceSec = 7200L, bucketSec = 21600L)
        .select(col("event_type"), col("user_id"), col("event_id"),
          col("epoch_s"), col("cents"), col("asof_ts"), col("asof_sum_cents"))
    }),

    // trailing 24h rolling aggregate over the hourly tier (RANGE window:
    // missing buckets shorten the trailing set, never stretch it)
    "q_rolling_24h" -> ((s, dir) =>
      TimeSeriesOps.rollingWindow(
          tierAt(s, dir, 3600).select(col("event_type"), col("bucket_ts"),
            col("sum_cents")),
          Seq("event_type"), "bucket_ts", "sum_cents", windowSec = 86400L)
        .select(col("event_type"), col("bucket_ts"),
          col("roll_n"), col("roll_sum").cast("long").as("roll_sum"),
          (col("roll_sum").cast("double") / col("roll_n") / lit(100.0))
            .as("roll_mean"))),

    // gap-based sessionization (30-min inactivity): per-user session
    // stats — the session boundary and running session_seq are window
    // expressions mirrored exactly by the oracle
    "q_sessions" -> ((s, dir) =>
      TimeSeriesOps.sessionize(base(s, dir), Seq("user_id"), "epoch_s",
          "event_id", gapSec = 1800L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), min("epoch_s").as("t_start"),
          max("epoch_s").as("t_end"), sum("cents").as("cents_sum"))),

    "q_owncalc" -> ((s, dir) =>
      base(s, dir)
        .groupBy(TimeSeriesOps.bucketStart(col("epoch_s"), 3600).as("bucket_ts"))
        .agg(
          sum(when(col("event_type") === "click", col("cents"))).as("click_cents"),
          sum(when(col("event_type") === "view", col("cents"))).as("view_cents"))
        .withColumn("total_cents", col("click_cents") + col("view_cents"))
        .withColumn("basis",
          when(col("click_cents").isNotNull && col("view_cents").isNotNull,
            lit("own calculation based on click | view")).otherwise(lit("")))),

    // Seasonal hour-of-week profile (the load-profile analysis OPSD data
    // exists for): hourly-tier partials re-keyed to hour_of_week
    // (0 = Mon 00:00 UTC; epoch day 0 is a Thursday, hence +72) and
    // re-summed — exact algebra over 168 output rows per series, so the
    // second aggregation is map-side-combined to almost nothing.
    "q_seasonal_profile" -> ((s, dir) =>
      tierAt(s, dir, 3600)
        .groupBy(col("event_type"),
          expr("(bucket_ts div 3600 + 72) % 168").as("hour_of_week"))
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
        .withColumn("mean_v",
          col("sum_cents").cast("double") / col("n") / lit(100.0))),

    // Event-rate anomaly detection: z-score of each hourly bucket's
    // count against its TRAILING 24h baseline (current bucket excluded,
    // RANGE frame so missing buckets shrink the baseline). The window
    // partials (wn, Σv, Σv²) are exact integers; z is assembled in
    // doubles with the identical expression shape on both sides — never
    // stddev(), whose internal update order isn't mirrorable.
    "q_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket_ts"))
        .rangeBetween(-86399, -3600)
      tierAt(s, dir, 3600)
        .select(col("event_type"), col("bucket_ts"), col("n"),
          count(col("n")).over(w).as("wn"),
          sum(col("n")).over(w).as("ws"),
          sum(col("n") * col("n")).over(w).as("wss"))
        .withColumn("z",
          when(col("wn") >= 3 &&
              col("wss").cast("double") - col("ws").cast("double") * col("ws") / col("wn") > 0,
            (col("n").cast("double") - col("ws").cast("double") / col("wn")) /
              sqrt((col("wss").cast("double") -
                col("ws").cast("double") * col("ws") / col("wn")) / col("wn"))))
        .withColumn("is_anomaly", coalesce(abs(col("z")) > lit(3.0), lit(false)))
    }),

    // Cross-metric Pearson correlation per series: does hourly event
    // COUNT co-move with hourly cents VOLUME? Sufficient statistics
    // (cnt, Σx, Σy, Σx², Σxy, Σy²) are exact BIGINTs gathered in ONE
    // pass; r is assembled in doubles with the identical expression on
    // both sides (never corr(), whose streaming update isn't mirrorable).
    "q_corr_metrics" -> ((s, dir) =>
      tierAt(s, dir, 3600)
        .select(col("event_type"), col("n").as("x"), col("sum_cents").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("r",
          (col("cnt").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
            (sqrt(col("cnt").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")) *
              sqrt(col("cnt").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))))),

    // Range (interval) join: events matched to data-derived "hot day"
    // intervals (days whose count is strictly above the series' daily
    // mean — compared in exact integers as n*cnt > total). The bucketed
    // equi-join shape never plans a nested-loop join (TierSpec).
    "q_range_join" -> ((s, dir) => {
      val daily = chain(chain(tierAt(s, dir, 900).drop("mean_v"), 3600)
        .drop("mean_v"), 86400)
        .select(col("event_type"), col("bucket_ts"), col("n"))
      val tot = daily.groupBy(col("event_type"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("cnt"))
      val hot = daily.join(broadcast(tot), Seq("event_type"))
        .filter(col("n") * col("cnt") > col("total"))
        .select(col("event_type"), col("bucket_ts").as("start_ts"),
          (col("bucket_ts") + 86400L).as("end_ts"))
      TimeSeriesOps.rangeJoin(base(s, dir), hot, Seq("event_type"),
          "epoch_s", "start_ts", "end_ts", bucketSec = 86400L)
        .groupBy(col("event_type"), col("start_ts"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents_sum"))
    }),

    // Per-day coverage report (OPSD data-availability QA): how many of
    // the day's 96 15-min buckets actually hold data, per series.
    "q_coverage" -> ((s, dir) =>
      tierAt(s, dir, 900)
        .groupBy(col("event_type"),
          expr("bucket_ts div 86400 * 86400").as("day_ts"))
        .agg(count(lit(1)).as("buckets_present"))
        .withColumn("coverage",
          col("buckets_present").cast("double") / lit(96.0)))
  )

  // -------------------------------------------------------------------
  // oracles
  // -------------------------------------------------------------------

  val oracleSql: Map[String, String] = Map(
    // the append-maintained store answers the straddling box identically
    "q_zorder_append" ->
      s"""SELECT event_type, user_id, event_id, epoch_s, cents FROM $EV e
         |WHERE user_id BETWEEN 30 AND 69
         |  AND epoch_s BETWEEN ${1704067200L + 12 * 86400}
         |                  AND ${1704067200L + 20 * 86400 - 1}""".stripMargin,

    // the zone-map-pruned box read must equal the plain box filter
    "q_zorder_prune" ->
      s"""SELECT event_type, user_id, event_id, epoch_s, cents FROM $EV e
         |WHERE user_id BETWEEN 30 AND 69
         |  AND epoch_s BETWEEN ${1704067200L + 8 * 86400}
         |                  AND ${1704067200L + 15 * 86400 - 1}""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the independent formulation of
    // the engine's union+window as-of (tolerance applied post-join)
    "q_asof_tier" ->
      s"""SELECT e.event_type, e.user_id, e.event_id, e.epoch_s, e.cents,
         |  CASE WHEN t.bucket_ts IS NOT NULL AND e.epoch_s - t.bucket_ts <= 7200
         |       THEN t.bucket_ts END AS asof_ts,
         |  CASE WHEN t.bucket_ts IS NOT NULL AND e.epoch_s - t.bucket_ts <= 7200
         |       THEN t.sum_cents END AS asof_sum_cents
         |FROM $EV e ASOF LEFT JOIN ($T1H) t
         |  ON e.event_type = t.event_type AND e.epoch_s >= t.bucket_ts""".stripMargin,

    "q_rolling_24h" ->
      s"""SELECT event_type, bucket_ts,
         |  count(sum_cents) OVER w AS roll_n,
         |  CAST(sum(sum_cents) OVER w AS BIGINT) AS roll_sum,
         |  CAST(sum(sum_cents) OVER w AS DOUBLE)
         |    / count(sum_cents) OVER w / 100.0 AS roll_mean
         |FROM ($T1H) h
         |WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
         |  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_sessions" ->
      s"""WITH s AS (SELECT user_id, event_id, epoch_s, cents,
         |    lag(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev_ts
         |  FROM $EV e),
         |m AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_s - prev_ts > 1800
         |                     THEN 1 ELSE 0 END AS new_sess FROM s),
         |r AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY epoch_s, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM m)
         |SELECT user_id, session_seq, count(*) AS n_events,
         |  min(epoch_s) AS t_start, max(epoch_s) AS t_end,
         |  CAST(sum(cents) AS BIGINT) AS cents_sum
         |FROM r GROUP BY 1, 2""".stripMargin,

    "q_tier_15min" -> meanSel(T15),
    "q_tier_30min" -> meanSel(
      s"SELECT event_type, bucket_ts//1800*1800 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
        s"CAST(sum(sum_cents) AS BIGINT) AS sum_cents FROM ($T15) t15 GROUP BY 1, 2"),
    "q_tier_1h" -> meanSel(T1H),
    "q_tier_1d" -> meanSel(T1D),
    "q_salted_1h" -> meanSel(T1H),
    "q_distinct_users" ->
      (s"SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, " +
        s"count(*) AS n_events FROM $EV e GROUP BY 1"),

    "q_ffill" -> (GRID_ANN +
      """SELECT event_type, bucket_ts, sum_cents AS value,
        |  CASE WHEN sum_cents IS NULL AND rn - COALESCE(prev_rn, 0) <= 2 AND prev_v IS NOT NULL
        |       THEN prev_v ELSE sum_cents END AS value_filled,
        |  CASE WHEN sum_cents IS NULL AND rn - COALESCE(prev_rn, 0) <= 2 AND prev_v IS NOT NULL
        |       THEN event_type || '_ffill' ELSE '' END AS marker
        |FROM a2""".stripMargin),

    "q_interp" -> (GRID_ANN +
      """SELECT event_type, bucket_ts, sum_cents AS value,
        |  CASE WHEN sum_cents IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
        |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 4
        |       THEN prev_v + (next_v - prev_v) * CAST(bucket_ts - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)
        |       ELSE CAST(sum_cents AS DOUBLE) END AS value_filled,
        |  CASE WHEN sum_cents IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
        |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 4
        |       THEN event_type || '_interpolated' ELSE '' END AS marker
        |FROM a2""".stripMargin),

    // identical result contract to q_interp (the fused plan must not
    // change a single bit)
    "q_interp_fused" -> (GRID_ANN +
      """SELECT event_type, bucket_ts, sum_cents AS value,
        |  CASE WHEN sum_cents IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
        |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 4
        |       THEN prev_v + (next_v - prev_v) * CAST(bucket_ts - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)
        |       ELSE CAST(sum_cents AS DOUBLE) END AS value_filled,
        |  CASE WHEN sum_cents IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
        |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 4
        |       THEN event_type || '_interpolated' ELSE '' END AS marker
        |FROM a2""".stripMargin),

    "q_gap_report" -> (GRID_ANN +
      """SELECT event_type, min(bucket_ts) AS gap_start, max(bucket_ts) AS gap_end,
        |  count(*) AS gap_len
        |FROM a2 WHERE sum_cents IS NULL
        |GROUP BY event_type, COALESCE(prev_rn, 0)""".stripMargin),

    "q_markers_daily" -> (GRID_ANN +
      """, m AS (SELECT event_type, bucket_ts,
        |  CASE WHEN sum_cents IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
        |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 4
        |       THEN event_type || '_interpolated' ELSE '' END AS marker
        |FROM a2)
        |SELECT event_type, bucket_ts//86400*86400 AS bucket_ts,
        |  COALESCE(string_agg(DISTINCT marker, ' | ' ORDER BY marker) FILTER (WHERE marker <> ''), '') AS markers_day
        |FROM m GROUP BY 1, 2""".stripMargin),

    "q_dedupe_latest" ->
      s"""SELECT user_id, bucket_ts, event_id, cents FROM (
         |  SELECT user_id, epoch_s//900*900 AS bucket_ts, event_id, cents,
         |    row_number() OVER (PARTITION BY user_id, epoch_s//900*900 ORDER BY event_id DESC) AS rn
         |  FROM $EV e) r WHERE rn = 1""".stripMargin,

    "q_combine_first" ->
      s"""WITH l AS (SELECT epoch_s//3600*3600 AS bucket_ts, CAST(sum(cents) AS BIGINT) AS lv FROM $EV e WHERE event_type = 'click' GROUP BY 1),
         |r AS (SELECT epoch_s//3600*3600 AS bucket_ts, CAST(sum(cents) AS BIGINT) AS rv FROM $EV e WHERE event_type = 'view' GROUP BY 1)
         |SELECT COALESCE(l.bucket_ts, r.bucket_ts) AS bucket_ts,
         |  COALESCE(lv, rv) AS value,
         |  (lv IS NULL AND rv IS NOT NULL) AS patched
         |FROM l FULL OUTER JOIN r ON l.bucket_ts = r.bucket_ts""".stripMargin,

    "q_trim_stats" ->
      s"""SELECT event_type,
         |  min(CASE WHEN value_n IS NOT NULL THEN epoch_s END) AS first_ts,
         |  max(CASE WHEN value_n IS NOT NULL THEN epoch_s END) AS last_ts,
         |  count(value_n) AS n_obs, count(*) AS n_rows
         |FROM (SELECT event_type, epoch_s,
         |        CASE WHEN cents % 7 = 0 THEN NULL ELSE cents END AS value_n
         |      FROM $EV e) v
         |GROUP BY 1""".stripMargin,

    "q_shift_delta" ->
      s"""SELECT event_type, bucket_ts, sum_cents,
         |  sum_cents - lag(sum_cents, 1) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS delta
         |FROM ($T1H) h""".stripMargin,

    "q_cumsum" ->
      s"""SELECT event_type, bucket_ts, sum_cents,
         |  CAST(sum(sum_cents) OVER (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
         |FROM ($T1H) h""".stripMargin,

    "q_tier_last" ->
      s"""SELECT event_type, bucket_ts, cents AS last_cents FROM (
         |  SELECT event_type, epoch_s//3600*3600 AS bucket_ts, cents,
         |    row_number() OVER (PARTITION BY event_type, epoch_s//3600*3600
         |                       ORDER BY epoch_s DESC, event_id DESC) AS rn
         |  FROM $EV e) r WHERE rn = 1""".stripMargin,

    "q_summary" ->
      s"""SELECT event_type, count(*) AS n, min(cents) AS min_cents,
         |  max(cents) AS max_cents, CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  min(epoch_s) AS first_ts, max(epoch_s) AS last_ts
         |FROM $EV e GROUP BY 1""".stripMargin,

    "q_stacked_export" ->
      s"""SELECT event_type || '_cents_sum' AS series,
         |  strftime(make_timestamp(bucket_ts * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS utc_timestamp,
         |  strftime(timezone('Europe/Berlin', to_timestamp(bucket_ts)), '%Y-%m-%dT%H:%M:%S') AS cet_cest_timestamp,
         |  sum_cents AS value
         |FROM ($T1H) h""".stripMargin,

    "q_jdbc_roundtrip" ->
      s"""SELECT event_type, bucket_ts, n, sum_cents FROM ($T1H) h""",

    "q_datapackage" ->
      s"""SELECT 'stacked' AS resource, CAST(size AS BIGINT) AS bytes,
        |  sha256(decode(content)) AS sha256
        |FROM read_blob('${Scratch.dir("dpkg")}/stacked/part-*.csv')""".stripMargin,

    // the six-level per-series descriptor list, derived from the data
    "q_datapackage_fields" ->
      """SELECT DISTINCT
        |  event_type || '_cents_sum_events_cents' AS series,
        |  event_type AS region, 'cents' AS variable, 'sum' AS attribute,
        |  'events' AS source,
        |  'https://graft.example/docs/' || event_type AS web,
        |  'cents' AS unit
        |FROM events""".stripMargin,

    "q_singleindex_export" ->
      s"""SELECT strftime(make_timestamp(bucket_ts * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS utc_timestamp,
         |  strftime(timezone('Europe/Berlin', to_timestamp(bucket_ts)), '%Y-%m-%dT%H:%M:%S') AS cet_cest_timestamp,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN sum_cents END) AS BIGINT) AS click_cents_sum,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN sum_cents END) AS BIGINT) AS error_cents_sum,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN sum_cents END) AS BIGINT) AS purchase_cents_sum,
         |  CAST(sum(CASE WHEN event_type = 'signup' THEN sum_cents END) AS BIGINT) AS signup_cents_sum,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN sum_cents END) AS BIGINT) AS view_cents_sum
         |FROM ($T1H) h GROUP BY bucket_ts""".stripMargin,

    "q_multiindex_export" ->
      s"""SELECT event_type || '_cents_sum_events_cents' AS series,
         |  strftime(make_timestamp(bucket_ts * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS utc_timestamp,
         |  strftime(timezone('Europe/Berlin', to_timestamp(bucket_ts)), '%Y-%m-%dT%H:%M:%S') AS cet_cest_timestamp,
         |  sum_cents AS value
         |FROM ($T1H) h""".stripMargin,

    "q_owncalc" ->
      s"""SELECT epoch_s//3600*3600 AS bucket_ts,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN cents END) AS BIGINT) AS click_cents,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS view_cents,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN cents END) + sum(CASE WHEN event_type = 'view' THEN cents END) AS BIGINT) AS total_cents,
         |  CASE WHEN sum(CASE WHEN event_type = 'click' THEN cents END) IS NOT NULL
         |        AND sum(CASE WHEN event_type = 'view' THEN cents END) IS NOT NULL
         |       THEN 'own calculation based on click | view' ELSE '' END AS basis
         |FROM $EV e GROUP BY 1""".stripMargin,

    "q_seasonal_profile" ->
      s"""SELECT event_type, (bucket_ts//3600 + 72) % 168 AS hour_of_week,
         |  CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
         |  CAST(sum(sum_cents) AS DOUBLE) / CAST(sum(n) AS BIGINT) / 100.0 AS mean_v
         |FROM ($T1H) h GROUP BY 1, 2""".stripMargin,

    "q_anomaly" ->
      s"""SELECT event_type, bucket_ts, n, wn, ws, wss, z,
         |  COALESCE(abs(z) > 3.0, FALSE) AS is_anomaly
         |FROM (
         |  SELECT *, CASE WHEN wn >= 3
         |      AND CAST(wss AS DOUBLE) - CAST(ws AS DOUBLE)*ws/wn > 0
         |    THEN (CAST(n AS DOUBLE) - CAST(ws AS DOUBLE)/wn)
         |      / sqrt((CAST(wss AS DOUBLE) - CAST(ws AS DOUBLE)*ws/wn)/wn) END AS z
         |  FROM (
         |    SELECT event_type, bucket_ts, n,
         |      count(n) OVER w AS wn,
         |      CAST(sum(n) OVER w AS BIGINT) AS ws,
         |      CAST(sum(n*n) OVER w AS BIGINT) AS wss
         |    FROM ($T1H) h
         |    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
         |      RANGE BETWEEN 86399 PRECEDING AND 3600 PRECEDING)) p) zz""".stripMargin,

    "q_corr_metrics" ->
      s"""SELECT event_type, cnt, sx, sy, sxx, sxy, syy,
         |  (CAST(cnt AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
         |    / (sqrt(CAST(cnt AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
         |       * sqrt(CAST(cnt AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)) AS r
         |FROM (
         |  SELECT event_type, count(*) AS cnt,
         |    CAST(sum(n) AS BIGINT) AS sx, CAST(sum(sum_cents) AS BIGINT) AS sy,
         |    CAST(sum(n*n) AS BIGINT) AS sxx,
         |    CAST(sum(n*sum_cents) AS BIGINT) AS sxy,
         |    CAST(sum(sum_cents*sum_cents) AS BIGINT) AS syy
         |  FROM ($T1H) h GROUP BY 1) p""".stripMargin,

    "q_range_join" ->
      s"""WITH d AS (SELECT event_type, bucket_ts, n FROM ($T1D) t1d),
         |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
         |               count(*) AS cnt FROM d GROUP BY 1),
         |hot AS (SELECT d.event_type, d.bucket_ts AS start_ts,
         |               d.bucket_ts + 86400 AS end_ts
         |        FROM d JOIN tot USING (event_type)
         |        WHERE d.n * tot.cnt > tot.total)
         |SELECT e.event_type, h.start_ts, count(*) AS n_events,
         |  CAST(sum(e.cents) AS BIGINT) AS cents_sum
         |FROM $EV e JOIN hot h ON e.event_type = h.event_type
         |  AND e.epoch_s >= h.start_ts AND e.epoch_s < h.end_ts
         |GROUP BY 1, 2""".stripMargin,

    "q_coverage" ->
      s"""SELECT event_type, bucket_ts//86400*86400 AS day_ts,
         |  count(*) AS buckets_present,
         |  CAST(count(*) AS DOUBLE) / 96.0 AS coverage
         |FROM ($T15) t GROUP BY 1, 2""".stripMargin
  )
}
