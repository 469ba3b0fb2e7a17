package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ingest.{CsvSource, Pages, Xlsx}
import graft.rollup.TimeSeriesOps
import graft.gapfill.GapFill
import graft.chunk.ChunkWriter

/** The flagship pipeline: Common-Crawl-style pages -> points -> retention
  * tiers -> gap-fill -> Gorilla chunks, each stage exposed as a
  * driver-verifiable query whose DuckDB oracle re-derives the identical
  * pages table from `documents` inside a CTE (see Pages.oracleCte).
  *
  * Exactness: all metric values are integers or dyadic rationals (k/256),
  * so sums are order-independent in float64 and tier values match the
  * oracle bitwise (SURVEY.md §7.5).
  */
object PageQueries {

  private val P = s"(${Pages.oracleCte})"

  /** Points SQL: long-format (domain, metric, epoch_s, value). */
  private val POINTS =
    s"""SELECT domain, 'text_chars' AS metric, epoch_s, CAST(n_chars AS DOUBLE) AS value FROM $P p1
       |UNION ALL SELECT domain, 'bytes', epoch_s, CAST(html_len AS DOUBLE) FROM $P p2
       |UNION ALL SELECT domain, 'score', epoch_s, score FROM $P p3""".stripMargin

  private val T15 =
    s"SELECT domain, metric, epoch_s//900*900 AS bucket_ts, count(value) AS n, " +
      s"sum(value) AS sum_v, sum(value)/count(value) AS mean_v FROM ($POINTS) pts GROUP BY 1, 2, 3"
  private val T30 =
    s"SELECT domain, metric, bucket_ts//1800*1800 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
      s"sum(sum_v) AS sum_v, sum(sum_v)/sum(n) AS mean_v FROM ($T15) t15 GROUP BY 1, 2, 3"
  private val T1H =
    s"SELECT domain, metric, bucket_ts//3600*3600 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
      s"sum(sum_v) AS sum_v, sum(sum_v)/sum(n) AS mean_v FROM ($T15) t15 GROUP BY 1, 2, 3"
  private val T1D =
    s"SELECT domain, metric, bucket_ts//86400*86400 AS bucket_ts, CAST(sum(n) AS BIGINT) AS n, " +
      s"sum(sum_v) AS sum_v, sum(sum_v)/sum(n) AS mean_v FROM ($T1H) t1h GROUP BY 1, 2, 3"

  private def points(s: SparkSession, dir: String): DataFrame =
    Pages.toPoints(Pages.synthesize(s, dir))

  private def tier15(s: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.tier(points(s, dir), Seq("domain", "metric"), "epoch_s",
      "value", 900)

  private def chain(df: DataFrame, period: Long): DataFrame =
    TimeSeriesOps.chainTier(df, Seq("domain", "metric"), period)

  /** 15-min score tier as Gorilla chunks (series `<domain>_score`,
    * maxPoints 96) — the store-build input of `q_index_read`, exposed so
    * the bench can time index BUILD and READ separately.
    */
  def buildScoreChunks(s: SparkSession, dir: String, maxPoints: Int = 96) = {
    val t = tier15(s, dir).filter(col("metric") === "score")
      .select(concat(col("domain"), lit("_score")).as("series_flat"),
        col("bucket_ts").as("ts"), col("mean_v").as("value"))
    ChunkWriter.build(t, "15min", maxPoints = maxPoints)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pages_tier15" -> ((s, dir) => tier15(s, dir)),
    "q_pages_30min" -> ((s, dir) => chain(tier15(s, dir), 1800)),
    "q_pages_1h" -> ((s, dir) => chain(tier15(s, dir), 3600)),
    "q_pages_1d" -> ((s, dir) => chain(chain(tier15(s, dir), 3600), 86400)),

    // hot-domain rollup via salted two-phase agg — must equal plain tier15
    "q_pages_salted15" -> ((s, dir) =>
      TimeSeriesOps.saltedTier(points(s, dir), Seq("domain", "metric"),
        "epoch_s", "value", 900, salts = 16, saltSource = "epoch_s")),

    // 15-min grid densify + linear interpolation on the score metric
    "q_pages_interp" -> ((s, dir) => {
      // fused densify+interpolate (one window + Generate) — hash-matches
      // the same oracle as the two-step plan it replaced (q_interp keeps
      // the two-step path under oracle coverage on the events surface)
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(col("domain"), col("bucket_ts"), col("mean_v"))
      GapFill.interpolateFused(t, Seq("domain"), "bucket_ts", "mean_v",
          maxGapPeriods = 8,
          markerExpr = concat(col("domain"), lit("_score_interpolated")),
          periodSec = 900L)
        .select(col("domain"), col("bucket_ts"),
          col("mean_v").as("value"), col("value_filled"),
          TimeSeriesOps.renderMarkers(col("markers")).as("marker"))
    }),

    // Gorilla encode -> decode roundtrip; oracle sees the plain tier,
    // proving bit-exact chunk storage.
    "q_gorilla_roundtrip" -> ((s, dir) => {
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(concat(col("domain"), lit("_score")).as("series_flat"),
          col("bucket_ts").as("ts"), col("mean_v").as("value"))
      val chunks = ChunkWriter.build(t, "15min", maxPoints = 256)
      ChunkWriter.decode(chunks)
        .select(col("series_flat"), col("ts").as("bucket_ts"), col("value"))
    }),

    // time-range chunk pruning: only chunks overlapping day 3 are decoded
    "q_chunk_prune" -> ((s, dir) => {
      val from = Pages.T0Epoch + 2 * 86400L
      val until = Pages.T0Epoch + 3 * 86400L
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(concat(col("domain"), lit("_score")).as("series_flat"),
          col("bucket_ts").as("ts"), col("mean_v").as("value"))
      val chunks = ChunkWriter.build(t, "15min", maxPoints = 96)
      ChunkWriter.decode(ChunkWriter.pruneByTime(chunks, from, until))
        .filter(col("ts") >= from && col("ts") < until)
        .select(col("series_flat"), col("ts").as("bucket_ts"), col("value"))
    }),

    // same result as q_chunk_prune but with NO manual pruneByTime call:
    // decode via the gorilla_explode Generator + a plain ts filter; the
    // PruneChunksByTime optimizer rule derives the chunk-level (t0, t_max)
    // predicates and pushdown carries them into the scan
    "q_chunk_prune_auto" -> ((s, dir) => {
      val from = Pages.T0Epoch + 2 * 86400L
      val until = Pages.T0Epoch + 3 * 86400L
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(concat(col("domain"), lit("_score")).as("series_flat"),
          col("bucket_ts").as("ts"), col("mean_v").as("value"))
      val chunks = ChunkWriter.build(t, "15min", maxPoints = 96)
      ChunkWriter.decodeSql(chunks.toDF())
        .filter(col("ts") >= from && col("ts") < until)
        .select(col("series_flat"), col("ts").as("bucket_ts"), col("value"))
    }),

    // the full production READ path in one query: chunk store ->
    // gorilla_explode decode with automatic time-range chunk pruning
    // (PruneChunksByTime) -> grid densify -> linear interpolation with
    // markers — "give me gap-filled series for days 2-4 from the
    // compressed tier"
    "q_window_read" -> ((s, dir) => {
      val from = Pages.T0Epoch + 1 * 86400L
      val until = Pages.T0Epoch + 4 * 86400L
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(concat(col("domain"), lit("_score")).as("series_flat"),
          col("bucket_ts").as("ts"), col("mean_v").as("value"))
      val chunks = ChunkWriter.build(t, "15min", maxPoints = 96)
      val pts = ChunkWriter.decodeSql(chunks.toDF())
        .filter(col("ts") >= from && col("ts") < until) // auto chunk prune
        .select(col("series_flat"), col("ts").as("bucket_ts"),
          col("value").as("mean_v"))
      // fused densify+interpolate over the decoded points (all non-null:
      // tier means are never NaN) — same oracle as the two-step plan
      GapFill.interpolateFused(pts, Seq("series_flat"), "bucket_ts",
          "mean_v", 8,
          concat(col("series_flat"), lit("_interpolated")),
          periodSec = 900L)
        .select(col("series_flat"), col("bucket_ts"),
          col("mean_v").as("value"), col("value_filled"),
          TimeSeriesOps.renderMarkers(col("markers")).as("marker"))
    }),

    // delta-encoded partition index drives the read: only partitions the
    // index proves relevant (series hash + time span) are listed/scanned,
    // then chunk-level prune + Gorilla decode
    "q_index_read" -> ((s, dir) => {
      val from = Pages.T0Epoch + 1 * 86400L
      val until = Pages.T0Epoch + 4 * 86400L
      val store = Scratch.dir("chunk_store_idx")
      ChunkWriter.writeIndexedStore(buildScoreChunks(s, dir), store, buckets = 16)
      ChunkWriter.indexedRead(s, store,
          Seq("d7.example_score", "d42.example_score"), from, until)
        .select(col("series_flat"), col("ts"), col("value"))
    }),

    // store maintenance: a deliberately fragmented chunk store (maxPoints
    // 12 -> ~8x too many chunks) is compacted copy-on-write, then read
    // back through the rebuilt index — the oracle sees the plain tier, so
    // compaction proving content-invariance is the check
    "q_compact_read" -> ((s, dir) => {
      val store = Scratch.dir("chunk_store_compact")
      ChunkWriter.writeIndexedStore(
        buildScoreChunks(s, dir, maxPoints = 12), store, buckets = 16)
      val compacted = ChunkWriter.compactStore(s, store, buckets = 16,
        maxPoints = 96, minAvgPoints = 48)
      require(compacted.nonEmpty, "fixture store must need compaction")
      ChunkWriter.indexedRead(s, store, Seq.empty, Long.MinValue, Long.MaxValue)
        .select(col("series_flat"), col("ts").as("bucket_ts"), col("value"))
    }),

    // S2 CSV source, oracle-checked end-to-end: Spark parses a
    // deterministic EU-format CSV (decimal comma, dot thousands, 2 header
    // rows, n/a cells) via CsvSource; DuckDB reads the SAME file with its
    // own CSV reader and mirrors the normalization
    "q_csv_source" -> ((s, dir) => {
      val p = java.nio.file.Paths.get(Scratch.dir("eu_ts.csv"))
      java.nio.file.Files.createDirectories(p.getParent)
      val rows = (0 until 96).map { i =>
        val ts = f"2024-01-01T${i / 4}%02d:${(i % 4) * 15}%02d:00Z"
        val load = f"1.${i}%03d,${25 * (i % 4)}%02d" // 1.000,00 .. 1.095,75
        val wind = if (i % 7 == 5) "n/a" else s"$i,125"
        s"$ts;$load;$wind"
      }
      java.nio.file.Files.writeString(p,
        "timestamp;DE_load;DE_wind\n;actual;actual\n" + rows.mkString("\n") + "\n")
      CsvSource.readEuTimeSeries(s, p.toString, headerRows = 2)
        .select(unix_timestamp(col("ts")).as("epoch_s"),
          col("DE_load_actual"), col("DE_wind_actual"))
    }),

    // S2/F2 CET-CEST local-time CSV across the 2024-10-27 autumn DST
    // transition: wall times 02:00-02:59 exist twice; policy latest folds
    // them to the second (CET) occurrence. The oracle reads the SAME file
    // and computes the expected UTC from explicit CASE offsets (the spec),
    // independent of any engine's tz-overlap resolution.
    "q_csv_cet" -> ((s, dir) => {
      val p = java.nio.file.Paths.get(Scratch.dir("eu_cet.csv"))
      java.nio.file.Files.createDirectories(p.getParent)
      val rows = (0 until 20).map { i =>
        val ts = f"2024-10-27 ${i / 4}%02d:${(i % 4) * 15}%02d:00"
        s"$ts;$i,5"
      }
      java.nio.file.Files.writeString(p,
        "timestamp;DE_load\n;actual\n" + rows.mkString("\n") + "\n")
      CsvSource.readEuTimeSeries(s, p.toString, headerRows = 2,
          sourceTz = "Europe/Berlin", ambiguous = "latest")
        .select(unix_timestamp(col("ts")).as("epoch_s"), col("DE_load_actual"))
    }),

    // S2/S3 config-driven source registry (the reference's sources.yml +
    // read-loop architecture): two sources with different formats — an EU
    // CSV (decimal comma, coerce-null) and a hand-built two-header-row
    // xlsx — each declaring reader/params/column map in one yml-shaped
    // config, dispatched and stacked long by SourceRegistry.readAll. The
    // oracle re-reads the CSV with DuckDB's reader and recomputes the
    // workbook arithmetic.
    "q_source_registry" -> ((s, dir) => {
      import graft.ingest.SourceRegistry
      val csvPath = java.nio.file.Paths.get(Scratch.dir("reg") + "/entso.csv")
      java.nio.file.Files.createDirectories(csvPath.getParent)
      val csvRows = (0 until 24).map { i =>
        val ts = f"2024-01-01T$i%02d:00:00Z"
        val load = if (i == 5) "n/a" else s"$i,5"
        s"$ts;$load"
      }
      java.nio.file.Files.writeString(csvPath,
        "timestamp;DE_load\n;actual\n" + csvRows.mkString("\n") + "\n")
      val xlsxDir = Scratch.dir("reg_xlsx")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(xlsxDir))
      def istr(ref: String, v: String) =
        s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
      def num(ref: String, v: Double) = s"""<c r="$ref"><v>$v</v></c>"""
      val sheet =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          s"""<row r="1">${istr("A1", "timestamp")}${istr("B1", "AT_gen")}</row>""" +
          s"""<row r="2">${istr("B2", "actual")}</row>""" +
          (0 until 24).map { i =>
            s"""<row r="${i + 3}">${istr(s"A${i + 3}", f"2024-02-01T$i%02d:00:00Z")}${num(s"B${i + 3}", 100.0 + i * 0.5)}</row>"""
          }.mkString +
          """</sheetData></worksheet>"""
      val zout = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(s"$xlsxDir/at.xlsx")))
      try {
        zout.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
        zout.write(sheet.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zout.closeEntry()
      } finally zout.close()
      val cfg =
        s"""entso_csv:
           |  format: csv
           |  path: $csvPath
           |  sep: ;
           |  header_rows: 2
           |  columns:
           |    DE_load_actual: de_load
           |tso_xlsx:
           |  format: xlsx
           |  path: $xlsxDir
           |  header_rows: 2
           |  columns:
           |    AT_gen_actual: at_gen
           |""".stripMargin
      SourceRegistry.readAll(s, SourceRegistry.parse(cfg))
        .select(col("source"), col("series"),
          unix_timestamp(col("ts")).as("epoch_s"), col("value"))
    }),

    // S6 Excel sink + S3 Excel source, closed as a ROUNDTRIP oracle (the
    // q_gorilla_roundtrip pattern): the 15-min score tier is exported to
    // a real xlsx workbook (pure-JDK OOXML writer) and read back via the
    // distributed xlsx source; the oracle sees the plain tier, so the
    // check proves bit-exact Excel storage (Double.toString shortest
    // round-trip repr).
    "q_excel_roundtrip" -> ((s, dir) => {
      val t = tier15(s, dir).filter(col("metric") === "score")
        .select(col("domain"), col("bucket_ts").cast("double").as("bucket_ts"),
          col("mean_v"))
      val out = Scratch.dir("tier_xlsx")
      Xlsx.writeXlsx(t, s"$out/tier.xlsx")
      Xlsx.readSheet(s, out)
        .select(col("domain"), col("bucket_ts").cast("long").as("bucket_ts"),
          col("mean_v"))
    }),

    // S3 Excel parse against an INDEPENDENT workbook: the fixture is
    // hand-assembled SpreadsheetML (shared strings for the two header
    // rows — the t="s" path real TSO workbooks use — inline timestamp
    // strings, sparse refs for missing cells), NOT produced by the
    // engine's own writer; the oracle recomputes the arithmetic from
    // generate_series.
    "q_excel_source" -> ((s, dir) => {
      val out = Scratch.dir("eu_xlsx")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      def si(ref: String, idx: Int) = s"""<c r="$ref" t="s"><v>$idx</v></c>"""
      def str(ref: String, v: String) =
        s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
      def num(ref: String, v: Double) = s"""<c r="$ref"><v>$v</v></c>"""
      val shared =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
          """<si><t>timestamp</t></si><si><t>DE_load</t></si>""" +
          """<si><t>DE_wind</t></si><si><t>actual</t></si></sst>"""
      val dataRows = (0 until 96).map { i =>
        val r = i + 3
        val ts = f"2024-01-01T${i / 4}%02d:${(i % 4) * 15}%02d:00Z"
        str(s"A$r", ts) +
          num(s"B$r", 1000.0 + i * 1.5) +
          (if (i % 7 == 5) "" else num(s"C$r", i * 0.25))
      }
      val sheet =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          s"""<row r="1">${si("A1", 0)}${si("B1", 1)}${si("C1", 2)}</row>""" +
          s"""<row r="2">${si("B2", 3)}${si("C2", 3)}</row>""" +
          dataRows.zipWithIndex.map { case (cells, i) =>
            s"""<row r="${i + 3}">$cells</row>""" }.mkString +
          """</sheetData></worksheet>"""
      val zout = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(s"$out/eu.xlsx")))
      try {
        Seq("xl/sharedStrings.xml" -> shared,
            "xl/worksheets/sheet1.xml" -> sheet).foreach { case (n, c) =>
          zout.putNextEntry(new java.util.zip.ZipEntry(n))
          zout.write(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          zout.closeEntry()
        }
      } finally zout.close()
      Xlsx.readEuTimeSeries(s, out, headerRows = 2)
        .select(unix_timestamp(col("ts")).as("epoch_s"),
          col("DE_load_actual"), col("DE_wind_actual"))
    }),

    // per-row invariant: text bytes survive a partitioned write+read
    "q_text_invariant" -> ((s, dir) => {
      val pages = Pages.synthesize(s, dir)
      val out = Scratch.dir("pages_rt")
      Pages.writePartitioned(pages.select("url", "warc_ts", "html", "text", "lang"),
        out, buckets = 16)
      s.read.parquet(out)
        .select(col("url"), sha2(col("text"), 256).as("h")).distinct()
    }),

    // VERSION PATCH (J3 + A4 lineage at the pages level): a late re-crawl
    // REVISES day-2 scores for two domains; the revision tier is patched
    // over the published 15-min tier with combine_first priority
    // (revision wins where present) and every patched bucket carries an
    // OPSD-style "own calculation based on ..." lineage marker
    // [pub: imputation.py combine_first; marker strings in main.ipynb].
    "q_pages_patch" -> ((s, dir) => {
      val from = Pages.T0Epoch + 2 * 86400L
      val until = Pages.T0Epoch + 3 * 86400L
      val published = tier15(s, dir).filter(col("metric") === "score")
        .select(col("domain"), col("bucket_ts"), col("mean_v"))
      // the re-crawl: same pages, day-2 window, two domains, scores
      // shifted by an exact dyadic (+256) so revised buckets are visible
      val rev = TimeSeriesOps.tier(
          points(s, dir).filter(col("metric") === "score" &&
            col("domain").isin("d7.example", "d42.example") &&
            col("epoch_s") >= from && col("epoch_s") < until)
            .withColumn("value", col("value") + 256.0d),
          Seq("domain"), "epoch_s", "value", 900)
        .select(col("domain"), col("bucket_ts"), col("mean_v"))
      TimeSeriesOps.combineFirst(
          rev, published, Seq("domain", "bucket_ts"), "mean_v")
        .select(col("domain"), col("bucket_ts"), col("mean_v").as("value"),
          // combineFirst marks right-filled rows `patched`; the REVISED
          // rows are the left-present ones — those get the lineage label
          when(!col("patched"),
            concat(lit("own calculation based on recrawl of "), col("domain")))
            .otherwise(lit("")).as("marker"))
    }),

    // T26 canonical-URL dedup — the FIRST dedup pass of a web pipeline
    // (no document bytes touched): five crawl-shaped variants per page
    // url (bare; tracking-params+fragment; case-shifted host with the
    // default :443; real params unsorted; real params + tracking) must
    // canonicalize so that the first three collapse to one form and the
    // last two to another
    "q_url_canon" -> ((s, dir) => {
      val urls = Pages.synthesize(s, dir).select("url").distinct()
      val up = concat(lit("HTTPS://"),
        upper(regexp_extract(col("url"), "^https://([^/]+)", 1)), lit(":443"),
        regexp_extract(col("url"), "^https://[^/]+(/.*)$", 1))
      val variants = urls.select(col("url").as("raw"))
        .unionByName(urls.select(
          concat(col("url"), lit("?utm_source=feed&utm_campaign=x#top")).as("raw")))
        .unionByName(urls.select(up.as("raw")))
        .unionByName(urls.select(concat(col("url"), lit("?b=2&a=1")).as("raw")))
        .unionByName(urls.select(
          concat(col("url"), lit("?a=1&b=2&utm_source=z")).as("raw")))
      variants.select(col("raw"),
        graft.text.TextOps.canonicalUrl(col("raw")).as("canon"))
    }),

    // top hot domains by visit count (rank with deterministic tie-break)
    "q_topk_domains" -> ((s, dir) => {
      // pre-derived domain column (same value as the url regex): the scan
      // reads only (doc_id), never the constructed url strings
      val cnt = Pages.synthesize(s, dir)
        .select(col("domain"))
        .groupBy("domain").agg(count(lit(1)).as("visits"))
      // TakeOrderedAndProject (per-partition top-k heap + driver merge),
      // NOT an unpartitioned window over every domain; the ordering is
      // total (domain unique after groupBy) so rank == row_number and the
      // rank is derived over the 10 surviving rows only.
      val top = cnt.orderBy(col("visits").desc, col("domain")).limit(10)
      // pmod(visits, 1) = 0 but non-foldable: keeps WindowExec partitioned
      val w = Window.partitionBy(pmod(col("visits"), lit(1)))
        .orderBy(col("visits").desc, col("domain"))
      top.withColumn("rk", rank().over(w))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pages_tier15" -> T15,
    "q_pages_30min" -> T30,
    "q_pages_1h" -> T1H,
    "q_pages_1d" -> T1D,
    "q_pages_salted15" -> T15,

    "q_pages_interp" ->
      s"""WITH t AS (SELECT domain, bucket_ts, mean_v FROM ($T15) t15 WHERE metric = 'score'),
         |span AS (SELECT domain, min(bucket_ts) AS t0, max(bucket_ts) AS t1 FROM t GROUP BY 1),
         |grid AS (SELECT domain, UNNEST(generate_series(t0, t1, 900)) AS bucket_ts FROM span),
         |g AS (SELECT grid.domain, grid.bucket_ts, t.mean_v FROM grid LEFT JOIN t USING (domain, bucket_ts)),
         |a1 AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY bucket_ts) AS rn FROM g),
         |a2 AS (SELECT *,
         |  last_value(CASE WHEN mean_v IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS prev_rn,
         |  last_value(CASE WHEN mean_v IS NOT NULL THEN mean_v END IGNORE NULLS) OVER wp AS prev_v,
         |  last_value(CASE WHEN mean_v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wp AS prev_t,
         |  first_value(CASE WHEN mean_v IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS next_rn,
         |  first_value(CASE WHEN mean_v IS NOT NULL THEN mean_v END IGNORE NULLS) OVER wn AS next_v,
         |  first_value(CASE WHEN mean_v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wn AS next_t
         |  FROM a1
         |  WINDOW wp AS (PARTITION BY domain ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY domain ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT domain, bucket_ts, mean_v AS value,
         |  CASE WHEN mean_v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
         |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 8
         |       THEN prev_v + (next_v - prev_v) * CAST(bucket_ts - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)
         |       ELSE mean_v END AS value_filled,
         |  CASE WHEN mean_v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
         |            AND (next_rn - COALESCE(prev_rn, 0) - 1) <= 8
         |       THEN domain || '_score_interpolated' ELSE '' END AS marker
         |FROM a2""".stripMargin,

    "q_gorilla_roundtrip" ->
      s"""SELECT domain || '_score' AS series_flat, bucket_ts, mean_v AS value
         |FROM ($T15) t WHERE metric = 'score'""".stripMargin,

    // compaction must be content-invariant: the oracle is the tier itself
    "q_compact_read" ->
      s"""SELECT domain || '_score' AS series_flat, bucket_ts, mean_v AS value
         |FROM ($T15) t WHERE metric = 'score'""".stripMargin,

    "q_window_read" ->
      s"""WITH t AS (SELECT domain || '_score' AS series_flat, bucket_ts, mean_v FROM ($T15) t15
         |           WHERE metric = 'score'
         |             AND bucket_ts >= ${Pages.T0Epoch + 1 * 86400L}
         |             AND bucket_ts < ${Pages.T0Epoch + 4 * 86400L}),
         |span AS (SELECT series_flat, min(bucket_ts) AS t0, max(bucket_ts) AS t1 FROM t GROUP BY 1),
         |grid AS (SELECT series_flat, UNNEST(generate_series(t0, t1, 900)) AS bucket_ts FROM span),
         |g AS (SELECT grid.series_flat, grid.bucket_ts, t.mean_v FROM grid LEFT JOIN t USING (series_flat, bucket_ts)),
         |a2 AS (SELECT *,
         |  last_value(CASE WHEN mean_v IS NOT NULL THEN mean_v END IGNORE NULLS) OVER wp AS prev_v,
         |  last_value(CASE WHEN mean_v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wp AS prev_t,
         |  first_value(CASE WHEN mean_v IS NOT NULL THEN mean_v END IGNORE NULLS) OVER wn AS next_v,
         |  first_value(CASE WHEN mean_v IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wn AS next_t
         |  FROM g
         |  WINDOW wp AS (PARTITION BY series_flat ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY series_flat ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT series_flat, bucket_ts, mean_v AS value,
         |  CASE WHEN mean_v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
         |            AND (next_t - prev_t) / 900 - 1 <= 8
         |       THEN prev_v + (next_v - prev_v) * CAST(bucket_ts - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)
         |       ELSE mean_v END AS value_filled,
         |  CASE WHEN mean_v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
         |            AND (next_t - prev_t) / 900 - 1 <= 8
         |       THEN series_flat || '_interpolated' ELSE '' END AS marker
         |FROM a2""".stripMargin,

    "q_chunk_prune" ->
      s"""SELECT domain || '_score' AS series_flat, bucket_ts, mean_v AS value
         |FROM ($T15) t WHERE metric = 'score'
         |  AND bucket_ts >= ${Pages.T0Epoch + 2 * 86400L}
         |  AND bucket_ts < ${Pages.T0Epoch + 3 * 86400L}""".stripMargin,

    "q_chunk_prune_auto" ->
      s"""SELECT domain || '_score' AS series_flat, bucket_ts, mean_v AS value
         |FROM ($T15) t WHERE metric = 'score'
         |  AND bucket_ts >= ${Pages.T0Epoch + 2 * 86400L}
         |  AND bucket_ts < ${Pages.T0Epoch + 3 * 86400L}""".stripMargin,

    "q_text_invariant" ->
      s"SELECT DISTINCT url, sha256(text) AS h FROM $P p",

    // Excel roundtrip must be content-invariant: the oracle is the tier
    "q_excel_roundtrip" ->
      s"""SELECT domain, bucket_ts, mean_v
         |FROM ($T15) t WHERE metric = 'score'""".stripMargin,

    // the hand-built workbook's arithmetic, recomputed from scratch
    "q_excel_source" ->
      """SELECT CAST(1704067200 + i*900 AS BIGINT) AS epoch_s,
        |  1000.0 + i*1.5 AS DE_load_actual,
        |  CASE WHEN i % 7 = 5 THEN NULL ELSE i*0.25 END AS DE_wind_actual
        |FROM (SELECT UNNEST(generate_series(0, 95)) AS i) t""".stripMargin,

    // registry output replayed per source: DuckDB re-reads the CSV, the
    // workbook arithmetic is recomputed from generate_series
    "q_source_registry" ->
      s"""WITH c AS (SELECT epoch_us(CAST(c0 AS TIMESTAMPTZ))//1000000 AS epoch_s,
         |    TRY_CAST(replace(replace(trim(c1), '.', ''), ',', '.') AS DOUBLE) AS value
         |  FROM read_csv('${Scratch.dir("reg")}/entso.csv', delim=';', header=false,
         |    skip=2, columns={'c0':'VARCHAR','c1':'VARCHAR'})),
         |x AS (SELECT CAST(1706745600 + i*3600 AS BIGINT) AS epoch_s,
         |    100.0 + i*0.5 AS value
         |  FROM (SELECT UNNEST(generate_series(0, 23)) AS i) t)
         |SELECT 'entso_csv' AS source, 'de_load' AS series, epoch_s, value FROM c
         |UNION ALL
         |SELECT 'tso_xlsx' AS source, 'at_gen' AS series, epoch_s, value FROM x""".stripMargin,

    "q_csv_source" ->
      s"""SELECT epoch_us(CAST(c0 AS TIMESTAMPTZ))//1000000 AS epoch_s,
        |  TRY_CAST(replace(replace(trim(c1), '.', ''), ',', '.') AS DOUBLE) AS DE_load_actual,
        |  TRY_CAST(replace(replace(trim(c2), '.', ''), ',', '.') AS DOUBLE) AS DE_wind_actual
        |FROM read_csv('${Scratch.dir("eu_ts.csv")}', delim=';', header=false, skip=2,
        |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR'})""".stripMargin,

    "q_index_read" ->
      s"""SELECT domain || '_score' AS series_flat, bucket_ts AS ts, mean_v AS value
         |FROM ($T15) t15
         |WHERE metric = 'score' AND domain IN ('d7.example', 'd42.example')
         |  AND bucket_ts >= ${Pages.T0Epoch + 1 * 86400L}
         |  AND bucket_ts < ${Pages.T0Epoch + 4 * 86400L}""".stripMargin,

    "q_csv_cet" ->
      s"""SELECT epoch_us(CAST(c0 AS TIMESTAMP))//1000000
        |  - (CASE WHEN c0 < '2024-10-27 02:00:00' THEN 7200 ELSE 3600 END) AS epoch_s,
        |  TRY_CAST(replace(replace(trim(c1), '.', ''), ',', '.') AS DOUBLE) AS DE_load_actual
        |FROM read_csv('${Scratch.dir("eu_cet.csv")}', delim=';', header=false, skip=2,
        |  columns={'c0':'VARCHAR','c1':'VARCHAR'})""".stripMargin,

    "q_pages_patch" ->
      s"""WITH t AS (SELECT domain, bucket_ts, mean_v FROM ($T15) t15 WHERE metric = 'score'),
         |rev AS (SELECT domain, epoch_s//900*900 AS bucket_ts,
         |          sum(value + 256)/count(value) AS mean_v
         |        FROM ($POINTS) pts
         |        WHERE metric = 'score' AND domain IN ('d7.example', 'd42.example')
         |          AND epoch_s >= ${Pages.T0Epoch + 2 * 86400L}
         |          AND epoch_s < ${Pages.T0Epoch + 3 * 86400L}
         |        GROUP BY 1, 2)
         |SELECT COALESCE(rev.domain, t.domain) AS domain,
         |  COALESCE(rev.bucket_ts, t.bucket_ts) AS bucket_ts,
         |  COALESCE(rev.mean_v, t.mean_v) AS value,
         |  CASE WHEN rev.mean_v IS NOT NULL
         |       THEN 'own calculation based on recrawl of ' || rev.domain
         |       ELSE '' END AS marker
         |FROM t FULL OUTER JOIN rev
         |  ON t.domain = rev.domain AND t.bucket_ts = rev.bucket_ts""".stripMargin,

    // every canonicalization rule replayed in DuckDB (RE2 and Java regex
    // agree on these patterns; param sort is byte-lexicographic on ASCII
    // in both engines)
    "q_url_canon" ->
      s"""WITH u AS (SELECT DISTINCT url FROM $P p),
         |raws AS (
         |  SELECT url AS raw FROM u
         |  UNION ALL SELECT url || '?utm_source=feed&utm_campaign=x#top' FROM u
         |  UNION ALL SELECT 'HTTPS://' || upper(regexp_extract(url, '^https://([^/]+)', 1))
         |    || ':443' || regexp_extract(url, '^https://[^/]+(/.*)${"$"}', 1) FROM u
         |  UNION ALL SELECT url || '?b=2&a=1' FROM u
         |  UNION ALL SELECT url || '?a=1&b=2&utm_source=z' FROM u),
         |parts AS (SELECT raw,
         |    lower(regexp_extract(raw, '^([^:/?#]+)://', 1)) AS scheme,
         |    lower(regexp_extract(raw, '^[^:/?#]+://([^/?#]*)', 1)) AS auth,
         |    regexp_replace(regexp_extract(raw, '^[^:/?#]+://[^/?#]*([^?#]*)', 1), '/+${"$"}', '') AS path,
         |    regexp_extract(raw, '\\?([^#]*)', 1) AS q
         |  FROM raws),
         |norm AS (SELECT raw, scheme,
         |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80${"$"}', '')
         |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443${"$"}', '')
         |         ELSE auth END AS host,
         |    path,
         |    COALESCE(array_to_string(list_sort(list_filter(string_split(q, '&'),
         |      p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)=') AND p <> '')), '&'), '') AS kept
         |  FROM parts)
         |SELECT raw, scheme || '://' || host || path ||
         |  CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon
         |FROM norm""".stripMargin,

    "q_topk_domains" ->
      s"""SELECT domain, visits, rk FROM (
         |  SELECT domain, CAST(count(*) AS BIGINT) AS visits,
         |    rank() OVER (ORDER BY count(*) DESC, domain) AS rk
         |  FROM $P p GROUP BY domain) r
         |WHERE rk <= 10""".stripMargin
  )
}
