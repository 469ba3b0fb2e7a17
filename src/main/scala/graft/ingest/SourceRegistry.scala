package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven ingestion registry — the engine analog of the
  * reference's sources.yml + the read.py read loop [pub: read.py::read;
  * sources.yml]: every SOURCE declares its reader (csv | xlsx), parse
  * parameters (separator, header rows), its timestamp policy (ISO UTC,
  * or local wall clock in a zone with an explicit DST-overlap fold), and
  * a column map renaming provider columns to canonical series names.
  * [[readAll]] dispatches each source to CsvSource/Xlsx and stacks the
  * results into one long frame (source, series, ts, value) — the shape
  * the tier pipeline ingests.
  *
  * The config is a deliberately tiny yml-shaped dialect (two indent
  * levels, `key: value` lines, a `columns:` sub-block), parsed by hand —
  * no yaml dependency ships offline, and the reference's file uses no
  * more structure than this.
  */
object SourceRegistry {

  case class SourceSpec(
      name: String,
      format: String, // "csv" | "xlsx"
      path: String,
      sep: String = ";",
      headerRows: Int = 2,
      tz: String = "", // "" = timestamps are ISO-8601 UTC
      ambiguous: String = "earliest",
      columnMap: Map[String, String] = Map.empty // provider col -> series
  )

  /** Parse the registry config. Shape:
    * {{{
    * source_name:
    *   format: csv
    *   path: /data/entso
    *   sep: ;
    *   header_rows: 2
    *   tz: Europe/Berlin
    *   ambiguous: latest
    *   columns:
    *     DE_load_actual: de_load
    * }}}
    */
  def parse(cfg: String): Seq[SourceSpec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SourceSpec]
    var inColumns = false
    cfg.linesIterator.filter(_.trim.nonEmpty).filterNot(_.trim.startsWith("#"))
      .foreach { line =>
        val indent = line.takeWhile(_ == ' ').length
        val (k, v) = line.trim.split(":", 2) match {
          case Array(a, b) => (a.trim, b.trim)
          case Array(a) => (a.trim, "")
        }
        if (indent == 0) {
          require(v.isEmpty, s"source line must be 'name:', got: $line")
          out += SourceSpec(name = k, format = "", path = "")
          inColumns = false
        } else {
          require(out.nonEmpty, s"key before any source block: $line")
          val cur = out.last
          // a columns: sub-block holds until the indent falls back
          if (indent <= 2) inColumns = false
          (if (inColumns && indent > 2) "columns-entry" else k) match {
            case "columns" => inColumns = true
            case "columns-entry" =>
              out(out.length - 1) = cur.copy(columnMap = cur.columnMap + (k -> v))
            case "format" => out(out.length - 1) = cur.copy(format = v)
            case "path" => out(out.length - 1) = cur.copy(path = v)
            case "sep" => out(out.length - 1) = cur.copy(sep = v)
            case "header_rows" => out(out.length - 1) = cur.copy(headerRows = v.toInt)
            case "tz" => out(out.length - 1) = cur.copy(tz = v)
            case "ambiguous" => out(out.length - 1) = cur.copy(ambiguous = v)
            case other => throw new IllegalArgumentException(
              s"unknown registry key '$other' in: $line")
          }
        }
      }
    out.foreach { s =>
      require(s.format == "csv" || s.format == "xlsx",
        s"source ${s.name}: format must be csv|xlsx, got '${s.format}'")
      require(s.path.nonEmpty, s"source ${s.name}: path is required")
    }
    out.toSeq
  }

  /** One source -> typed wide frame (ts, canonical series...): dispatch
    * to the format's EU-time-series reader, then apply the column map.
    * Only MAPPED columns survive — the registry is the allow-list, like
    * the reference's per-source column selection.
    */
  def readSource(spark: SparkSession, spec: SourceSpec): DataFrame = {
    val raw = spec.format match {
      case "csv" => CsvSource.readEuTimeSeries(spark, spec.path,
        sep = spec.sep, headerRows = spec.headerRows,
        sourceTz = spec.tz, ambiguous = spec.ambiguous)
      case "xlsx" =>
        val df = Xlsx.readEuTimeSeries(spark, spec.path, spec.headerRows)
        if (spec.tz.isEmpty) df
        else df.withColumn("ts",
          CsvSource.localizedUtc(col("ts"), spec.tz, spec.ambiguous))
    }
    val missing = spec.columnMap.keys.filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"source ${spec.name}: mapped column(s) ${missing.mkString(",")} " +
        s"absent from input (has: ${raw.columns.mkString(",")})")
    raw.select(col("ts") +:
      spec.columnMap.toSeq.sortBy(_._2)
        .map { case (from, to) => col(from).as(to) }: _*)
  }

  /** All sources, stacked long: (source, series, ts, value) — one
    * union-append of per-source frames, the reference's read-loop shape.
    */
  def readAll(spark: SparkSession, specs: Seq[SourceSpec]): DataFrame = {
    require(specs.nonEmpty, "empty source registry")
    specs.map { spec =>
      val wide = readSource(spark, spec)
      val series = wide.columns.filterNot(_ == "ts")
      // per-series selects unioned (not explode(map(...)): map values may
      // not be null, and coerce-failed cells ARE null)
      series.toSeq.map(sname =>
        wide.select(lit(spec.name).as("source"), lit(sname).as("series"),
          col("ts"), col(sname).cast("double").as("value")))
        .reduce(_ unionByName _)
    }.reduce(_ unionByName _)
  }
}
