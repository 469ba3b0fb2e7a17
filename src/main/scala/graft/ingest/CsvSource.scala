package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** European-style CSV ingestion (SURVEY.md §2.1 S2): the reference's
  * per-TSO parsers handle decimal commas, thousands separators, skiprows,
  * multi-row headers and CET/CEST local timestamps (OPSD read.py
  * `read_<source>` family). The engine's production input is the
  * Parquet/Iceberg pages table, but the parsing capability itself is part
  * of the operator inventory:
  *
  *  - `;`-separated, decimal-comma numbers (`1.234,56` -> 1234.56),
  *  - N header rows flattened into `level0_level1_...` column names
  *    (pandas MultiIndex header parity),
  *  - null-on-unparseable via `try_cast` (pandas
  *    `to_numeric(errors='coerce')` parity),
  *  - timestamps either ISO-8601 UTC or LOCAL wall-clock in a source tz,
  *    with the autumn DST overlap folded by an explicit policy
  *    (pandas `tz_localize(ambiguous='...')` parity).
  *
  * Header rows are dropped POSITIONALLY (by byte offset within each file),
  * never by content — a data row that textually equals a header line
  * survives, and multi-split files keep correct names (round-1 advice).
  */
object CsvSource {

  /** Parse a decimal-comma / dot-thousands string column to double,
    * null on failure. */
  def euNumber(c: Column): Column =
    regexp_replace(regexp_replace(trim(c), "\\.", ""), ",", ".")
      .try_cast("double")

  /** Driver-side read of the first `n` lines of the (first) file under
    * `path`, returning the lines and the EXACT byte length of that header
    * block (including line terminators, CRLF-safe). Bounded work: only the
    * header prefix is read, never the data.
    */
  private def headerBlock(
      spark: SparkSession,
      path: String,
      n: Int
  ): (Seq[String], Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory) {
        val parts = fs.listStatus(hPath).filter(_.isFile)
          .map(_.getPath).sortBy(_.getName)
        require(parts.nonEmpty, s"no files under $path")
        parts.head
      } else hPath
    val in = fs.open(file)
    try {
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new java.io.ByteArrayOutputStream()
      var bytes = 0L
      var b = in.read()
      while (b >= 0 && lines.length < n) {
        bytes += 1
        if (b == '\n') {
          val s = cur.toString("UTF-8")
          lines += (if (s.endsWith("\r")) s.dropRight(1) else s)
          cur.reset()
        } else cur.write(b)
        if (lines.length < n) b = in.read() else b = -1
      }
      require(lines.length == n, s"expected $n header rows in $file")
      (lines.toSeq, bytes)
    } finally in.close()
  }

  /** Read a `sep`-separated CSV whose first `headerRows` lines are header
    * levels; returns a frame with flattened `l0_l1_..` column names and
    * every payload column still string-typed (callers pick types).
    *
    * The header block is read driver-side (bounded prefix); data rows are
    * read distributed with their per-file byte offset (TextInputFormat's
    * key) and header lines are dropped where `offset < headerBytes` —
    * positional, so multi-split files and header-identical data rows are
    * both handled correctly. Multi-file inputs must carry an identical
    * header block in every file (the reference's per-source layout).
    */
  def readMultiHeader(
      spark: SparkSession,
      path: String,
      sep: String = ";",
      headerRows: Int = 2
  ): DataFrame = {
    import spark.implicits._
    val (headerLines, headerBytes) = headerBlock(spark, path, headerRows)
    val dataLines = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text])
      .filter { case (off, _) => off.get() >= headerBytes }
      .map { case (_, t) => t.toString }
    val data = spark.read
      .option("header", "false")
      .option("sep", sep)
      .csv(spark.createDataset(dataLines))
    val levels = headerLines.map(_.split(java.util.regex.Pattern.quote(sep), -1))
    val cols = data.columns
    val names = cols.indices.map { i =>
      levels.map(l => if (i < l.length) l(i) else "")
        .filter(_.nonEmpty).mkString("_")
    }
    names.zipWithIndex.foldLeft(data) { case (df, (n, i)) =>
      df.withColumnRenamed(cols(i), if (n.isEmpty) s"c$i" else n)
    }
  }

  /** Convert a LOCAL wall-clock timestamp (parsed naive) in `tz` to UTC,
    * folding the autumn DST overlap by policy — pandas
    * `tz_localize(tz, ambiguous=...)` parity:
    *
    *  - "earliest": both duplicate wall times map to the FIRST occurrence
    *    (summer offset) — java.time's default resolution;
    *  - "latest": ambiguous wall times map to the SECOND occurrence.
    *
    * The fold width is DERIVED from the zone's own transition rules, not
    * hardcoded: offset(t) falls by exactly the overlap across an autumn
    * transition, so `offset(earliest) - offset(earliest + 12h)` yields the
    * gap (3600 s for CET/CEST, 1800 s for half-hour zones like
    * Australia/Lord_Howe; real folds are minutes-to-hours, never half a
    * day, so the 12 h probe always lands beyond the transition and before
    * any next one). Ambiguity is then detected structurally: a wall time
    * is ambiguous iff the instant `fold` seconds after its earliest
    * mapping renders back to the same wall clock. Spring-gap times
    * (nonexistent) resolve per java.time (shifted forward by the gap).
    * Pure column expressions — no UDF; timestamp->long casts read the
    * internal epoch, so nothing depends on the session time zone.
    */
  def localizedUtc(local: Column, tz: String, ambiguous: String = "earliest"): Column = {
    def offsetAt(t: Column): Column =
      from_utc_timestamp(t, tz).cast("long") - t.cast("long")
    val earliest = to_utc_timestamp(local, tz)
    val probe = timestamp_seconds(earliest.cast("long") + 43200L)
    val fold = offsetAt(earliest) - offsetAt(probe)
    val second = timestamp_seconds(earliest.cast("long") + fold)
    val isAmbiguous = fold > 0 && from_utc_timestamp(second, tz) === local
    ambiguous match {
      case "earliest" => earliest
      case "latest"   => when(isAmbiguous, second).otherwise(earliest)
      case other => throw new IllegalArgumentException(
        s"ambiguous policy must be earliest|latest, got $other")
    }
  }

  /** Full S2 shape: multi-header EU CSV -> typed long frame
    * (ts, series columns...) with decimal-comma values parsed. First
    * column must be the timestamp: ISO-8601 UTC when `sourceTz` is empty,
    * otherwise LOCAL wall clock in `sourceTz` folded to UTC by the
    * `ambiguous` policy (the reference's TSO CSVs arrive in CET/CEST).
    */
  def readEuTimeSeries(
      spark: SparkSession,
      path: String,
      sep: String = ";",
      headerRows: Int = 2,
      sourceTz: String = "",
      ambiguous: String = "earliest"
  ): DataFrame = {
    val df = readMultiHeader(spark, path, sep, headerRows)
    val tsCol = df.columns.head
    val valueCols = df.columns.tail
    val ts =
      if (sourceTz.isEmpty) to_timestamp(col(tsCol))
      else localizedUtc(to_timestamp(col(tsCol)), sourceTz, ambiguous)
    valueCols.foldLeft(df.withColumn("ts", ts)) { (d, c) =>
        d.withColumn(c, euNumber(col(c)))
      }
      .drop(tsCol)
      .select(col("ts") +: valueCols.map(col): _*)
  }
}
