package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Excel (xlsx) source + sink built directly on the OOXML SpreadsheetML
  * format (ECMA-376) with the JDK's zip + StAX — an xlsx file is a zip
  * archive of XML parts, so no external library is required. Covers
  * SURVEY.md §2.1 S3 (reference read.py `pd.read_excel`) and §2.6 S6
  * (main.ipynb `ExcelWriter`), previously declared impossible offline.
  *
  * Scale contract:
  *  - SOURCE: many-workbook ingest parses each file ON AN EXECUTOR
  *    (`binaryFile` scan + flatMap over file bytes) — horizontal scaling
  *    is per file, matching the reference's one-workbook-per-TSO inputs.
  *    A single workbook is driver-feasible by construction (Excel caps a
  *    sheet at 1,048,576 rows).
  *  - SINK: Excel export is a LAST-MILE artifact for small curated
  *    outputs (the reference's ExcelWriter dumps the final frame); the
  *    sink collects and enforces the sheet row cap — bulk output always
  *    goes to parquet / chunk stores.
  *
  * Supported cell forms: inline strings (`t="inlineStr"`), shared
  * strings (`t="s"` + xl/sharedStrings.xml), cached formula strings
  * (`t="str"`), numbers, blanks/gaps (sparse `r="B7"` refs) -> null.
  * Doubles are written with `Double.toString` (shortest round-trip
  * representation), so a write/read cycle is bitwise lossless.
  */
object Xlsx {

  // ---------------------------------------------------------------- parse

  /** Parse the FIRST worksheet of an xlsx byte array into a dense row
    * grid: `null` | `java.lang.Double` | `String` per cell. Pure function
    * of the bytes — safe to call inside executor tasks.
    */
  def parse(bytes: Array[Byte]): IndexedSeq[IndexedSeq[AnyRef]] = {
    var sheets = List.empty[(String, Array[Byte])]
    var sharedXml: Option[Array[Byte]] = None
    var workbookXml: Option[Array[Byte]] = None
    var relsXml: Option[Array[Byte]] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") sharedXml = Some(readAll(zin))
        else if (name == "xl/workbook.xml") workbookXml = Some(readAll(zin))
        else if (name == "xl/_rels/workbook.xml.rels") relsXml = Some(readAll(zin))
        else if (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))
          sheets ::= (name, readAll(zin))
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheets.nonEmpty, "xlsx contains no worksheet part")
    val shared = sharedXml.map(parseSharedStrings).getOrElse(Vector.empty)
    // "first sheet" = first in WORKBOOK order (xl/workbook.xml sheet list
    // resolved through the rels part) — part FILENAMES carry no order
    // contract (sheet10.xml sorts before sheet2.xml). Falls back to the
    // lexically-smallest part name when either xml part is absent.
    val first = firstSheetTarget(workbookXml, relsXml)
      .flatMap(t => sheets.find(_._1 == t))
      .getOrElse(sheets.minBy(_._1))
    parseSheet(first._2, shared)
  }

  /** Resolve the first workbook sheet's part name ("xl/worksheets/...")
    * from xl/workbook.xml (sheet order + r:id) and its rels (r:id ->
    * Target). None when either part is missing or unparsable.
    */
  private def firstSheetTarget(
      workbookXml: Option[Array[Byte]],
      relsXml: Option[Array[Byte]]
  ): Option[String] =
    try {
      for {
        wb <- workbookXml
        rels <- relsXml
        rid <- {
          val r = xmlReader(wb)
          try {
            var found: Option[String] = None
            while (found.isEmpty && r.hasNext) {
              if (r.next() == XMLStreamConstants.START_ELEMENT &&
                  r.getLocalName == "sheet")
                found = Option(r.getAttributeValue(
                  "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
                  "id"))
            }
            found
          } finally r.close()
        }
        target <- {
          val r = xmlReader(rels)
          try {
            var found: Option[String] = None
            while (found.isEmpty && r.hasNext) {
              if (r.next() == XMLStreamConstants.START_ELEMENT &&
                  r.getLocalName == "Relationship" &&
                  Option(r.getAttributeValue(null, "Id")).contains(rid))
                found = Option(r.getAttributeValue(null, "Target"))
            }
            found
          } finally r.close()
        }
      } yield if (target.startsWith("/")) target.stripPrefix("/")
              else s"xl/$target"
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** xl/sharedStrings.xml: one entry per `<si>`, concatenating its `<t>`
    * runs (rich-text strings split across runs).
    */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = xmlReader(bytes)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t" => inT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => out += cur.toString
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** "B7" -> 1 (0-based column); empty/absent ref -> -1 (sequential). */
  private def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    c - 1
  }

  private def parseSheet(
      bytes: Array[Byte],
      shared: Vector[String]
  ): IndexedSeq[IndexedSeq[AnyRef]] = {
    val r = xmlReader(bytes)
    val rows = Vector.newBuilder[IndexedSeq[AnyRef]]
    val row = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val text = new StringBuilder
    var cellType = ""
    var cellCol = -1
    var nextCol = 0
    var inVorT = false
    var rowsEmitted = 0
    def put(idx: Int, v: AnyRef): Unit = {
      while (row.length < idx) row += null
      if (idx == row.length) row += v else row(idx) = v
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                row.clear(); nextCol = 0
                // honor the r= row number: Excel omits <row> elements for
                // blank rows — insert empty rows for the gap (the row
                // analog of the sparse-cell colIndex handling), else all
                // later rows silently shift up and header/data misalign
                Option(r.getAttributeValue(null, "r"))
                  .flatMap(_.toIntOption).foreach { rref =>
                    while (rowsEmitted < rref - 1) {
                      rows += Vector.empty; rowsEmitted += 1
                    }
                  }
              case "c" =>
                text.clear()
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(-1)
                if (cellCol < 0) cellCol = nextCol
              case "v" | "t" => inVorT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inVorT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => inVorT = false
              case "c" =>
                val s = text.toString
                val v: AnyRef = cellType match {
                  case "s" => shared(s.trim.toInt)
                  case "inlineStr" | "str" => s
                  case "b" => if (s.trim == "1") "TRUE" else "FALSE"
                  case _ => // numeric (default) — blank cell -> null
                    if (s.trim.isEmpty) null
                    else java.lang.Double.valueOf(s.trim)
                }
                put(cellCol, v)
                nextCol = cellCol + 1
              case "row" => rows += row.toVector; rowsEmitted += 1
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result()
  }

  // ---------------------------------------------------------------- read

  private def pad(r: IndexedSeq[AnyRef], n: Int): Seq[AnyRef] =
    (0 until n).map(i => if (i < r.length) r(i) else null)

  /** Driver-side parse of the first (sorted) xlsx file under `path` —
    * used only to derive header names / column types; data rows stream
    * through executors in [[readSheet]] / [[readEuTimeSeries]].
    */
  private def firstFile(
      spark: SparkSession, path: String, glob: String
  ): IndexedSeq[IndexedSeq[AnyRef]] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory) {
        val m = new org.apache.hadoop.fs.GlobFilter(glob)
        val parts = fs.listStatus(hPath).filter(_.isFile)
          .map(_.getPath).filter(m.accept).sortBy(_.getName)
        require(parts.nonEmpty, s"no $glob files under $path")
        parts.head
      } else hPath
    val in = fs.open(file)
    try parse(readAll(in)) finally in.close()
  }

  /** Read single-header-row workbook(s) (the [[writeXlsx]] shape):
    * columns named by the header row, each column typed by its first
    * non-null data cell in the first file (string -> string, number ->
    * double). Every file under `path` matching `glob` is parsed on an
    * executor.
    */
  def readSheet(
      spark: SparkSession,
      path: String,
      glob: String = "*.xlsx"
  ): DataFrame = {
    val head = firstFile(spark, path, glob)
    require(head.nonEmpty, "workbook has no header row")
    val names = head.head.map(v => String.valueOf(v))
    val types = names.indices.map { i =>
      head.drop(1).iterator.map(r => if (i < r.length) r(i) else null)
        .collectFirst { case v if v != null => v } match {
        case Some(_: String) => StringType
        case _ => DoubleType
      }
    }
    val schema = StructType(names.zip(types).map {
      case (n, t) => StructField(n, t, nullable = true)
    })
    val nCols = names.length
    val bin = binaryFiles(spark, path, glob)
    val rows = bin.flatMap { case (_, bytes) =>
      parse(bytes).drop(1).map(r => Row.fromSeq(pad(r, nCols)))
    }
    spark.createDataFrame(rows, schema)
  }

  /** EU time-series workbook(s), mirroring
    * [[CsvSource.readEuTimeSeries]]'s contract on xlsx: first column an
    * ISO-8601 UTC timestamp, `headerRows` header rows flattened into
    * `level0_level1_...` names (blank levels skipped), numeric data
    * cells, blanks/gaps -> null. Output: (`ts` timestamp, <series>...
    * double), one parse task per file.
    */
  def readEuTimeSeries(
      spark: SparkSession,
      path: String,
      headerRows: Int,
      glob: String = "*.xlsx"
  ): DataFrame = {
    val head = firstFile(spark, path, glob)
    require(head.length >= headerRows, s"workbook has < $headerRows header rows")
    val header = head.take(headerRows)
    val nCols = header.map(_.length).max
    val names = (1 until nCols).map { i =>
      val levels = header.map(r => if (i < r.length) r(i) else null)
        .collect { case s: String if s.nonEmpty => s }
      require(levels.nonEmpty, s"column $i has an empty header")
      levels.mkString("_")
    }
    val schema = StructType(StructField("ts", StringType) +:
      names.map(n => StructField(n, DoubleType, nullable = true)))
    val bin = binaryFiles(spark, path, glob)
    val rows = bin.flatMap { case (_, bytes) =>
      parse(bytes).drop(headerRows).map { r =>
        val p = pad(r, nCols)
        Row.fromSeq(String.valueOf(p.head) +: p.tail.map {
          case d: java.lang.Double => d
          case null => null
          case s: String if s.trim.isEmpty => null
          case s: String => s.toDouble: java.lang.Double
        })
      }
    }
    spark.createDataFrame(rows, schema)
      .withColumn("ts", to_timestamp(col("ts")))
  }

  private def binaryFiles(
      spark: SparkSession, path: String, glob: String
  ): org.apache.spark.rdd.RDD[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])].rdd
  }

  // ---------------------------------------------------------------- write

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(rowIdx: Int, colIdx: Int, v: Any): String = {
    val ref = s"${colRef(colIdx)}${rowIdx + 1}"
    v match {
      case null => ""
      case d: Double => s"""<c r="$ref"><v>${d.toString}</v></c>"""
      case f: Float => s"""<c r="$ref"><v>${f.toDouble.toString}</v></c>"""
      case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
      case s: String =>
        s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>"""
      case other => throw new IllegalArgumentException(
        s"unsupported xlsx cell type ${other.getClass.getName} — cast " +
          "timestamps/booleans to string or numeric before the Excel sink")
    }
  }

  /** Write `df` as one xlsx workbook: a header row of column names, then
    * the data, strings as inline strings, numerics as shortest-round-trip
    * numbers. Enforces Excel's sheet capacity (`maxRows`, default the
    * format's 1,048,576 minus the header) — by design: see the class
    * docs, the Excel sink is a last-mile export, not a bulk path.
    */
  def writeXlsx(
      df: DataFrame,
      path: String,
      sheetName: String = "data",
      maxRows: Int = 1048575
  ): Unit = {
    val names = df.columns.toIndexedSeq
    val rows = df.collect()
    require(rows.length <= maxRows,
      s"xlsx sheet cap: ${rows.length} rows > $maxRows — Excel export is " +
        "a last-mile artifact; write parquet for bulk output")
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sheet.append(s"""<row r="1">""")
    names.zipWithIndex.foreach { case (n, i) => sheet.append(cellXml(0, i, n)) }
    sheet.append("</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.append(s"""<row r="${ri + 2}">""")
      (0 until r.length).foreach { ci =>
        sheet.append(cellXml(ri + 1, ci, r.get(ci)))
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
          """</workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheet.toString)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val zout = new ZipOutputStream(java.nio.file.Files.newOutputStream(p))
    try parts.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zout.closeEntry()
    } finally zout.close()
  }
}
