package graft.ingest

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source + sink — the container format
  * Common Crawl actually ships, so a pages engine that claims
  * crawl-native ingestion (BASELINE.json input_hint) has to read it.
  *
  * Layout per record (response records only, the kind that carries pages):
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <ISO-8601 UTC>\r\n
  * Content-Type: application/http; msgtype=response\r\n
  * Content-Length: <n = byte length of the HTTP block>\r\n
  * \r\n
  * HTTP/1.1 200 OK\r\n ... \r\n\r\n <body bytes>
  * \r\n\r\n
  * }}}
  *
  * Framing is LENGTH-BASED (Content-Length), never delimiter-based: bodies
  * may legally contain "\r\n\r\n" (WarcSpec plants one). `.warc.gz` files
  * follow the Common-Crawl convention of one gzip MEMBER per record,
  * concatenated — members are what make a 1 GB crawl file splittable by
  * record offset in production readers; here the JDK's GZIPInputStream
  * consumes the concatenation transparently.
  *
  * Scale shape: Common Crawl parallelism is PER-FILE (each ~1 GB warc is
  * one task; a crawl segment is tens of thousands of files), which is
  * exactly what `binaryFile` + flatMap gives — no shuffle, record parsing
  * streams within the task, and only the projected (url, ts, html) rows
  * survive. Reading a 100 TB crawl is then scan-bound, as it should be.
  */
object Warc {

  private val Magic = "WARC/1.0"

  // ---------------------------------------------------------------- write

  /** Distributed sink: `df` must carry (url STRING, warc_ts TIMESTAMP,
    * html BINARY). Writes `nFiles` warc files (one per partition, from the
    * executors — on a cluster `outDir` would be shared storage).
    */
  def write(df: DataFrame, outDir: String, nFiles: Int, gzip: Boolean): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val ext = if (gzip) "warc.gz" else "warc"
    df.select(col("url"), unix_timestamp(col("warc_ts")).as("epoch_s"),
        col("html"))
      .repartition(nFiles)
      .foreachPartition { it: Iterator[Row] =>
        val pid = TaskContext.getPartitionId()
        val path = java.nio.file.Paths.get(f"$outDir/part-$pid%05d.$ext")
        val out = java.nio.file.Files.newOutputStream(path)
        try it.foreach { r =>
          writeRecord(out, r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2), gzip)
        } finally out.close()
      }
  }

  /** One record; for gzip each record is its OWN gzip member (CC layout). */
  private def writeRecord(out: OutputStream, url: String, epochS: Long,
      body: Array[Byte], gzip: Boolean): Unit = {
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
    http.write(body)
    val httpBytes = http.toByteArray
    val rec = new ByteArrayOutputStream()
    rec.write((s"$Magic\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: ${Instant.ofEpochSecond(epochS)}\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${httpBytes.length}\r\n\r\n").getBytes(UTF_8))
    rec.write(httpBytes)
    rec.write("\r\n\r\n".getBytes(UTF_8))
    if (gzip) {
      val gz = new GZIPOutputStream(out)
      gz.write(rec.toByteArray)
      gz.finish() // member trailer only — the underlying stream stays open
    } else out.write(rec.toByteArray)
  }

  // ----------------------------------------------------------------- read

  /** Distributed source: every `.warc` / `.warc.gz` under `dir` becomes
    * one task; yields (url STRING, warc_ts TIMESTAMP, html BINARY).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(bytes => parseAll(bytes))
      .toDF("url", "epoch_s", "html")
      .select(col("url"), timestamp_seconds(col("epoch_s")).as("warc_ts"),
        col("html"))
  }

  /** Parse a whole warc file (gunzipping first when the magic says so).
    * Tolerates trailing truncation: a record whose Content-Length runs
    * past the buffer is dropped, not an error (crawls truncate).
    */
  def parseAll(raw: Array[Byte]): Seq[(String, Long, Array[Byte])] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw)
      else raw
    val recs = Seq.newBuilder[(String, Long, Array[Byte])]
    var pos = 0
    while (pos >= 0 && pos + Magic.length <= bytes.length &&
        new String(bytes, pos, Magic.length, UTF_8) == Magic) {
      val hEnd = indexOf(bytes, "\r\n\r\n".getBytes(UTF_8), pos)
      if (hEnd < 0) pos = -1
      else {
        val headers = new String(bytes, pos, hEnd - pos, UTF_8)
          .split("\r\n").iterator
          .map(_.split(":", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
          .toMap
        val len = headers.get("Content-Length").map(_.toInt).getOrElse(-1)
        val bodyStart = hEnd + 4
        if (len < 0 || bodyStart + len > bytes.length) pos = -1 // truncated
        else {
          if (headers.get("WARC-Type").contains("response")) {
            val http = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len)
            val split = indexOf(http, "\r\n\r\n".getBytes(UTF_8), 0)
            if (split >= 0)
              recs += ((
                headers.getOrElse("WARC-Target-URI", ""),
                Instant.parse(headers.getOrElse("WARC-Date", "1970-01-01T00:00:00Z"))
                  .getEpochSecond,
                java.util.Arrays.copyOfRange(http, split + 4, http.length)))
          }
          pos = bodyStart + len
          // skip the inter-record \r\n\r\n (tolerate its absence at EOF)
          while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n'))
            pos += 1
        }
      }
    }
    recs.result()
  }

  /** Decompress a multi-member gzip stream (one member per record). */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
