package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.Warc
import graft.web.Web

class WebSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- html

  test("extractText: tags stripped, script/style contents dropped, entities decoded once, ws collapsed") {
    val html =
      "<html><head><title>T</title><script>var a=\"</p>ish\";\nif(a<2){}</script>" +
        "<style>p { margin : 0 }\n.x{}</style></head>" +
        "<body><h1>Hi</h1>\n  <p>a   b</p><p>x &amp;amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;done</p></body></html>"
    val out = Seq(html).toDF("h").select(Web.extractText(col("h"))).as[String].head()
    // &amp;amp; decodes exactly once -> literal "&amp;"
    assert(out == "T Hi a b x &amp; <tag> \"q\" 's' done")
  }

  test("extractText over the pages fixture html is byte-identical to documents.text (the input_hint invariant)") {
    val pages = graft.ingest.Pages.synthesize(spark, SparkTestSession.sf0001)
    val bad = pages
      .select(col("text"), Web.extractText(col("html").cast("string")).as("ex"))
      .where(col("text") =!= col("ex"))
    assert(bad.count() == 0)
  }

  test("extractLinks keeps document order and both quote contents; link graph drops relative links") {
    val html = "<a href=\"https://a.example/x\">1</a><p/><a id=\"z\" href=\"/rel\">2</a>" +
      "<a href=\"https://b.example/\">3</a><a href=\"https://a.example/y\">4</a>"
    val links = Seq(html).toDF("h").select(Web.extractLinks(col("h"))).as[Seq[String]].head()
    assert(links == Seq("https://a.example/x", "/rel", "https://b.example/", "https://a.example/y"))
    val g = Web.domainLinkGraph(
      Seq(("https://src.example/p", html)).toDF("url", "html"), "url", "html")
      .as[(String, String, Long)].collect().toSet
    assert(g == Set(("src.example", "a.example", 2L), ("src.example", "b.example", 1L)))
  }

  // --------------------------------------------------------- pagerank

  test("pagerankFixedPoint matches hand-computed fixed-point ranks on a planted graph") {
    // a -> b, a -> c, b -> c, c -> a : outdeg a=2, b=1, c=1
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = Web.pagerankFixedPoint(edges, iters = 2)
      .as[(String, Long)].collect().toMap
    // r0 = 1_000_000 each; contrib(u) = r(u)*85 div (100*outdeg)
    // r1: a = 150000 + c:850000 = 1000000
    //     b = 150000 + a:425000 = 575000
    //     c = 150000 + a:425000 + b:850000 = 1425000
    // r2: a = 150000 + 1425000*85 div 100 = 150000 + 1211250 = 1361250
    //     b = 150000 + 1000000*85 div 200 = 150000 + 425000  = 575000
    //     c = 150000 + 425000 + 575000*85 div 100 = 150000 + 425000 + 488750 = 1063750
    assert(got == Map("a" -> 1361250L, "b" -> 575000L, "c" -> 1063750L))
  }

  test("pagerank is partitioning-invariant (integer arithmetic): repartitioned input gives identical ranks") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pages = docs.select(col("doc_id"),
      concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
        lit(".example/p")).as("url"),
      concat(lit("<a href=\"https://d"), ((col("doc_id") * 3 + 1) % 11).cast("string"),
        lit(".example/\">x</a>")).as("html"))
    def ranks(df: org.apache.spark.sql.DataFrame) =
      Web.pagerankFixedPoint(
        Web.domainLinkGraph(df, "url", "html")
          .select(col("src_domain").as("src"), col("dst_domain").as("dst")))
        .as[(String, Long)].collect().toMap
    assert(ranks(pages) == ranks(pages.repartition(17)))
  }

  // ------------------------------------------------------------- warc

  test("warc roundtrip (plain + gzip): records survive byte-exactly, bodies with embedded CRLFCRLF intact") {
    val body = Array.tabulate[Byte](300)(i => (i % 251).toByte) ++
      "\r\n\r\n".getBytes ++ Array.tabulate[Byte](40)(i => (i * 7).toByte)
    val df = Seq(
      ("https://x.example/a", 1704067200L, "<html>plain</html>".getBytes("UTF-8")),
      ("https://x.example/b", 1704067260L, body),
      ("https://y.example/c", 1704153600L, "<html>3</html>".getBytes("UTF-8"))
    ).toDF("url", "epoch_s", "html")
      .select(col("url"), timestamp_seconds(col("epoch_s")).as("warc_ts"), col("html"))
    for (gz <- Seq(false, true)) {
      val out = graft.queries.Scratch.dir(s"webspec_warc_$gz")
      Warc.write(df, out, nFiles = 2, gzip = gz)
      val back = Warc.read(spark, out)
        .select(col("url"), unix_timestamp(col("warc_ts")).as("e"), col("html"))
        .as[(String, Long, Array[Byte])].collect().sortBy(_._1)
      assert(back.map(_._1).toSeq == Seq("https://x.example/a", "https://x.example/b", "https://y.example/c"))
      assert(back.map(_._2).toSeq == Seq(1704067200L, 1704067260L, 1704153600L))
      assert(back(1)._3.toSeq == body.toSeq, s"gzip=$gz body mismatch")
    }
  }

  test("warc parser: empty input, warcinfo-only files, and mid-header truncation all yield empty, not errors") {
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll(
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nmeta\r\n\r\n"
        .getBytes("UTF-8")).isEmpty)
    assert(Warc.parseAll(
      "WARC/1.0\r\nWARC-Type: resp".getBytes("UTF-8")).isEmpty)
    // corrupt gzip magic with garbage behind it: clean empty, no throw
    assert(Warc.parseAll(Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9, 9)).isEmpty)
  }

  test("warc parser: skips warcinfo records, tolerates a truncated trailing record") {
    val good = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nmeta\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://ok.example/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 44\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 6\r\n\r\n<html>\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://cut.example/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 999\r\n\r\nHTTP/1.1 200").getBytes("UTF-8")
    val recs = Warc.parseAll(good)
    assert(recs.map(_._1) == Seq("https://ok.example/"))
    assert(new String(recs.head._3, "UTF-8") == "<html>")
  }

  test("warc parser: WARC/1.1 accepted; corrupt Content-Length / WARC-Date end or skip cleanly") {
    // WARC/1.1 (ISO 28500 current revision, wget emits it) must parse
    val v11 = ("WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: https://v11.example/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 44\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 6\r\n\r\n<html>\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parseAll(v11).map(_._1) == Seq("https://v11.example/"))
    // non-numeric Content-Length: ends iteration cleanly (framing is lost)
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: oops\r\n\r\njunk").getBytes("UTF-8")
    assert(Warc.parseAll(badLen).isEmpty)
    // malformed WARC-Date: that RECORD is skipped (framing intact), the
    // following good record still parses
    val badDate = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://bad.example/\r\n" +
      "WARC-Date: not-a-date\r\nContent-Length: 44\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 6\r\n\r\n<html>\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://good.example/\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 44\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 6\r\n\r\n<html>\r\n\r\n").getBytes("UTF-8")
    assert(Warc.parseAll(badDate).map(_._1) == Seq("https://good.example/"))
  }
}
