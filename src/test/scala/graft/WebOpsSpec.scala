package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.web.Web

/** Unit coverage for the round-5 web-pipeline additions: revisit change
  * detection, repeated-window stats, weighted mixing, domain quality.
  */
class WebOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("revisitChanges: planted revision history counts changes between consecutive visits only") {
    val rows = Seq(
      // url a: v1 v1 v2 v2 v3 -> 4 intervals, 2 changes -> 500000 ppm
      ("https://a/", 100L, "v1"), ("https://a/", 200L, "v1"),
      ("https://a/", 300L, "v2"), ("https://a/", 400L, "v2"),
      ("https://a/", 500L, "v3"),
      // url b: constant -> 0 changes
      ("https://b/", 100L, "x"), ("https://b/", 200L, "x"),
      // url c: single visit -> change_ppm 0 by definition
      ("https://c/", 100L, "y"))
    val df = rows.toDF("url", "e", "text")
      .select(col("url"), timestamp_seconds(col("e")).as("ts"), col("text"))
    val got = Web.revisitChanges(df, "url", "ts", "text")
      .select("url", "n_visits", "n_changes", "change_ppm")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("https://a/", 5L, 2L, 500000L),
      ("https://b/", 2L, 0L, 0L),
      ("https://c/", 1L, 0L, 0L)))
    val sched = Web.recrawlSchedule(Web.revisitChanges(df, "url", "ts", "text"))
      .select("url", "recrawl_s").as[(String, Long)].collect().toMap
    assert(sched == Map("https://a/" -> 900L, "https://b/" -> 86400L,
      "https://c/" -> 86400L))
  }

  test("dupWindowStats: full copy shares all windows, unrelated doc shares none") {
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")     // 20 tokens -> 8 windows of 13
    val other = (100 to 119).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val got = TextOps.dupWindowStats(df, "doc_id", "text", k = 13)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 8L, 8L, 1000000L), (2L, 8L, 8L, 1000000L), (3L, 8L, 0L, 0L)))
  }

  test("dupWindowStats: partial overlap flags only the shared head's windows") {
    val a = (1 to 30).map(i => s"tok$i").mkString(" ")         // 18 windows
    // b shares tokens 1..20 then diverges: shared windows = those fully
    // inside 1..20 -> windows starting at 1..8
    val b = (1 to 20).map(i => s"tok$i").mkString(" ") + " " +
      (200 to 209).map(i => s"uni$i").mkString(" ")
    val got = TextOps.dupWindowStats(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", k = 13)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 18L, 8L, 444444L), (2L, 18L, 8L, 444444L)))
  }

  test("detectMime: every magic routed, unknown falls through to octet-stream") {
    import graft.multimodal.Multimodal
    val cases: Seq[(Array[Byte], String)] = Seq(
      Multimodal.synthPng(7L, 9, 9) -> "image/png",
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) -> "image/jpeg",
      "GIF89a trailer".getBytes("UTF-8") -> "image/gif",
      Multimodal.synthWav(7L, 60) -> "audio/wav",
      Multimodal.synthAvi(7L, 3, 32, 24) -> "video/x-msvideo",
      Multimodal.synthMp4(7L, 2, 32, 24) -> "video/mp4",
      Array[Byte](0x1F, 0x8B.toByte, 8, 0) -> "application/gzip",
      "PK\u0003\u0004rest".getBytes("ISO-8859-1") -> "application/zip",
      "<html><body>x</body></html>".getBytes("UTF-8") -> "text/html",
      Array[Byte](1, 2, 3, 4, 5) -> "application/octet-stream")
    val got = cases.zipWithIndex
      .map { case ((b, _), i) => (i, b) }.toDF("i", "payload")
      .select(col("i"), Multimodal.detectMime(col("payload")).as("m"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == cases.map(_._2))
  }

  test("anchorTexts: pairs align positionally, relative links dropped, rank ties break lexicographically") {
    val html =
      "<a href=\"https://t.example/a\" id=\"x\">buy</a>" +
        "<a href=\"/rel\">skip</a>" +
        "<a href=\"https://t.example/b\">buy</a>" +
        "<a href=\"https://t.example/c\">act</a>" +
        "<a href=\"https://o.example/\">one</a>"
    val got = Web.anchorTexts(Seq(html).toDF("html"), "html", k = 2)
      .select("dst_domain", "anchor", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().toSet
    assert(got == Set(
      ("t.example", "buy", 2L, 1), ("t.example", "act", 1L, 2),
      ("o.example", "one", 1L, 1)))
  }

  test("resolveRedirects: chains resolve, cycles cap out as resolved=false, terminals stay put") {
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"))
      .toDF("src", "dst")
    val starts = Seq("a", "b", "c", "d", "f").toDF("url")
    val got = Web.resolveRedirects(starts, "url", edges, maxHops = 3)
      .as[(String, String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == (("c", 2L, true)))   // two-hop chain
    assert(got("b") == (("c", 1L, true)))
    assert(got("c") == (("c", 0L, true)))   // terminal
    assert(got("f") == (("f", 0L, true)))   // never redirected
    val (fa, na, ra) = got("d")             // cycle: still redirecting at cap
    assert(!ra && na == 3L && (fa == "d" || fa == "e"))
  }

  test("robotsRules + robotsFilter: prefix deny per domain, rule-less domains allow, empty Disallow ignored") {
    val robots = Seq(
      ("x.example", "User-agent: *\nDisallow: /private/\nDisallow: /tmp\nDisallow:\n"),
      ("z.example", "User-agent: *\nDisallow:\n")) // empty = allow all
      .toDF("domain", "txt")
    val rules = Web.robotsRules(robots, "domain", "txt")
    assert(rules.as[(String, String)].collect().toSet ==
      Set(("x.example", "/private/"), ("x.example", "/tmp")))
    val pages = Seq(
      "https://x.example/private/1", "https://x.example/public/1",
      "https://x.example/tmpfile", "https://y.example/private/1",
      "https://z.example/anything").toDF("url")
    val got = Web.robotsFilter(pages, "url", rules)
      .as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "https://x.example/private/1" -> false,
      "https://x.example/public/1" -> true,
      "https://x.example/tmpfile" -> false, // prefix match, not path-segment
      "https://y.example/private/1" -> true,
      "https://z.example/anything" -> true))
  }

  test("htmlMeta: fields extract independently; missing fields come back empty") {
    val html = "<html><head><meta charset=\"UTF-8\"><title>T1\nT2</title>" +
      "<meta name=\"description\" content=\"d e s c\"></head><body>x</body></html>"
    val got = Web.htmlMeta(Seq(html).toDF("html"), "html")
      .select("title", "meta_desc", "charset", "canonical")
      .as[(String, String, String, String)].head()
    assert(got == (("T1\nT2", "d e s c", "utf-8", "")))
  }

  test("invertedIndex: df counts distinct docs; postings fingerprint is the sorted joined id list") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq((2L, "y x y"), (1L, "x y"), (10L, "y z")).toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, "doc_id", "text", cap = 100)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("x") == ((2L, md5Hex("1,2"))))
    assert(got("y") == ((3L, md5Hex("1,2,10")))) // numeric sort, not lexicographic
    assert(got("z") == ((1L, md5Hex("10"))))
  }

  test("topTerms ranks by tf desc then corpus df asc then token") {
    val docs = Seq((1L, "a a a b c"), (2L, "b c c")).toDF("doc_id", "text")
    val got = TextOps.topTerms(docs, "doc_id", "text", k = 5)
      .select("doc", "token", "rank").as[(Long, String, Int)].collect()
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(got(1L) == Seq("a", "b", "c")) // tf 3; tf 1 tie -> df asc ties -> token
    assert(got(2L) == Seq("c", "b"))      // tf 2 beats tf 1
  }

  test("parseSitemap explodes loc entries per domain") {
    val xml = "<urlset><url><loc>https://a/1</loc></url>" +
      "<url><loc>https://a/2</loc><lastmod>2024-01-01</lastmod></url></urlset>"
    val got = Web.parseSitemap(Seq(("a.example", xml)).toDF("domain", "xml"),
      "domain", "xml").as[(String, String)].collect().toSeq
    assert(got == Seq(("a.example", "https://a/1"), ("a.example", "https://a/2")))
  }

  test("politeSchedule: same-domain fetches space by Crawl-delay, declared or default; cross-domain unaffected") {
    val frontier = Seq(
      ("https://a.example/1", "a.example", 100L),
      ("https://a.example/2", "a.example", 100L), // same desired time
      ("https://a.example/3", "a.example", 130L), // beyond the spacing
      ("https://b.example/1", "b.example", 100L),
      ("https://b.example/2", "b.example", 101L))
      .toDF("url", "domain", "next_fetch_s")
    val delays = Seq(("a.example", 10L)).toDF("domain", "delay_s")
    val got = Web.politeSchedule(frontier, delays, defaultDelayS = 5L)
      .select("url", "sched_s").as[(String, Long)].collect().toMap
    assert(got("https://a.example/1") == 100L)
    assert(got("https://a.example/2") == 110L) // min + 1*10
    assert(got("https://a.example/3") == 130L) // desired already compliant
    assert(got("https://b.example/1") == 100L)
    assert(got("https://b.example/2") == 105L) // default 5s spacing
  }

  test("weightedMix: rate-0 source drops all, rate-1 keeps all, unlisted source dropped; repartition-invariant") {
    val df = (0L until 200L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val weights = Seq("s0" -> 0L, "s1" -> 1000000L, "s2" -> 500000L)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.weightedMix(d, "source", "doc_id", weights)
        .as[(Long, String)].collect().toSet
    val got = run(df)
    assert(!got.exists(_._2 == "s0"))
    assert(!got.exists(_._2 == "s3"))                      // unlisted -> dropped
    assert(got.count(_._2 == "s1") == 50)                  // 100% of s1
    val s2 = got.count(_._2 == "s2")
    assert(s2 > 5 && s2 < 45, s"~50% of s2 expected, got $s2")
    assert(run(df.repartition(13)) == got)
  }
}
