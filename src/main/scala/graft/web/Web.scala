package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML-side operators of the web-pipeline: text extraction (tag strip +
  * entity decode + whitespace normalization), outlink extraction, the
  * domain link graph, and a fixed-point (integer-arithmetic) PageRank.
  *
  * The reference pipeline consumes already-extracted series; a
  * Common-Crawl-shaped engine (BASELINE.json input_hint: pages carry raw
  * `html` BINARY next to extracted `text`) needs the html->text step
  * itself, because "byte-identical extracted text per url" is the per-row
  * invariant every downstream stage is audited against. Everything here is
  * pure codegen'd column expressions (regexp_replace / regexp_extract_all
  * chains) — no UDFs, no shuffles until an explicit aggregation — and every
  * rule is RE2/java.util.regex-portable so the DuckDB oracle replays it
  * verbatim.
  */
object Web {

  /** Plain-text extraction from raw HTML:
    *  1. drop <script>...</script> and <style>...</style> INCLUDING their
    *     contents ((?s) so blocks may span lines),
    *  2. strip every remaining tag to a space,
    *  3. decode the 6 entities that survive in body text
    *     (&lt; &gt; &quot; &#39; &nbsp;, and &amp; LAST so "&amp;lt;"
    *     decodes to the literal "&lt;" exactly once — single-pass
    *     semantics),
    *  4. collapse runs of whitespace to single spaces and trim.
    *
    * Output is one whitespace-normalized line per document — the same
    * normal form the `documents` corpus uses, so for any page whose body
    * held normalized text the extraction is byte-identical to it.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The same chain as a DuckDB SQL expression over `expr` (the oracle
    * mirror of [[extractText]] — kept adjacent so the two lists of rules
    * cannot drift apart silently).
    */
  def extractTextSql(expr: String): String = {
    val noScript = s"regexp_replace($expr, '(?s)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '<[^>]*>', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) =>
      s"regexp_replace($c, '$e', '$r', 'g')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** All href targets of anchor tags, in document order. Double-quoted
    * hrefs only (the form every major generator emits); relative links are
    * returned as-is — callers filter/resolve.
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("<a[^>]*href=\"([^\"]*)\""), lit(1))

  /** DuckDB mirror of [[extractLinks]]. */
  def extractLinksSql(expr: String): String =
    s"""regexp_extract_all($expr, '<a[^>]*href="([^"]*)"', 1)"""

  /** Domain-level link graph: explode each page's outlinks, keep absolute
    * https links, and count edges per (src_domain, dst_domain).
    *
    * 100 TB shape: the explode is narrow (no shuffle); only (src, dst)
    * domain PAIRS — cardinality |domains|^2 at worst, web-graph-sparse in
    * practice — reach the single hash aggregation, which partial-aggregates
    * map-side before the exchange. Html bytes never shuffle.
    */
  def domainLinkGraph(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    pages
      .select(
        regexp_extract(col(urlCol), "https://([^/]+)", 1).as("src_domain"),
        explode(extractLinks(col(htmlCol).cast("string"))).as("href"))
      .where(col("href").startsWith("https://"))
      .select(col("src_domain"),
        regexp_extract(col("href"), "https://([^/]+)", 1).as("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** HTML metadata extraction (T37): title, meta description, declared
    * charset, canonical link — the head fields every crawl pipeline
    * indexes (and canonical is itself a dedup signal). Pure regexp
    * projections, double-quoted attributes (the form generators emit);
    * missing fields extract as ''.
    */
  def htmlMeta(pages: DataFrame, htmlCol: String): DataFrame = {
    val h = col(htmlCol).cast("string")
    pages
      .withColumn("title", regexp_extract(h, "(?s)<title>(.*?)</title>", 1))
      .withColumn("meta_desc",
        regexp_extract(h, "<meta name=\"description\" content=\"([^\"]*)\"", 1))
      .withColumn("charset",
        lower(regexp_extract(h, "<meta charset=\"([^\"]*)\"", 1)))
      .withColumn("canonical",
        regexp_extract(h, "<link rel=\"canonical\" href=\"([^\"]*)\"", 1))
  }

  /** robots.txt rule extraction (T38): one (domain, prefix) row per
    * `Disallow:` line. Scope: the `User-agent: *` group form (the fixture
    * and the vast majority of real files); empty Disallow ("allow all")
    * rows are dropped per the spec.
    */
  def robotsRules(robots: DataFrame, domainCol: String, txtCol: String): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(txtCol), "\n")).as("line"))
      .select(col("domain"),
        regexp_extract(col("line"), "^Disallow:\\s*(\\S+)", 1).as("prefix"))
      .where(col("prefix") =!= "")

  /** robots.txt Crawl-delay extraction (T38): one (domain, delay_s) row
    * per file that declares one; callers supply the default for the
    * rest. Integer seconds (the form real files use).
    */
  def robotsDelays(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(txtCol), "\n")).as("line"))
      .select(col("domain"),
        regexp_extract(col("line"), "^Crawl-delay:\\s*([0-9]+)", 1).as("d"))
      .where(col("d") =!= "")
      .select(col("domain"), col("d").cast("long").as("delay_s"))

  /** Politeness scheduling (T40b): space a domain's fetches at least its
    * Crawl-delay apart. Policy (closed-form, deterministic under any
    * partitioning — a tightest-schedule recurrence would need a
    * sequential scan): the i-th fetch of a domain (ordered by desired
    * time, url) starts no earlier than the domain's FIRST desired time
    * plus (i-1)·delay:
    *
    *   sched_s = greatest(next_fetch_s, min(next_fetch_s) over domain
    *                                    + (pos_in_domain - 1) * delay_s)
    *
    * One window over domain — the politeness unit — so hot domains
    * serialize exactly where the crawl must serialize anyway.
    */
  def politeSchedule(frontier: DataFrame, delays: DataFrame,
      defaultDelayS: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("next_fetch_s"), col("url"))
    frontier.join(broadcast(delays), Seq("domain"), "left")
      .withColumn("delay_s", coalesce(col("delay_s"), lit(defaultDelayS)))
      .withColumn("_pos", row_number().over(w))
      .withColumn("_dmin",
        min(col("next_fetch_s")).over(Window.partitionBy(col("domain"))))
      .withColumn("sched_s",
        greatest(col("next_fetch_s"),
          col("_dmin") + (col("_pos") - 1) * col("delay_s")))
      .drop("_pos", "_dmin")
  }

  /** Crawl-policy filter (T38): a page is allowed unless SOME of its
    * domain's disallow prefixes matches its path. Rules tables are tiny
    * next to a crawl — broadcast left join, per-url bool aggregation (the
    * join may multiply a url by its domain's rule count; the aggregate
    * collapses it back map-side).
    */
  def robotsFilter(pages: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val withPath = pages.select(col(urlCol).as("url"),
      regexp_extract(col(urlCol), "https://[^/]+(/.*)", 1).as("path"),
      regexp_extract(col(urlCol), "https://([^/]+)", 1).as("domain"))
    withPath.join(broadcast(rules), Seq("domain"), "left")
      .groupBy(col("url"))
      .agg((sum(when(col("prefix").isNotNull &&
          col("path").startsWith(col("prefix")), 1).otherwise(0)) === 0)
        .as("allowed"))
  }

  /** Sitemap parse (S10): explode a sitemap XML's `<loc>` entries to
    * (domain, loc) rows — the discovery side of crawling: sitemap minus
    * crawled = the frontier the crawler is missing. Regexp extraction
    * (sitemap XML is flat, machine-generated); one narrow explode.
    */
  def parseSitemap(sitemaps: DataFrame, domainCol: String,
      xmlCol: String): DataFrame =
    sitemaps.select(col(domainCol).as("domain"),
      explode(regexp_extract_all(col(xmlCol), lit("<loc>([^<]*)</loc>"),
        lit(1))).as("loc"))

  /** Redirect-chain resolution (T39): follow (src -> dst) redirect edges
    * from every start url for up to `maxHops` hops. Emits
    * (url, final_url, n_hops, resolved) — `resolved` false when the url
    * still points at a redirect after the cap (cycles and over-long
    * chains surface instead of hanging; real crawlers cap at 5-10).
    *
    * Each hop is one hash join of the frontier against the edge table —
    * maxHops is a small constant, so the whole resolution is a fixed
    * cascade Catalyst plans as ordinary joins (AQE broadcasts the side
    * that shrinks). No driver-side iteration state.
    */
  def resolveRedirects(starts: DataFrame, urlCol: String, edges: DataFrame,
      maxHops: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var cur = starts.select(col(urlCol).as("url"),
      col(urlCol).as("final_url"), lit(0L).as("n_hops"))
    for (_ <- 1 to maxHops) {
      cur = cur.join(e, cur("final_url") === e("src"), "left")
        .select(col("url"),
          coalesce(col("dst"), col("final_url")).as("final_url"),
          (col("n_hops") + when(col("dst").isNotNull, 1L).otherwise(0L))
            .as("n_hops"))
    }
    cur.join(e.select(col("src"), lit(1).as("_more")),
        cur("final_url") === col("src"), "left")
      .select(col("url"), col("final_url"), col("n_hops"),
        col("_more").isNull.as("resolved"))
  }

  /** Anchor-text aggregation (T36): the classic web-corpus signal — what
    * OTHER pages call a target (anchor corpora train retrieval and were
    * classic ranking features). Extracts (href, anchor-text) pairs
    * positionally from one pattern evaluated twice (group 1 / group 2 —
    * identical match spans, so the zip aligns), keeps absolute https
    * links, and emits the top-`k` anchor strings per target domain by
    * count (ties broken lexicographically ⇒ deterministic).
    *
    * 100 TB shape: html never shuffles — only (dst_domain, anchor) pairs
    * reach the partial-agg'd count, and the rank window runs over
    * already-aggregated rows with a WindowGroupLimit top-k heap.
    */
  def anchorTexts(pages: DataFrame, htmlCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pat = "<a[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
    val pairs = pages
      .select(explode(zip_with(
        regexp_extract_all(col(htmlCol).cast("string"), lit(pat), lit(1)),
        regexp_extract_all(col(htmlCol).cast("string"), lit(pat), lit(2)),
        (h, t) => struct(h.as("href"), t.as("anchor")))).as("p"))
      .select(col("p.href").as("href"), col("p.anchor").as("anchor"))
      .where(col("href").startsWith("https://"))
      .select(regexp_extract(col("href"), "https://([^/]+)", 1).as("dst_domain"),
        col("anchor"))
    pairs.groupBy("dst_domain", "anchor").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("dst_domain"))
          .orderBy(col("cnt").desc, col("anchor"))))
      .filter(col("rank") <= k)
  }

  /** Revisit change detection — the crawl-freshness statistic that drives
    * recrawl scheduling. Per url, visits ordered by `ts`: a visit is a
    * CHANGE when its content hash differs from the previous visit's.
    * Emits per-url (n_visits, n_changes, first/last epoch, change_ppm)
    * where change_ppm = n_changes * 10^6 div (n_visits - 1) — integer
    * arithmetic, reproducible bitwise under any partitioning.
    *
    * 100 TB shape: ONE shuffle on url (window partition key = the
    * storage bucket key family, never the domain — no hot-domain skew),
    * lag + aggregation collapse in the same exchange; only md5 hashes
    * move, never document bytes.
    */
  def revisitChanges(pages: DataFrame, urlCol: String, tsCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url")).orderBy(col("epoch_s"))
    pages
      .select(col(urlCol).as("url"),
        unix_timestamp(col(tsCol)).as("epoch_s"),
        md5(col(textCol)).as("h"))
      .withColumn("changed",
        when(lag(col("h"), 1).over(w).isNull, lit(0))
          .when(col("h") =!= lag(col("h"), 1).over(w), lit(1))
          .otherwise(lit(0)))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n_visits"),
        sum(col("changed")).cast("long").as("n_changes"),
        min(col("epoch_s")).as("first_s"),
        max(col("epoch_s")).as("last_s"))
      .withColumn("change_ppm",
        when(col("n_visits") > 1,
          expr("n_changes * 1000000 div (n_visits - 1)")).otherwise(lit(0L)))
  }

  /** Recrawl scheduling over [[revisitChanges]] output: integer-threshold
    * policy buckets (hot >= 50% change rate -> 900 s, warm >= 10% ->
    * 3600 s, else daily). A pure projection — composes with the stats in
    * the same stage.
    */
  def recrawlSchedule(changes: DataFrame): DataFrame =
    changes.withColumn("recrawl_s",
      when(col("change_ppm") >= 500000L, lit(900L))
        .when(col("change_ppm") >= 100000L, lit(3600L))
        .otherwise(lit(86400L)))

  /** Fixed-point PageRank over a (src, dst) edge list: `iters` synchronous
    * iterations of
    *
    *   rank'(v) = base + sum over in-edges (u,v) of (rank(u) * damp_num)
    *                                               / (damp_den * outdeg(u))
    *
    * in INTEGER arithmetic (ranks are fixed-point with `scale` = 1.0).
    * Floating-point PageRank is order-dependent under Spark's partial
    * aggregation (double addition is non-associative), so its low bits —
    * and any rounding of them — are not reproducible across engines or
    * even across runs. Integer division + integer sums are exact and
    * associative: the result is bitwise identical for ANY partitioning and
    * replays in ANSI SQL, which is what makes the op oracle-checkable and
    * is how a reproducible 100 TB ranking job should be built anyway.
    * (Truncation drops ≤ damp_den*outdeg ulps per edge — immaterial at
    * scale 10^6.)
    *
    * Dangling mass (nodes without outlinks) is dropped, not redistributed
    * — the common simplified formulation; documented so the oracle states
    * the same rule.
    *
    * Plan: per-iteration = one broadcast-or-shuffle hash join of the
    * current rank table (|V| rows) against edges + one partial-agg sum by
    * dst. Edge table and outdegrees are computed once and reused; ranks
    * are tiny relative to edges so AQE broadcasts them.
    */
  def pagerankFixedPoint(
      edges: DataFrame, // src: string, dst: string (distinct edges)
      iters: Int = 3,
      scale: Long = 1000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    // persist the loop invariants: every iteration references e/outdeg/
    // nodes, and without pinning, iteration k would recompute the whole
    // upstream edge derivation k times (same contract as dupClusters)
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist()
    val base = scale * (dampDen - dampNum) / dampDen
    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank
        .join(outdeg, rank("node") === outdeg("src"))
        .join(e, "src")
        // `div`, not `/`: Spark's Column./ is always double division;
        // integral `div` keeps the arithmetic exact and associative
        .select(col("dst"),
          expr(s"rank * $dampNum div ($dampDen * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      rank = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank"))
    }
    // materialize the final rank (|V| rows — bounded by the node set, not
    // the edges), then RELEASE the three loop invariants: without this
    // every invocation left three pinned RDDs on the executors for the
    // life of the session. The returned frame stays cached; callers that
    // are done with it may unpersist.
    rank = rank.persist()
    rank.count()
    e.unpersist(false)
    nodes.unpersist(false)
    outdeg.unpersist(false)
    rank
  }
}
