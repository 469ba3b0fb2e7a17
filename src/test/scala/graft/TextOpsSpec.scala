package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shingles: 3-gram over tokens; short text collapses to one shingle") {
    val df = Seq("a b c d", "x y").toDF("text")
    val out = df.select(TextOps.shingles(col("text"), 3)).as[Seq[String]]
      .collect().toSeq
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y"))
  }

  test("exact dedupe groups identical texts, keeps min id") {
    val df = Seq((1L, "same text"), (5L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = TextOps.exactDedupe(df, "doc_id", "text")
      .select("keeper", "n_copies").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds the planted near-duplicate and not the unrelated doc") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base + " extra"
    val far = (100 to 160).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = TextOps.minhashNearDups(df, "doc_id", "text",
        k = 16, bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: identical -> 1.0, disjoint -> 0.0") {
    val df = Seq(("a b c d e", "a b c d e", "p q r s t"))
      .toDF("x", "y", "z")
    val (same, disj) = df.select(
        TextOps.ngramJaccard(col("x"), col("y"), 3),
        TextOps.ngramJaccard(col("x"), col("z"), 3))
      .as[(Double, Double)].head()
    assert(same == 1.0 && disj == 0.0)
  }

  test("simhash: hamming(near-dup) << hamming(unrelated)") {
    val base = (1 to 100).map(i => s"w$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 100).map(i => s"v${i * 7}")
    val hNear = java.lang.Long.bitCount(
      TextOps.simhash64(base) ^ TextOps.simhash64(near))
    val hFar = java.lang.Long.bitCount(
      TextOps.simhash64(base) ^ TextOps.simhash64(far))
    assert(hNear < 8, s"near dup hamming $hNear")
    assert(hFar > 16, s"unrelated hamming $hFar")
  }

  test("simhash blocking finds pairs within maxDist") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val near = ((1 to 100).map(i => s"w$i").updated(3, "X")).mkString(" ")
    val df = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
    val pairs = TextOps.simhashNearDups(
        TextOps.simhashTable(df, "doc_id", "text"), "doc_id", maxDist = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("language ID prefers the dictionary with most hits; en wins ties") {
    val df = Seq(
      "the cat of the house is in a box", // en
      "der hund und die katze ist nicht da", // de
      "xyz qqq www" // nothing -> en by tie rule
    ).toDF("text")
    val out = TextOps.langScores(df, "text").select("predicted")
      .as[String].collect().toSeq
    assert(out == Seq("en", "de", "en"))
  }

  test("dupClusters collapses transitive chains to min-id components") {
    import org.apache.spark.sql.functions._
    // components: {1,2,3,4} via chain 1-2-3-4, {10,11}, singletons 20, 21
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = TextOps.dupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("paragraphDedup flags cross-doc paragraphs only; within-doc repeats are not boilerplate") {
    val docs = Seq(
      (1L, "shared nav\n\nunique body one\n\nshared nav"), // repeat WITHIN doc 1 only counts via doc 2
      (2L, "shared nav\n\nunique body two"),
      (3L, "only unique\n\nonly unique") // within-doc repeat, no other doc -> NOT hot
    ).toDF("doc_id", "text")
    val got = TextOps.paragraphDedup(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: 3 paras, both "shared nav" instances flagged (hash in docs 1+2)
    // doc 2: 2 paras, 1 flagged; doc 3: 2 paras, 0 flagged (single-doc hash)
    assert(got == Seq((1L, 3L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
    // blank/whitespace-only segments are dropped
    val blanks = Seq((9L, "a\n\n   \n\nb")).toDF("doc_id", "text")
    assert(TextOps.paragraphDedup(blanks, "doc_id", "text")
      .head().getLong(1) == 2L)
  }

  test("canonicalUrl collapses crawl variants, keeps real params sorted") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(TextOps.canonicalUrl(col("u"))).head().getString(0)
    // tracking params + fragment + case + default port all collapse
    assert(canon("https://Ex.Org/p/1") == "https://ex.org/p/1")
    assert(canon("HTTPS://EX.ORG:443/p/1#frag") == "https://ex.org/p/1")
    assert(canon("https://ex.org/p/1?utm_source=a&fbclid=x&gclid=y&ref=z") ==
      "https://ex.org/p/1")
    assert(canon("http://ex.org:80/p/1") == "http://ex.org/p/1")
    // real params survive, byte-sorted; order never distinguishes
    assert(canon("https://ex.org/p?b=2&a=1") == "https://ex.org/p?a=1&b=2")
    assert(canon("https://ex.org/p?a=1&b=2&utm_medium=m") ==
      canon("https://ex.org/p?b=2&a=1"))
    // NON-default port is a different origin — kept
    assert(canon("https://ex.org:8443/p") == "https://ex.org:8443/p")
    // trailing slashes are noise; a param named 'reference' is NOT 'ref'
    assert(canon("https://ex.org/p/") == "https://ex.org/p")
    assert(canon("https://ex.org/p?reference=1") == "https://ex.org/p?reference=1")
  }

  test("rolling FNV-1a hash: deterministic, order-sensitive") {
    val a = TextOps.rollingHash64("hello world")
    val b = TextOps.rollingHash64("hello world")
    val c = TextOps.rollingHash64("world hello")
    assert(a == b && a != c)
  }

  test("codegen'd minhash_sig == pure-Catalyst reference, bitwise, on fixture docs") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((900001L, ""), (900002L, "one"), (900003L, "  two tokens  "),
        (900004L, "\ttab lead"), (900005L, "trail newline\n"),
        (900006L, "a\r\nb  c\td")).toDF("doc_id", "text"))
    val both = docs.select(
        col("doc_id"),
        TextOps.minhashSig(col("text"), 16).as("fast"),
        TextOps.minhashSigColumns(col("text"), 16).as("ref"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, fast, ref) =>
      assert(fast == ref, s"doc $id: $fast != $ref")
    }
  }

  test("codegen'd shingle_set == array_distinct(shingles), bitwise, on fixture docs") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((900001L, ""), (900002L, "one two"),
        (900003L, "a b c a b c a b c"), (900004L, "\ttab lead x y"),
        (900005L, "trail newline x y\n")).toDF("doc_id", "text"))
    val both = docs.select(
        col("doc_id"),
        TextOps.shingleSet(col("text"), 3).as("fast"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ref"))
      .as[(Long, Seq[String], Seq[String])].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, fast, ref) =>
      assert(fast == ref, s"doc $id: $fast != $ref")
    }
  }

  test("codegen'd shingle_hashes == xxhash64 over shingles, bitwise, on fixture docs") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((900001L, ""), (900002L, "one two"),
        (900003L, "a b c a b c a b c"), (900004L, "\ttab lead x y"),
        (900005L, "trail newline x y\n")).toDF("doc_id", "text"))
    val both = docs.select(
        col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(13)).as("fast"),
        transform(TextOps.shingles(col("text"), 13), w => xxhash64(w))
          .as("ref"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, fast, ref) =>
      assert(fast == ref, s"doc $id: $fast != $ref")
    }
  }

  test("topNgrams: planted counts, lexicographic tie-break, partitioning-invariant") {
    val docs = Seq(
      ("en", "a b a b a b"),     // "a b" x3, "b a" x2
      ("en", "z z"),             // "z z" x1
      ("de", "x"),               // short doc -> the 1-token gram itself
      ("de", "x y x y")          // "x y" x2, "y x" x1
    ).toDF("lang", "text")
    val got = TextOps.topNgrams(docs, "lang", "text", 2, 2)
      .orderBy("lang", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("de", "x y", 2L, 1), ("de", "x", 1L, 2),   // "x" < "y x" ties at 1
      ("en", "a b", 3L, 1), ("en", "b a", 2L, 2)))
    // same result regardless of input partitioning (rank window total order)
    val re = TextOps.topNgrams(docs.repartition(7), "lang", "text", 2, 2)
      .orderBy("lang", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(re == got)
  }

  test("approx_percentile (at-scale quantile path) tracks the exact rank-selection p50") {
    val dir = SparkTestSession.sf0001
    val exact = graft.queries.TextQueries.queries("q_quantiles")(spark, dir)
      .select("lang", "p50").as[(String, Int)].collect().toMap
    val approx = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), size(TextOps.tokens(col("text"))).as("n_tokens"))
      .groupBy("lang")
      .agg(percentile_approx(col("n_tokens"), lit(0.5), lit(1000)).as("a50"))
      .as[(String, Int)].collect().toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (lang, p50) =>
      assert(math.abs(approx(lang) - p50).toDouble / p50 < 0.05,
        s"$lang: approx ${approx(lang)} drifted from exact $p50")
    }
  }

  test("packSequences: partition-invariant global prefix sum, gapless token stream, no global window") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    def pack(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextOps.packSequences(df, "doc_id", "text", 512)
    val a = pack(docs).collect().toSet
    // the two-phase scan must be independent of the INPUT partitioning
    assert(a == pack(docs.repartition(13)).collect().toSet)
    assert(a == pack(docs.repartition(1)).collect().toSet)
    // the concatenated stream is gapless: sorted by doc_id, each start is
    // the previous end, starting at 0, and chunk spans match the algebra
    val sorted = pack(docs)
      .select("doc_id", "n_tokens", "start_tok", "first_chunk", "last_chunk", "n_chunks")
      .collect().sortBy(_.getLong(0))
    var expectStart = 0L
    sorted.foreach { r =>
      assert(r.getLong(2) == expectStart, s"gap at doc ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(2) / 512)
      assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 512)
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
      expectStart += r.getLong(1)
    }
    // scale shape: NO unpartitioned global window anywhere in the plan
    val plan = pack(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"packing must not plan a window (single-partition scan):\n$plan")
    // offsets survive a downstream coalesce(1) — the Verify write shape
    // that zeroes TaskContext-derived partition ids
    assert(pack(docs).coalesce(1).collect().toSet == a)
  }

  test("shuffleShards: partition-invariant, gapless ranks, full shards, no global window") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    def shard(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextOps.shuffleShards(df, "doc_id", 8, 42)
    val a = shard(docs).collect().toSet
    assert(a == shard(docs.repartition(13)).collect().toSet)
    assert(a == shard(docs.repartition(1)).collect().toSet)
    // ranks = shard*8 + pos form exactly 0..n-1 (a permutation, no gaps)
    val n = docs.count()
    val ranks = shard(docs)
      .select(col("shard") * 8 + col("pos_in_shard")).as[Long].collect().toSet
    assert(ranks == (0L until n).toSet)
    // every shard except possibly the last is exactly full
    val sizes = shard(docs).groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = sizes.keys.max
    assert(sizes.filter(_._1 != last).values.forall(_ == 8L))
    // the order really is the md5 order, verified independently
    import java.security.MessageDigest
    def md5hex(x: String) = MessageDigest.getInstance("MD5").digest(x.getBytes)
      .map("%02x".format(_)).mkString
    val wantRank = docs.select("doc_id").as[Long].collect()
      .sortBy(id => (md5hex(s"$id:42"), id)).zipWithIndex.toMap
    shard(docs).collect().foreach { r =>
      assert(r.getLong(1) * 8 + r.getLong(2) == wantRank(r.getLong(0)))
    }
    // ranks survive a downstream coalesce(1) — the Verify write shape
    // that breaks any TaskContext-keyed offset map (all pids collapse
    // to 0 inside the coalesced task)
    assert(shard(docs).coalesce(1).collect().toSet == a)
    val plan = shard(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sharding must not plan a window:\n$plan")
  }

  test("bucketedShuffleRank: bitwise the per-bucket window rank, partition-invariant, Window-free") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_tokens"))
      .withColumn("len_bucket", expr("n_tokens div 64"))
    def rank(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextOps.bucketedShuffleRank(df, "doc_id", "len_bucket", 42)
    // the reference: the per-bucket row_number window it replaces (the
    // single-task-sort shape at scale — kept here as the truth oracle)
    val w = Window.partitionBy(col("len_bucket"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":42"))),
        col("doc_id"))
    val want = d.withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("len_bucket").cast("long"), col("rn"))
      .as[(Long, Long, Long)].collect().toSet
    val got = rank(d).as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // bitwise invariant under input partitioning and a downstream
    // coalesce(1) (the Verify write shape)
    assert(rank(d.repartition(13)).as[(Long, Long, Long)].collect().toSet == want)
    assert(rank(d.repartition(1)).as[(Long, Long, Long)].collect().toSet == want)
    assert(rank(d).coalesce(1).as[(Long, Long, Long)].collect().toSet == want)
    // scale shape: no window anywhere in the plan
    val plan = rank(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bucketed rank must not plan a window:\n$plan")
  }

  test("quality-gate histogram p25 == row-level rank-selection p25") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_tokens"))
    // row-level form (the oracle's formulation): value at rank
    // ceil(cnt * 0.25) in (n_tokens, doc_id) order per lang
    val ranked = d
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val rowLevel = ranked.groupBy(col("lang"))
      .agg(max(when(col("rn") === greatest(lit(1), ceil(col("cnt") * 0.25)),
        col("n_tokens"))).as("p25"))
      .as[(String, Int)].collect().toSet
    // histogram form (the engine's scale-safe formulation): smallest
    // length whose cumulative count reaches the target rank — windows run
    // over DISTINCT lengths per lang, bounded
    val hist = d.groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("_c"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(col("lang"))
    val histLevel = hist
      .withColumn("_cum", sum(col("_c")).over(wcum))
      .withColumn("_cnt", sum(col("_c")).over(wall))
      .filter(col("_cum") >= greatest(lit(1), ceil(col("_cnt") * 0.25)))
      .groupBy(col("lang")).agg(min(col("n_tokens")).as("p25"))
      .as[(String, Int)].collect().toSet
    assert(histLevel == rowLevel)
  }

  test("weightedSample: deterministic fixed-k set, heavy rows win more often") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") < 100, 1000L).otherwise(lit(1L)).as("w"))
    def pick(d: org.apache.spark.sql.DataFrame) =
      graft.text.TextOps.weightedSample(d, "doc_id", "w", 50, 7)
        .select("doc_id").as[Long].collect().toSet
    val sel = pick(df)
    assert(sel.size == 50)
    // reproducible under any partitioning
    assert(sel == pick(df.repartition(17)))
    // the 10% of rows carrying 1000x weight dominate the selection
    val heavy = sel.count(_ < 100)
    assert(heavy >= 45, s"expected heavy rows to dominate, got $heavy/50")
    // zero/negative weights are excluded, never divide
    val withZero = spark.range(10).select(col("id").as("doc_id"),
      (col("id") % 2).as("w"))
    assert(graft.text.TextOps.weightedSample(withZero, "doc_id", "w", 10, 7)
      .count() == 5)
  }

  test("splitByGroup: one group never straddles splits; proportions hold") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5000).select(col("id").as("doc_id"),
      concat(lit("site"), (col("id") % 500).cast("string")).as("src"))
    val out = graft.text.TextOps.splitByGroup(df, "src", 80, 10, 42)
    // group purity: every source maps to exactly one split
    assert(out.groupBy("src").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() == 0)
    // proportions over 500 groups: loose binomial bounds
    val bySplit = out.select("src", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 350 && bySplit("train") < 450, bySplit.toString)
    assert(bySplit("val") > 20 && bySplit("val") < 90, bySplit.toString)
    assert(bySplit("test") > 20 && bySplit("test") < 90, bySplit.toString)
  }
}
