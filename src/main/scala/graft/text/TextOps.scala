package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for a web-scale training-data
  * pipeline, built from codegen'd `functions._` wherever possible (no UDFs
  * in the hot path; SimHash is the one typed-map op, documented below).
  *
  * These extend the reference's capability set — OPSD has no text ops —
  * per the brief: dedup (exact, MinHash+LSH, n-gram Jaccard), language ID,
  * quality scoring, token counting, fingerprinting.
  */
object TextOps {

  /** Whitespace tokenization, engine-wide definition. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles: transform over a position sequence + slice —
    * pure Catalyst expressions, fully codegen'd, no UDF.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** DISTINCT shingles via the codegen'd `shingle_set` expression
    * (graft.plans.ShingleSet) — bit-identical to
    * `array_distinct(shingles(text, n))` (TextOpsSpec parity), minus the
    * per-shingle interpretation tax.
    */
  def shingleSet(text: Column, n: Int): Column =
    call_function("shingle_set", text, lit(n))

  /** Exact dedup by content hash: one surviving doc per distinct text. */
  def exactDedupe(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------------
  // MinHash + LSH near-dup detection
  // -------------------------------------------------------------------

  /** 31-bit Carter–Wegman hash family over xxhash64(shingle):
    * h_k(x) = (a_k * x + b_k) mod (2^31 - 1). Parameters derived
    * deterministically from k (no RNG — reproducible across runs/sessions).
    */
  private val P31 = 2147483647L
  private def aK(k: Int): Long = 2 * (1103515245L * (k + 1) % (P31 / 2)) + 1
  private def bK(k: Int): Long = 12345L * (k + 7) % P31

  /** Shingle hashes for a text column (computed once per row). */
  def shingleHashes(text: Column): Column =
    transform(shingles(text, 3), s => pmod(xxhash64(s), lit(P31)))

  /** MinHash signature (array of K longs): the codegen'd `minhash_sig`
    * Catalyst expression (graft.plans.MinhashSig, registered by
    * GraftExtensions) — one tokenization + K minima updates per shingle
    * in primitive loops. The pure-Catalyst formulation it replaced
    * ([[minhashSigColumns]]) is interpreted per shingle (higher-order
    * functions have no codegen) and dominated the LSH pipeline; the two
    * are asserted bitwise-equal in TextOpsSpec.
    */
  def minhashSig(text: Column, k: Int): Column =
    call_function("minhash_sig", text, lit(k))

  /** Reference formulation of [[minhashSig]] as a SINGLE aggregate pass
    * over the shingle hashes — kept as the cross-check for the codegen'd
    * expression.
    */
  private[graft] def minhashSigColumns(text: Column, k: Int): Column = {
    val aArr = array((0 until k).map(i => lit(aK(i))): _*)
    val bArr = array((0 until k).map(i => lit(bK(i))): _*)
    aggregate(
      shingleHashes(text),
      array_repeat(lit(Long.MaxValue), k),
      (acc, x) =>
        zip_with(acc, zip_with(aArr, bArr, (a, b) => pmod(a * x + b, lit(P31))),
          (cur, h) => least(cur, h)))
  }

  /** MinHash signature table: (doc, sig array<long>) — the stored artifact
    * of the LSH pipeline. At crawl scale this is the table you materialize
    * once per snapshot and band repeatedly.
    */
  def minhashSigTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame =
    docs.select(col(idCol).as("doc"), minhashSig(col(textCol), k).as("sig"))

  /** LSH banding + verification over a PRECOMPUTED signature table (see
    * [[minhashSigTable]]): candidate pairs whose signatures collide in
    * >= 1 band, then EXACT shingle-set Jaccard verification of every
    * candidate against the source docs. Output: (doc_a, doc_b, jaccard),
    * doc_a < doc_b, jaccard >= threshold.
    *
    * Scale shape: the band explode + self-join shuffles only
    * (band_idx, band_hash, doc) — collisions are rare by construction, so
    * the join fan-out stays tiny; candidate pairs are deduped on the
    * narrow id pair BEFORE the wide shingle arrays are joined back, so
    * the shuffle moves ids, not documents (the part that matters at
    * 10^12 docs). The expensive exact Jaccard only runs on candidates
    * (classic MinHash-LSH contract).
    */
  def minhashNearDupsFromSigs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sigs: DataFrame,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val rows = k / bands
    val shinTable = docs
      .select(col(idCol).as("doc"), shingleSet(col(textCol), 3).as("shin"))
    val banded = sigs
      .select(col("doc"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band_idx"),
            xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)))
              .as("band_hash"))
        }: _*)).as("band"))
      .select(col("doc"), col("band.band_idx"), col("band.band_hash"))
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc").as("doc_a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc").as("doc_b"))
    val cand = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(shinTable.withColumnRenamed("doc", "doc_a")
        .withColumnRenamed("shin", "shin_a"), "doc_a")
      .join(shinTable.withColumnRenamed("doc", "doc_b")
        .withColumnRenamed("shin", "shin_b"), "doc_b")
      .withColumn("inter", size(array_intersect(col("shin_a"), col("shin_b"))))
      .withColumn("uni",
        size(array_distinct(concat(col("shin_a"), col("shin_b")))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Self-contained MinHash+LSH near-dup detection (signatures computed
    * inline). SINGLE pass: the signature table — the expensive part — is
    * pinned while the one materializing action runs (both sides of the
    * band self-join read the cache), then released; the session keeps
    * only the O(pairs) result (round-2 verdict: an eager count() on the
    * candidate pairs paid a whole extra pipeline pass). Callers may
    * unpersist the returned frame after use; idle entries are reclaimed
    * by the ContextCleaner.
    */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      sigSink: Option[String] = None
  ): DataFrame = {
    val sigs = minhashSigTable(docs, idCol, textCol, k).persist()
    val verified = minhashNearDupsFromSigs(
        docs, idCol, textCol, sigs, k, bands, threshold)
      .persist()
    verified.count()
    // optional signature-table dump (for cross-engine checks / reuse):
    // written FROM the cache, so it costs a parquet write, not a second
    // signature pass — and the dumped sigs are bit-identical to the ones
    // the banding just used
    sigSink.foreach(p => sigs.write.mode("overwrite").parquet(p))
    sigs.unpersist(false)
    verified
  }

  /** Connected components over a near-duplicate pair graph: every doc is
    * assigned the MINIMUM id reachable through dup pairs — its cluster id
    * / canonical keeper. This is the step that turns pairwise near-dup
    * detection into one-survivor-per-cluster dedup: transitive chains
    * a~b~c collapse into one cluster even when the (a, c) pair was never
    * detected.
    *
    * Algorithm: iterative min-label propagation over the symmetrized edge
    * list. Each round is one join + partial-aggregated groupBy (labels
    * shuffled by id, edges pre-shuffled once); the driver loop only reads
    * a scalar convergence count. Rounds needed = component diameter —
    * dup clusters are small and star-like, so a handful in practice (the
    * same convergence contract as the large-star/small-star CC algorithms
    * used at web scale).
    *
    * The returned frame is persisted (already materialized by the last
    * convergence check); unpersisting here would force a full lineage
    * recompute at consumption. Callers may `unpersist()` after use; idle
    * cached labels are otherwise reclaimed by the ContextCleaner.
    */
  def dupClusters(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 20
  ): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct().persist()
    var labels = docs.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("label")).persist()
    labels.count()
    var iters = 0
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min("nl").as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("nmin") < col("label")).as("_chg"))
        .persist()
      changed = updated.filter(col("_chg")).count() // materializes `updated`
      labels.unpersist(false)
      labels = updated // keep the MATERIALIZED frame; _chg is pruned at the end
      iters += 1
    }
    edges.unpersist(false)
    // fail LOUDLY if the loop exited on the iteration cap: returning the
    // still-changing labels would hand callers silently-wrong clusters
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge after $maxIters iterations " +
          s"($changed labels still changing) — a component's diameter " +
          "exceeds maxIters; raise it")
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
  }

  /** Exact n-gram Jaccard between explicit pairs (the verification kernel
    * of the LSH pipeline, exposed standalone).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_distinct(concat(sa, sb)))
  }

  // -------------------------------------------------------------------
  // SimHash (64-bit) — typed map (bit-bucketed majority vote is a poor
  // fit for per-column expressions; this is the documented exception to
  // the no-closures rule, O(tokens) per row, partition-local).
  // -------------------------------------------------------------------

  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong * 0x9e3779b97f4a7c15L +
        scala.util.hashing.MurmurHash3.stringHash(t.reverse)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, txt) =>
        (id, simhash64(txt.trim.split("\\s+").toSeq))
      }
      .toDF(idCol, "simhash")
  }

  /** Hamming-distance near-dup candidates from a simhash table: block on
    * 4 x 16-bit chunks (two docs within Hamming distance 3 of each other
    * must agree on at least one chunk — pigeonhole), verify with exact
    * popcount.
    */
  def simhashNearDups(sim: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val chunked = sim.select(col(idCol).as("doc"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk_idx"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))
            .as("chunk_val"))
      }: _*)).as("c"))
      .select(col("doc"), col("simhash"), col("c.chunk_idx"), col("c.chunk_val"))
    val l = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc").as("doc_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("doc").as("doc_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // -------------------------------------------------------------------
  // Language ID + quality + token stats (pure column expressions,
  // SQL-mirrorable for the DuckDB oracle)
  // -------------------------------------------------------------------

  val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了")
  )

  def stopHits(text: Column, dict: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(dict.map(lit(_)): _*)))

  /** Stopword-hit language scores + first-max prediction in fixed dict
    * order (deterministic, SQL-CASE-mirrorable).
    */
  def langScores(docs: DataFrame, textCol: String): DataFrame = {
    val withScores = langDicts.foldLeft(docs) { case (df, (lng, dict)) =>
      df.withColumn(s"n_$lng", stopHits(col(textCol), dict))
    }
    val scoreCols = langDicts.map { case (lng, _) => col(s"n_$lng") }
    val best = greatest(scoreCols: _*)
    val predicted = langDicts.foldRight(lit("und")) { case ((lng, _), acc) =>
      when(col(s"n_$lng") >= best, lit(lng)).otherwise(acc)
    }
    // foldRight builds en-first CASE: en wins ties, matching the oracle
    withScores.withColumn("predicted", predicted)
  }

  /** BPE-style pre-tokenizer regex (GPT-2-family shape: letter runs,
    * short digit runs, punctuation runs) — constructs chosen to behave
    * identically under java.util.regex (Spark) and RE2 (DuckDB oracle):
    * no lookaround, no unicode classes.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]+"

  /** Per-group top-k n-grams by corpus frequency — the vocabulary /
    * corpus-statistics stage of a training-data pipeline. 100 TB shape:
    * the exploded n-gram stream collapses in ONE hash aggregation where
    * map-side combine does the heavy lifting (|distinct n-grams| <<
    * |token positions|), and the rank window then shuffles only the
    * already-aggregated (group, ngram, cnt) rows. Ties break by n-gram
    * text ascending, so top-k is deterministic under any partitioning.
    */
  def topNgrams(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int,
      k: Int
  ): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(shingles(col(textCol), n)).as("ngram"))
      .groupBy(col(groupCol), col("ngram"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("ngram"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0)))
        .as("n_bpeish"),
      length(col(textCol)).as("n_chars"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
  }

  def qualityStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = stopHits(col(textCol), langDicts.head._2)
    val charsNoSpace = length(regexp_replace(col(textCol), " ", ""))
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      nStop.as("n_stop"),
      (nStop.cast("double") / nTok).as("stop_ratio"),
      (charsNoSpace.cast("double") / nTok).as("mean_token_len"))
  }

  // -------------------------------------------------------------------
  // PII redaction + repetition (training-data hygiene; pure column
  // expressions with java.regex/RE2-portable constructs — no lookaround)
  // -------------------------------------------------------------------

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}" // E.164-ish; the + anchor avoids false hits
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Typed-placeholder PII scrub — the compliance stage every
    * training-data pipeline runs before tokenization. Order matters:
    * emails first (they contain dots and digits), then IPs, then phones.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-doc PII hit counts (pre-redaction) + redacted text. */
  def piiStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).as("n_ip"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).as("n_phone"),
      redactPii(col(textCol)).as("redacted"))

  /** Duplicate-shingle repetition signal (the C4/Gopher-style quality
    * filter): fraction of word n-grams that are repeats of an earlier
    * n-gram in the same doc. High values flag boilerplate/spam.
    */
  def repetitionStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    val sh = shingles(col(textCol), n)
    docs.select(
      col(idCol),
      size(sh).as("n_shingles"),
      size(array_distinct(sh)).as("n_uniq"),
      (lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
        .as("dup_ratio"))
  }

  /** Content fingerprints: md5 (oracle-checkable) plus a 64-bit rolling
    * polynomial hash over the UTF-8 bytes (engine-native, used for
    * cheap page-revision change detection at crawl scale).
    */
  def rollingHash64(text: String): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64-bit offset basis (14695981039346656037)
    var i = 0
    while (i < text.length) {
      h = (h ^ text.charAt(i)) * 1099511628211L // FNV-1a step
      i += 1
    }
    h
  }

  /** Deterministic hash sampling: keep a row iff the first 32 bits of
    * md5(key) fall under `rate` — the reproducible corpus-subset op every
    * training pipeline needs (same rows on every engine/run/partitioning,
    * unlike `df.sample`), composable by id-range, and cheap (one hash per
    * row, no shuffle, fully pushed into the scan's filter).
    */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame = {
    val threshold = (rate * 4294967296.0).toLong
    df.filter(
      conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        < threshold)
  }

  /** Paragraph-level exact dedup / boilerplate share (T23): split each
    * document on blank lines, hash every non-empty trimmed paragraph; a
    * paragraph is BOILERPLATE iff its hash occurs in >= `minDocs`
    * DISTINCT documents (the C4/RefinedWeb-style repeated-span filter at
    * paragraph granularity — nav bars, cookie banners, subscribe
    * footers). Output per doc: paragraph count, boilerplate-paragraph
    * count, boilerplate share.
    *
    * Scale shape: paragraphs move as narrow (doc, md5) rows only — the
    * texts themselves never shuffle; the hot-hash table comes from a
    * partially-aggregated distinct-doc count, and the flagging join
    * shuffles on the hash (NO broadcast assumption — a crawl's
    * boilerplate set is itself huge); the per-doc rollup partial-aggs.
    * The paragraph table is persisted across its two consumers (hot set
    * + per-doc rollup) — same pinning contract as minhashNearDups.
    */
  def paragraphDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int = 2
  ): DataFrame = {
    val paras = docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), "\\n{2,}")).as("para"))
      .filter(length(trim(col("para"))) > 0)
      .select(col("doc"), md5(trim(col("para"))).as("ph"))
      .persist()
    val hot = paras.distinct()
      .groupBy("ph").agg(count(lit(1)).as("_n_docs"))
      .filter(col("_n_docs") >= minDocs)
      .select(col("ph"), lit(1).as("_hot"))
    paras.join(hot, Seq("ph"), "left")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_paras"), count(col("_hot")).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_paras"))
  }

  /** Stratified quota sampling (T25): keep at most `cap` rows per group
    * (language, source, domain — the data-MIXING primitive: balance a
    * corpus before training), chosen by deterministic md5-of-id rank so
    * the same rows survive on every engine/run/partitioning (same
    * reproducibility contract as [[sampleByHash]], but with a per-group
    * budget instead of a global rate).
    *
    * Scale shape: one window partitioned by the group columns. Group
    * sizes at crawl scale can be huge, but the window does a per-group
    * SORT only to emit rank <= cap — for small caps Spark's
    * WindowGroupLimit pushes the limit into the sort (top-k heap per
    * partition), so a hot group never fully sorts.
    */
  def quotaSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      cap: Int
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_qr", row_number().over(w))
      .filter(col("_qr") <= cap)
      .drop("_qr")
  }

  /** URL canonicalization (T26): the same page arrives from a crawl under
    * utm-tagged, fragment-suffixed, case-shifted variants — canonical-URL
    * dedup is the FIRST dedup pass of every web pipeline (cheaper than
    * any content hash: no document bytes touched). Rules, mirrored
    * exactly by the DuckDB oracle:
    *   - scheme and host lowercased; default port stripped
    *     (:80 for http, :443 for https)
    *   - fragment dropped
    *   - tracking params dropped (name utm_*, fbclid, gclid, ref),
    *     surviving params byte-sorted and rejoined — param ORDER never
    *     distinguishes resources, param SET does
    *   - trailing slashes stripped from the path
    * Pure column expressions (regexp + array ops; the param filter is a
    * higher-order function — interpreted per PARAM, not per char, and
    * params are few, so it stays off the codegen-kernel list).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([^:/?#]+)://", 1))
    val auth = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path = regexp_replace(
      regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") && p =!= "")),
      "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Benchmark decontamination (T24): flag documents sharing any word
    * `n`-gram with a benchmark/eval set — the must-run hygiene pass
    * before corpus release (eval answers leaking into training data).
    *
    * Scale shape: documents shuffle only as (doc, xxhash64(gram)) narrow
    * rows — per-doc DISTINCT grams, hashed before the join so gram
    * strings never move; the benchmark gram-hash set (eval suites are
    * tiny next to a crawl) broadcasts. Hash equality stands in for gram
    * equality (64-bit collisions are measure-zero; the oracle checks the
    * STRING intersection, so a collision would surface as a mismatch).
    * Output per doc: distinct-gram count, shared-gram count, flag.
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 13
  ): DataFrame = {
    val docGrams = docs.select(col(idCol).as("doc"),
        explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .select(col("doc"), xxhash64(col("g")).as("gh"))
      .persist()
    val benchHashes = bench
      .select(explode(array_distinct(shingles(col(benchTextCol), n))).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    val hits = docGrams.join(broadcast(benchHashes), Seq("gh"))
      .groupBy("doc").agg(count(lit(1)).as("n_shared"))
    docGrams.groupBy("doc").agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc"), "left")
      .select(col("doc"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** Cross-document repeated-window detection (T32): hash every k-token
    * window (stride 1) of every document; a window is REPEATED iff its
    * text occurs in >= 2 DISTINCT documents. Per-doc output:
    * (n_windows, n_dup_windows, dup_ppm) with dup_ppm integer fixed-point
    * — the window-granular cousin of the Lee-et-al. suffix-array exact
    * substring dedup (long shared spans show up as runs of repeated
    * windows), and of [[paragraphDedup]] (which needs paragraph breaks
    * this op doesn't).
    *
    * Scale shape: texts never shuffle — windows move as narrow
    * (doc, xxhash64(window)) rows; the hot set comes from a
    * partial-agg'd distinct-doc count and the flagging join shuffles on
    * the hash (no broadcast: a crawl's repeated-window set is huge). The
    * window table is persisted across its two consumers. Collision note:
    * flagging compares 64-bit hashes, the ORACLE intersects the window
    * STRINGS — an engine hash collision would surface as a mismatch.
    */
  def dupWindowStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 13
  ): DataFrame = {
    // codegen'd window hashing: one reused buffer per row instead of the
    // interpreted transform/slice/concat_ws tree per window (bitwise ==
    // xxhash64(explode(shingles(text, k))), parity-tested)
    val wins = docs.select(col(idCol).as("doc"),
        explode(call_function("shingle_hashes", col(textCol), lit(k)))
          .as("wh"))
      .persist()
    val hot = wins.distinct()
      .groupBy("wh").agg(count(lit(1)).as("_n_docs"))
      .filter(col("_n_docs") >= 2)
      .select(col("wh"), lit(1).as("_hot"))
    wins.join(hot, Seq("wh"), "left")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_windows"),
        count(col("_hot")).cast("long").as("n_dup_windows"))
      .withColumn("dup_ppm", expr("n_dup_windows * 1000000 div n_windows"))
  }

  /** Weighted corpus mixing (T33): per-source keep RATES (not caps —
    * that's [[quotaSample]]) applied by the same deterministic
    * md5-threshold rule as [[sampleByHash]], so the surviving set is
    * reproducible across engines/runs/partitionings. `weights` maps
    * source -> keep rate in ppm (exact integers end to end: threshold =
    * ppm * 2^32 div 10^6); unlisted sources are dropped. This is the
    * training-mix primitive: down-weight crawl dumps, keep curated
    * sources at 100%.
    *
    * Scale shape: the weight table is a literal broadcast dim; the
    * filter is a pure projection-side predicate — no shuffle at all.
    */
  def weightedMix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weightsPpm: Seq[(String, Long)]
  ): DataFrame = {
    val thresholds = weightsPpm.map { case (s, ppm) =>
      (s, ppm * 4294967296L / 1000000L)
    }
    val thDim = df.sparkSession.createDataFrame(thresholds)
      .toDF(sourceCol, "_th")
    df.join(broadcast(thDim), Seq(sourceCol))
      .filter(
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") < col("_th"))
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** Inverted-index build (T41): token -> document-frequency + a
    * deterministic fingerprint of the (sorted, capped) posting list —
    * the search-side structure a corpus engine serves lookups from.
    * Postings are summarized as md5 of the comma-joined sorted doc ids
    * (capped at `cap`) rather than emitted as arrays: the fingerprint is
    * engine-portable (array hashing is not) and a wrong or misordered
    * posting anywhere changes it.
    *
    * Scale shape: texts never shuffle — per-doc DISTINCT tokens explode
    * to narrow (token, doc) rows; ONE hash aggregation per token with
    * partial collect map-side. Posting CAPS are what make token keys
    * (stopwords!) safe: the full list for 'the' is the classic hot key,
    * the capped summary is bounded.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      cap: Int = 100): DataFrame =
    docs.select(col(idCol).cast("long").as("doc"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        md5(array_join(
          transform(slice(array_sort(collect_list(col("doc"))), 1, cap),
            _.cast("string")), ",").cast("binary"))
          .as("postings_md5"))

  /** Top distinctive terms per document (T42): rank a doc's tokens by
    * (tf DESC, corpus df ASC, token) and keep the top `k` — the
    * integer-exact TF-IDF-shaped keyword extraction (same ordering as
    * tf·idf for fixed tf tiers, no floats ⇒ bitwise reproducible).
    * Plans: one partial-agg'd (doc, token) count, a broadcast-or-shuffle
    * join to the token df table, one WindowGroupLimit top-k per doc.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).cast("long").as("doc"),
        explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("token"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))))
      .filter(col("rank") <= k)
      .select(col("doc"), col("token"), col("tf"), col("df"), col("rank"))
  }

  /** T50: sequence PACKING for training (the GPT-style concat-then-chunk
    * layout): documents concatenate in id order into one token stream
    * that is sliced into fixed `contextLen` windows; each doc's placement
    * is (start_tok, first_chunk, last_chunk, n_chunks) — what a data
    * loader needs to materialize any training window.
    *
    * The core is a GLOBAL PREFIX SUM of token counts in id order. A
    * naive `sum().over(Window.orderBy(id))` plans an unpartitioned
    * WindowExec — every row through ONE task, the round-1 scale killer.
    * Instead the classic two-phase distributed scan: range-partition by
    * id, cumsum locally per partition (mapPartitions — genuinely
    * imperative per-partition logic), collect the BOUNDED per-partition
    * totals (one row per partition), exclusive-scan them on the driver,
    * and add each partition's offset back as a broadcast map literal.
    * Two passes over narrow (id, n_tokens) rows, zero global sorts.
    * Determinism: range partitioning + in-partition sort by id make the
    * local scan order the global id order, so the result is independent
    * of input partitioning (TextOpsSpec asserts bitwise invariance).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      contextLen: Int
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the scan runs at the RDD level with mapPartitionsWithIndex: the
    // partition index comes from the Partition OBJECT, not TaskContext —
    // a downstream coalesce(1) (Verify's write shape) computes all parent
    // partitions inside one task, where TaskContext-derived pids all read
    // 0 and would silently zero the offsets. One shuffle, pinned, feeds
    // both the totals pass and the cumsum pass.
    val toks = docs.select(col(idCol).cast("long").as("id"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
      .rdd.persist()
    // pass 1: bounded per-partition totals -> exclusive offsets
    val partials = toks
      .mapPartitionsWithIndex((pid, it) =>
        Iterator.single((pid, it.map(_._2).sum)))
      .collect().sortBy(_._1)
    val offsets = partials.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }
    val offMap = (partials.map(_._1) zip offsets.map(_._2)).toMap
    // pass 2: local cumsum + the partition's exclusive offset
    toks.mapPartitionsWithIndex { (pid, it) =>
        var run = offMap(pid)
        it.map { case (id, n) => val start = run; run += n; (id, n, start) }
      }
      .toDF(idCol, "n_tokens", "start_tok")
      .withColumn("first_chunk", expr(s"start_tok div $contextLen"))
      .withColumn("last_chunk",
        expr(s"(start_tok + n_tokens - 1) div $contextLen"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** Deterministic global shuffle into fixed-size training shards (T52):
    * a training run wants the corpus in pseudo-random but REPRODUCIBLE
    * order, cut into equal shards — the data-loader layout step after
    * dedup/filter/mix. Order key = md5 of "id:seed" (uniform, lexicographic
    * hex compares identically on every engine), ties broken by id.
    *
    * Scale shape: the global rank is the SAME two-phase distributed scan
    * as [[packSequences]] — range-partition by the hash key, local rank
    * per partition, BOUNDED per-partition counts exclusive-scanned on the
    * driver, offsets rejoined as a broadcast map literal. This is the
    * terasort shape: two narrow passes, never an unpartitioned
    * `row_number() OVER (ORDER BY ...)` single-task window. Rank depends
    * only on the total (h, id) order, so shard assignment is bitwise
    * partition-invariant (range boundaries move ranks between partitions,
    * never within the order).
    */
  def shuffleShards(
      docs: DataFrame,
      idCol: String,
      shardSize: Int,
      seed: Int
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(shardSize > 0, "shardSize must be positive")
    // one range shuffle + in-partition sort fixes the md5 total order
    // (pinned so the count pass and the rank pass share one execution);
    // the global rank comes from RDD.zipWithIndex — the classic two-phase
    // scan (bounded per-partition counts -> exclusive offsets), with the
    // offsets carried in the Partition OBJECTS rather than read off
    // TaskContext, so ranks survive cache sharing across queries, AQE
    // re-planning, and a downstream coalesce collapsing task identity
    // (a TaskContext.getPartitionId()-keyed offset map does not: under
    // coalesce(1) every parent partition reports pid 0)
    val keyed = docs
      .select(col(idCol).cast("long").as("id"))
      .withColumn("h", md5(concat(col("id").cast("string"), lit(s":$seed"))))
      .repartitionByRange(col("h"), col("id"))
      .sortWithinPartitions("h", "id")
      .select(col("id"))
      .as[Long]
      .persist()
    keyed.rdd.zipWithIndex()
      .toDF(idCol, "_rank")
      .select(col(idCol),
        expr(s"_rank div $shardSize").as("shard"),
        (col("_rank") % shardSize).as("pos_in_shard"))
  }

  /** Per-BUCKET deterministic shuffle rank (the T61 fix): rank rows inside
    * each bucket by (md5("id:seed"), id) — the same order a
    * `row_number().over(Window.partitionBy(bucket).orderBy(h, id))` window
    * defines — WITHOUT ever giving one task a whole bucket. At crawl scale
    * a length bucket is unbounded, so the per-bucket window is a
    * single-task full sort (the shape ARCHITECTURE.md #23 forbids); this
    * is the [[shuffleShards]] two-phase scan generalized to grouped ranks:
    * one range shuffle on (bucket, h, id) fixes the global order, pass 1
    * collects BOUNDED per-(partition, bucket) counts (partitions x
    * buckets rows — buckets are bounded by construction), the driver
    * exclusive-scans them per bucket, pass 2 adds each partition's
    * per-bucket offsets to its local running rank. Offsets ride in the
    * Partition objects via mapPartitionsWithIndex (coalesce(1)-proof, the
    * packSequences contract). Output: (idCol, bucketCol, rn) with rn
    * 0-based within its bucket — bitwise the window's rn - 1 under any
    * input partitioning (TextOpsSpec asserts both).
    */
  def bucketedShuffleRank(
      df: DataFrame,
      idCol: String,
      bucketCol: String,
      seed: Int
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(bucketCol).cast("long").as("b"),
        col(idCol).cast("long").as("id"))
      .withColumn("h", md5(concat(col("id").cast("string"), lit(s":$seed"))))
      .repartitionByRange(col("b"), col("h"), col("id"))
      .sortWithinPartitions("b", "h", "id")
      .select("b", "id")
      .as[(Long, Long)]
      .rdd.persist()
    val partials = keyed.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
        it.foreach { case (b, _) => m.update(b, m.getOrElse(b, 0L) + 1L) }
        Iterator.single((pid, m.toSeq))
      }.collect().sortBy(_._1)
    val running = scala.collection.mutable.HashMap.empty[Long, Long]
    val offsets: Map[Int, Map[Long, Long]] = partials.map {
      case (pid, counts) =>
        pid -> counts.map { case (b, n) =>
          val cur = running.getOrElse(b, 0L)
          running.update(b, cur + n)
          b -> cur
        }.toMap
    }.toMap
    keyed.mapPartitionsWithIndex { (pid, it) =>
        val off = scala.collection.mutable.HashMap.empty[Long, Long]
        offsets.getOrElse(pid, Map.empty).foreach { case (b, o) =>
          off.update(b, o) }
        it.map { case (b, id) =>
          val r = off.getOrElse(b, 0L)
          off.update(b, r + 1L)
          (id, b, r)
        }
      }
      .toDF(idCol, bucketCol, "rn")
  }

  /** Weighted sampling without replacement, fixed size k — priority
    * sampling (Duffield–Lund–Thorup, JACM 2007): each row draws a uniform
    * u from md5(id:seed) and is ranked by priority u/w; the k smallest
    * priorities win, so heavier rows win proportionally more often while
    * any fixed-size subset stays possible. The priority is computed in
    * 1e6 FIXED POINT over exact integers (u < 2^32, so u*1e6 < 2^52 —
    * no overflow, no libm pow/ln whose final ULP differs across engines),
    * ties broken by id: the selected set is bitwise reproducible on every
    * engine/run/partitioning.
    *
    * Scale shape: `orderBy(priority).limit(k)` plans
    * TakeOrderedAndProject — a bounded top-k heap per partition + one
    * k-sized driver merge, never a global sort.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Int
  ): DataFrame = {
    // the fixed-point priority uses integral `div`: weights MUST be an
    // integral column (a fractional type fails analysis), and weights are
    // expected ≲ 1e6 — beyond that, u*1e6 div w truncates many priorities
    // to equal values and selection degrades toward id order among the
    // heaviest rows (callers with larger weights should pre-scale down)
    require(Set("ByteType", "ShortType", "IntegerType", "LongType")
      .contains(df.schema(weightCol).dataType.toString),
      s"weightedSample needs an integral weight column, got " +
        s"${df.schema(weightCol).dataType} for $weightCol")
    val u = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(s":$seed"))), 1, 8),
      16, 10).cast("long")
    df.filter(col(weightCol) > 0)
      .withColumn("_u", u)
      .withColumn("priority", expr(s"_u * 1000000 div $weightCol"))
      .drop("_u")
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Group-disjoint train/val/test split: the split label is a pure
    * function of the GROUP (md5 bucket of the source/domain), never the
    * row — every document of one source lands in the SAME split, so
    * near-identical content from one site can never leak from train into
    * eval (the contamination mode a row-wise split invites). Scan-side
    * projection, zero shuffles, reproducible on every engine/partitioning.
    */
  def splitByGroup(
      df: DataFrame,
      groupCol: String,
      pctTrain: Int,
      pctVal: Int,
      seed: Int
  ): DataFrame = {
    require(pctTrain + pctVal < 100, "train+val must leave room for test")
    val bucket = pmod(
      conv(substring(md5(concat(col(groupCol), lit(s":$seed"))), 1, 8), 16, 10)
        .cast("long"),
      lit(100L))
    df.withColumn("split",
      when(bucket < pctTrain, "train")
        .when(bucket < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rolling = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, txt) => (id, rollingHash64(txt)) }
      .toDF(idCol, "fp_rolling")
    docs.select(col(idCol), md5(col(textCol)).as("fp_md5"))
      .join(rolling, idCol)
  }
}
