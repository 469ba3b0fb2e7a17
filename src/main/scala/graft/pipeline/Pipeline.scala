package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Pages
import graft.rollup.TimeSeriesOps
import graft.chunk.ChunkWriter
import graft.table.ManifestTableLayer
import graft.checkpoint.Checkpoint
import graft.retention.Retention

/** The end-to-end engine pipeline over a canonical
  * `pages(url, warc_ts, html, text, lang)` table (SURVEY.md §3.4):
  *
  *   pages (partitioned bucket x day)
  *     -> points (domain-level metrics derived from the page row ONLY)
  *     -> 15min tier  (algebraic partials, per-day partitions)
  *     -> hourly tier  (chained from stored 15min partitions)
  *     -> daily tier   (chained from stored hourly partitions)
  *     -> Gorilla chunk partitions + delta index per day
  *   all stages checkpointed per (tier, day) partition in a
  *   ManifestTableLayer; retention sweeps raw tiers, aggregates survive.
  *
  * Partition-independence invariant: every work unit is a pure function of
  * one day of one tier (windows never span days: 900 | 3600 | 86400 all
  * divide a day), so units can run/retry/resume in any order on any number
  * of executors. Gap-fill is a query-time op over stored tiers (OPSD
  * semantics, cross-day windows) rather than part of the per-day build.
  */
object Pipeline {

  /** Retention tiers in chain order: each aggregates the PREVIOUS one
    * (continuous aggregates — raw pages are read once, by 15min only).
    * Carries all three OPSD native resolutions (15/30/60 min) plus daily.
    */
  val Tiers: Seq[(String, Long)] =
    Seq("15min" -> 900L, "30min" -> 1800L, "1h" -> 3600L, "1d" -> 86400L)

  /** Long-format points derived purely from canonical page columns. */
  def pointsFromPages(pages: DataFrame): DataFrame = {
    val base = pages.select(
      regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain"),
      unix_timestamp(col("warc_ts")).as("epoch_s"),
      length(col("text")).cast("double").as("text_chars"),
      length(col("html")).cast("double").as("bytes"))
    base.select(col("domain"), col("epoch_s"),
      explode(map(
        lit("text_chars"), col("text_chars"),
        lit("bytes"), col("bytes"))).as(Seq("metric", "value")))
  }

  /** 15-min tier directly from pages in ONE aggregation pass: both metrics
    * are aggregated as columns of the same groupBy and only the 10^4x
    * smaller aggregated rows are exploded into long format. Bitwise-equal
    * to `tier(pointsFromPages(pages))` (PipelineSpec) but the shuffle and
    * the explode see |series x buckets| rows instead of 2x|pages| — at
    * crawl scale the difference between moving terabytes and megabytes.
    */
  def tier15FromPages(pages: DataFrame): DataFrame = {
    val periodSec = 900L
    pages
      .select(
        regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain"),
        TimeSeriesOps.bucketStart(unix_timestamp(col("warc_ts")), periodSec)
          .as("bucket_ts"),
        length(col("text")).cast("double").as("text_chars"),
        length(col("html")).cast("double").as("bytes"))
      .groupBy(col("domain"), col("bucket_ts"))
      .agg(
        count(col("text_chars")).as("n_tc"), sum(col("text_chars")).as("s_tc"),
        count(col("bytes")).as("n_by"), sum(col("bytes")).as("s_by"))
      .select(col("domain"), col("bucket_ts"),
        explode(map(
          lit("text_chars"), struct(col("n_tc").as("n"), col("s_tc").as("sum_v")),
          lit("bytes"), struct(col("n_by").as("n"), col("s_by").as("sum_v"))))
          .as(Seq("metric", "agg")))
      .select(col("domain"), col("metric"), col("bucket_ts"),
        col("agg.n").as("n"), col("agg.sum_v").as("sum_v"),
        (col("agg.sum_v") / col("agg.n")).as("mean_v"))
  }

  private val seriesCols = Seq("domain", "metric")

  def tierKey(tier: String, day: String) = s"tier=$tier/day=$day"
  def chunkKey(tier: String, day: String) = s"chunks-$tier/day=$day"
  def indexKey(tier: String, day: String) = s"index-$tier/day=$day"

  /** Distinct days present in the pages table (partition column if the
    * table is partitioned, derived otherwise).
    */
  def listDays(spark: SparkSession, pagesPath: String): Seq[String] = {
    val pages = spark.read.parquet(pagesPath)
    val withDay =
      if (pages.columns.contains("day")) pages.select(col("day").cast("string"))
      else pages.select(to_date(col("warc_ts")).cast("string").as("day"))
    withDay.distinct().collect().map(_.getString(0)).sorted.toSeq
  }

  /** Build all tier + chunk partitions for the given days, resumable.
    * Returns number of newly committed partitions.
    */
  def runRollup(
      spark: SparkSession,
      pagesPath: String,
      table: ManifestTableLayer,
      days: Seq[String],
      chunkMaxPoints: Int = 1024,
      indexBuckets: Int = 16,
      failAfter: Int = -1
  ): Int = {
    import spark.implicits._
    val pages = spark.read.parquet(pagesPath)

    def dayPages(day: String): DataFrame =
      if (pages.columns.contains("day")) pages.filter(col("day") === day)
      else pages.filter(to_date(col("warc_ts")) === to_date(lit(day)))

    // tier-0 from raw pages, higher tiers chained from the STORED child
    // tier partition (continuous aggregates: raw data is read once)
    def tierUnit(tier: String, period: Long, day: String): () => DataFrame = () => {
      if (tier == "15min")
        tier15FromPages(dayPages(day))
      else {
        // chain from the immediately preceding tier (900|1800|3600|86400
        // each divide the next, so every step is an exact re-aggregation)
        val child = Tiers(Tiers.indexWhere(_._1 == tier) - 1)._1
        val childDf = spark.read.parquet(table.dataDir(tierKey(child, day)).toString)
        TimeSeriesOps.chainTier(childDf, seriesCols, period)
      }
    }

    def chunkUnit(day: String): () => DataFrame = () => {
      val t15 = spark.read.parquet(table.dataDir(tierKey("15min", day)).toString)
      val flat = t15.select(
        concat_ws("_", col("domain"), col("metric")).as("series_flat"),
        col("bucket_ts").as("ts"), col("mean_v").as("value"))
      ChunkWriter.build(flat, "15min", chunkMaxPoints).toDF()
    }

    def indexUnit(day: String): () => DataFrame = () => {
      val chunks = spark.read.parquet(table.dataDir(chunkKey("15min", day)).toString)
        .as[ChunkWriter.FlatChunk]
      ChunkWriter.buildIndex(chunks, indexBuckets).toDF()
    }

    // stage order matters (parents read stored children); within a stage
    // units are independent and resumable
    var n = 0
    for ((tier, period) <- Tiers) {
      val units = days.map(d => tierKey(tier, d) -> tierUnit(tier, period, d))
      n += Checkpoint.runResumable(table, units,
        lineage = s"rollup:$tier<-${if (tier == "15min") "pages" else "child-tier"}",
        failAfter = failAfter).size
    }
    n += Checkpoint.runResumable(table,
      days.map(d => chunkKey("15min", d) -> chunkUnit(d)),
      lineage = "gorilla:15min", failAfter = failAfter).size
    n += Checkpoint.runResumable(table,
      days.map(d => indexKey("15min", d) -> indexUnit(d)),
      lineage = "delta-index:chunks-15min", failAfter = failAfter).size
    n
  }

  /** INCREMENTAL tier refresh (materialized-view maintenance): merge a
    * LATE batch of pages into the stored tier chain without rebuilding
    * unaffected days. Because tiers store ALGEBRAIC partials (sum, n), a
    * delta is pure addition — merged(n, sum) = stored + delta per
    * (series, bucket) — so ALL touched days of the 15-min tier merge in
    * ONE distributed aggregation over (stored partitions ∪ delta
    * partials), each higher tier re-chains from its freshly merged child
    * in one aggregation per TIER (work bounded by the touched days,
    * never the corpus — and the job count bounded by the TIER count,
    * never the day count: a year-long backfill is ~6 stage commits, not
    * ~1,800 driver-serialized jobs), and the touched days' Gorilla
    * chunks + index rebuild in one keyed job each (compressed sorted
    * blobs don't merge incrementally; day-bounded scope keeps it cheap).
    * A delta may introduce entirely new days — those build fresh.
    *
    * This is the batch/store-level form of the revision patching the
    * reference does with combine_first + full re-runs [pub: main.ipynb
    * version patching], and the batch twin of the streaming MERGE sink.
    * Returns the refreshed days.
    */
  def applyDelta(
      spark: SparkSession,
      deltaPages: DataFrame,
      table: ManifestTableLayer,
      chunkMaxPoints: Int = 1024,
      indexBuckets: Int = 16
  ): Seq[String] = {
    import spark.implicits._
    val withDay = deltaPages
      .withColumn("_day", to_date(col("warc_ts")).cast("string")).persist()
    try {
      val days = withDay.select("_day").distinct().as[String].collect().sorted.toSeq
      if (days.isEmpty) return days
      val current = table.currentPartitions().map(p => p.key -> p).toMap
      def touchedPaths(keyOf: String => String): Seq[String] =
        days.flatMap(d => current.get(keyOf(d)).map(_.path))

      // ---- 15-min: stored partials of ALL touched days ∪ delta partials,
      // summed in ONE distributed aggregation — exact algebra, regardless
      // of how many days the delta spans. (The previous shape looped the
      // days from the driver: ~5 serialized jobs per day; a year-long
      // backfill was ~1,800 driver-launched jobs.)
      val tierCols = Seq("domain", "metric", "bucket_ts", "n", "sum_v")
      val d15 = tier15FromPages(withDay.drop("_day")).select(tierCols.map(col): _*)
      val stored15 = touchedPaths(d => tierKey("15min", d))
      val base15 =
        if (stored15.isEmpty) d15
        else spark.read.parquet(stored15: _*).select(tierCols.map(col): _*)
          .unionByName(d15)
      val merged15 = base15
        .groupBy(col("domain"), col("metric"), col("bucket_ts"))
        .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
        .withColumn("mean_v", col("sum_v") / col("n"))
        .select("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v")
      refreshChainFrom15(spark, table, merged15, days, "delta",
        chunkMaxPoints, indexBuckets)
      days
    } finally withDay.unpersist()
  }

  /** GDPR / right-to-be-forgotten delete, propagated through the store:
    * remove every row of the given urls from the raw pages store AND
    * rebuild exactly the tier/chunk/index partitions those rows
    * contributed to. Deletes are NOT algebraic over the stored (n, sum)
    * partials — subtracting would have to trust values that are being
    * erased — so the touched days RECOMPUTE their 15-min tier from the
    * PATCHED raw pages; the rest of the chain is the same
    * one-job-per-stage copy-on-write refresh as [[applyDelta]].
    *
    * Scale shape: a url lives in exactly ONE storage bucket
    * (bucket = url-hash), so the raw patch dynamic-partition-overwrites
    * only the (bucket, day) dirs that held the url — at 100 TB a
    * single-user erasure touches |days| files of one bucket, never the
    * corpus. Days whose pages are erased ENTIRELY are dropped from the
    * table (their partitions would otherwise go stale), not rebuilt.
    * Returns (refreshed days, dropped days).
    *
    * Crash semantics: the raw patch lands first, tier refreshes after,
    * each stage an atomic snapshot commit — a crash mid-way leaves raw
    * clean but some tiers stale (still carrying the urls' aggregates)
    * until the same call is retried to completion. Erasure is proven by
    * the snapshot diff (`q_erasure_proof`), not by the call returning.
    */
  def forgetUrls(
      spark: SparkSession,
      pagesPath: String,
      table: ManifestTableLayer,
      urls: Seq[String],
      buckets: Int = 16,
      chunkMaxPoints: Int = 1024,
      indexBuckets: Int = 16
  ): (Seq[String], Seq[String]) = {
    import spark.implicits._
    require(urls.nonEmpty, "forgetUrls needs at least one url")
    val pages = spark.read.parquet(pagesPath)
    val hit = pages.filter(col("url").isin(urls: _*))
      .select(col("bucket"), col("day").cast("string"))
      .distinct().as[(Int, String)].collect()
    if (hit.isEmpty) return (Seq.empty, Seq.empty)
    val touchedBuckets = hit.map(_._1).distinct.sorted.toSeq
    val days = hit.map(_._2).distinct.sorted.toSeq

    // ---- patch the raw store: rewrite ONLY the (bucket, day) partitions
    // that held a forgotten url, in one dynamic-partition overwrite
    val patched = pages
      .filter(col("bucket").isin(touchedBuckets: _*) &&
        col("day").cast("string").isin(days: _*))
      .filter(!col("url").isin(urls: _*))
      .localCheckpoint() // materialized BEFORE the overwrite deletes its own input files
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try patched.write.mode("overwrite").partitionBy("bucket", "day")
      .parquet(pagesPath)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // a (bucket, day) partition the erasure emptied ENTIRELY gets no dir
    // from the dynamic overwrite — its stale pre-forget files must go
    // explicitly, or the deleted rows would silently stay live
    val aliveParts = patched
      .groupBy(col("bucket"), col("day").cast("string").as("day"))
      .count().collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // stale-dir delete through the SAME Hadoop FS as the write: a
    // java.nio local delete silently no-ops on a non-local pagesPath and
    // erased rows would stay live — a quiet GDPR failure mode
    val fs = new org.apache.hadoop.fs.Path(pagesPath).getFileSystem(
      spark.sessionState.newHadoopConf())
    hit.filterNot(aliveParts.contains).foreach { case (b, d) =>
      val dir = new org.apache.hadoop.fs.Path(pagesPath, s"bucket=$b/day=$d")
      if (fs.exists(dir)) fs.delete(dir, true)
    }

    // ---- recompute the touched days' 15-min tier from patched raw; days
    // the erasure emptied entirely are DROPPED, not rebuilt
    val freshPages = spark.read.parquet(pagesPath)
      .filter(col("day").cast("string").isin(days: _*))
    val alive = freshPages.select(col("day").cast("string"))
      .distinct().as[String].collect().toSet
    val (rebuildDays, droppedDays) = days.partition(alive.contains)
    if (droppedDays.nonEmpty) {
      val gone = droppedDays.toSet
      table.dropPartitions { p =>
        gone.exists(d => p.key.endsWith(s"/day=$d"))
      }
    }
    if (rebuildDays.nonEmpty) {
      val fresh15 = tier15FromPages(
        freshPages.filter(col("day").cast("string").isin(rebuildDays: _*)))
        .select("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v")
      refreshChainFrom15(spark, table, fresh15, rebuildDays, "forget",
        chunkMaxPoints, indexBuckets)
    }
    (rebuildDays, droppedDays)
  }

  /** Shared tail of [[applyDelta]] / [[forgetUrls]]: commit the given
    * 15-min tier content for the touched days, then re-chain every higher
    * tier and rebuild chunks + index — one aggregation + one
    * copy-on-write dynamic-partition commit PER STAGE (never per day).
    */
  private def refreshChainFrom15(
      spark: SparkSession,
      table: ManifestTableLayer,
      merged15: DataFrame,
      days: Seq[String],
      tag: String,
      chunkMaxPoints: Int,
      indexBuckets: Int
  ): Unit = {
    // bucket_ts -> day, for routing merged rows into day partitions
    // (windows never span days, so this is exact)
    val dayOfBucket =
      to_date(timestamp_seconds(col("bucket_ts"))).cast("string").as("_day")
    commitRefreshedDays(spark, table, merged15.withColumn("_day", dayOfBucket),
      days, d => tierKey("15min", d), s"$tag-15min", s"$tag-merge:15min")

    // one snapshot read per stage (not per day): the committed paths of
    // the touched days, for the read-back that feeds the next stage
    def committedPaths(keyOf: String => String): Seq[String] = {
      val cur = table.currentPartitions().map(p => p.key -> p.path).toMap
      days.map(d => cur(keyOf(d)))
    }
    for (((tier, period), idx) <- Tiers.zipWithIndex if tier != "15min") {
      val child = Tiers(idx - 1)._1
      val childDf = spark.read.parquet(
        committedPaths(d => tierKey(child, d)): _*)
      commitRefreshedDays(spark, table,
        TimeSeriesOps.chainTier(childDf, seriesCols, period)
          .withColumn("_day", dayOfBucket),
        days, d => tierKey(tier, d), s"$tag-$tier", s"$tag-chain:$tier")
    }

    // ---- Gorilla chunks + delta index for every touched day, each ONE
    // keyed job (runs restart at day boundaries — bitwise the per-day
    // build)
    val t15 = spark.read.parquet(
      committedPaths(d => tierKey("15min", d)): _*)
    val flat = t15.select(
      to_date(timestamp_seconds(col("bucket_ts"))).cast("string").as("pkey"),
      concat_ws("_", col("domain"), col("metric")).as("series_flat"),
      col("bucket_ts").as("ts"), col("mean_v").as("value"))
    commitRefreshedDays(spark, table,
      ChunkWriter.buildKeyed(flat, "15min", chunkMaxPoints).toDF()
        .withColumnRenamed("pkey", "_day"),
      days, d => chunkKey("15min", d), s"$tag-chunks", s"$tag-chunks:15min")
    val chunks = spark.read.parquet(
        committedPaths(d => chunkKey("15min", d)): _*)
      .withColumn("pkey",
        to_date(timestamp_seconds(col("t0"))).cast("string"))
    commitRefreshedDays(spark, table,
      ChunkWriter.buildIndexKeyed(chunks, indexBuckets)
        .withColumnRenamed("pkey", "_day"),
      days, d => indexKey("15min", d), s"$tag-index", s"$tag-index:chunks-15min")
  }

  /** Copy-on-write refresh of MANY day partitions in one shot: write the
    * frame (routing column `_day`) to a FRESH stage dir — never the live
    * dirs, which the merged plan is lazily reading — as ONE
    * dynamic-partition job, then swap all touched days in ONE snapshot.
    * Old dirs stay for time travel until `expireSnapshots`. This is the
    * store-level twin of the streaming MergeSink's one-job MERGE.
    */
  private def commitRefreshedDays(
      spark: SparkSession,
      table: ManifestTableLayer,
      df: DataFrame, // carries "_day"
      days: Seq[String],
      keyFor: String => String,
      stageTag: String,
      lineage: String
  ): Unit = {
    val stageDir = Iterator.from(0)
      .map(i => table.dataDir(s"$stageTag-r$i"))
      .find(p => !java.nio.file.Files.exists(p)).get
    val pinned = df.persist()
    try {
      pinned.write.partitionBy("_day").mode("overwrite").parquet(stageDir.toString)
      val counts = pinned.groupBy(col("_day")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // every touched day must re-appear: a day the merge emptied would
      // leave its STALE pre-delta partition live after the swap
      val missing = days.filterNot(counts.contains)
      require(missing.isEmpty,
        s"$stageTag produced zero rows for day(s) ${missing.mkString(",")}")
      val metas = days.map { d =>
        val dir = stageDir.resolve(s"_day=$d")
        val bytes = {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(dir)
          try s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
          finally s.close()
        }
        graft.table.PartitionMeta(keyFor(d), dir.toString, counts(d), bytes,
          s"$lineage day=$d")
      }
      table.commit(metas, metas.map(_.key))
    } finally pinned.unpersist()
  }

  /** Read one full tier back from the table (all live day partitions). */
  def readTier(spark: SparkSession, table: ManifestTableLayer, tier: String): DataFrame = {
    val prefix = s"tier=$tier/"
    val parts = table.currentPartitions().filter(_.key.startsWith(prefix))
    require(parts.nonEmpty, s"no live partitions for tier $tier")
    spark.read.parquet(parts.map(_.path): _*)
  }

  /** Retention: drop raw 15-min partitions (and their chunk/index
    * partitions) older than cutoffDay; aggregates (1h/1d) stay.
    */
  def sweepRaw(table: ManifestTableLayer, cutoffDay: String): Long = {
    Retention.sweep(table, "15min", cutoffDay)
    table.dropPartitions { p =>
      (p.key.startsWith("chunks-15min/day=") &&
        p.key.stripPrefix("chunks-15min/day=") < cutoffDay) ||
      (p.key.startsWith("index-15min/day=") &&
        p.key.stripPrefix("index-15min/day=") < cutoffDay)
    }
  }

  /** Per-row invariant check: every url's text hash in the pages table is
    * unique (one text per url) — returns violation count (0 == ok).
    */
  def textInvariantViolations(spark: SparkSession, pagesPath: String): Long = {
    spark.read.parquet(pagesPath)
      .groupBy(col("url"))
      .agg(countDistinct(sha2(col("text"), 256)).as("n_hashes"))
      .filter(col("n_hashes") > 1)
      .count()
  }
}
