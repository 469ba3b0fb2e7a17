package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Pages
import graft.pipeline.Pipeline
import graft.table.ManifestTableLayer

/** Measure what the batched incremental refresh actually buys at volume:
  * a 28-day store is built once (the full rebuild a delta-less design
  * pays for ANY late data), then a late batch touching only the last
  * `deltaDays` days is merged with `Pipeline.applyDelta` — one
  * aggregation + one copy-on-write commit per stage, work bounded by the
  * touched days. Reported: full-build seconds, delta seconds, ratio, and
  * the bitwise-equality check against a ground-truth full build over
  * everything (the same invariant `q_tier_refresh` pins at sf0.01).
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.TimeDelta \
  *   [sfDir] [replicate] [days] [deltaDays] — prints one JSON line.
  */
object TimeDelta {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 4
    val days = if (args.length > 2) args(2).toInt else 28
    val deltaDays = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"target/timedelta_$cpus"
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    val all = Pages.synthesize(spark, sf, replicate = repl, days = days,
        domainMod = 9973)
      .select("url", "warc_ts", "html", "text", "lang")
    // the late batch: 20% of the pages of the LAST deltaDays days
    val cutEpoch = Pages.T0Epoch + (days - deltaDays).toLong * 86400
    val isLate = unix_timestamp(col("warc_ts")) >= cutEpoch &&
      regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long") % 5 === 4
    Pages.writePartitioned(all.filter(!isLate), s"$root/pages", buckets = 32)
    val nPages = spark.read.parquet(s"$root/pages").count()

    // full build of the base store (what ANY design pays once)
    val table = new ManifestTableLayer(s"$root/table")
    val t0 = System.nanoTime()
    Pipeline.runRollup(spark, s"$root/pages", table,
      Pipeline.listDays(spark, s"$root/pages"))
    val fullS = (System.nanoTime() - t0) / 1e9

    // the incremental path: merge the late batch
    val late = all.filter(isLate).persist()
    val nLate = late.count()
    val t1 = System.nanoTime()
    val touched = Pipeline.applyDelta(spark, late, table)
    val deltaS = (System.nanoTime() - t1) / 1e9

    // what the delta REPLACED: rebuilding the store from scratch over
    // base + late (the delta-less alternative)
    Pages.writePartitioned(all, s"$root/pagesFull", buckets = 32)
    val tFull = new ManifestTableLayer(s"$root/tableFull")
    val t2 = System.nanoTime()
    Pipeline.runRollup(spark, s"$root/pagesFull", tFull,
      Pipeline.listDays(spark, s"$root/pagesFull"))
    val rebuildS = (System.nanoTime() - t2) / 1e9

    // bitwise invariant at volume: incremental == rebuild on the 1h tier
    val cols = Seq("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v")
    val inc = Pipeline.readTier(spark, table, "1h").select(cols.map(col): _*)
    val reb = Pipeline.readTier(spark, tFull, "1h").select(cols.map(col): _*)
    val equal = inc.except(reb).isEmpty && reb.except(inc).isEmpty
    require(equal, "incremental refresh diverged from the full rebuild")

    // GDPR forget at the same volume: erase one url across the whole
    // history — the raw patch touches |days| files of ONE bucket, the
    // tier refresh exactly the days the url appeared on
    val victim = spark.read.parquet(s"$root/pagesFull")
      .select("url").head().getString(0)
    val t3 = System.nanoTime()
    val (rebuilt, dropped) = Pipeline.forgetUrls(
      spark, s"$root/pagesFull", tFull, Seq(victim), buckets = 32)
    val forgetS = (System.nanoTime() - t3) / 1e9
    require(spark.read.parquet(s"$root/pagesFull")
      .filter(col("url") === victim).count() == 0)

    println(s"""{"pages":$nPages,"late_pages":$nLate,"cpus":$cpus,""" +
      s""""days":$days,"delta_days":${touched.size},""" +
      s""""base_build_s":$fullS,"delta_s":$deltaS,"rebuild_s":$rebuildS,""" +
      s""""speedup_vs_rebuild":${rebuildS / deltaS},"equal":$equal,""" +
      s""""forget_s":$forgetS,"forget_days":${rebuilt.size + dropped.size}}""")
    spark.stop()
  }
}
