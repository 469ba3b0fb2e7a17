package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.Pages
import graft.pipeline.Pipeline
import graft.table.ManifestTableLayer
import graft.chunk.ChunkWriter
import java.nio.file.Files

/** End-to-end pipeline on sf0.001: rollup -> read back -> invariants,
  * chunk decode equivalence, retention semantics.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val root = Files.createTempDirectory(
    java.nio.file.Paths.get("/root/repo/target"), "pipe-test-").toString
  private lazy val pagesPath = s"$root/pages"
  private lazy val table: ManifestTableLayer = {
    Pages.writePartitioned(
      Pages.synthesize(spark, SparkTestSession.sf0001)
        .select("url", "warc_ts", "html", "text", "lang"),
      pagesPath, buckets = 8)
    val t = new ManifestTableLayer(s"$root/table")
    val days = Pipeline.listDays(spark, pagesPath)
    assert(days.size == 7)
    Pipeline.runRollup(spark, pagesPath, table = t, days = days,
      chunkMaxPoints = 128)
    t
  }

  test("rollup commits tiers + chunks + index partitions for every day") {
    val keys = table.currentPartitions().map(_.key)
    assert(keys.count(_.startsWith("tier=15min/")) == 7)
    assert(keys.count(_.startsWith("tier=30min/")) == 7)
    assert(keys.count(_.startsWith("tier=1h/")) == 7)
    assert(keys.count(_.startsWith("tier=1d/")) == 7)
    assert(keys.count(_.startsWith("chunks-15min/")) == 7)
    assert(keys.count(_.startsWith("index-15min/")) == 7)
  }

  test("one-pass two-metric tier-0 equals the long-format tier, bitwise") {
    val pages = spark.read.parquet(pagesPath)
    val viaPoints = graft.rollup.TimeSeriesOps.tier(
      Pipeline.pointsFromPages(pages), Seq("domain", "metric"),
      "epoch_s", "value", 900)
    val onePass = Pipeline.tier15FromPages(pages)
    val cols = Seq("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v")
    assert(onePass.select(cols.map(col): _*)
      .except(viaPoints.select(cols.map(col): _*)).isEmpty)
    assert(onePass.count() == viaPoints.count())
  }

  test("stored hourly tier equals direct aggregation from pages") {
    val points = Pipeline.pointsFromPages(spark.read.parquet(pagesPath))
    val direct = graft.rollup.TimeSeriesOps.tier(
      points, Seq("domain", "metric"), "epoch_s", "value", 3600)
    val stored = Pipeline.readTier(spark, table, "1h")
    assert(stored.select("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v")
      .except(direct.select("domain", "metric", "bucket_ts", "n", "sum_v", "mean_v"))
      .isEmpty)
    assert(stored.count() == direct.count())
  }

  test("chunk partitions decode back to the stored 15-min tier, bitwise") {
    val chunkParts = table.currentPartitions()
      .filter(_.key.startsWith("chunks-15min/")).map(_.path)
    val chunks = spark.read.parquet(chunkParts: _*).as[ChunkWriter.FlatChunk]
    val decoded = ChunkWriter.decode(chunks)
      .select(col("series_flat"), col("ts"), col("value"))
    val tier = Pipeline.readTier(spark, table, "15min").select(
      concat_ws("_", col("domain"), col("metric")).as("series_flat"),
      col("bucket_ts").as("ts"), col("mean_v").as("value"))
    assert(decoded.except(tier).isEmpty && tier.except(decoded).isEmpty)
    assert(decoded.count() == tier.count())
  }

  test("delta index agrees with chunk partitions (counts + time bounds)") {
    val idxParts = table.currentPartitions()
      .filter(_.key.startsWith("index-15min/")).map(_.path)
    val idx = spark.read.parquet(idxParts: _*)
    val chunkParts = table.currentPartitions()
      .filter(_.key.startsWith("chunks-15min/")).map(_.path)
    val chunks = spark.read.parquet(chunkParts: _*)
    assert(idx.agg(sum("n_chunks")).as[Long].head() == chunks.count())
    assert(idx.agg(min("t_min")).as[Long].head() ==
      chunks.agg(min("t0")).as[Long].head())
    assert(idx.agg(max("t_max")).as[Long].head() ==
      chunks.agg(max("t_max")).as[Long].head())
  }

  test("text invariant holds end-to-end on the partitioned pages table") {
    assert(Pipeline.textInvariantViolations(spark, pagesPath) == 0)
    // and the hashes equal the source documents' hashes
    val src = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select(sha2(col("text"), 256).as("h")).distinct()
    val rt = spark.read.parquet(pagesPath)
      .select(sha2(col("text"), 256).as("h")).distinct()
    assert(rt.except(src).isEmpty && src.except(rt).isEmpty)
  }

  test("sweep drops raw + chunks + index below cutoff; aggregates intact") {
    // run on a copy-table (fresh manifest root, same data dirs would be
    // mutated) — rebuild quickly instead
    val root2 = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "pipe-sweep-").toString
    val t2 = new ManifestTableLayer(s"$root2/table")
    Pipeline.runRollup(spark, pagesPath, t2,
      Pipeline.listDays(spark, pagesPath), chunkMaxPoints = 128)
    val daysBefore = Pipeline.readTier(spark, t2, "1d").count()
    Pipeline.sweepRaw(t2, "2024-01-04")
    val keys = t2.currentPartitions().map(_.key)
    assert(keys.count(_.startsWith("tier=15min/")) == 4)
    assert(keys.count(_.startsWith("chunks-15min/")) == 4)
    assert(keys.count(_.startsWith("index-15min/")) == 4)
    assert(keys.count(_.startsWith("tier=1d/")) == 7)
    assert(Pipeline.readTier(spark, t2, "1d").count() == daysBefore)
    // expired files physically gone, survivors remain readable
    graft.retention.Retention.expire(t2, keepLast = 1)
    assert(Pipeline.readTier(spark, t2, "15min").count() > 0)
  }
}
