package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.StreamingRollup
import java.nio.file.{Files, Paths}

/** Stateful streaming: flatMapGroupsWithState carries per-key state
  * ACROSS micro-batches and converges to the batch answer.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("latest-event-per-user state survives micro-batch boundaries == batch dedupe") {
    // split the fixture into 4 files; maxFilesPerTrigger=1 forces 4
    // micro-batches so the running maximum must be carried in state
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-test-").toString
    val dir = s"$base/src"
    spark.read.parquet(s"${SparkTestSession.sf0001}/events.parquet")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)

    val streamed = StreamingRollup.latestEventPerUserMerged(
      spark, dir, "*.parquet", s"$base/table", s"$base/ckpt",
      maxFilesPerTrigger = 1, nBuckets = 4)

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("timestamp").desc, col("event_id").desc)
    val batch = spark.read.parquet(dir)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))

    val cols = Seq("user_id", "event_id", "epoch_s", "event_type", "cents").map(col)
    assert(streamed.select(cols: _*).except(batch.select(cols: _*)).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("upsert MERGE sink resumes across query restarts == batch dedupe (kill/resume)") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-upsert-").toString
    val srcDir = s"$base/src"
    val events = spark.read.parquet(s"${SparkTestSession.sf0001}/events.parquet")

    // RANDOM split: run 2 delivers arbitrarily out-of-order (often older)
    // rows — no watermark on this path, so state + MERGE must simply
    // never regress the per-user (ts, id) maximum
    val h = pmod(xxhash64(col("event_id")), lit(2))
    events.filter(h === 0).repartition(2)
      .write.mode("overwrite").parquet(srcDir)
    val r1 = StreamingRollup.latestEventPerUserMerged(spark, srcDir, "*.parquet",
      s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1, nBuckets = 4)
    assert(r1.count() > 0)

    // "kill" = the first query fully stopped; run 2 restarts from the
    // SAME checkpoint + table after the rest of the data arrives
    events.filter(h === 1).repartition(2)
      .write.mode("append").parquet(srcDir)
    val r2 = StreamingRollup.latestEventPerUserMerged(spark, srcDir, "*.parquet",
      s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1, nBuckets = 4)

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("timestamp").desc, col("event_id").desc)
    val batch = events
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val cols = Seq("user_id", "event_id", "epoch_s", "event_type", "cents").map(col)
    assert(r2.select(cols: _*).except(batch.select(cols: _*)).isEmpty &&
      batch.select(cols: _*).except(r2.select(cols: _*)).isEmpty,
      "resumed upsert table must equal the batch dedupe over all files")
    assert(r2.count() == batch.count())
    // table is genuinely bucketed: multiple partitions, no driver funnel
    val layer = new graft.table.ManifestTableLayer(s"$base/table")
    assert(layer.currentPartitions().map(_.key).forall(_.startsWith("latest/bucket=")))
    assert(layer.currentPartitions().size > 1)
  }

  test("streaming dedup resumes across restarts == batch exact dedup (kill/resume)") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-dedup-").toString
    val srcDir = s"$base/src"
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
    // inject exact dups ACROSS the two runs: run 1 gets the originals,
    // run 2 the copies — the cumulative per-hash state must bridge the
    // restart for n_copies to come out right
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    val r1 = graft.streaming.StreamingDedup.dedupExactMerged(spark, srcDir,
      "*.parquet", s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)
    assert(r1.count() > 0)
    docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .repartition(2).write.mode("append").parquet(srcDir)
    val r2 = graft.streaming.StreamingDedup.dedupExactMerged(spark, srcDir,
      "*.parquet", s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)

    val batch = graft.text.TextOps.exactDedupe(
      spark.read.parquet(srcDir), "doc_id", "text")
    val cols = Seq("h", "keeper", "n_copies").map(col)
    assert(r2.select(cols: _*).except(batch.select(cols: _*)).isEmpty &&
      batch.select(cols: _*).except(r2.select(cols: _*)).isEmpty,
      "resumed dedup table must equal the batch exact dedup")
    assert(r2.count() == batch.count())
    // dup rows really did land in run 2: their hashes show n_copies == 2
    assert(r2.filter(col("n_copies") === 2).count() ==
      docs.filter(col("doc_id") % 10 === 0).count())
  }

  test("streaming near-dup resumes across restarts == batch minhash LSH (kill/resume)") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-neardup-").toString
    val srcDir = s"$base/src"
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select("doc_id", "text")
    // run 1: originals only — no near-dup partner has arrived yet
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    val r1 = graft.streaming.StreamingNearDup.nearDupsMerged(spark, srcDir,
      "*.parquet", s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)
    // run 2: the near-dup copies arrive AFTER the restart — every
    // (original, copy) pair requires the band state saved by run 1
    docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" graft trailer token")).as("text"))
      .repartition(2).write.mode("append").parquet(srcDir)
    val r2 = graft.streaming.StreamingNearDup.nearDupsMerged(spark, srcDir,
      "*.parquet", s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)

    val batch = graft.text.TextOps.minhashNearDups(
      spark.read.parquet(srcDir), "doc_id", "text",
      k = 16, bands = 4, threshold = 0.5)
    val cols = Seq("doc_a", "doc_b", "jaccard").map(col)
    assert(r2.select(cols: _*).except(batch.select(cols: _*)).isEmpty &&
      batch.select(cols: _*).except(r2.select(cols: _*)).isEmpty,
      "resumed near-dup pairs must equal the batch LSH answer")
    assert(r2.count() == batch.count() && r2.count() > 0)
    // the planted pairs really cross the restart boundary
    assert(r2.filter(col("doc_b") === col("doc_a") + 200000).count() > 0)
  }

  test("foreachBatch MERGE sink resumes across query restarts == batch rollup") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-merge-").toString
    val srcDir = s"$base/src"
    val events = spark.read.parquet(s"${SparkTestSession.sf0001}/events.parquet")

    // split by EVENT TIME (later files carry later data, the real arrival
    // order) — splitting randomly would make run 2 entirely "late" past
    // the checkpointed watermark, which correctly drops it
    val cutoff = events.selectExpr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")
      .head().getDouble(0).toLong

    // run 1: only the first half of the timeline exists; the query drains
    // it and stops (a "kill" between the two runs), MERGE-committing
    events.filter(unix_micros(col("ts").cast("timestamp")) < cutoff)
      .repartition(2).write.mode("overwrite").parquet(srcDir)
    val r1 = StreamingRollup.hourlyRollupMerged(spark, srcDir, "*.parquet",
      s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)
    assert(r1.count() > 0)

    // run 2: the rest of the timeline arrives; SAME checkpoint + table —
    // the restarted query restores aggregation state and upserts the table
    events.filter(unix_micros(col("ts").cast("timestamp")) >= cutoff)
      .repartition(2).write.mode("append").parquet(srcDir)
    val r2 = StreamingRollup.hourlyRollupMerged(spark, srcDir, "*.parquet",
      s"$base/table", s"$base/ckpt", maxFilesPerTrigger = 1)

    val batch = events.select(
        col("event_type"),
        (unix_timestamp(col("ts").cast("timestamp")) / 3600).cast("long") * 3600,
        round(col("value") * 100).cast("long"))
      .toDF("event_type", "bucket_ts", "cents")
      .groupBy("event_type", "bucket_ts")
      .agg(count(col("cents")).as("n"), sum(col("cents")).as("sum_cents"))
    val cols = Seq("event_type", "bucket_ts", "n", "sum_cents").map(col)
    assert(r2.select(cols: _*).except(batch.select(cols: _*)).isEmpty &&
      batch.select(cols: _*).except(r2.select(cols: _*)).isEmpty,
      "resumed MERGE table must equal the batch rollup over all files")
    assert(r2.count() == batch.count())
    // snapshot history exists (multiple commits across batches/runs)
    val layer = new graft.table.ManifestTableLayer(s"$base/table")
    assert(layer.currentPartitions().nonEmpty)
  }
}
