package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.Warc

/** Streaming WARC ingestion (S9-streaming) — the shape a live crawl
  * actually has: warc files LAND in a directory as crawler segments
  * complete, and the pages table must absorb them incrementally. The
  * `binaryFile` file-stream source discovers new files per micro-batch
  * (checkpointed, so a restart never re-ingests a processed file), each
  * file is record-STREAMED off its path by `Warc.parseStream` (task
  * memory stays O(record) — same reader as the batch path), and the
  * extracted (url, epoch_s, html_md5) rows MERGE into the url-hash-
  * bucketed snapshot table through the shared one-job-per-batch sink.
  *
  * Replay idempotence: a replayed batch re-parses the same files into
  * the identical rows; `keepBest` on (url, epoch_s) with the md5 as the
  * order collapses them — the table converges to the batch `Warc.read`
  * answer for any file arrival order.
  */
object StreamingWarc {

  /** MERGE one micro-batch of parsed records. */
  def mergeWarcBatch(
      spark: SparkSession,
      layer: graft.table.ManifestTableLayer,
      batch: DataFrame,
      batchId: Long,
      nBuckets: Int,
      expireEvery: Int = 0
  ): Unit = {
    val inc = batch.select("url", "epoch_s", "html_md5")
      .withColumn(MergeSink.BucketCol,
        pmod(xxhash64(col("url")), lit(nBuckets.toLong)).cast("string"))
    MergeSink.mergeBuckets(spark, layer, inc, batchId,
      keyPrefix = "warc/bucket=", lineageTag = "stream-warc",
      merge = MergeSink.keepBest(Seq("url", "epoch_s"),
        Seq(col("html_md5").asc)),
      expireEvery = expireEvery)
  }

  /** Ingest every `.warc` / `.warc.gz` under `dir` as a stream; returns
    * the drained table (url, epoch_s, html_md5).
    */
  def ingestMerged(
      spark: SparkSession,
      dir: String,
      tableRoot: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 0,
      nBuckets: Int = 16,
      expireEvery: Int = 8
  ): DataFrame = {
    import spark.implicits._
    val layer = new graft.table.ManifestTableLayer(tableRoot)
    val schema = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir).schema
    val reader = spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.warc*")
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).load(dir)
    val recs = src
      .select(col("path")).as[String]
      .flatMap { p =>
        val uri = new java.net.URI(p)
        val fs = org.apache.hadoop.fs.FileSystem.get(uri,
          new org.apache.hadoop.conf.Configuration())
        Warc.parseStream(fs.open(new org.apache.hadoop.fs.Path(uri)),
          gz = p.endsWith(".gz"))
      }
      .toDF("url", "epoch_s", "html")
      .select(col("url"), col("epoch_s"), md5(col("html")).as("html_md5"))
    val q = recs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) =>
        mergeWarcBatch(spark, layer, batch, id, nBuckets, expireEvery))
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    layer.read(spark).select("url", "epoch_s", "html_md5")
  }
}
