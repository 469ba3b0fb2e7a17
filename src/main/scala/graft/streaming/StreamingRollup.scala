package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming variant of the tier rollup: the incremental /
  * late-data path the batch reference lacks (OPSD handles revisions by
  * full re-runs; at crawl scale you want continuous aggregates instead).
  *
  * Shape: `readStream` over the events directory -> event-time watermark ->
  * tumbling-window aggregation -> sink. In this sandbox the sink is the
  * in-memory table and the source is the finite fixture, driven to
  * completion synchronously — on a cluster the same plan runs against a
  * file/Kafka source with a Parquet/Iceberg `foreachBatch` MERGE sink.
  */
object StreamingRollup {

  /** Hourly streaming rollup of the events fixture; returns the completed
    * result as a batch DataFrame (epoch-second buckets + exact cents sums,
    * identical to the batch tier for a finite input).
    */
  def hourlyRollup(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(
        col("event_type"),
        col("ts").cast("timestamp").as("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(col("cents")).as("n"), sum(col("cents")).as("sum_cents"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).select(
      col("event_type"),
      unix_timestamp(col("window.start")).as("bucket_ts"),
      col("n"), col("sum_cents"))
  }
}
