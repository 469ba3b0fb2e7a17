package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

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

  case class Ev(event_id: Long, epoch_s: Long, user_id: Long,
      event_type: String, cents: Long)

  /** Stateful streaming upsert: latest event per user via
    * `flatMapGroupsWithState` — per-key state carries the running
    * (epoch_s, event_id) maximum ACROSS micro-batches, the streaming form
    * of the engine's priority dedupe (P6) / revision patching (J3). Late
    * or out-of-order arrivals never regress the state (strict (ts, id)
    * ordering), which is exactly the late-page-revision semantics the
    * batch pipeline gets from union + window dedupe.
    *
    * `eventsPath` may be split over many files; with maxFilesPerTrigger=1
    * each file is its own micro-batch, exercising cross-batch state
    * (StreamingSpec). Emitted updates are per-batch; the final answer is
    * the last update per key (resolved with one window pass at the end —
    * on a cluster the sink would be a keyed MERGE instead).
    */
  def latestEventPerUser(
      spark: SparkSession,
      dir: String,
      glob: String,
      queryName: String,
      maxFilesPerTrigger: Int = 0
  ): DataFrame = {
    import spark.implicits._
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    val evs = src.select(
        col("event_id").cast("long").as("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
    val latest = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], st: GroupState[Ev]) =>
          var cur = st.getOption.orNull
          rows.foreach { e =>
            if (cur == null || e.epoch_s > cur.epoch_s ||
                (e.epoch_s == cur.epoch_s && e.event_id > cur.event_id))
              cur = e
          }
          st.update(cur)
          Iterator((uid, cur.event_id, cur.epoch_s, cur.event_type, cur.cents))
      }
      .toDF("user_id", "event_id", "epoch_s", "event_type", "cents")
    val q = latest.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s").desc, col("event_id").desc)
    spark.table(queryName)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }
}
