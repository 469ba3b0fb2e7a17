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
    val dir = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream-test-").toString
    spark.read.parquet(s"${SparkTestSession.sf0001}/events.parquet")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)

    val streamed = StreamingRollup.latestEventPerUser(
      spark, dir, "*.parquet", "graft_stream_state_test", maxFilesPerTrigger = 1)

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
}
