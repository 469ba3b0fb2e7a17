package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: one-off semantic probes against the fixtures. Not part
  * of the engine API.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.select(
      col("ts"),
      unix_timestamp(col("ts").cast("timestamp")).as("unix_s"),
      unix_micros(col("ts").cast("timestamp")).as("unix_us"),
      round(col("value") * 100).cast("long").as("cents")
    ).show(5, false)
    ev.selectExpr(
      "min(unix_micros(cast(ts as timestamp)) div 1000000)",
      "max(unix_micros(cast(ts as timestamp)) div 1000000)").show()
    spark.stop()
  }
}
