package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gapfill.GapFill

object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t15 = spark.read.parquet("target/bench/sf0.1_r4_d28/t15")
      .filter(col("metric") === "text_chars")
      .select(col("domain"), col("bucket_ts"), col("mean_v"))
    println(s"t15 rows: ${t15.count()}")
    val dense = GapFill.densify(t15, Seq("domain"), "bucket_ts", 900)
    t("densify")(dense.write.format("noop").mode("overwrite").save())
    val ann = GapFill.annotateRuns(dense, Seq("domain"), "bucket_ts", "mean_v")
    t("annotate")(ann.write.format("noop").mode("overwrite").save())
    val interp = GapFill.interpolate(dense, Seq("domain"), "bucket_ts", "mean_v",
      8, concat(col("domain"), lit("_i")))
    t("interpolate")(interp.write.format("noop").mode("overwrite").save())
    interp.explain("formatted")
    spark.stop()
  }
}
