package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    println(s"docs: ${d.count()}")

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val k = 16; val bands = 4; val rows = 4
    val sig = d.select(col("doc_id").as("doc"),
      TextOps.minhashSig(col("text"), k).as("sig"))
    t("sig compute")(sig.write.format("noop").mode("overwrite").save())

    val banded = sig.select(col("doc"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)))
            .as("band_hash"))
      }: _*)).as("band"))
      .select(col("doc"), col("band.band_idx"), col("band.band_hash"))
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc").as("doc_a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc").as("doc_b"))
    val cand = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
    println(s"raw candidates: ${t("cand count")(cand.count())}")
    println(s"distinct candidates: ${t("cand distinct")(cand.select("doc_a", "doc_b").distinct().count())}")
    // biggest buckets
    banded.groupBy("band_idx", "band_hash").count()
      .orderBy(col("count").desc).show(10)
    spark.stop()
  }
}
