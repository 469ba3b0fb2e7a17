package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.{Pages, Warc}
import graft.web.Web

/** Time the round-5 web ops at REPLICATED volume (dev tool): the sf0.1
  * fixtures are too small for a scaling signal (fixed overhead dominates
  * sub-second queries), so this materializes `replicate` copies of the
  * pages derivation once and times the operators over the stored table —
  * the same protocol `tools/scaling.sh` uses for the tier pipeline.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.TimeWeb \
  *   [sfDir] [replicate] — prints one JSON line.
  */
object TimeWeb {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = s"target/timeweb_pages_r$repl"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(store))) {
      Pages.synthesize(spark, sf, replicate = repl)
        .select("url", "warc_ts", "html", "text")
        .repartition(64)
        .write.mode("overwrite").parquet(store)
    }
    val nRows = spark.read.parquet(store).count()

    def timeIt(label: String)(body: => Unit): Double = {
      body // warm (codegen + C2); fresh-JVM single shots time the interpreter
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tExtract = timeIt("extract") {
      noop(spark.read.parquet(store)
        .select(md5(Web.extractText(col("html").cast("string"))).as("h")))
    }
    val tChanges = timeIt("changes") {
      noop(Web.revisitChanges(spark.read.parquet(store),
        "url", "warc_ts", "text"))
    }
    val warcDir = s"target/timeweb_warc_r$repl"
    val t0w = System.nanoTime()
    Warc.write(spark.read.parquet(store).select("url", "warc_ts", "html"),
      warcDir, nFiles = cpus.toInt * 2, gzip = true)
    val tWarcWrite = (System.nanoTime() - t0w) / 1e9
    val tWarcRead = timeIt("warcRead") {
      noop(Warc.read(spark, warcDir)
        .select(col("url"), length(col("html")).as("n")))
    }
    println(s"""{"rows":$nRows,"cpus":$cpus,"extract_s":$tExtract,""" +
      s""""changes_s":$tChanges,"warc_write_s":$tWarcWrite,""" +
      s""""warc_read_s":$tWarcRead,""" +
      s""""extract_rps":${(nRows / tExtract).toLong},""" +
      s""""changes_rps":${(nRows / tChanges).toLong},""" +
      s""""warc_read_rps":${(nRows / tWarcRead).toLong}}""")
    spark.stop()
  }
}
