package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Time the dedup CAPSTONE (q_dedup_corpus's shape: minhash sigs ->
  * banded candidate pairs -> verified near-dup pairs -> connected
  * components -> one survivor per cluster) at REPLICATED volume — the
  * engine's headline claim benched the way the web ops are (TimeWeb).
  *
  * Corpus construction matters: naive replication copies texts exactly,
  * so every text becomes one giant all-pairs cluster and the bench
  * measures a pathological quadratic blow-up instead of throughput.
  * Instead each replica re-letters its documents through a DISTINCT
  * deterministic alphabet permutation (`translate`), so replicas share
  * essentially no shingles — the corpus grows linearly with realistic
  * cluster sizes — and near-dup PAIRS are planted explicitly per replica
  * (doc_id % 10 == 0 re-appears with a trailer token), exactly the
  * q_dedup_corpus fixture shape.
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.TimeDedup \
  *   [sfDir] [replicate] — prints one JSON line.
  */
object TimeDedup {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = s"target/timededup_docs_r$repl"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(store))) {
      val base = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      val abc = "abcdefghijklmnopqrstuvwxyz"
      val replicas = (0 until repl).map { i =>
        val perm = new scala.util.Random(i).shuffle(abc.toList).mkString
        val relettered = base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), abc, perm).as("text"))
        // planted near-dup pair per tenth doc (the q_dedup_corpus shape)
        relettered.unionByName(
          relettered.filter(col("doc_id") % 10 === 0).select(
            (col("doc_id") + 5000000L).as("doc_id"),
            concat(col("text"), lit(" graft trailer token")).as("text")))
      }.reduce(_ unionByName _)
      replicas.repartition(64).write.mode("overwrite").parquet(store)
    }
    val docs = spark.read.parquet(store)
    val nDocs = docs.count()

    // the capstone, timed end-to-end in stages (each forced via count —
    // counts are also the sanity output). Two full passes: the first
    // warms codegen/C2 (fresh-JVM single shots time the interpreter on
    // this VM), the SECOND is reported.
    var out = ""
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = TextOps.minhashNearDups(docs, "doc_id", "text",
        k = 16, bands = 4, threshold = 0.5).persist()
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val labels = TextOps.dupClusters(docs, "doc_id", pairs, "doc_a", "doc_b")
        .persist()
      labels.count()
      val tCc = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nSurvivors = labels.filter(col("cluster_id") === col("doc_id"))
        .select("doc_id").join(docs, "doc_id")
        .select(col("doc_id"), md5(col("text")).as("fp_md5"))
        .count()
      val tSurv = (System.nanoTime() - t2) / 1e9
      val total = (System.nanoTime() - t0) / 1e9
      pairs.unpersist(); labels.unpersist()
      out = s"""{"docs":$nDocs,"cpus":$cpus,"pairs":$nPairs,""" +
        s""""survivors":$nSurvivors,"pairs_s":$tPairs,"cc_s":$tCc,""" +
        s""""survivors_s":$tSurv,"total_s":$total,""" +
        s""""docs_per_s":${(nDocs / total).toLong},"pass":$pass}"""
    }
    println(out)
    spark.stop()
  }
}
