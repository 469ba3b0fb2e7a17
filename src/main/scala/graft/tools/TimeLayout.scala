package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.table.Skipping

/** Time the training-set-layout + data-skipping ops at VOLUME (the way
  * TimeWeb/TimeDedup bench their surfaces):
  *
  *  - shuffle-to-shards over `nIds` synthetic doc ids (the op touches only
  *    the id column, so volume comes from row count, not text bytes):
  *    md5 ordering + the two-phase distributed rank + shard arithmetic.
  *  - Z-order layout write + zone-map box read over the events table
  *    replicated `repl` times with shifted users/timestamps (so the 2-D
  *    space actually fills out instead of overlaying copies).
  *
  * Two full passes per stage; the SECOND is reported (fresh-JVM single
  * shots time the interpreter on this VM).
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.TimeLayout \
  *   [sfDir] [nIds] [repl] — prints one JSON line.
  */
object TimeLayout {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nIds = if (args.length > 1) args(1).toLong else 50000000L
    val repl = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- corpus ids (shards) + replicated events (z-order) -------------
    val ids = spark.range(nIds).select(col("id").as("doc_id"))
    val ev0 = spark.read.parquet(s"$sf/events.parquet").select(
      col("user_id"), col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("epoch_s"))
    val uSpan = 1500L
    val events = (0 until repl).map { i =>
      ev0.select(
        (col("user_id") + lit(i.toLong * uSpan)).as("user_id"),
        col("event_id"), (col("epoch_s") + lit((i % 7) * 43L)).as("epoch_s"))
    }.reduce(_ unionByName _).persist()
    val nEvents = events.count()
    val t0e = 1704067200L

    var out = ""
    for (pass <- 1 to 2) {
      // ---- shuffle-to-shards: 2 narrow passes over nIds rows ----------
      // shuffleShards pins its range-shuffled input; drop pass 1's cache
      // so pass 2 times the FULL pipeline (JIT-warm, cache-cold), then
      // re-pin the events input the z-order stage reads
      spark.catalog.clearCache()
      events.persist(); events.count()
      val t0 = System.nanoTime()
      val nSharded = TextOps.shuffleShards(ids, "doc_id", 8192, 42).count()
      val tShards = (System.nanoTime() - t0) / 1e9
      require(nSharded == nIds)

      // ---- z-order layout write + zone-map box read -------------------
      val zroot = s"target/timelayout_z_$cpus"
      val t1 = System.nanoTime()
      Skipping.writeZOrdered(events, "user_id", 0, repl * uSpan - 1,
        "epoch_s", t0e, t0e + 30 * 86400 - 1, zroot)
      val tZWrite = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val (rows, kept) = Skipping.readZBox(spark, zroot,
        "user_id", repl * uSpan / 4, repl * uSpan / 2 - 1,
        "epoch_s", t0e + 8 * 86400, t0e + 15 * 86400 - 1)
      val nBox = rows.count()
      val tZRead = (System.nanoTime() - t2) / 1e9
      out = s"""{"ids":$nIds,"events":$nEvents,"cpus":$cpus,""" +
        s""""shards_s":$tShards,"ids_per_s":${(nIds / tShards).toLong},""" +
        s""""zwrite_s":$tZWrite,"zwrite_rows_per_s":${(nEvents / tZWrite).toLong},""" +
        s""""zread_s":$tZRead,"box_rows":$nBox,"parts_kept":${kept.size},""" +
        s""""pass":$pass}"""
    }
    println(out)
    spark.stop()
  }
}
