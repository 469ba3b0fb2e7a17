package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.{ManifestTableLayer, PartitionMeta}

/** The shared `foreachBatch` copy-on-write MERGE sink used by every
  * streaming path (hourly rollup, latest-per-user upsert, exact dedup,
  * near-dup candidates). One micro-batch is merged into its bucketed
  * snapshot table with a CONSTANT number of Spark jobs — three —
  * regardless of how many buckets the batch touches:
  *
  *   1. touched-bucket discovery (also materializes the incoming cache),
  *   2. ONE dynamic-partition write of the merged contents of ALL touched
  *      buckets (`partitionBy` over the routing column — the same
  *      all-partitions-in-one-job shape the chunk-store compaction uses),
  *   3. per-bucket row counts from the merged cache (one aggregate job;
  *      file sizes come from a driver-side fs listing, not a re-read).
  *
  * The whole batch then commits as ONE snapshot. The previous shape — a
  * sequential `buckets.foreach` launching a write job plus a parquet
  * re-read `count()` job per bucket from the driver — is invisible at
  * nBuckets=16 but driver-serialized job launches dominate batch latency
  * once a cluster batch touches hundreds of day/bucket partitions.
  *
  * Retention: with `expireEvery > 0` the sink calls
  * `expireSnapshots(keepLast)` every N batches, so a long-running stream
  * keeps a bounded number of `b<batchId>` staging dirs on disk instead of
  * one per touched bucket per batch forever. Expiry never touches live
  * data (every current partition is referenced by the latest snapshot)
  * and replaying a batch after a crash re-runs an idempotent expire.
  */
object MergeSink {

  /** Reserved routing column: callers attach it (as a STRING — a day like
    * "2024-01-03" or a rendered bucket number) to each incoming row; the
    * partition key is `keyPrefix + value`. Dropped from the stored files
    * by the `partitionBy` write, exactly like the per-bucket loops it
    * replaces dropped their `bucket` column.
    */
  val BucketCol = "mbk"

  /** MERGE one micro-batch into the layer.
    *
    * @param incoming  the batch, carrying [[BucketCol]]
    * @param keyPrefix partition key = keyPrefix + bucket value
    *                  (e.g. "dedup/bucket=", "tier=1h/day=")
    * @param merge     (existing, incoming) => merged rows, BucketCol
    *                  preserved. Merge keys must be bucket-local (each
    *                  key's rows land in exactly one bucket), which every
    *                  caller guarantees by construction — the bucket IS a
    *                  hash/date of the merge key — so a global window or
    *                  anti-join inside `merge` equals the per-bucket one.
    * @param expireEvery run `expireSnapshots(keepLast)` every N batches
    *                  (0 = never; finite drains with AvailableNow keep
    *                  full history for the duration of the run anyway)
    * @param extraBuckets buckets to REWRITE even when no incoming row
    *                  lands in them — `merge(existing, ∅)` runs there.
    *                  Needed by merges that DELETE keys from buckets the
    *                  batch adds nothing to (a url moving between md5
    *                  groups must be removed from its OLD group's bucket).
    * @param allowEmptied a touched bucket whose merged content is empty
    *                  commits as a DROPPED partition instead of failing
    *                  the batch (only deletion-capable merges opt in; the
    *                  default keeps the loud stale-partition guard)
    */
  def mergeBuckets(
      spark: SparkSession,
      layer: ManifestTableLayer,
      incoming: DataFrame,
      batchId: Long,
      keyPrefix: String,
      lineageTag: String,
      merge: (DataFrame, DataFrame) => DataFrame,
      expireEvery: Int = 0,
      keepLast: Int = 2,
      extraBuckets: Seq[String] = Nil,
      allowEmptied: Boolean = false
  ): Unit = {
    import spark.implicits._
    val inc = incoming.persist()
    try {
      val buckets = (inc.select(BucketCol).distinct().as[String].collect() ++
        extraBuckets).distinct.sorted
      if (buckets.isEmpty) return
      val current = layer.currentPartitions().map(p => p.key -> p).toMap
      // stored files carry the data columns only (BucketCol is in the dir
      // name); reading them back with the explicit schema skips footer
      // inference
      val dataSchema = org.apache.spark.sql.types.StructType(
        inc.schema.filterNot(_.name == BucketCol))
      val existingPaths = buckets.toSeq
        .flatMap(b => current.get(keyPrefix + b).map(_.path))
      val existing = existingFor(spark, dataSchema, existingPaths)
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], inc.schema))
      val merged = merge(existing, inc).persist()
      try {
        // one dynamic-partition job writes every touched bucket. The
        // stage dir must be FRESH: a replayed batch (foreachBatch is
        // at-least-once) would otherwise overwrite — delete-first — the
        // very files its merge plan is lazily reading as "existing".
        // On replay/crash-leftovers the attempt suffix picks an unused
        // dir; orphaned attempts are unreferenced by any snapshot and
        // swept by expireSnapshots.
        val ns = keyPrefix.split("/").head
        val stageDir = Iterator.from(0)
          .map(a => layer.dataDir(if (a == 0) s"$ns/b$batchId" else s"$ns/b$batchId-r$a"))
          .find(p => !java.nio.file.Files.exists(p)).get
        merged.write.partitionBy(BucketCol)
          .mode("overwrite").parquet(stageDir.toString)
        val counts = merged.groupBy(BucketCol).count()
          .as[(String, Long)].collect().toMap
        val added = buckets.toSeq.flatMap { b =>
          val dir = stageDir.resolve(s"$BucketCol=$b")
          if (!java.nio.file.Files.isDirectory(dir)) None
          else {
            val bytes = {
              import scala.jdk.CollectionConverters._
              val s = java.nio.file.Files.list(dir)
              try s.iterator().asScala
                .filter(p => java.nio.file.Files.isRegularFile(p))
                .map(java.nio.file.Files.size).sum
              finally s.close()
            }
            Some(PartitionMeta(keyPrefix + b, dir.toString,
              counts.getOrElse(b, 0L), bytes, s"$lineageTag batch=$batchId"))
          }
        }
        // merge-contract check: every TOUCHED bucket must re-appear in the
        // merged output (the default mergers only grow or keep per-key
        // rows). A merge that emptied a bucket writes no mbk= dir; without
        // an explicit commit the STALE old partition would silently stay
        // live — fail loudly, unless the caller declared a
        // deletion-capable merge (allowEmptied), in which case the emptied
        // buckets' keys are DROPPED in the same snapshot.
        val written = added.map(_.key.stripPrefix(keyPrefix)).toSet
        val vanished = buckets.filterNot(written.contains)
        require(allowEmptied || vanished.isEmpty,
          s"merge produced zero rows for touched bucket(s) ${vanished.mkString(",")} " +
            "— a bucket-emptying merge needs an explicit empty-partition commit, " +
            "which no current sink's merge can produce")
        // one snapshot per batch; re-written keys are swapped, emptied
        // keys (allowEmptied only) are dropped
        layer.commit(added, added.map(_.key) ++ vanished.map(keyPrefix + _))
        if (expireEvery > 0 && (batchId + 1) % expireEvery == 0)
          layer.expireSnapshots(keepLast)
      } finally merged.unpersist()
    } finally inc.unpersist()
  }

  /** ONE multi-path read of all touched buckets' current partitions, the
    * bucket value recovered from the `mbk=<value>` directory segment each
    * stored file lives under. The previous shape — a per-bucket
    * `spark.read` chained through `unionByName.reduce` — grew the logical
    * plan LINEARLY in touched buckets: at hundreds of buckets per batch
    * the analyzer walk dominates and the plan tree eventually threatens
    * the stack. Bucket values must be partition-path-safe (days / rendered
    * numbers — every caller's, by construction), or the dir name would be
    * Hive-escaped and no longer match the incoming values.
    */
  private[graft] def existingFor(
      spark: SparkSession,
      dataSchema: org.apache.spark.sql.types.StructType,
      paths: Seq[String]
  ): Option[DataFrame] =
    if (paths.isEmpty) None
    else Some(
      spark.read.schema(dataSchema).parquet(paths: _*)
        .withColumn(BucketCol,
          regexp_extract(input_file_name(), s"/$BucketCol=([^/]+)/", 1)))

  /** Keep, per `keys` group, the single best row by `order` — the
    * window-dedupe merge every upsert-style sink uses (latest event,
    * cumulative dedup counts). Formulated once here so the four sinks
    * share it.
    */
  def keepBest(keys: Seq[String], order: Seq[org.apache.spark.sql.Column])(
      existing: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    existing.unionByName(incoming)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }
}
