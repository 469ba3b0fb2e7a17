package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.text.TextOps

/** Streaming MinHash+LSH near-dup detection — the crawl-time form of the
  * batch T2 pipeline: as documents arrive, each one's codegen'd MinHash
  * signature is banded (same `xxhash64(slice)` band keys as the batch
  * path, so identical inputs produce identical buckets), and per
  * (band_idx, band_hash) bucket the stateful operator carries the doc ids
  * seen so far ACROSS micro-batches, emitting every (new x seen) and
  * (new x new) candidate pair the moment the later document lands. The
  * union of emissions over any arrival order equals the batch band
  * self-join's pair set.
  *
  * Candidates drain through the hash-bucketed `foreachBatch` MERGE sink
  * (distinct pairs, replay-idempotent, checkpoint-resumable). The exact
  * shingle-Jaccard verification then runs BATCH over just the candidate
  * ids — the same candidates-then-verify contract as the batch pipeline,
  * so the final (doc_a, doc_b, jaccard >= threshold) table is bitwise the
  * batch `minhashNearDups` answer once the source drains.
  *
  * State contract: one row per OCCUPIED band bucket holding its doc ids —
  * bucket occupancy is near-dup-cluster-sized by LSH construction, so
  * state grows with distinct near-dup groups, not the corpus.
  */
object StreamingNearDup {

  case class BandRow(band_idx: Int, band_hash: Long, doc: Long)

  /** MERGE one micro-batch of (doc_a, doc_b) candidate pairs: per-bucket
    * distinct union with the existing partition (pure set growth — any
    * replay is a no-op).
    */
  def mergeCandidateBatch(
      spark: SparkSession,
      layer: graft.table.ManifestTableLayer,
      batch: DataFrame,
      batchId: Long,
      nBuckets: Int
  ): Unit = {
    import spark.implicits._
    val b = batch.select("doc_a", "doc_b").distinct()
      .withColumn("bucket",
        pmod(xxhash64(col("doc_a"), col("doc_b")), lit(nBuckets.toLong)))
      .persist()
    try {
      val buckets = b.select("bucket").distinct().as[Long].collect().sorted
      if (buckets.isEmpty) return
      val current = layer.currentPartitions().map(p => p.key -> p).toMap
      buckets.foreach { bk =>
        val key = s"cand/bucket=$bk"
        val batchBk = b.filter(col("bucket") === bk).drop("bucket")
        val merged = (current.get(key) match {
          case Some(pm) => spark.read.parquet(pm.path).unionByName(batchBk)
          case None => batchBk
        }).distinct()
        val outDir = layer.dataDir(key).resolve(s"b$batchId").toString
        merged.write.mode("overwrite").parquet(outDir)
        val written = spark.read.parquet(outDir)
        val rows = written.count()
        val bytes = {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.list(java.nio.file.Paths.get(outDir))
          try s.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p))
            .map(java.nio.file.Files.size).sum
          finally s.close()
        }
        layer.commit(
          Seq(graft.table.PartitionMeta(key, outDir, rows, bytes,
            s"stream-neardup batch=$batchId")),
          Seq(key))
      }
    } finally b.unpersist()
  }

  /** Streaming near-dup over a documents directory. Returns
    * (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold
    * — the batch `minhashNearDups` answer — after draining the source
    * through the stateful banding + MERGE candidate table and running the
    * exact-Jaccard verify batch-side over the candidate ids.
    */
  def nearDupsMerged(
      spark: SparkSession,
      dir: String,
      glob: String,
      tableRoot: String,
      checkpointDir: String,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxFilesPerTrigger: Int = 0,
      nBuckets: Int = 16
  ): DataFrame = {
    import spark.implicits._
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val layer = new graft.table.ManifestTableLayer(tableRoot)
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    // identical band-key derivation to the batch path: same codegen'd
    // signature, same xxhash64 over the comma-joined band slice
    val banded = src
      .select(col("doc_id").cast("long").as("doc"),
        TextOps.minhashSig(col("text"), k).as("sig"))
      .select(col("doc"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band_idx"),
            xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)))
              .as("band_hash"))
        }: _*)).as("band"))
      .select(col("band.band_idx"), col("band.band_hash"), col("doc"))
      .as[BandRow]
    val candidates = banded.groupByKey(r => (r.band_idx, r.band_hash))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow], st: GroupState[Seq[Long]]) =>
          val seen = st.getOption.getOrElse(Seq.empty)
          val seenSet = seen.toSet
          val fresh = rows.map(_.doc).toSet.diff(seenSet).toSeq.sorted
          if (fresh.isEmpty) Iterator.empty
          else {
            st.update(seen ++ fresh)
            // new x seen, plus new x new (ordered) — over all batches this
            // is exactly the bucket's unordered pair set
            val vsSeen = for (b <- fresh.iterator; a <- seen.iterator)
              yield (math.min(a, b), math.max(a, b))
            val vsFresh = for {
              i <- fresh.indices.iterator
              j <- (i + 1 until fresh.length).iterator
            } yield (fresh(i), fresh(j))
            vsSeen ++ vsFresh
          }
      }
      .toDF("doc_a", "doc_b")
    val q = candidates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) =>
        mergeCandidateBatch(spark, layer, batch, id, nBuckets))
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // exact verification batch-side, candidates-only (ids joined back to
    // the corpus — the shuffle carries ids, not documents)
    val docs = spark.read.option("pathGlobFilter", glob).parquet(dir)
      .select(col("doc_id").cast("long").as("doc"),
        TextOps.shingleSet(col("text"), 3).as("shin"))
    layer.read(spark)
      .join(docs.select(col("doc").as("doc_a"), col("shin").as("shin_a")), "doc_a")
      .join(docs.select(col("doc").as("doc_b"), col("shin").as("shin_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("shin_a"), col("shin_b"))))
      .withColumn("uni",
        size(array_distinct(concat(col("shin_a"), col("shin_b")))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
