package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The cluster-side TableLayer: an Iceberg table driven ENTIRELY through
  * Spark's public SQL/DataFrame surface — `spark.table`, `writeTo`,
  * `DELETE WHERE`, and the `system.*` stored procedures — so this class
  * compiles with zero Iceberg classes on the compile classpath (the
  * sandbox ships none) and runs wherever `spark.sql.catalog.<cat>` is
  * configured with `org.apache.iceberg.spark.SparkCatalog`.
  *
  * UNTESTED OFFLINE: no Iceberg runtime exists in this sandbox, so this
  * impl is excluded from the test suite; `ManifestTableLayer` reproduces
  * the same snapshot/partition semantics locally and carries the oracle
  * coverage. Method-for-method mapping:
  *
  *  - commit(added, removed)  -> append staged Parquet dirs via
  *    `writeTo(table).append()` (one Iceberg snapshot) after deleting
  *    replaced keys — Iceberg's optimistic-commit protocol supplies the
  *    atomic CURRENT swap the manifest layer does with ATOMIC_MOVE.
  *  - currentPartitions()     -> the `<table>.partitions` metadata table
  *    (record_count / file_size; lineage lives in snapshot summary props).
  *  - dropPartitions(pred)    -> `DELETE FROM table WHERE <partition preds>`
  *    — a metadata-only drop when predicates align with partition bounds.
  *  - expireSnapshots(keep)   -> `CALL <cat>.system.expire_snapshots(...)`
  *    (physical deletes deferred to the procedure, like the local layer's
  *    deferred rmTree).
  *
  * `partitionKeySql` turns a layer key like "tier=1h/day=2024-01-03" into
  * the matching predicate; keys are the same strings ManifestTableLayer
  * uses, so Pipeline/Retention code is layer-agnostic.
  */
class IcebergTableLayer(
    spark: SparkSession,
    catalog: String,
    table: String
) extends TableLayer {

  private def fq = s"$catalog.$table"

  /** "tier=1h/day=2024-01-03" -> "tier = '1h' AND day = '2024-01-03'" */
  private def partitionKeySql(key: String): String =
    key.split("/").map { kv =>
      val Array(k, v) = kv.split("=", 2)
      s"$k = '$v'"
    }.mkString(" AND ")

  override def commit(added: Seq[PartitionMeta], removedKeys: Seq[String]): Long = {
    removedKeys.foreach(k =>
      spark.sql(s"DELETE FROM $fq WHERE ${partitionKeySql(k)}"))
    added.foreach { pm =>
      val df = spark.read.parquet(pm.path)
      val withKeys = pm.key.split("/").foldLeft(df) { (d, kv) =>
        val Array(k, v) = kv.split("=", 2)
        if (d.columns.contains(k)) d
        else d.withColumn(k, org.apache.spark.sql.functions.lit(v))
      }
      withKeys.writeTo(fq).append()
    }
    currentSnapshotId()
  }

  override def currentPartitions(): Seq[PartitionMeta] =
    spark.sql(
        s"SELECT partition, record_count, file_count, total_data_file_size_in_bytes " +
          s"FROM $fq.partitions")
      .collect().toSeq.map { r =>
        val part = r.getStruct(0)
        val key = part.schema.fieldNames
          .map(f => s"$f=${part.getAs[Any](f)}").mkString("/")
        PartitionMeta(key, s"$fq [$key]", r.getLong(1), r.getLong(3),
          lineage = s"iceberg snapshot ${currentSnapshotId()}")
      }

  override def read(spark: SparkSession): DataFrame = spark.table(fq)

  override def dropPartitions(pred: PartitionMeta => Boolean): Long = {
    currentPartitions().filter(pred)
      .foreach(p => spark.sql(s"DELETE FROM $fq WHERE ${partitionKeySql(p.key)}"))
    currentSnapshotId()
  }

  override def expireSnapshots(keepLast: Int): Int = {
    val before = spark.sql(s"SELECT count(*) FROM $fq.snapshots")
      .head().getLong(0)
    spark.sql(
      s"CALL $catalog.system.expire_snapshots(table => '$table', " +
        s"retain_last => $keepLast)")
    val after = spark.sql(s"SELECT count(*) FROM $fq.snapshots")
      .head().getLong(0)
    (before - after).toInt
  }

  private def currentSnapshotId(): Long =
    spark.sql(s"SELECT snapshot_id FROM $fq.snapshots ORDER BY committed_at DESC LIMIT 1")
      .collect().headOption.map(_.getLong(0)).getOrElse(-1L)
}
