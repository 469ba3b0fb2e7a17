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
  *  - commit(added, removed)  -> ONE `writeTo(table).overwrite(cond)`
  *    (Iceberg REPLACE WHERE) where `cond` covers exactly the REMOVED
  *    keys: removed partitions are deleted, the union of all staged
  *    Parquet dirs is inserted (added keys not in `removed` APPEND
  *    alongside existing rows — ManifestTableLayer parity), all in a
  *    SINGLE Iceberg snapshot. Iceberg's optimistic-commit protocol
  *    supplies the atomic CURRENT swap the manifest layer does with
  *    ATOMIC_MOVE; a concurrent reader sees the whole commit or none.
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
    if (added.isEmpty && removedKeys.isEmpty) return currentSnapshotId()
    // ManifestTableLayer parity: only keys in `removedKeys` are replaced;
    // an added key NOT in removedKeys appends alongside existing rows
    val cond =
      if (removedKeys.isEmpty) "false"
      else removedKeys.map(k => s"(${partitionKeySql(k)})").mkString(" OR ")
    if (added.isEmpty) {
      // removals only: one DELETE with the OR'd predicate — one snapshot
      spark.sql(s"DELETE FROM $fq WHERE $cond")
    } else {
      val staged = added.map { pm =>
        val df = spark.read.parquet(pm.path)
        pm.key.split("/").foldLeft(df) { (d, kv) =>
          val Array(k, v) = kv.split("=", 2)
          if (d.columns.contains(k)) d
          else d.withColumn(k, org.apache.spark.sql.functions.lit(v))
        }
      }.reduce(_ unionByName _)
      // delete-of-removed + replace-of-added in ONE atomic snapshot
      staged.writeTo(fq).overwrite(org.apache.spark.sql.functions.expr(cond))
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
