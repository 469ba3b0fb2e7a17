package graft.checkpoint

import org.apache.spark.sql.DataFrame
import graft.table.{ManifestTableLayer, PartitionMeta}

/** Per-partition checkpointed execution (the engine analog of the
  * reference's per-source pickle cache — SURVEY.md §2.1 S4, and the north
  * rule's "resumable from per-partition checkpoints").
  *
  * A stage is a list of independent work units keyed by partition
  * ("tier=15min/day=2024-01-03"). Each unit is computed, written as an
  * immutable partition dir, and committed to the table manifest
  * INDIVIDUALLY — so a killed run resumes by skipping every key already in
  * the current snapshot. Partition metas carry rows/bytes/lineage, giving
  * the per-partition metrics emission for free.
  */
object Checkpoint {

  /** A simulated-crash hook for tests: fail after N successful commits. */
  final class InjectedCrash(val after: Int)
      extends RuntimeException(s"injected crash after $after partitions")

  /** Run all units not yet committed. Returns metas of newly committed
    * partitions. `failAfter >= 0` injects a crash (test hook).
    */
  def runResumable(
      table: ManifestTableLayer,
      units: Seq[(String, () => DataFrame)],
      lineage: String,
      failAfter: Int = -1
  ): Seq[PartitionMeta] = {
    val done = table.currentPartitions().map(_.key).toSet
    var committed = 0
    units.filterNot { case (k, _) => done.contains(k) }.map { case (key, compute) =>
      if (failAfter >= 0 && committed >= failAfter) throw new InjectedCrash(failAfter)
      val meta = ManifestTableLayer.writePartition(table, compute(), key, lineage)
      table.commit(Seq(meta), Seq.empty)
      committed += 1
      meta
    }
  }
}
