package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.table.{ManifestTableLayer, PartitionMeta}
import graft.checkpoint.Checkpoint
import graft.retention.Retention
import java.nio.file.Files

class TableLayerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "mtl-test-").toString

  private def df(k: Int) = (1 to 10).map(i => (k, i)).toDF("k", "v")

  test("commit + read: snapshot sees exactly the committed partitions") {
    val t = new ManifestTableLayer(freshRoot())
    val m1 = ManifestTableLayer.writePartition(t, df(1), "tier=x/day=d1", "test")
    t.commit(Seq(m1), Seq.empty)
    val m2 = ManifestTableLayer.writePartition(t, df(2), "tier=x/day=d2", "test")
    t.commit(Seq(m2), Seq.empty)
    assert(t.read(spark).count() == 20)
    assert(t.currentPartitions().map(_.key).sorted ==
      Seq("tier=x/day=d1", "tier=x/day=d2"))
    assert(t.currentPartitions().forall(p => p.rows == 10 && p.bytes > 0))
  }

  test("dropPartitions is a logical drop; data returns on no snapshot change") {
    val t = new ManifestTableLayer(freshRoot())
    Seq("d1", "d2", "d3").foreach { d =>
      val m = ManifestTableLayer.writePartition(t, df(1), s"tier=x/day=$d", "test")
      t.commit(Seq(m), Seq.empty)
    }
    t.dropPartitions(_.key.endsWith("d1"))
    assert(t.currentPartitions().map(_.key).sorted ==
      Seq("tier=x/day=d2", "tier=x/day=d3"))
    assert(t.read(spark).count() == 20)
    // physical file still on disk until expire (time travel window)
    assert(Files.exists(t.dataDir("tier=x/day=d1")))
  }

  test("expireSnapshots physically deletes unreferenced partitions only") {
    val t = new ManifestTableLayer(freshRoot())
    Seq("d1", "d2").foreach { d =>
      val m = ManifestTableLayer.writePartition(t, df(1), s"tier=x/day=$d", "test")
      t.commit(Seq(m), Seq.empty)
    }
    t.dropPartitions(_.key.endsWith("d1"))
    val deleted = t.expireSnapshots(keepLast = 1)
    assert(deleted == 1)
    assert(!Files.exists(t.dataDir("tier=x/day=d1")))
    assert(Files.exists(t.dataDir("tier=x/day=d2")))
    assert(t.read(spark).count() == 10)
  }

  test("retention sweep drops only the raw tier below the cutoff") {
    val t = new ManifestTableLayer(freshRoot())
    for (tier <- Seq("15min", "1d"); d <- Seq("2024-01-01", "2024-01-05")) {
      val m = ManifestTableLayer.writePartition(t, df(1), s"tier=$tier/day=$d", "test")
      t.commit(Seq(m), Seq.empty)
    }
    Retention.sweep(t, "15min", "2024-01-04")
    assert(t.currentPartitions().map(_.key).sorted == Seq(
      "tier=15min/day=2024-01-05",
      "tier=1d/day=2024-01-01", "tier=1d/day=2024-01-05"))
  }

  test("checkpoint resume: crash mid-stage, rerun, result equals single run") {
    val rootA = freshRoot()
    val rootB = freshRoot()
    def units = (1 to 6).map(i => s"p=$i" -> (() => df(i)))
    // run A: crash after 3 commits, then resume
    val tA = new ManifestTableLayer(rootA)
    intercept[Checkpoint.InjectedCrash] {
      Checkpoint.runResumable(tA, units, "test", failAfter = 3)
    }
    assert(tA.currentPartitions().size == 3)
    val resumed = Checkpoint.runResumable(tA, units, "test")
    assert(resumed.size == 3) // only the remaining units ran
    // run B: single uninterrupted run
    val tB = new ManifestTableLayer(rootB)
    Checkpoint.runResumable(tB, units, "test")
    val a = tA.read(spark).orderBy("k", "v").collect().toSeq
    val b = tB.read(spark).orderBy("k", "v").collect().toSeq
    assert(a == b)
    assert(tA.currentPartitions().map(_.key).toSet ==
      tB.currentPartitions().map(_.key).toSet)
  }
}
