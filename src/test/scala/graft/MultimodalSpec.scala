package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: binary-in/binary-out transforms keep their
  * deterministic contracts (a real codec swaps only the stub bodies).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = Seq(
    ("u1", Array.fill[Byte](2048)(7)),
    ("u2", Array.fill[Byte](513)(3)),
    ("u3", Array.fill[Byte](100)(1))
  ).toDF("url", "payload")

  test("extractFeatures emits one metadata row per payload, deterministic") {
    val a = Multimodal.extractFeatures(media, "url", "payload").collect()
    val b = Multimodal.extractFeatures(media, "url", "payload").collect()
    assert(a.sortBy(_.url).toSeq == b.sortBy(_.url).toSeq)
    assert(a.length == 3 && a.forall(m => m.width >= 64 && m.height >= 64))
  }

  test("resize respects the bounding box and shrinks payload bytes") {
    val out = Multimodal.resize(media, "url", "payload", maxW = 64, maxH = 64)
      .collect().map(r => r.url -> r).toMap
    assert(out.values.forall(r => r.width <= 64 && r.height <= 64))
    val orig = media.as[(String, Array[Byte])].collect().toMap
    assert(out.values.forall(r => r.payload.length <= orig(r.url).length))
  }

  test("frame sampling: strided fixed-size slices, bounded fan-out") {
    val frames = Multimodal.sampleFrames(media, "url", "payload",
      frameBytes = 256, stride = 2, maxFrames = 3).collect()
    val byUrl = frames.groupBy(_.url)
    assert(byUrl("u1").length == 3) // 8 slices, stride 2 -> 4, capped at 3
    assert(byUrl("u2").length == 1) // 2 slices, stride 2 -> 1
    assert(!byUrl.contains("u3"))   // payload smaller than one frame
    assert(frames.forall(_.payload.length == 256))
    assert(byUrl("u1").map(_.offset).sorted.toSeq == Seq(0L, 512L, 1024L))
  }
}
