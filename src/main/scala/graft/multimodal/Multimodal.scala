package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batched
  * partition-local passes.
  *
  * The Spark-side plumbing is real (binary schema, batch iteration,
  * deterministic output schema, partition locality); the DECODER ITSELF IS
  * A STUB — this container has no image/audio codecs, so `decodeStub`
  * derives deterministic fake features from the payload bytes. Swapping in
  * a real decoder (libjpeg/ffmpeg via JNI, or `mapInPandas` + PIL on a
  * PySpark cluster) changes only the function body, not the pipeline.
  */
object Multimodal {

  final case class MediaMeta(
      url: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      fmt: String
  )

  /** STUB decode: deterministic pseudo-features from byte length only, so
    * an oracle can reproduce them. A real build replaces the body with an
    * actual codec call; the batched mapPartitions shape (one decoder init
    * per partition, streaming over rows) is the part that matters at scale.
    */
  def decodeStub(url: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      url = url,
      n_bytes = n,
      width = (64 + n % 251).toInt,
      height = (64 + n % 241).toInt,
      fmt = (n % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      })
  }

  /** Feature-extract a (url, binary) table. mapPartitions so a real codec
    * would be initialized once per partition, not once per row.
    */
  def extractFeatures(media: DataFrame, urlCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(urlCol), col(binCol)).as[(String, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would go here (once per partition)
        it.map { case (url, bytes) => decodeStub(url, bytes) }
      }
  }

  final case class ResizedMedia(url: String, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB resize to a bounding box: real builds swap the body for a codec
    * scale call; the stub deterministically truncates/pads the payload to
    * the area ratio so output byte-lengths are oracle-reproducible. The
    * Spark shape is what matters: binary-in/binary-out, partition-local,
    * no driver round-trip.
    */
  def resize(media: DataFrame, urlCol: String, binCol: String,
      maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(urlCol), col(binCol)).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, bytes) =>
        val m = decodeStub(url, bytes)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
        val w = math.max(1, (m.width * scale).toInt)
        val h = math.max(1, (m.height * scale).toInt)
        val outLen = math.max(1, (bytes.length * scale * scale).toInt)
        ResizedMedia(url, w, h, java.util.Arrays.copyOf(bytes, outLen))
      })
  }

  final case class Frame(url: String, frame_idx: Int, offset: Long,
      payload: Array[Byte])

  /** STUB frame sampling for video-shaped payloads: emits every
    * `stride`-th fixed-size slice of the blob as a "frame" (flatMap —
    * 1:N row fan-out, the real shape of video decode). A real build
    * replaces slicing with an ffmpeg-style keyframe iterator; partition
    * locality, output schema, and the bounded `maxFrames` fan-out are the
    * scale-relevant parts.
    */
  def sampleFrames(media: DataFrame, urlCol: String, binCol: String,
      frameBytes: Int = 256, stride: Int = 4, maxFrames: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(urlCol), col(binCol)).as[(String, Array[Byte])]
      .flatMap { case (url, bytes) =>
        val nSlices = bytes.length / frameBytes
        (0 until nSlices by stride).take(maxFrames).zipWithIndex.map {
          case (slice, idx) =>
            val off = slice.toLong * frameBytes
            Frame(url, idx, off,
              java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + frameBytes))
        }
      }
  }
}
