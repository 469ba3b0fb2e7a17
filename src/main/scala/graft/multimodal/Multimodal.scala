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
}
