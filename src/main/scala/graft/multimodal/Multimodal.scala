package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a batch feature-extraction stage.
  *
  * The Spark-side shape is real — schema, partitioning, per-partition batch
  * iteration (the Scala analogue of `mapInPandas`: `mapPartitions` over a
  * typed `Dataset`, one decoder instantiation per partition, streaming
  * through rows without materializing the partition). The codec itself is a
  * clearly-marked deterministic stand-in (this container ships no
  * image/audio libraries): "decoding" computes byte-level features
  * (entropy, histogram mode, strided samples) that stand where pixel/PCM
  * features would.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, bytes: Array[Byte])

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      entropy: Double,
      mode_byte: Int,
      // Strided byte sample — the "frame sample" stand-in (every n-th byte,
      // up to 16), as a fixed-shape feature vector.
      sample: Array[Byte])

  /** Wrap a text table as a media table: opaque bytes + typed metadata.
    * In production the binary column would come straight from parquet.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** STUB DECODER — stands in for image/audio decode. Deterministic pure
    * function of the bytes; replace with a real codec binding when one is
    * available. Kept per-partition so a real (expensive-to-init) decoder
    * would be instantiated once per partition, not per row.
    */
  private def decodeStub(bytes: Array[Byte]): (Double, Int, Array[Byte]) = {
    val histo = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { histo(bytes(i) & 0xff) += 1; i += 1 }
    var entropy = 0.0
    var mode    = 0
    var j = 0
    while (j < 256) {
      if (histo(j) > histo(mode)) mode = j
      if (histo(j) > 0) {
        val p = histo(j).toDouble / bytes.length
        entropy -= p * math.log(p)
      }
      j += 1
    }
    val stride = math.max(1, bytes.length / 16)
    val sample = Array.tabulate(math.min(16, bytes.length))(k => bytes(k * stride))
    (entropy, mode, sample)
  }

  /** Batch feature extraction: one pass per partition, streaming. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (entropy, mode, sample) = decodeStub(r.bytes)
        MediaFeatures(r.doc_id, r.bytes.length, entropy, mode, sample)
      }
    }
  }
}
