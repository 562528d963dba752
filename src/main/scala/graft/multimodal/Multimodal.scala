package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a batch feature-extraction stage.
  *
  * The Spark-side shape is real — schema, partitioning, per-partition batch
  * iteration (the Scala analogue of `mapInPandas`: `mapPartitions` over a
  * typed `Dataset`, one decoder instantiation per partition, streaming
  * through rows without materializing the partition). This module's codec
  * is a deterministic byte-level stand-in (entropy, histogram mode,
  * strided samples); [[MediaDecode]] carries the REAL decoders the JDK can
  * host — ImageIO images (dims/luma/thumbnail/dHash + banded near-dup),
  * WAV PCM audio (rate/duration/RMS/peak), and AVI/MJPEG video (RIFF
  * demux → evenly-spaced frame sampling → per-frame dHash/luma), plus
  * [[ContainerMeta]]'s real MP4/Matroska metadata demux (duration, tracks,
  * codecs, dimensions from the moov box tree / EBML elements). Only
  * non-AVI FRAME content (MP4/Matroska — no H.264/VP9 decoder in the JDK)
  * remains represented by the strided-byte stand-in here.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, bytes: Array[Byte])

  // Feature fields are Options: a NULL bytes cell (nullable binary columns
  // come straight from parquet) — or, with a real codec, a failed decode —
  // yields None features rather than killing the job, matching the columnar
  // twin's NULL-propagating expression semantics.
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Option[Int],
      entropy: Option[Double],
      mode_byte: Option[Int],
      // Strided byte sample — the "frame sample" stand-in (every n-th byte,
      // up to 16), as a fixed-shape feature vector.
      sample: Option[Array[Byte]])

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
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Double, Int, Array[Byte]) = {
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

  /** Batch feature extraction: one pass per partition, streaming. This is
    * the path for a REAL codec — a JNI/native decoder with expensive
    * per-process init is instantiated once per partition here, which no
    * per-row expression can express. For pure byte-level features prefer
    * [[extractFeaturesColumnar]], which stays inside whole-stage codegen.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        if (r.bytes == null) // NULL media cell → NULL features (twin parity)
          MediaFeatures(r.doc_id, None, None, None, None)
        else {
          val (entropy, mode, sample) = decodeStub(r.bytes)
          MediaFeatures(r.doc_id, Some(r.bytes.length), Some(entropy),
            Some(mode), Some(sample))
        }
      }
    }
  }

  /** Columnar twin of [[extractFeatures]]: the same features as a native
    * codegen'd Catalyst expression over the binary column — no
    * row→case-class deserialization, no codegen boundary, one tight loop
    * per row inside the WholeStageCodegen span (the Scala-side analogue of
    * handing batches to a vectorized UDF). Bit-identical output to the
    * mapPartitions path (asserted in MultimodalSpec); use it whenever the
    * "decode" is a pure byte-level function.
    */
  def extractFeaturesColumnar(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"),
        Bridge.column(MediaByteFeatures(Bridge.expression(col("bytes")))).as("f"))
      .select(col("doc_id"), col("f.n_bytes"), col("f.entropy"),
        col("f.mode_byte"), col("f.sample"))
}

/** `media_byte_features(bytes)`: one-pass byte histogram → struct(n_bytes,
  * entropy, mode_byte, sample). Shares the exact kernel with the
  * mapPartitions path so the two stay bit-identical.
  */
case class MediaByteFeatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaByteFeatures.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_byte_features"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_byte_features expects binary, got $other")
    }

  override def nullSafeEval(b: Any): Any =
    MediaByteFeatures.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.multimodal.MediaByteFeatures.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaByteFeatures =
    copy(child = newChild)
}

object MediaByteFeatures {
  val schema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("mode_byte", IntegerType, nullable = false),
    StructField("sample", BinaryType, nullable = false)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val (entropy, mode, sample) = Multimodal.decodeStub(bytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bytes.length, entropy, mode, sample))
  }
}
