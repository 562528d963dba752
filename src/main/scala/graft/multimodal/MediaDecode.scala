package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** REAL media decode with the JDK alone — upgrading [[Multimodal]]'s
  * documented byte-level stand-in for the two modalities the platform can
  * actually decode without external libraries:
  *
  *   - **Images**: `javax.imageio` ships PNG/JPEG/BMP/GIF/WBMP readers in
  *     every JDK (the same headless stack [[graft.etl.Charts]] already
  *     writes PNGs with). Decode → dimensions, mean luma, an 8×8 grayscale
  *     thumbnail (the "resize" stage), and a 64-bit **dHash** (gradient
  *     difference hash, the standard perceptual fingerprint: bit =
  *     left-pixel < right-pixel on a 9×8 gray downscale). dHash is
  *     brightness-shift INVARIANT (a constant offset preserves every
  *     gradient sign), which is what makes it a near-dup key rather than a
  *     checksum.
  *   - **Audio**: WAV/RIFF PCM is a public byte layout — parse fmt/data
  *     chunks directly → sample rate, channels, bit depth, frame count,
  *     duration, RMS and peak amplitude (the quality-filter features).
  *
  *   - **Video**: AVI (RIFF) is the same public chunk layout as WAV, and
  *     MJPEG payloads are plain JPEGs the ImageIO stack decodes — so
  *     AVI/MJPEG frame-sampling is a REAL demux + decode here (evenly
  *     spaced frames → per-frame dHash + luma). MP4/Matroska frame DECODE
  *     stays out of scope (no H.264/VP9 decoder in the JDK), but their
  *     container METADATA (duration, tracks, codec ids, dimensions) is
  *     really demuxed in [[ContainerMeta]];
  *     [[Multimodal.extractFeatures]]'s strided-byte sampling remains the
  *     documented stand-in for those containers' frame content only.
  *
  * Scale shape: decode runs per partition over the opaque binary column
  * ([[Multimodal]]'s `mapPartitions` discipline — decoder state per
  * partition, streaming, no partition materialization); a failed or
  * unsupported decode yields None features, never a killed job (corrupt
  * media WILL exist in 100 TB of crawled bytes). Image near-dup reuses the
  * q64 banding discipline: ONE shuffle on (band, key) over the dHash,
  * in-bucket pair expansion with the hot-bucket cap, per-pair Hamming
  * verify with no join back to the corpus.
  */
object MediaDecode {

  // ======================================================== image decode

  /** None fields = decode failed / null bytes. `thumb` is the 8×8 gray
    * resize (row-major bytes); `dhash` the 64-bit gradient hash.
    */
  case class ImageFeatures(
      doc_id: Long,
      width: Option[Int],
      height: Option[Int],
      mean_luma: Option[Double],
      dhash: Option[Long],
      thumb: Option[Array[Byte]])

  /** Decompression-bomb guard: a tiny file can DECLARE enormous dimensions
    * (pixel flood) and make a naive `ImageIO.read` allocate gigabytes —
    * an OutOfMemoryError no `NonFatal` catch survives. Dimensions are read
    * from the header alone (`ImageReader.getWidth/getHeight` parse
    * metadata, not pixels) and over-cap images return None before any
    * pixel allocation. 64 MPix ≈ a 256 MB ARGB raster — beyond any
    * legitimate crawled thumbnail-able image.
    */
  val maxPixels: Long = 64L * 1024 * 1024

  /** Header-checked decode, or None (no reader / over cap / corrupt).
    * Memory-cached input stream EXPLICITLY: the ImageIO factory defaults
    * to a disk-backed FileCacheImageInputStream (ImageIO.getUseCache),
    * which would write every already-in-memory image to an executor temp
    * file per decode in the per-partition hot loop — and fail outright on
    * a full or unwritable java.io.tmpdir.
    */
  private def readBounded(bytes: Array[Byte]): Option[BufferedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > maxPixels) None
        else Option(reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Gray downscale, deterministic for a given JDK (the fixed Graphics2D
    * bilinear pipeline). PROGRESSIVE halving first: a single bilinear step
    * from a large source point-samples it (bilinear reads only the 2×2
    * source pixels nearest each mapped point — a 4000×3000 photo would be
    * judged by ~288 of its 12M pixels, so mean_luma would not be a mean
    * and JPEG re-encode noise on the sampled pixels would flip dHash
    * gradient signs). Halving averages every pixel into the final
    * resample, restoring the documented copies-land-at-Hamming-0-2
    * robustness at crawl-scale image sizes.
    *
    * HASH VERSION BREAK: switching to progressive halving changed the
    * dHash (and mean_luma) values for any image ≥ ~4× the 9×8 target
    * versus the earlier single-step downscale. Persisted features from
    * before the switch — stored dHash columns, streaming near-dup bucket
    * state, any index keyed on the hash — will NOT match newly computed
    * hashes for such images and must be recomputed after deploying this
    * version; comparing old and new hashes silently reports false
    * non-duplicates. (Hashes for images already ≤ 2× the target are
    * unchanged: the halving loop never fires there.)
    */
  private def gray(img: BufferedImage, w: Int, h: Int): Array[Int] = {
    def step(src: BufferedImage, tw: Int, th: Int): BufferedImage = {
      val g  = new BufferedImage(tw, th, BufferedImage.TYPE_BYTE_GRAY)
      val gr = g.createGraphics()
      gr.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gr.drawImage(src, 0, 0, tw, th, null)
      gr.dispose()
      g
    }
    var cur = img
    while (cur.getWidth / 2 >= w * 2 && cur.getHeight / 2 >= h * 2)
      cur = step(cur, cur.getWidth / 2, cur.getHeight / 2)
    val g = step(cur, w, h)
    val r = g.getRaster
    Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0))
  }

  // dHash: 9×8 gray, bit (y*8+x) set when p[y][x] < p[y][x+1]
  private def dhashOf(img: BufferedImage): Long = {
    val d9 = gray(img, 9, 8)
    var dhash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (d9(y * 9 + x) < d9(y * 9 + x + 1))
          dhash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    dhash
  }

  /** Decode + fingerprint one image. Deterministic for a given JDK:
    * ImageIO's PNG path is exact (lossless), and the gray downscale is the
    * fixed bilinear Graphics2D pipeline (progressively halved, see
    * [[gray]]).
    */
  private[graft] def decodeImage(
      bytes: Array[Byte]): Option[(Int, Int, Double, Long, Array[Byte])] =
    try {
      readBounded(bytes).map { img =>
        val t8    = gray(img, 8, 8)
        val thumb = t8.map(_.toByte)
        val luma  = t8.sum.toDouble / 64.0
        (img.getWidth, img.getHeight, luma, dhashOf(img), thumb)
      }
    } catch { case NonFatal(_) => None } // corrupt/truncated media

  /** Hash-only decode for the streaming candidate path — skips the
    * thumbnail/luma render the stream would discard.
    */
  private[graft] def dhash64(bytes: Array[Byte]): Option[Long] =
    try readBounded(bytes).map(dhashOf)
    catch { case NonFatal(_) => None }

  /** Batch image decode: the [[Multimodal.extractFeatures]] stage with a
    * REAL codec in the per-partition slot.
    */
  def decodeImages(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val dec = Option(r.bytes).flatMap(decodeImage)
          dec match {
            case Some((w, h, luma, dh, thumb)) =>
              ImageFeatures(r.doc_id, Some(w), Some(h), Some(luma),
                Some(dh), Some(thumb))
            case None =>
              ImageFeatures(r.doc_id, None, None, None, None, None)
          }
        }
      }
  }

  /** Image near-dup candidate pairs over the dHash — the q64 simhash
    * discipline verbatim (16-bit bands, ONE (band,key) shuffle, hot-bucket
    * cap, per-pair `bit_count(xor)` verify with the hash riding in the
    * bucket struct). dHash's brightness invariance means re-encoded /
    * gamma-shifted copies of one crawled image land at Hamming 0-2.
    *
    * RECALL CONTRACT: the 4×16-bit banding is pigeonhole-COMPLETE only
    * for `maxHamming` ≤ 3 (≤3 flipped bits cannot touch all 4 bands). A
    * larger `maxHamming` still verifies every emitted pair's Hamming
    * bound, but candidate recall is PARTIAL — a pair differing in all
    * four bands is never generated (the standard LSH trade; the parity
    * specs pass 64 deliberately to expose the raw banded candidate set).
    * The banding expression is kept textually in sync with
    * `TextQueries.simhashPairsFrom` and the bucket-state projections in
    * `StreamingOps` — a band-width change must land in all three.
    */
  def imageNearDupPairs(feats: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val banded = feats
      .filter(col("dhash").isNotNull)
      .select(
        posexplode(array((0 to 3).map(j =>
          shiftright(col("dhash"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "key")),
        struct(col("doc_id"), col("dhash")).as("ds"))
    RelationalOps
      .inBucketPairs(banded, Seq("band", "key"), "ds", "a", "b", maxBucket)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ======================================================== audio decode

  /** None fields = not a decodable PCM WAV. */
  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Option[Int],
      channels: Option[Int],
      bits_per_sample: Option[Int],
      n_frames: Option[Long],
      duration_s: Option[Double],
      rms: Option[Double],
      peak: Option[Double])

  /** Parse a RIFF/WAVE file with integer PCM samples (format code 1, or
    * WAVE_FORMAT_EXTENSIBLE wrapping PCM): the byte layout is public
    * (chunked RIFF; fmt = code/channels/rate/block-align/bits; data =
    * little-endian frames). Samples normalize to [-1, 1] for RMS/peak.
    */
  private[multimodal] def decodeWav(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double, Double, Double)] =
    try {
      if (bytes.length < 44) return None
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
      def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def u32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      // chunk scan: fmt may precede or follow LIST/fact chunks
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // code, channels, rate, bits
      var data: Option[(Int, Int)] = None          // offset, length
      var truncated = false
      // for WAVE_FORMAT_EXTENSIBLE: the wrapped format tag (SubFormat GUID
      // bytes 0-1 at fmt offset 24) — float/A-law payloads must NOT be
      // misparsed as integer PCM
      var subFormat = 1
      while (!truncated && off + 8 <= bytes.length &&
          (fmt.isEmpty || data.isEmpty)) {
        val id   = ascii(off, 4)
        val size = u32(off + 4).toInt
        if (size < 0 || off + 8 + size > bytes.length) {
          // tolerate a FINAL data chunk truncated by a partial download —
          // but only with a well-formed NON-NEGATIVE declared size: a
          // negative size (e.g. 0xFFFFFFFF) is malformed, and treating it
          // as truncated data would compute RMS/peak over arbitrary tail
          // bytes instead of returning None. Either way the scan STOPS — a
          // negative size must also never move `off` backwards (crafted
          // bytes would loop the task forever).
          if (id == "data" && size >= 0 && off + 8 < bytes.length)
            data = Some((off + 8, bytes.length - off - 8))
          else return None
          truncated = true
        } else {
          id match {
            case "fmt " if size >= 16 =>
              // size >= 16 gate: the base fmt fields read up to off+24
              // (bits at +22); a malformed smaller chunk (e.g. size 4)
              // would otherwise read the NEXT chunk's bytes as
              // channels/rate/bits and yield garbage features instead of
              // None whenever those reads stay in-bounds
              val code = u16(off + 8)
              fmt = Some((code, u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
              if (code == 0xFFFE)
                subFormat = if (size >= 26) u16(off + 8 + 24) else 0
            case "fmt " => return None // declared fmt too small to hold PCM fields
            case "data" => data = Some((off + 8, size))
            case _      => () // LIST, fact, cue … skipped
          }
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      (fmt, data) match {
        case (Some((code, ch, rate, bits)), Some((dOff, dLen)))
            if (code == 1 || (code == 0xFFFE && subFormat == 1)) &&
              ch > 0 && rate > 0 &&
              (bits == 8 || bits == 16 || bits == 24 || bits == 32) =>
          val bytesPer = bits / 8
          val nSamples = dLen / bytesPer
          val nFrames  = nSamples.toLong / ch
          var sumSq = 0.0
          var peak  = 0.0
          var i = 0
          while (i < nSamples * bytesPer) {
            val v = bits match {
              case 8  => ((bytes(dOff + i) & 0xFF) - 128) / 128.0 // unsigned
              case 16 =>
                val s = (bytes(dOff + i) & 0xFF) | (bytes(dOff + i + 1) << 8)
                s / 32768.0
              case 24 =>
                val s = (bytes(dOff + i) & 0xFF) | ((bytes(dOff + i + 1) & 0xFF) << 8) |
                  (bytes(dOff + i + 2) << 16)
                s / 8388608.0
              case 32 =>
                val s = (bytes(dOff + i) & 0xFF) | ((bytes(dOff + i + 1) & 0xFF) << 8) |
                  ((bytes(dOff + i + 2) & 0xFF) << 16) | (bytes(dOff + i + 3) << 24)
                s / 2147483648.0
            }
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += bytesPer
          }
          val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
          Some((rate, ch, bits, nFrames, nFrames.toDouble / rate, rms, peak))
        case _ => None // compressed / float / malformed
      }
    } catch { case NonFatal(_) => None }

  /** Batch audio decode, same per-partition stage shape. */
  def decodeAudio(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          Option(r.bytes).flatMap(decodeWav) match {
            case Some((rate, ch, bits, frames, dur, rms, peak)) =>
              AudioFeatures(r.doc_id, Some(rate), Some(ch), Some(bits),
                Some(frames), Some(dur), Some(rms), Some(peak))
            case None =>
              AudioFeatures(r.doc_id, None, None, None, None, None, None, None)
          }
        }
      }
  }

  // ============================================== video decode (AVI/MJPEG)

  /** None fields = not a demuxable AVI. `frame_dhashes` aligns
    * index-for-index with the evenly-spaced sample positions; `mean_luma`
    * averages over the SAMPLED frames (the per-frame 8×8 gray mean, the
    * same statistic the image path reports per image).
    */
  case class VideoFeatures(
      doc_id: Long,
      width: Option[Int],
      height: Option[Int],
      n_frames: Option[Long],
      fps: Option[Double],
      duration_s: Option[Double],
      sampled_frames: Option[Int],
      frame_dhashes: Option[Array[Long]],
      mean_luma: Option[Double])

  /** Demuxed container facts + the frame chunk table (offset, length into
    * the original bytes — frames are NOT copied at demux time; only the
    * sampled ones are sliced for decode).
    */
  private[multimodal] case class AviInfo(
      width: Int, height: Int, microSecPerFrame: Long,
      frames: Vector[(Int, Int)])

  /** Walked-frame cap: a crafted movi list can declare millions of
    * zero-length chunks; the walk stops collecting past this bound.
    * Everything downstream — n_frames, duration, the sampling domain —
    * sees the CAPPED list, so a legitimate >100k-frame AVI (~66 min at
    * 25 fps) under-reports and anchors its last sample inside the cap;
    * the avih dwTotalFrames header is deliberately NOT used instead,
    * because truncated downloads and lying muxers make it the less
    * trustworthy count (the same reason idx1 is ignored), and the walked
    * list is what the decode can actually reach.
    */
  private val maxDemuxFrames = 100000

  /** Pure-JVM AVI (RIFF) demuxer — the container layout is public
    * (msdn AVI RIFF form: `RIFF('AVI ' LIST('hdrl' 'avih' …)
    * LIST('movi' '00dc'…))`). Walks the chunk tree directly, like
    * [[decodeWav]] walks WAVE:
    *
    *   - `avih` (main header, inside `LIST hdrl`) carries
    *     dwMicroSecPerFrame (+0) and dwWidth/dwHeight (+32/+36);
    *   - frame data lives in `LIST movi` as `##dc`/`##db` chunks (the
    *     2-digit prefix is the stream number); the VIDEO stream is the
    *     first `strh` declaring fccType 'vids' — crawled AVIs routinely
    *     put audio at stream 00, so hardcoding `00dc` would sample zero
    *     frames there (stream 0 remains the fallback when no strl
    *     headers exist). For MJPEG every video payload is a complete
    *     baseline JPEG, which the stock ImageIO reader decodes;
    *     interleave groups (`LIST rec `) are walked inline;
    *   - `idx1` is ignored — the movi walk IS the index, so a file with a
    *     missing or lying idx1 (common in truncated crawls) still demuxes;
    *   - a final chunk truncated by a partial download ends the walk with
    *     whatever frames were complete (the WAV truncation discipline);
    *     malformed sizes (negative, or a LIST smaller than its type tag)
    *     return None rather than walking arbitrary memory, and offsets
    *     only ever advance, so crafted bytes cannot loop the task.
    */
  private[multimodal] def demuxAvi(bytes: Array[Byte]): Option[AviInfo] =
    try {
      if (bytes.length < 12) return None
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      def u32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return None
      var width = 0; var height = 0; var usPerFrame = 0L
      var sawAvih = false
      // stream resolution: strh chunks appear in stream order inside
      // LIST('strl') lists; the first with fccType 'vids' is the video
      // stream. Crawled AVIs routinely interleave audio FIRST (stream 00
      // = '00wb' audio, '01dc' video), so assuming stream 0 would sample
      // zero frames there. Chunks are collected per-stream and filtered
      // after the walk (robust even to a pathological movi-before-hdrl
      // ordering).
      var strhSeen = 0
      var vidStream = -1
      val frames = Vector.newBuilder[(Int, Int, Int)] // (stream, off, len)
      var nFrames = 0
      // walk one chunk run [from, until); returns false on malformed
      // input. depth caps LIST nesting: a legit AVI needs 2 (top→movi→
      // rec), while a crafted hdrl-in-hdrl-in-hdrl chain would otherwise
      // recurse once per 12 bytes of input — StackOverflowError, which
      // NonFatal does NOT catch.
      def walk(from: Int, until: Int, inMovi: Boolean, depth: Int): Boolean = {
        if (depth > 8) return false
        var off = from
        while (off + 8 <= until) {
          val id = ascii(off, 4)
          val size = u32(off + 4)
          if (size > Int.MaxValue - 8) return false
          val sz = size.toInt
          // Long arithmetic: off + 8 + sz can exceed Int.MaxValue for a
          // bogus near-max declared size at a nonzero offset — an Int sum
          // wraps negative, `end > until` reads false, and the oversized
          // frame would be collected (bounds safety then hinging on the
          // NEXT iteration happening to throw).
          val endL = off.toLong + 8L + sz
          if (endL > until) {
            // truncated FINAL chunk (partial download). A truncated LIST
            // still gets its inside walked over the AVAILABLE region — a
            // cut-off movi list must keep its complete earlier frames; a
            // truncated plain chunk (a half JPEG decodes to garbage or
            // throws) is kept out. Either way the walk ends clean here.
            if (id == "LIST" && off + 12 <= until) {
              val listType = ascii(off + 8, 4)
              listType match {
                case "hdrl" => walk(off + 12, until, inMovi = false, depth + 1)
                case "movi" => walk(off + 12, until, inMovi = true, depth + 1)
                case "rec " if inMovi =>
                  walk(off + 12, until, inMovi = true, depth + 1)
                case _ => ()
              }
            }
            return true
          }
          val end = endL.toInt // endL <= until <= bytes.length: fits Int
          id match {
            case "LIST" if sz >= 4 =>
              val listType = ascii(off + 8, 4)
              val ok = listType match {
                case "hdrl" => walk(off + 12, end, inMovi = false, depth + 1)
                case "strl" => walk(off + 12, end, inMovi = false, depth + 1)
                case "movi" => walk(off + 12, end, inMovi = true, depth + 1)
                case "rec " if inMovi =>
                  walk(off + 12, end, inMovi = true, depth + 1)
                case _ => true // INFO etc. skipped
              }
              if (!ok) return false
            case "LIST" => return false // list too small to hold its type
            case "avih" if sz >= 40 =>
              usPerFrame = u32(off + 8)
              width = u32(off + 8 + 32).toInt
              height = u32(off + 8 + 36).toInt
              sawAvih = true
            case "strh" if sz >= 4 =>
              if (ascii(off + 8, 4) == "vids" && vidStream < 0)
                vidStream = strhSeen
              strhSeen += 1
            case d if inMovi && d.length == 4 &&
                d(0).isDigit && d(1).isDigit &&
                (d.endsWith("dc") || d.endsWith("db")) =>
              if (nFrames < maxDemuxFrames && sz > 0) {
                frames += (((d(0) - '0') * 10 + (d(1) - '0'), off + 8, sz))
                nFrames += 1
              }
            case _ => () // strf/idx1/JUNK/non-video stream chunk types
          }
          off = end + (sz & 1) // RIFF chunks are word-aligned
        }
        true
      }
      val riffEnd = math.min(bytes.length.toLong, 8L + u32(4)).toInt
      if (!walk(12, riffEnd, inMovi = false, depth = 0)) None
      else if (!sawAvih) None
      else {
        // no 'vids' strh (minimal writers omit strl): fall back to stream 0
        val vs = math.max(vidStream, 0)
        Some(AviInfo(width, height, usPerFrame,
          frames.result().collect { case (s, o, l) if s == vs => (o, l) }))
      }
    } catch { case NonFatal(_) => None }

  /** Demux + sample + decode: up to `maxSamples` evenly spaced frames
    * through the bounded ImageIO path ([[readBounded]] — the
    * decompression-bomb guard applies per frame), each contributing its
    * dHash; luma averages the per-frame 8×8 gray means. A frame that
    * fails to decode is skipped (crawled AVIs carry corrupt frames), so
    * `sampled_frames` counts DECODED frames, which can be < the sample
    * positions chosen. mean_luma is None (not 0.0) when NO sampled frame
    * decoded — zero evidence, not a black video.
    */
  private[graft] def decodeVideo(bytes: Array[Byte], maxSamples: Int = 8)
      : Option[(Int, Int, Long, Double, Double, Int, Array[Long],
          Option[Double])] =
    demuxAvi(bytes).map { info =>
      val n = info.frames.length
      val fps =
        if (info.microSecPerFrame > 0) 1.0e6 / info.microSecPerFrame else 0.0
      val duration = if (fps > 0) n / fps else 0.0
      val k = math.min(maxSamples, n)
      val picks =
        if (k == 0) Seq.empty[Int]
        // evenly spaced with both ends covered when k > 1 (first and last
        // frame anchor the sample — re-encoded copies match end to end)
        else if (k == 1) Seq(0)
        else (0 until k).map(i => ((n - 1).toLong * i / (k - 1)).toInt)
      val decoded = picks.flatMap { fi =>
        val (off, len) = info.frames(fi)
        // copyOfRange INSIDE the try: a frame entry with out-of-bounds
        // offsets must be a skipped frame like any other corrupt one,
        // not an exception escaping the per-frame guard
        try {
          val slice = java.util.Arrays.copyOfRange(bytes, off, off + len)
          readBounded(slice).map { img =>
            val t8 = gray(img, 8, 8)
            (dhashOf(img), t8.sum.toDouble / 64.0)
          }
        } catch { case NonFatal(_) => None }
      }
      // None, not 0.0, when nothing decoded: a zero-evidence video must be
      // distinguishable from a genuinely black one downstream
      val luma =
        if (decoded.isEmpty) None
        else Some(decoded.map(_._2).sum / decoded.length)
      (info.width, info.height, n.toLong, fps, duration,
        decoded.length, decoded.map(_._1).toArray, luma)
    }

  /** Batch video decode — the same per-partition stage shape as the image
    * and audio paths: demux state per row, streaming, None on any
    * non-AVI/corrupt input, never a killed job. Per-frame dHashes make a
    * video near-dup key directly: feed `explode(frame_dhashes)` rows into
    * [[imageNearDupPairs]]' banding to find re-encoded copies by any
    * shared sampled frame.
    */
  def decodeVideos(media: DataFrame): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[Multimodal.MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          Option(r.bytes).flatMap(decodeVideo(_)) match {
            case Some((w, h, n, fps, dur, k, hashes, luma)) =>
              VideoFeatures(r.doc_id, Some(w), Some(h), Some(n),
                Some(fps), Some(dur), Some(k), Some(hashes), luma)
            case None =>
              VideoFeatures(r.doc_id, None, None, None, None, None, None,
                None, None)
          }
        }
      }
  }
}
