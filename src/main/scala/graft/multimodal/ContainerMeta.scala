package graft.multimodal

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM container-METADATA demux for the two crawled-video containers
  * the AVI work left as byte-level stand-ins: MP4 (ISO-BMFF,
  * ISO/IEC 14496-12 box layout) and Matroska/WebM (EBML). Frame DECODE for
  * these stays out of scope — the JDK ships no H.264/VP9 codec — but the
  * container headers are public byte layouts, the same discipline as
  * [[MediaDecode.demuxAvi]] / `decodeWav` / `graft.sources.SqliteIO`:
  *
  *   - **MP4**: walk the box tree (`u32 size | 'fourcc' type`, size 1 →
  *     64-bit largesize, size 0 → to end of enclosing box). `ftyp` gives
  *     the major brand; `moov/mvhd` the presentation timescale + duration;
  *     each `moov/trak` contributes `mdia/hdlr` (handler: 'vide'/'soun')
  *     and `mdia/minf/stbl/stsd` (first sample-entry fourcc = codec, and
  *     the VisualSampleEntry's u16 width/height at entry offset +32/+34).
  *   - **Matroska**: EBML variable-length ints (leading-zero count = byte
  *     length; IDs keep the marker bit, sizes clear it, all-ones size =
  *     "unknown", accepted for Segment only — live-mux files carry it).
  *     `EBML/DocType` distinguishes matroska from webm; `Segment/Info`
  *     carries TimestampScale (ns, default 1e6) + Duration (float, in
  *     scale ticks); `Segment/Tracks/TrackEntry` carries TrackType
  *     (1=video, 2=audio), CodecID, and `Video/PixelWidth,PixelHeight`.
  *
  * Both parsers follow the demuxAvi hardening rules: Long arithmetic for
  * every size (a declared size near 2^63 must not wrap a bounds check),
  * depth-capped recursion (a crafted moov-in-moov chain must exhaust the
  * cap, not the stack), truncation-tolerant (a partial download keeps the
  * metadata that is present — crawled media is routinely cut mid-`mdat`),
  * and `NonFatal → None` so corrupt bytes are a None row, never a killed
  * executor. Scale shape: [[decodeContainerMeta]] is the same
  * per-partition streaming stage as [[MediaDecode.decodeVideos]].
  */
object ContainerMeta {

  /** One row per media doc: which container the bytes are, and the
    * header-level facts a crawl-curation pipeline filters on (duration,
    * track inventory, codec ids, declared dimensions). None container =
    * not a recognized MP4/Matroska/AVI byte layout.
    */
  case class VideoMeta(
      doc_id: Long,
      container: Option[String],   // "mp4" | "matroska" | "webm" | "avi"
      brand: Option[String],       // ftyp major brand / EBML DocType
      duration_s: Option[Double],
      track_count: Option[Int],
      video_codec: Option[String],
      audio_codec: Option[String],
      width: Option[Int],
      height: Option[Int])

  // ================================================== shared byte readers

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def beU64(b: Array[Byte], o: Int): Long =
    (beU32(b, o) << 32) | beU32(b, o + 4)

  private def beU16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  // ============================================================ MP4 boxes

  private[multimodal] case class Mp4Meta(
      brand: String, durationS: Option[Double], trackCount: Int,
      videoCodec: Option[String], audioCodec: Option[String],
      width: Option[Int], height: Option[Int])

  /** ISO-BMFF metadata walk, or None (not an MP4 / malformed past repair).
    * Requires `ftyp` as the first box — every muxer emits it first and it
    * is the cheapest non-MP4 rejection. A final box truncated by a partial
    * download is still WALKED over the available region when it is a
    * container (a cut-off trailing `moov` keeps its complete children);
    * leaf handlers bounds-check every field read, so a truncated leaf is
    * skipped, not a throw.
    */
  private[graft] def decodeMp4Meta(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      if (bytes == null || bytes.length < 16) return None
      // DELIBERATE LENIENCY, not spec compliance (round-14 ADVICE): per
      // ISO/IEC 14496-12 §4.3 FileTypeBox carries major_brand AND
      // minor_version, so the minimum LEGAL ftyp is 16 bytes. A 12-byte
      // ftyp (header + major_brand, minor_version truncated away) is
      // malformed, but the brand at +8 is intact and everything this
      // walk reads lives in later boxes — so we tolerate the truncation
      // and resume at the declared end rather than classify the whole
      // file as a None row. The length >= 16 fast-reject above is about
      // the DISPATCH read, not this box: any real MP4 carries at least
      // one more box after ftyp.
      if (beU32(bytes, 0) < 12 || fourcc(bytes, 4) != "ftyp") return None
      val brand = fourcc(bytes, 8)
      var durationS: Option[Double] = None
      var trackCount = 0
      var videoCodec: Option[String] = None
      var audioCodec: Option[String] = None
      var width: Option[Int] = None
      var height: Option[Int] = None

      // walk the child boxes of [from, until); `handle` sees
      // (type, payloadFrom, payloadEnd). Long offsets throughout: a bogus
      // largesize near 2^63 must fail the `end > until` check, not wrap it.
      def boxes(from: Long, until: Long, depth: Int)(
          handle: (String, Long, Long) => Unit): Unit = {
        if (depth > 8) return
        var off = from
        while (off + 8 <= until) {
          val sz32 = beU32(bytes, off.toInt)
          val typ = fourcc(bytes, off.toInt + 4)
          var hdr = 8L
          val size =
            if (sz32 == 1) {
              if (off + 16 > until) return // truncated largesize header
              hdr = 16L
              val s = beU64(bytes, off.toInt + 8)
              if (s < 0) return // 2^63+ declared size: malformed
              s
            } else if (sz32 == 0) until - off // "to end of enclosing box"
            else sz32
          if (size < hdr) return // box smaller than its own header
          val end = off + size
          if (end > until) {
            // truncated FINAL box (partial download): walk what's there
            handle(typ, off + hdr, until)
            return
          }
          handle(typ, off + hdr, end)
          off = end
        }
      }

      // one trak's facts, associated after its subtree is walked
      def walkTrak(from: Long, until: Long): Unit = {
        var handler = ""
        var codec: Option[String] = None
        var tw: Option[Int] = None
        var th: Option[Int] = None
        def walk(parent: String, from: Long, until: Long, depth: Int): Unit =
          boxes(from, until, depth) { (typ, p, e) =>
            (parent, typ) match {
              case ("trak", "mdia") | ("mdia", "minf") | ("minf", "stbl") =>
                walk(typ, p, e, depth + 1)
              case ("mdia", "hdlr") if p + 12 <= e =>
                // FullBox(4) + pre_defined(4), handler_type at +8
                handler = fourcc(bytes, p.toInt + 8)
              case ("stbl", "stsd") if p + 16 <= e =>
                // FullBox(4) + entry_count(4), then the first sample entry:
                // size(4) + format fourcc(4)
                if (beU32(bytes, p.toInt + 4) >= 1) {
                  codec = Some(fourcc(bytes, p.toInt + 12))
                  // VisualSampleEntry: SampleEntry(16) + pre_defined/
                  // reserved(16), u16 width/height at entry +32/+34
                  val entrySz = beU32(bytes, p.toInt + 8)
                  if (entrySz >= 36 && p + 8 + 36 <= e) {
                    tw = Some(beU16(bytes, p.toInt + 8 + 32))
                    th = Some(beU16(bytes, p.toInt + 8 + 34))
                  }
                }
              case _ => ()
            }
          }
        walk("trak", from, until, 4)
        trackCount += 1
        handler match {
          case "vide" =>
            if (videoCodec.isEmpty) {
              videoCodec = codec
              // only a VIDEO sample entry's +32/+34 are dimensions
              if (width.isEmpty) { width = tw; height = th }
            }
          case "soun" => if (audioCodec.isEmpty) audioCodec = codec
          case _      => ()
        }
      }

      boxes(0L, bytes.length.toLong, 0) { (typ, p, e) =>
        if (typ == "moov") boxes(p, e, 1) { (t2, p2, e2) =>
          t2 match {
            case "mvhd" if p2 + 4 <= e2 =>
              val v = bytes(p2.toInt) & 0xFF
              // v0: timescale u32 @+12, duration u32 @+16;
              // v1: timescale u32 @+20, duration u64 @+24
              val (ts, dur) =
                if (v == 1 && p2 + 32 <= e2)
                  (beU32(bytes, p2.toInt + 20), beU64(bytes, p2.toInt + 24))
                else if (v == 0 && p2 + 20 <= e2)
                  (beU32(bytes, p2.toInt + 12), beU32(bytes, p2.toInt + 16))
                else (0L, 0L)
              // all-ones duration = "unknown" (fragmented MP4); 0 timescale
              // is malformed — both stay None rather than a fake number
              val unknown = dur == 0xFFFFFFFFL || dur < 0
              if (ts > 0 && dur > 0 && !unknown)
                durationS = Some(dur.toDouble / ts.toDouble)
            case "trak" => walkTrak(p2, e2)
            case _      => ()
          }
        }
      }
      Some(Mp4Meta(brand, durationS, trackCount, videoCodec, audioCodec,
        width, height))
    } catch { case NonFatal(_) => None }

  // ======================================================= Matroska/EBML

  private[multimodal] case class MkvMeta(
      docType: String, durationS: Option[Double], trackCount: Int,
      videoCodec: Option[String], audioCodec: Option[String],
      width: Option[Int], height: Option[Int])

  // element IDs (marker bit kept, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  /** Read one EBML vint at `off`: (value, byteLength), or null when
    * malformed/out of bounds. IDs keep the marker bit (`keepMarker`),
    * sizes clear it. An all-data-bits-ones SIZE is the EBML "unknown
    * size" sentinel, returned as -1.
    */
  private def vint(b: Array[Byte], off: Int, until: Int,
      keepMarker: Boolean): (Long, Int) = {
    if (off >= until) return null
    val first = b(off) & 0xFF
    if (first == 0) return null // >8-byte vint: outside EBML's ID/size range
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (off + len > until) return null
    var v: Long =
      if (keepMarker) first else first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xFF); i += 1 }
    if (!keepMarker && v == (1L << (7 * len)) - 1) (-1L, len) // unknown
    else (v, len)
  }

  private def ebmlUint(b: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until && i - from < 8) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  /** EBML string read. RFC 8794 allows string elements to be ZERO-PADDED
    * (libebml pads when rewriting a string into reserved space) — the
    * padding is not content, so strip trailing NULs; "webm\0\0" must
    * compare equal to "webm" and must not leak NUL bytes into the brand
    * column.
    */
  private def ebmlString(b: Array[Byte], from: Int, until: Int): String = {
    var end = until
    while (end > from && b(end - 1) == 0) end -= 1
    new String(b, from, end - from, "ISO-8859-1")
  }

  private def ebmlFloat(b: Array[Byte], from: Int, until: Int): Option[Double] =
    (until - from) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(beU32(b, from).toInt)
        .toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(beU64(b, from)))
      case _ => None // EBML floats are exactly 0/4/8 bytes; 0 = default
    }

  /** Matroska/WebM metadata walk, or None (not EBML / malformed). Only the
    * known container elements (Segment, Info, Tracks, TrackEntry, Video)
    * are descended into; everything else — Clusters above all, which hold
    * the undecodable frame data and dominate the file — is skipped by its
    * declared size. Unknown-size is accepted for Segment alone (live-mux
    * output carries it; its payload runs to end of input); anywhere else
    * it is malformed and ends that level's walk with what was parsed.
    */
  private[graft] def decodeMkvMeta(bytes: Array[Byte]): Option[MkvMeta] =
    try {
      if (bytes == null || bytes.length < 8) return None
      if (beU32(bytes, 0) != EbmlHeader) return None
      var docType = "matroska" // the EBML spec default when DocType absent
      var scaleNs = 1000000L   // TimestampScale default: 1 ms
      var durationTicks: Option[Double] = None
      var trackCount = 0
      var videoCodec: Option[String] = None
      var audioCodec: Option[String] = None
      var width: Option[Int] = None
      var height: Option[Int] = None

      def walk(from: Int, until: Int, depth: Int)(
          handle: (Long, Int, Int) => Unit): Unit = {
        if (depth > 8) return
        var off = from
        while (off < until) {
          val id = vint(bytes, off, until, keepMarker = true)
          if (id == null || id._1 == -1L) return
          val szAt = off + id._2
          val sz = vint(bytes, szAt, until, keepMarker = false)
          if (sz == null) return
          val p = szAt + sz._2
          val end =
            if (sz._1 == -1L) {
              // unknown size: Segment runs to end of input; anything else
              // is unparseable — keep what's been collected so far
              if (id._1 == Segment) until else return
            } else {
              val e = p.toLong + sz._1 // Long: a 2^56-scale declared size
              if (e > until) {
                // truncated final element (partial download): a container
                // keeps its complete children, a leaf is skipped by the
                // handler's own bounds
                handle(id._1, p, until)
                return
              }
              e.toInt
            }
          handle(id._1, p, end)
          off = end
        }
      }

      def walkTrackEntry(from: Int, until: Int): Unit = {
        var kind = 0L
        var codec: Option[String] = None
        var tw: Option[Int] = None
        var th: Option[Int] = None
        walk(from, until, 3) { (id, p, e) =>
          id match {
            case TrackType => kind = ebmlUint(bytes, p, e)
            case CodecId =>
              codec = Some(ebmlString(bytes, p, e))
            case VideoEl => walk(p, e, 4) { (id2, p2, e2) =>
              // range-check before the Long→Int narrowing: a corrupt
              // >32-bit dimension must be None, not a truncated
              // plausible-but-wrong (or negative) pixel count
              def dim: Option[Int] = ebmlUint(bytes, p2, e2) match {
                case v if v > 0 && v <= Int.MaxValue => Some(v.toInt)
                case _                               => None
              }
              id2 match {
                case PixelWidth  => tw = dim
                case PixelHeight => th = dim
                case _           => ()
              }
            }
            case _ => ()
          }
        }
        trackCount += 1
        kind match {
          case 1L =>
            if (videoCodec.isEmpty) {
              videoCodec = codec
              if (width.isEmpty) { width = tw; height = th }
            }
          case 2L => if (audioCodec.isEmpty) audioCodec = codec
          case _  => ()
        }
      }

      walk(0, bytes.length, 0) { (id, p, e) =>
        id match {
          case EbmlHeader => walk(p, e, 1) { (id2, p2, e2) =>
            if (id2 == DocType) docType = ebmlString(bytes, p2, e2)
          }
          case Segment => walk(p, e, 1) { (id2, p2, e2) =>
            id2 match {
              case Info => walk(p2, e2, 2) { (id3, p3, e3) =>
                id3 match {
                  case TimestampScale =>
                    val s = ebmlUint(bytes, p3, e3)
                    if (s > 0) scaleNs = s
                  case DurationId => durationTicks = ebmlFloat(bytes, p3, e3)
                  case _          => ()
                }
              }
              case Tracks => walk(p2, e2, 2) { (id3, p3, e3) =>
                if (id3 == TrackEntry) walkTrackEntry(p3, e3)
              }
              case _ => () // Cluster / SeekHead / Cues: skipped by size
            }
          }
          case _ => ()
        }
      }
      // isFinite, not just > 0: a corrupt float element decoding to +Inf
      // would otherwise poison any downstream duration aggregate
      val durationS = durationTicks.collect {
        case t if t > 0 && java.lang.Double.isFinite(t) =>
          t * scaleNs.toDouble / 1e9
      }
      Some(MkvMeta(docType, durationS, trackCount, videoCodec, audioCodec,
        width, height))
    } catch { case NonFatal(_) => None }

  // ===================================================== dispatch + stage

  /** Single-doc dispatch on the magic bytes (never the mime string — a
    * crawled mime lies freely): ftyp → MP4, EBML → matroska/webm, RIFF
    * AVI → the real [[MediaDecode.demuxAvi]] facts. None = none of the
    * three layouts.
    */
  private[graft] def decodeMeta(docId: Long, bytes: Array[Byte]): VideoMeta = {
    def empty = VideoMeta(docId, None, None, None, None, None, None, None,
      None)
    if (bytes == null || bytes.length < 12) empty
    else if (fourcc(bytes, 4) == "ftyp") decodeMp4Meta(bytes) match {
      case Some(m) => VideoMeta(docId, Some("mp4"), Some(m.brand),
        m.durationS, Some(m.trackCount), m.videoCodec, m.audioCodec,
        m.width, m.height)
      case None => empty
    }
    else if (beU32(bytes, 0) == EbmlHeader) decodeMkvMeta(bytes) match {
      case Some(m) =>
        val container = if (m.docType == "webm") "webm" else "matroska"
        VideoMeta(docId, Some(container), Some(m.docType), m.durationS,
          Some(m.trackCount), m.videoCodec, m.audioCodec, m.width, m.height)
      case None => empty
    }
    else MediaDecode.demuxAvi(bytes) match {
      case Some(a) =>
        val fps =
          if (a.microSecPerFrame > 0) 1.0e6 / a.microSecPerFrame else 0.0
        val dur = if (fps > 0) Some(a.frames.length / fps) else None
        VideoMeta(docId, Some("avi"), None, dur, None, None, None,
          Some(a.width), Some(a.height))
      case None => empty
    }
  }

  /** Batch container-metadata stage — the same per-partition streaming
    * shape as [[MediaDecode.decodeVideos]]: parser state per row, no
    * partition materialization, a None row (never a throw) for anything
    * that isn't one of the three container layouts. Header-only work per
    * row: the walk skips `mdat`/Cluster payloads by declared size, so the
    * cost is O(metadata), not O(bytes) — the property that makes a
    * metadata inventory over 100 TB of crawled video a cheap scan.
    */
  def decodeContainerMeta(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "mime", "bytes").as[Multimodal.MediaRow]
      .mapPartitions(rows => rows.map(r => decodeMeta(r.doc_id, r.bytes)))
  }
}
