package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.SparkSpec

/** MP4 (ISO-BMFF) and Matroska (EBML) metadata demux over in-test
  * synthesized containers — the same verification discipline as the
  * AVI/WAV decoders: spec-conformant fixtures built byte-by-byte here
  * (public layouts: ISO/IEC 14496-12 boxes, the EBML/Matroska element
  * ids), truncation and adversarial-byte cases, and a byte-fuzz pass that
  * proves the parsers are total.
  */
class ContainerMetaSpec extends SparkSpec {

  // ------------------------------------------------------- MP4 builders

  private def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Long) = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** The 64-bit-size form: u32 size = 1, then the real size after the
    * type. Valid for any box; muxers use it for >4 GiB mdat.
    */
  private def bigBox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ typ.getBytes("ISO-8859-1") ++ be64(16L + payload.length) ++
      payload

  private def ftyp(brand: String = "isom") =
    box("ftyp", brand.getBytes ++ be32(0) ++ "mp41".getBytes)

  private def mvhdV0(timescale: Long, duration: Long) =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++                // creation, modification
      be32(timescale) ++ be32(duration) ++
      new Array[Byte](80))                 // rate..matrix..next_track_ID

  private def mvhdV1(timescale: Long, duration: Long) =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration) ++
      new Array[Byte](80))

  private def hdlr(handler: String) =
    box("hdlr", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
      handler.getBytes("ISO-8859-1") ++ new Array[Byte](12) ++
      "x\u0000".getBytes)

  /** stsd with ONE sample entry. Video entries get the VisualSampleEntry
    * layout (dims at entry +32/+34); audio entries a minimal opaque body.
    */
  private def stsd(format: String, w: Int = 0, h: Int = 0) = {
    val entryBody =
      if (w > 0)
        new Array[Byte](8) ++     // reserved[6] + data_reference_index
          new Array[Byte](16) ++  // pre_defined/reserved
          be16(w) ++ be16(h) ++
          new Array[Byte](46)     // resolution..depth..pre_defined
      else new Array[Byte](20)
    val entry = box(format, entryBody)
    box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++ entry)
  }

  private def trak(handler: String, format: String, w: Int = 0, h: Int = 0) =
    box("trak", box("mdia",
      hdlr(handler) ++ box("minf", box("stbl", stsd(format, w, h)))))

  private def mp4(boxes: Array[Byte]*): Array[Byte] =
    boxes.foldLeft(Array.empty[Byte])(_ ++ _)

  private def fullMp4 = mp4(
    ftyp("isom"),
    box("moov", mvhdV0(1000, 10000) ++
      trak("vide", "avc1", 640, 360) ++ trak("soun", "mp4a")),
    box("mdat", new Array[Byte](64)))

  // ------------------------------------------------------ EBML builders

  /** Encode an EBML SIZE vint in `len` bytes (marker in the first byte). */
  private def vintSize(v: Long, len: Int): Array[Byte] = {
    val marked = v | (1L << (7 * len))
    (1 to len).map(i => ((marked >> (8 * (len - i))) & 0xFF).toByte).toArray
  }

  /** Element ids are written verbatim (they carry their own marker). */
  private def ebmlId(id: Long): Array[Byte] = {
    val n = if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2
      else if (id <= 0xFFFFFF) 3 else 4
    (1 to n).map(i => ((id >> (8 * (n - i))) & 0xFF).toByte).toArray
  }

  private def el(id: Long, payload: Array[Byte], sizeLen: Int = 1)
      : Array[Byte] =
    ebmlId(id) ++ vintSize(payload.length, math.max(sizeLen,
      if (payload.length < 127) 1 else if (payload.length < 16383) 2
      else 3)) ++ payload

  private def uintEl(id: Long, v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var started = false
    for (i <- 7 to 0 by -1) {
      val b = ((v >> (8 * i)) & 0xFF).toInt
      if (b != 0 || started || i == 0) { out.write(b); started = true }
    }
    el(id, out.toByteArray)
  }

  private def floatEl(id: Long, v: Double): Array[Byte] =
    el(id, be64(java.lang.Double.doubleToLongBits(v)))

  private def strEl(id: Long, s: String): Array[Byte] =
    el(id, s.getBytes("ISO-8859-1"))

  private def mkvTrackEntry(kind: Int, codec: String,
      w: Int = 0, h: Int = 0): Array[Byte] = {
    val video =
      if (w > 0) el(0xE0L, uintEl(0xB0L, w) ++ uintEl(0xBAL, h))
      else Array.empty[Byte]
    el(0xAEL, uintEl(0x83L, kind) ++ strEl(0x86L, codec) ++ video)
  }

  private def mkv(docType: String, durationTicks: Double,
      scaleNs: Long = 1000000L, unknownSegmentSize: Boolean = false)
      : Array[Byte] = {
    val header = el(0x1A45DFA3L, strEl(0x4282L, docType))
    val info = el(0x1549A966L,
      uintEl(0x2AD7B1L, scaleNs) ++ floatEl(0x4489L, durationTicks))
    val tracks = el(0x1654AE6BL,
      mkvTrackEntry(1, "V_VP9", 1280, 720) ++ mkvTrackEntry(2, "A_OPUS"))
    val segBody = info ++ tracks
    val segment =
      if (unknownSegmentSize)
        ebmlId(0x18538067L) ++ Array(0xFF.toByte) ++ segBody
      else el(0x18538067L, segBody, sizeLen = 2)
    header ++ segment
  }

  // -------------------------------------------------------------- tests

  test("MP4: brand, duration, tracks, codecs, dimensions from real boxes") {
    val Some(m) = ContainerMeta.decodeMp4Meta(fullMp4)
    assert(m.brand === "isom")
    assert(m.durationS === Some(10.0)) // 10000 ticks at timescale 1000
    assert(m.trackCount === 2)
    assert(m.videoCodec === Some("avc1"))
    assert(m.audioCodec === Some("mp4a"))
    assert(m.width === Some(640) && m.height === Some(360))
  }

  test("MP4: version-1 mvhd (64-bit duration) parses identically") {
    val m = ContainerMeta.decodeMp4Meta(mp4(ftyp(),
      box("moov", mvhdV1(90000, 2700000)))).get
    assert(m.durationS === Some(30.0))
  }

  test("MP4: 64-bit largesize boxes and unknown duration handled") {
    // moov wrapped in the largesize form must still be walked
    val m = ContainerMeta.decodeMp4Meta(mp4(ftyp(),
      bigBox("moov", mvhdV0(1000, 5000) ++ trak("vide", "hvc1", 320, 240))))
    assert(m.get.durationS === Some(5.0) && m.get.videoCodec === Some("hvc1"))
    // all-ones duration (fragmented mp4 convention) must read as unknown
    val frag = ContainerMeta.decodeMp4Meta(mp4(ftyp(),
      box("moov", mvhdV0(1000, 0xFFFFFFFFL))))
    assert(frag.get.durationS === None)
  }

  test("MP4: truncated trailing moov keeps its complete children") {
    val whole = mp4(ftyp(), box("mdat", new Array[Byte](32)),
      box("moov", mvhdV0(1000, 7000) ++ trak("vide", "avc1", 640, 360) ++
        trak("soun", "mp4a")))
    // cut inside the SECOND trak: mvhd + first trak are complete
    val cut = whole.take(whole.length - 30)
    val m = ContainerMeta.decodeMp4Meta(cut).get
    assert(m.durationS === Some(7.0))
    assert(m.videoCodec === Some("avc1") && m.width === Some(640))
  }

  test("MP4: truncated 12-byte ftyp is tolerated by deliberate leniency") {
    // round-14 ADVICE: per ISO/IEC 14496-12 the minimum LEGAL ftyp is 16
    // bytes (major_brand AND minor_version), so a 12-byte ftyp is
    // MALFORMED — this test pins lenient parsing of that truncation (the
    // brand at +8 is intact; nothing the walk needs lives in the missing
    // minor_version), not a claim that 12 bytes is spec-legal
    val tinyFtyp = box("ftyp", "mp42".getBytes) // 8 + 4 = 12 bytes
    assert(tinyFtyp.length === 12)
    val m = ContainerMeta.decodeMp4Meta(mp4(tinyFtyp,
      box("moov", mvhdV0(1000, 3000) ++ trak("vide", "avc1", 320, 240)))).get
    assert(m.brand === "mp42")
    assert(m.durationS === Some(3.0) && m.width === Some(320))
    // an ftyp declaring LESS than 12 is still malformed → None
    assert(ContainerMeta.decodeMp4Meta(
      be32(8L) ++ "ftyp".getBytes ++ new Array[Byte](16)) === None)
  }

  test("MP4: non-MP4, bogus sizes, and nesting bombs return None/partial") {
    assert(ContainerMeta.decodeMp4Meta(Array.empty[Byte]) === None)
    assert(ContainerMeta.decodeMp4Meta("not an mp4 at all!!".getBytes) === None)
    // a box declaring a 2^62 largesize must not wrap any bounds check
    val evil = mp4(ftyp(), be32(1) ++ "moov".getBytes ++ be64(1L << 62))
    val m = ContainerMeta.decodeMp4Meta(evil)
    assert(m.isDefined && m.get.trackCount === 0) // walk ended clean
    // 100-deep moov-in-moov chain: depth cap, not StackOverflowError
    val bomb = mp4(ftyp(),
      (1 to 100).foldLeft(mvhdV0(1000, 1000))((b, _) => box("moov", b)))
    assert(ContainerMeta.decodeMp4Meta(bomb).isDefined)
  }

  test("Matroska: doctype, duration, tracks, codecs, dimensions") {
    val Some(m) = ContainerMeta.decodeMkvMeta(mkv("matroska", 42000.0))
    assert(m.docType === "matroska")
    assert(m.durationS.exists(d => math.abs(d - 42.0) < 1e-9))
    assert(m.trackCount === 2)
    assert(m.videoCodec === Some("V_VP9"))
    assert(m.audioCodec === Some("A_OPUS"))
    assert(m.width === Some(1280) && m.height === Some(720))
  }

  test("Matroska: non-default TimestampScale and webm doctype") {
    // 30000 ticks at 2ms/tick = 60 s
    val m = ContainerMeta.decodeMkvMeta(
      mkv("webm", 30000.0, scaleNs = 2000000L)).get
    assert(m.docType === "webm")
    assert(m.durationS.exists(d => math.abs(d - 60.0) < 1e-9))
  }

  test("Matroska: unknown-size Segment (live mux) parses to end of input") {
    val m = ContainerMeta.decodeMkvMeta(
      mkv("matroska", 1000.0, unknownSegmentSize = true)).get
    assert(m.durationS === Some(1.0) && m.trackCount === 2)
  }

  test("Matroska: truncated input keeps complete elements; junk is None") {
    val whole = mkv("matroska", 9000.0)
    val cut = whole.take(whole.length - 12) // cut inside the audio track
    val m = ContainerMeta.decodeMkvMeta(cut).get
    assert(m.durationS === Some(9.0))
    assert(m.videoCodec === Some("V_VP9"))
    assert(ContainerMeta.decodeMkvMeta("garbage".getBytes) === None)
    assert(ContainerMeta.decodeMkvMeta(fullMp4) === None)
    assert(ContainerMeta.decodeMp4Meta(whole) === None)
  }

  test("Matroska: zero-padded DocType, corrupt dims, +Inf duration hardened") {
    // RFC 8794 zero-padded strings: "webm\0\0" must classify as webm with
    // a clean brand, and a padded CodecID must not leak NULs
    val header = el(0x1A45DFA3L, strEl(0x4282L, "webm\u0000\u0000"))
    val padCodec = el(0xAEL, uintEl(0x83L, 1) ++
      strEl(0x86L, "V_VP9\u0000") ++
      // 5-byte PixelWidth > Int.MaxValue truncating to a plausible 1920,
      // and a negative-after-toInt PixelHeight: both must be None
      el(0xE0L, el(0xB0L, Array[Byte](0x01, 0x00, 0x00, 0x07, 0x80.toByte)) ++
        el(0xBAL, Array[Byte](0x80.toByte, 0, 0, 0))))
    val info = el(0x1549A966L,
      // +Inf 4-byte Duration: must read as unknown, not Some(Infinity)
      el(0x4489L, be32(0x7F800000L)))
    val seg = el(0x18538067L, info ++ el(0x1654AE6BL, padCodec), sizeLen = 2)
    val m = ContainerMeta.decodeMkvMeta(header ++ seg).get
    assert(m.docType === "webm")
    assert(m.videoCodec === Some("V_VP9"))
    assert(m.width === None && m.height === None)
    assert(m.durationS === None)
    val vm = ContainerMeta.decodeMeta(7L, header ++ seg)
    assert(vm.container === Some("webm") && vm.brand === Some("webm"))
  }

  test("fuzz: random, mutated, and truncated bytes never throw (both)") {
    val rnd = new scala.util.Random(1207)
    for (i <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(400)); rnd.nextBytes(b)
      if (i % 4 == 0 && b.length >= 8)
        be32(0x1A45DFA3L).copyToArray(b, 0) // EBML-magic-prefixed garbage
      if (i % 4 == 1 && b.length >= 12)
        "ftyp".getBytes.copyToArray(b, 4)   // ftyp-prefixed garbage
      ContainerMeta.decodeMp4Meta(b)
      ContainerMeta.decodeMkvMeta(b)
      ContainerMeta.decodeMeta(0L, b)
    }
    val valids = Seq(fullMp4, mkv("matroska", 5000.0))
    for (v <- valids; _ <- 0 until 100) {
      val m = v.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      ContainerMeta.decodeMp4Meta(m); ContainerMeta.decodeMkvMeta(m)
      val cut = v.take(rnd.nextInt(v.length))
      ContainerMeta.decodeMp4Meta(cut); ContainerMeta.decodeMkvMeta(cut)
    }
  }

  test("decodeContainerMeta stage: magic-byte dispatch, None discipline") {
    import spark.implicits._
    // a tiny RIFF('AVI ') with avih only — enough for the avi metadata row
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)
    def riffChunk(id: String, p: Array[Byte]): Array[Byte] =
      id.getBytes ++ le32(p.length) ++ p
    val avihP = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(320) ++ le32(200) ++
      new Array[Byte](16)
    val hdrl = riffChunk("LIST", "hdrl".getBytes ++ riffChunk("avih", avihP))
    val aviBody = "AVI ".getBytes ++ hdrl
    val avi = "RIFF".getBytes ++ le32(aviBody.length) ++ aviBody
    val rows = Seq(
      (1L, "video/mp4", fullMp4),
      (2L, "video/webm", mkv("webm", 8000.0)),
      (3L, "video/avi", avi),
      (4L, "video/mp4", "junk bytes".getBytes), // lying mime: None row
      (5L, "video/mp4", null))
    val out = ContainerMeta
      .decodeContainerMeta(rows.toDF("doc_id", "mime", "bytes"))
      .collect().sortBy(_.doc_id)
    assert(out(0).container === Some("mp4") && out(0).width === Some(640))
    assert(out(1).container === Some("webm") &&
      out(1).video_codec === Some("V_VP9"))
    assert(out(2).container === Some("avi") && out(2).width === Some(320))
    assert(out(3).container === None)
    assert(out(4).container === None)
  }
}
