package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real JDK media decode: images (ImageIO), WAV PCM, dHash near-dup.
  * Fixtures are synthesized in-test with the same JDK encoders (PNG/JPEG
  * write, raw WAV bytes) — no external files.
  */
class MediaDecodeSpec extends SparkSpec {

  // ------------------------------------------------------------- fixtures

  /** Deterministic RGB test image: smooth horizontal gradient + a block. */
  private def testImage(w: Int, h: Int, shift: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = math.min(255, (x * 255) / w + shift)
      val v    = if (x > w / 2 && y > h / 2) math.min(255, base + 60) else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** 16-bit little-endian PCM WAV with a sine tone. */
  private def sineWav(rate: Int, channels: Int, seconds: Double,
      amplitude: Double, freq: Double = 440.0): Array[Byte] = {
    val frames   = (rate * seconds).toInt
    val dataLen  = frames * channels * 2
    val out      = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes); le32(36 + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(1); le16(channels); le32(rate)
    le32(rate * channels * 2); le16(channels * 2); le16(16)
    out.write("data".getBytes); le32(dataLen)
    for (i <- 0 until frames; _ <- 0 until channels) {
      val s = (amplitude * math.sin(2 * math.Pi * freq * i / rate) * 32767).toInt
      le16(s & 0xFFFF)
    }
    out.toByteArray
  }

  // --------------------------------------------------------------- images

  test("PNG decode: dimensions, luma, deterministic dhash") {
    val bytes = encode(testImage(64, 48), "png")
    val Some((w, h, luma, dhash, thumb)) = MediaDecode.decodeImage(bytes)
    assert(w === 64 && h === 48)
    assert(luma > 0 && luma < 255)
    assert(thumb.length === 64)
    // deterministic across calls and across re-encodes of the same pixels
    assert(MediaDecode.decodeImage(bytes).get._4 === dhash)
    assert(MediaDecode.decodeImage(encode(testImage(64, 48), "png")).get._4 === dhash)
  }

  test("dHash is brightness-shift invariant and discriminates content") {
    val base     = MediaDecode.decodeImage(encode(testImage(64, 64), "png")).get
    val brighter = MediaDecode.decodeImage(encode(testImage(64, 64, shift = 25), "png")).get
    // constant offset preserves every gradient sign (up to clipping at 255
    // in the saturated corner) → tiny Hamming distance
    val drift = java.lang.Long.bitCount(base._4 ^ brighter._4)
    assert(drift <= 6, s"brightness drift moved $drift dhash bits")
    // different content → far hash
    val noise = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val rnd   = new scala.util.Random(7)
    for (y <- 0 until 64; x <- 0 until 64)
      noise.setRGB(x, y, rnd.nextInt(1 << 24))
    val other = MediaDecode.decodeImage(encode(noise, "png")).get
    assert(java.lang.Long.bitCount(base._4 ^ other._4) > 10)
  }

  test("JPEG decodes (lossy) with near-identical dhash to its PNG source") {
    val img  = testImage(80, 60)
    val png  = MediaDecode.decodeImage(encode(img, "png")).get
    val jpeg = MediaDecode.decodeImage(encode(img, "jpg")).get
    assert(jpeg._1 === 80 && jpeg._2 === 60)
    // same content through a lossy codec → perceptual hash agrees
    assert(java.lang.Long.bitCount(png._4 ^ jpeg._4) <= 6)
  }

  test("corrupt, truncated and non-image bytes yield None, never throw") {
    assert(MediaDecode.decodeImage("not an image".getBytes) === None)
    assert(MediaDecode.decodeImage(Array[Byte]()) === None)
    val png = encode(testImage(32, 32), "png")
    assert(MediaDecode.decodeImage(png.take(20)) === None)
  }

  test("pixel-flood bomb is rejected from the header, before allocation") {
    // a tiny file DECLARING huge dimensions: craft a valid PNG IHDR with
    // width/height 60000×60000 by patching a real 8×8 PNG's header (fix
    // the IHDR CRC so the reader accepts the chunk)
    val png  = encode(testImage(8, 8), "png")
    val bomb = png.clone()
    def be32(off: Int, v: Int): Unit = {
      bomb(off) = (v >> 24).toByte; bomb(off + 1) = (v >> 16).toByte
      bomb(off + 2) = (v >> 8).toByte; bomb(off + 3) = v.toByte
    }
    be32(16, 60000); be32(20, 60000) // IHDR width, height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // "IHDR" + 13 data bytes
    be32(29, crc.getValue.toInt)
    // header parse alone must reject it — no multi-GB raster allocation
    assert(MediaDecode.decodeImage(bomb) === None)
    assert(MediaDecode.dhash64(bomb) === None)
  }

  test("dhash64 fast path equals the full decode's hash") {
    val bytes = encode(testImage(48, 48), "png")
    assert(MediaDecode.dhash64(bytes) ===
      MediaDecode.decodeImage(bytes).map(_._4))
  }

  test("decodeImages stage: per-partition decode, None rows for failures") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", encode(testImage(40, 30), "png")),
      (2L, "image/jpeg", encode(testImage(40, 30), "jpg")),
      (3L, "image/png", "garbage".getBytes),
      (4L, "image/png", null))
    val media = rows.toDF("doc_id", "mime", "bytes").repartition(3)
    val f = MediaDecode.decodeImages(media).collect().sortBy(_.doc_id)
    assert(f.map(_.doc_id).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(f(0).width === Some(40) && f(0).height === Some(30))
    assert(f(1).dhash.isDefined)
    assert(f(2) === MediaDecode.ImageFeatures(3L, None, None, None, None, None))
    assert(f(3).width === None)
  }

  test("imageNearDupPairs: banded dhash finds the re-encoded twin only") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", encode(testImage(64, 64), "png")),
      (2L, "image/jpeg", encode(testImage(64, 64), "jpg")), // same content, lossy twin
      (3L, "image/png", {
        val noise = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
        val rnd = new scala.util.Random(11)
        for (y <- 0 until 64; x <- 0 until 64) noise.setRGB(x, y, rnd.nextInt(1 << 24))
        encode(noise, "png")
      }),
      (4L, "image/png", "corrupt".getBytes)) // must not crash the pair stage
    val feats = MediaDecode.decodeImages(rows.toDF("doc_id", "mime", "bytes"))
      .toDF()
    val pairs = MediaDecode.imageNearDupPairs(feats, maxHamming = 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("streaming dHash candidates equal the batch banded pair set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val imgs = Seq(
      (1L, encode(testImage(64, 64), "png")),
      (2L, encode(testImage(64, 64), "jpg")), // lossy twin of 1
      (3L, {
        val noise = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
        val rnd = new scala.util.Random(11)
        for (y <- 0 until 64; x <- 0 until 64) noise.setRGB(x, y, rnd.nextInt(1 << 24))
        encode(noise, "png")
      }),
      (4L, "corrupt".getBytes))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val query = graft.streaming.StreamingOps.imageNeardupCandidates(
        input.toDF().toDF("doc_id", "bytes", "event_time"))
      .writeStream.format("memory").queryName("img_neardup")
      .outputMode("append").start()
    try {
      input.addData(imgs.map { case (id, b) => (id, b, ts(s"2023-01-01 10:0$id:00")) })
      query.processAllAvailable()
      val stream = spark.table("img_neardup")
        .select("doc_a", "doc_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // maxHamming = 64 disables the verify → the raw banded candidate set
      val batch = MediaDecode.imageNearDupPairs(
          MediaDecode.decodeImages(
            imgs.toDF("doc_id", "bytes").withColumn("mime", lit("image/*"))).toDF(),
          maxHamming = 64)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.contains((1L, 2L))) // sanity: the perceptual twin banded together
      assert(stream === batch)
    } finally query.stop()
  }

  // ---------------------------------------------------------------- audio

  test("WAV decode: rate, frames, duration, RMS ≈ A/√2, peak ≈ A") {
    val wav = sineWav(rate = 8000, channels = 1, seconds = 0.5, amplitude = 0.8)
    val Some((rate, ch, bits, frames, dur, rms, peak)) = MediaDecode.decodeWav(wav)
    assert(rate === 8000 && ch === 1 && bits === 16)
    assert(frames === 4000L)
    assert(math.abs(dur - 0.5) < 1e-9)
    assert(math.abs(rms - 0.8 / math.sqrt(2)) < 0.01, s"rms $rms")
    assert(math.abs(peak - 0.8) < 0.01, s"peak $peak")
  }

  test("stereo WAV: channels and per-frame accounting") {
    val wav = sineWav(rate = 16000, channels = 2, seconds = 0.25, amplitude = 0.5)
    val Some((rate, ch, _, frames, dur, _, _)) = MediaDecode.decodeWav(wav)
    assert(rate === 16000 && ch === 2)
    assert(frames === 4000L)
    assert(math.abs(dur - 0.25) < 1e-9)
  }

  test("silence has zero RMS; garbage and compressed formats yield None") {
    val silent = sineWav(8000, 1, 0.1, amplitude = 0.0)
    assert(MediaDecode.decodeWav(silent).get._6 === 0.0)
    assert(MediaDecode.decodeWav("RIFFxxxxWAVEnope".getBytes) === None)
    assert(MediaDecode.decodeWav(Array[Byte](1, 2, 3)) === None)
    // format code 85 (mp3-in-wav) must be rejected, not misparsed
    val mp3ish = sineWav(8000, 1, 0.1, 0.5)
    mp3ish(20) = 85 // fmt code low byte
    assert(MediaDecode.decodeWav(mp3ish) === None)
  }

  test("negative chunk size terminates the scan instead of spinning") {
    // "RIFF" len "WAVE" "data" size=-8 + one byte: a crafted negative size
    // must not move the scan backwards into an infinite loop (the task
    // would hang, which no exception handler can save)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(Array[Byte](16, 0, 0, 0))
    out.write("WAVE".getBytes)
    out.write("data".getBytes); out.write(Array[Byte](-8, -1, -1, -1))
    out.write(99)
    val decoded = MediaDecode.decodeWav(out.toByteArray) // must return
    assert(decoded === None) // data prefix recorded but no fmt chunk
  }

  test("a negative data-chunk size is malformed, not 'truncated final data'") {
    // a VALID fmt chunk followed by a data chunk declaring size 0xFFFFFFFF
    // (-1) and arbitrary tail bytes: the truncated-final-data tolerance is
    // for a partial download of a well-formed size — a negative size must
    // return None, not compute RMS/peak over the garbage tail
    val good = sineWav(8000, 1, 0.1, 0.5)
    val out = new ByteArrayOutputStream()
    out.write(good, 0, 36)                          // RIFF/WAVE + fmt chunk
    out.write("data".getBytes)
    out.write(Array[Byte](-1, -1, -1, -1))          // size = -1
    out.write(Array.fill[Byte](1000)(42))           // arbitrary tail
    assert(MediaDecode.decodeWav(out.toByteArray) === None)
    // a genuinely truncated download of the same file still decodes
    assert(MediaDecode.decodeWav(good.take(good.length - 100)).isDefined)
  }

  test("undersized fmt chunk is rejected, not parsed into the next chunk") {
    // fmt declares size 4 (only code+channels): the rate/bits fields live
    // at +12/+22, i.e. inside the FOLLOWING chunk — parsing them would
    // yield in-bounds garbage features instead of None
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(Array[Byte](60, 0, 0, 0))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(Array[Byte](4, 0, 0, 0))
    out.write(Array[Byte](1, 0, 1, 0))             // code=1 PCM, channels=1
    out.write("data".getBytes); out.write(Array[Byte](16, 0, 0, 0))
    // bytes that, misread as rate/bits, would look plausible (rate>0,
    // bits=16) — exactly the case the size gate must catch
    out.write(Array[Byte](0x40, 0x1F, 0, 0, 2, 0, 16, 0))
    out.write(new Array[Byte](8))
    assert(MediaDecode.decodeWav(out.toByteArray) === None)
  }

  test("extensible WAV wrapping IEEE float is rejected, PCM accepted") {
    // rewrite the fixture's fmt chunk as WAVE_FORMAT_EXTENSIBLE (code
    // 0xFFFE, cbSize 22, SubFormat tag in the GUID): float subformat (3)
    // must NOT be misparsed as integer PCM; PCM subformat (1) must parse
    def extensible(sub: Int): Array[Byte] = {
      val base = sineWav(8000, 1, 0.1, 0.5)
      val out  = new ByteArrayOutputStream()
      out.write(base, 0, 12)                       // RIFF/WAVE header
      out.write("fmt ".getBytes)
      out.write(Array[Byte](40, 0, 0, 0))          // fmt size 40
      // fmt body from the fixture: code, ch, rate, byteRate, blockAlign, bits
      val body = java.util.Arrays.copyOfRange(base, 20, 36)
      body(0) = 0xFE.toByte; body(1) = 0xFF.toByte // code 0xFFFE
      out.write(body)
      out.write(Array[Byte](22, 0))                // cbSize
      out.write(Array[Byte](16, 0))                // validBits
      out.write(Array[Byte](0, 0, 0, 0))           // channelMask
      out.write(Array[Byte](sub.toByte, 0))        // SubFormat tag
      out.write(new Array[Byte](14))               // GUID remainder
      out.write(base, 36, base.length - 36)        // data chunk
      out.toByteArray
    }
    assert(MediaDecode.decodeWav(extensible(3)) === None)
    val pcm = MediaDecode.decodeWav(extensible(1))
    assert(pcm.isDefined && pcm.get._1 === 8000)
  }

  test("truncated data chunk (partial download) still parses the prefix") {
    val wav  = sineWav(8000, 1, 0.5, 0.8)
    val cut  = wav.take(wav.length - 1000) // header intact, data short
    val dec  = MediaDecode.decodeWav(cut)
    assert(dec.isDefined)
    assert(dec.get._4 < 4000L && dec.get._4 > 3000L)
  }

  test("decodeAudio stage mirrors the image stage's None discipline") {
    import spark.implicits._
    val rows = Seq(
      (1L, "audio/wav", sineWav(8000, 1, 0.1, 0.5)),
      (2L, "audio/wav", "junk".getBytes),
      (3L, "audio/wav", null))
    val f = MediaDecode.decodeAudio(rows.toDF("doc_id", "mime", "bytes"))
      .collect().sortBy(_.doc_id)
    assert(f(0).sample_rate === Some(8000))
    assert(f(1).sample_rate === None)
    assert(f(2).sample_rate === None)
  }

  // ------------------------------------------------------ video (AVI/MJPEG)

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)

  private def riffChunk(id: String, p: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(p.length) ++ p ++
      (if ((p.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])

  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ body)

  /** Minimal spec-conformant AVI/MJPEG: RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' 00dc…) idx1), real ImageIO JPEG
    * payloads. `recGroups` wraps the frames in a LIST('rec ') interleave
    * group, as 1:1-interleaved writers emit.
    */
  /** `audioFirst` puts an 'auds' stream at index 0 (strl order + '00wb'
    * audio chunks interleaved in movi) and the video at index 1 ('01dc'),
    * the layout many muxers emit.
    */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Int = 40000, recGroups: Boolean = false,
      audioFirst: Boolean = false): Array[Byte] = {
    // avih (56 bytes): usPerFrame, maxBytesPerSec, padding, flags,
    // totalFrames(+16), initialFrames, streams, sugBufSize, width(+32),
    // height(+36), reserved[4]
    val nStreams = if (audioFirst) 2 else 1
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(nStreams) ++ le32(0) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16)
    val vidStrh = "vids".getBytes ++ "MJPG".getBytes ++ new Array[Byte](48)
    val audStrh = "auds".getBytes ++ new Array[Byte](4) ++ new Array[Byte](48)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ new Array[Byte](28)
    val vidStrl =
      riffList("strl", riffChunk("strh", vidStrh) ++ riffChunk("strf", strf))
    val audStrl =
      riffList("strl", riffChunk("strh", audStrh) ++
        riffChunk("strf", new Array[Byte](16)))
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      (if (audioFirst) audStrl ++ vidStrl else vidStrl))
    val vidId = if (audioFirst) "01dc" else "00dc"
    val frameChunks = frames.map { f =>
      val v = riffChunk(vidId, f)
      if (audioFirst) riffChunk("00wb", new Array[Byte](32)) ++ v else v
    }
    val moviBody =
      if (recGroups) frameChunks.map(c => riffList("rec ", c))
        .foldLeft(Array.empty[Byte])(_ ++ _)
      else frameChunks.foldLeft(Array.empty[Byte])(_ ++ _)
    val movi = riffList("movi", moviBody)
    val idx1 = riffChunk("idx1", new Array[Byte](16))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def jpegFrames(n: Int, w: Int = 64, h: Int = 48): Seq[Array[Byte]] =
    (0 until n).map(i => encode(testImage(w, h, shift = i * 13), "jpg"))

  test("AVI/MJPEG demux + decode: dims, frame count, fps, real frame dHashes") {
    val frames = jpegFrames(5)
    val avi = mjpegAvi(frames, 64, 48, usPerFrame = 40000)
    val Some((w, h, n, fps, dur, sampled, hashes, luma)) =
      MediaDecode.decodeVideo(avi)
    assert(w === 64 && h === 48 && n === 5L)
    assert(fps === 25.0 && math.abs(dur - 0.2) < 1e-9)
    assert(sampled === 5 && hashes.length === 5)
    // each sampled dHash IS the image path's dHash of that frame — the
    // video path goes through the same bounded ImageIO decode
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(hashes(i) === MediaDecode.decodeImage(f).get._4, s"frame $i")
    }
    assert(luma.exists(l => l > 0 && l < 255))
  }

  test("frame sampling is evenly spaced, both ends anchored") {
    val frames = jpegFrames(10)
    val avi = mjpegAvi(frames, 64, 48)
    val Some((_, _, n, _, _, sampled, hashes, _)) =
      MediaDecode.decodeVideo(avi, maxSamples = 4)
    assert(n === 10L && sampled === 4)
    // picks for n=10, k=4: 0, 3, 6, 9
    val expect = Seq(0, 3, 6, 9).map(i =>
      MediaDecode.decodeImage(frames(i)).get._4)
    assert(hashes.toSeq === expect)
  }

  test("'rec ' interleave groups demux identically to flat movi") {
    val frames = jpegFrames(4)
    val flat = MediaDecode.decodeVideo(mjpegAvi(frames, 64, 48))
    val rec  = MediaDecode.decodeVideo(
      mjpegAvi(frames, 64, 48, recGroups = true))
    assert(flat.isDefined && rec.isDefined)
    assert(rec.get._7.toSeq === flat.get._7.toSeq) // same dhashes
    assert(rec.get._3 === 4L)
  }

  test("audio-first AVI: the 'vids' strh picks stream 01, skips '00wb' audio") {
    val frames = jpegFrames(4)
    val flat = MediaDecode.decodeVideo(mjpegAvi(frames, 64, 48))
    val af = MediaDecode.decodeVideo(
      mjpegAvi(frames, 64, 48, audioFirst = true))
    assert(af.isDefined)
    // hardcoding stream 00 would have sampled the audio chunks (0 decoded
    // frames); the strh resolution must recover the identical video set
    assert(af.get._3 === 4L && af.get._6 === 4)
    assert(af.get._7.toSeq === flat.get._7.toSeq)
  }

  test("truncated AVI (partial download) keeps the complete earlier frames") {
    val frames = jpegFrames(4)
    val avi = mjpegAvi(frames, 64, 48)
    // cut inside the LAST frame's JPEG payload: the demux must keep frames
    // 0-2 and drop the partial one, like the WAV truncation discipline
    val cut = avi.take(avi.length - frames.last.length / 2 - 20)
    val dec = MediaDecode.decodeVideo(cut)
    assert(dec.isDefined)
    assert(dec.get._3 === 3L, "partial final frame must be dropped")
    assert(dec.get._7.toSeq ===
      frames.take(3).map(f => MediaDecode.decodeImage(f).get._4))
  }

  test("non-AVI, corrupt, and adversarial bytes return None, never crash") {
    assert(MediaDecode.decodeVideo(Array.empty[Byte]) === None)
    assert(MediaDecode.decodeVideo("junk".getBytes) === None)
    assert(MediaDecode.decodeVideo(encode(testImage(8, 8), "jpg")) === None)
    assert(MediaDecode.decodeVideo(sineWav(8000, 1, 0.01, 0.5)) === None)
    // missing avih → None even with a well-formed movi
    val frames = jpegFrames(2)
    val noHdrl = {
      val movi = riffList("movi",
        frames.map(riffChunk("00dc", _)).foldLeft(Array.empty[Byte])(_ ++ _))
      val body = "AVI ".getBytes ++ movi
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    assert(MediaDecode.decodeVideo(noHdrl) === None)
    // nesting bomb: 100-deep hdrl-in-hdrl chain must hit the depth cap,
    // not StackOverflowError
    val bomb = {
      val core = riffChunk("avih", new Array[Byte](56))
      val nested = (1 to 100).foldLeft(core)((b, _) => riffList("hdrl", b))
      val body = "AVI ".getBytes ++ nested
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    assert(MediaDecode.decodeVideo(bomb) === None)
    // a corrupt frame among good ones is skipped, not fatal
    val mixed = mjpegAvi(
      Seq(frames(0), "not a jpeg at all".getBytes, frames(1)), 64, 48)
    val dec = MediaDecode.decodeVideo(mixed)
    assert(dec.isDefined && dec.get._3 === 3L)
    assert(dec.get._6 === 2) // sampled_frames counts DECODED frames
  }

  test("bogus near-Int.MaxValue frame size at a nonzero offset is rejected") {
    // off + 8 + sz overflows Int for sz close to the guard's cap: a wrapped
    // negative `end` used to slip past the `end > until` truncation check,
    // collecting a frame whose copyOfRange bounds were garbage. With Long
    // arithmetic the chunk reads as truncated and the earlier good frames
    // survive.
    val frames = jpegFrames(2)
    val good = mjpegAvi(frames, 64, 48)
    // append a movi-style frame chunk declaring a huge payload it lacks —
    // splice it INSIDE the movi list body, before the list's closing edge
    val huge = "00dc".getBytes("US-ASCII") ++ le32(Int.MaxValue - 8) ++
      "short".getBytes("US-ASCII")
    val moviAt = {
      // locate LIST....movi
      val pat = "movi".getBytes("US-ASCII")
      (0 until good.length - 4).find(i => good.slice(i, i + 4).sameElements(pat)
        && good.slice(i - 8, i - 4).sameElements("LIST".getBytes)).get
    }
    val listSizeOff = moviAt - 4
    val oldSize = (good(listSizeOff) & 0xFF) | ((good(listSizeOff + 1) & 0xFF) << 8) |
      ((good(listSizeOff + 2) & 0xFF) << 16) | ((good(listSizeOff + 3) & 0xFF) << 24)
    val moviEnd = moviAt + oldSize // end of movi body (size counts 'movi' tag)
    val patched = good.take(moviEnd) ++ huge ++ good.drop(moviEnd)
    le32(oldSize + huge.length).copyToArray(patched, listSizeOff)
    le32(patched.length - 8).copyToArray(patched, 4) // fix RIFF size
    val dec = MediaDecode.decodeVideo(patched)
    assert(dec.isDefined, "good frames before the bogus chunk must survive")
    assert(dec.get._3 === 2L, "the bogus-size chunk must not be collected")
    assert(dec.get._6 === 2)
  }

  test("all sampled frames corrupt: mean_luma is None, not a fake black 0.0") {
    val avi = mjpegAvi(Seq("nope".getBytes, "also nope".getBytes), 64, 48)
    val dec = MediaDecode.decodeVideo(avi)
    assert(dec.isDefined && dec.get._3 === 2L)
    assert(dec.get._6 === 0, "nothing decoded")
    assert(dec.get._8 === None, "zero evidence must not read as black")
  }

  test("fuzz: random, mutated, and truncated bytes never throw or hang") {
    val rnd = new scala.util.Random(1311)
    // pure-random buffers, including RIFF/AVI-prefixed garbage
    for (i <- 0 until 200) {
      val n = rnd.nextInt(600)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (i % 3 == 0 && n >= 12) {
        "RIFF".getBytes.copyToArray(b, 0); "AVI ".getBytes.copyToArray(b, 8)
      }
      MediaDecode.decodeVideo(b) // must return, whatever the bytes
      MediaDecode.decodeWav(b)
      MediaDecode.decodeImage(b)
    }
    // single-byte mutations and random truncations of a VALID AVI: the
    // demux must stay total (None or a structurally sane Some), and a
    // mutated frame payload must degrade to a skipped frame, not a throw
    val avi = mjpegAvi(jpegFrames(3), 64, 48)
    for (_ <- 0 until 150) {
      val m = avi.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      MediaDecode.decodeVideo(m).foreach { case (_, _, n, _, _, k, hs, _) =>
        assert(n >= 0 && k >= 0 && hs.length === k)
      }
      val cut = avi.take(rnd.nextInt(avi.length))
      MediaDecode.decodeVideo(cut).foreach { case (_, _, n, _, _, k, hs, _) =>
        assert(n >= 0 && k <= n && hs.length === k)
      }
    }
  }

  test("video near-dup: exploded frame dHashes ride the image banding") {
    // the decodeVideos Scaladoc claims explode(frame_dhashes) feeds
    // imageNearDupPairs directly — prove it: two videos sharing one
    // frame (a re-encode that kept a scene) must collide, an unrelated
    // video must not
    import spark.implicits._
    val shared = jpegFrames(1).head
    val a = mjpegAvi(Seq(shared) ++ jpegFrames(2, 32, 32), 64, 48)
    val b = mjpegAvi(jpegFrames(2, 48, 32) ++ Seq(shared), 64, 48)
    val noise = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(99)
    for (y <- 0 until 48; x <- 0 until 64)
      noise.setRGB(x, y, rnd.nextInt(1 << 24))
    val c = mjpegAvi(Seq(encode(noise, "jpg")), 64, 48)
    val media = Seq((1L, "video/x-msvideo", a), (2L, "video/x-msvideo", b),
      (3L, "video/x-msvideo", c)).toDF("doc_id", "mime", "bytes")
    val feats = MediaDecode.decodeVideos(media).toDF()
      .select(col("doc_id"), explode(col("frame_dhashes")).as("dhash"))
    val pairs = MediaDecode.imageNearDupPairs(feats, maxHamming = 0)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .contains((1L, 2L)))
    assert(!pairs.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("decodeVideos stage mirrors the image/audio None discipline") {
    import spark.implicits._
    val avi = mjpegAvi(jpegFrames(3), 64, 48)
    val rows = Seq(
      (1L, "video/x-msvideo", avi),
      (2L, "video/x-msvideo", "garbage".getBytes),
      (3L, "video/x-msvideo", null))
    val f = MediaDecode.decodeVideos(rows.toDF("doc_id", "mime", "bytes"))
      .collect().sortBy(_.doc_id)
    assert(f(0).n_frames === Some(3L) && f(0).frame_dhashes.get.length === 3)
    assert(f(0).fps === Some(25.0))
    assert(f(1).n_frames === None && f(2).n_frames === None)
    // per-frame dhashes feed the image near-dup banding directly: a video
    // and a still of one of its frames collide at Hamming 0
    val still = MediaDecode.dhash64(jpegFrames(3)(1))
    assert(f(0).frame_dhashes.get.contains(still.get))
  }
}
