package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride through the
  * pipeline as opaque `binary` payload columns with typed metadata
  * alongside. The Spark-side contract — schema, partition-parallel batch
  * decode via `mapPartitions`, typed output — is real and tested.
  *
  * The decode itself is tiered: payloads carrying a known image magic
  * number (PNG/JPEG/GIF/BMP) go through a REAL pure-JVM codec
  * ([[imageDecode]], `javax.imageio`), WAV/AIFF audio goes through the
  * JDK's real `javax.sound.sampled` header parser ([[audioDecode]]),
  * MIDI through `javax.sound.midi`, and MP3 / Ogg(Vorbis|Opus) through
  * this file's own pure-Scala frame/page header parsers
  * ([[mp3Decode]], [[oggDecode]]) — no native deps, no dependencies.
  * Everything else falls back to [[fakeDecode]], a deterministic
  * stand-in keyed on payload bytes. The remaining stand-in surface is
  * SAMPLE-level decode of compressed codecs (MP3/Vorbis/Opus PCM, MP4
  * video) — a PERMANENT, documented dependency decision for this
  * build (docs/COVERAGE.md "Closed boundary"): the JDK ships no codec
  * for these formats and the dependency set is pinned, so their
  * feature/frame paths stub while their METADATA is real. The stub
  * tier is the extension slot: a production deployment adds a
  * pure-JVM decoder (a `javax.sound` SPI jar, or a direct decoder
  * ahead of [[fakeDecode]] the way [[imageDecode]] sits ahead of it)
  * with no schema, plan, or operator changes.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      octets: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** STUB decoder — the fallback for payloads no real codec claims:
    * deterministic pseudo-metadata from payload size and first byte.
    * A production build adds audio/video codecs ahead of this fallback
    * the way [[imageDecode]] sits ahead of it for images.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val octets = payload.length.toLong
    val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else 0L
    MediaMeta(
      doc_id = docId,
      octets = octets,
      width = 64L + octets % 576L,
      height = 64L + (octets * 7L) % 448L,
      n_frames = 1L + first % 8L,
      checksum = (octets * 31L + first) % 997L)
  }

  /** True iff the payload starts with a magic number one of the JDK's
    * imageio readers owns (PNG / JPEG / GIF / BMP). Gating on the magic —
    * rather than letting ImageIO sniff arbitrary bytes — keeps decode
    * behavior a pure function of the leading bytes: no text payload can
    * accidentally engage a lenient codec.
    */
  def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
    (b.length >= 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) ||
    (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') ||
    (b.length >= 14 && b(0) == 'B' && b(1) == 'M')

  /** True iff the payload starts with a RIFF/WAVE or FORM/AIFF container
    * magic — the two audio families the JDK's `javax.sound.sampled`
    * parses out of the box. Same gating rationale as [[looksLikeImage]]:
    * decode engagement is a pure function of the leading bytes, so no
    * text payload can accidentally reach a lenient parser.
    */
  def looksLikeAudio(b: Array[Byte]): Boolean =
    looksLikeWav(b) ||
    (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
      b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      (b(11) == 'F' || b(11) == 'C')) ||
    (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
      b(3) == 'd') // Sun AU — the JDK's third built-in audio parser

  /** Standard MIDI File magic (`MThd`) — parsed by the JDK's
    * `javax.sound.midi`, the one remaining built-in media parser.
    */
  def looksLikeMidi(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'M' && b(1) == 'T' && b(2) == 'h' &&
      b(3) == 'd'

  /** REAL MIDI metadata via `javax.sound.midi` (header+track parse, no
    * synthesis): [[MediaMeta]] axes are `width` = microsecond duration,
    * `height` = track count, `n_frames` = tick length. None when the
    * parser rejects the bytes — callers fall back to [[fakeDecode]].
    */
  def midiDecode(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    try {
      val seq = javax.sound.midi.MidiSystem.getSequence(
        new java.io.ByteArrayInputStream(payload))
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      Some(MediaMeta(
        doc_id = docId,
        octets = payload.length.toLong,
        width = seq.getMicrosecondLength,
        height = seq.getTracks.length.toLong,
        n_frames = seq.getTickLength,
        checksum = crc.getValue))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // MPEG audio (MP3) + Ogg container METADATA — pure-JVM frame/page
  // header parsers, no dependency, no sample decode. The container has
  // no MP3/Vorbis/Opus PCM codec, so sample-level paths (features,
  // frame windows) still fall back to the stub for these formats; the
  // METADATA tier, however, is real: rate/channels/duration come from
  // the actual bitstream headers (public format knowledge: MPEG-1/2
  // audio frame headers, Ogg page + Vorbis/Opus id headers).
  // ------------------------------------------------------------------

  /** ID3v2 tag size (header + syncsafe body) when the payload starts
    * with one, else 0 — MP3 files commonly lead with the tag.
    */
  private def id3v2Size(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
        (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0)
      10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    else 0

  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000)

  /** Parse one MPEG-audio Layer III frame header at `off`:
    * (frameBytes, samplesPerFrame, sampleRate, channels), or None when
    * the four bytes are not a valid header.
    */
  private def mp3FrameAt(
      b: Array[Byte], off: Int): Option[(Int, Int, Int, Int)] = {
    if (off < 0 || off + 4 > b.length) return None
    val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if ((h & 0xffe00000) != 0xffe00000) return None
    val verBits = (h >>> 19) & 3 // 0 = MPEG-2.5, 2 = MPEG-2, 3 = MPEG-1
    val layerBits = (h >>> 17) & 3 // 1 = Layer III
    if (verBits == 1 || layerBits != 1) return None
    val brIdx = (h >>> 12) & 0xf
    val srIdx = (h >>> 10) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (h >>> 9) & 1
    val channels = if (((h >>> 6) & 3) == 3) 1 else 2
    val v1 = verBits == 3
    val div = if (v1) 1 else if (verBits == 2) 2 else 4
    val sampleRate = Mp3SampleRateV1(srIdx) / div
    val bitrate =
      (if (v1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx) * 1000
    val samplesPerFrame = if (v1) 1152 else 576
    val frameBytes = samplesPerFrame / 8 * bitrate / sampleRate + padding
    if (frameBytes <= 4) None
    else Some((frameBytes, samplesPerFrame, sampleRate, channels))
  }

  /** True iff the payload is plausibly an MP3: optional ID3v2 tag, then
    * a COMPLETE valid Layer III frame followed by either end-of-payload
    * or a second valid header. The 11-bit sync pattern alone fires on
    * arbitrary binary, so one full frame + continuation is required —
    * the gate stays a pure function of the bytes, like every other
    * magic here.
    */
  def looksLikeMp3(b: Array[Byte]): Boolean = {
    val off = id3v2Size(b)
    mp3FrameAt(b, off).exists { case (len, _, _, _) =>
      off + len <= b.length &&
        (off + len == b.length || mp3FrameAt(b, off + len).isDefined)
    }
  }

  /** REAL MP3 metadata via a frame-header walk (VBR-correct: every
    * frame's own header contributes its sample count) — zero
    * allocation, no sample decode. [[MediaMeta]] axes as for
    * [[audioDecode]]: `width` = sample rate, `height` = channels,
    * `n_frames` = total sample frames (duration = n_frames / width).
    * The walk stops at the first non-frame byte (trailing ID3v1 tags
    * and truncation degrade to the frames actually present).
    */
  def mp3Decode(docId: Long, payload: Array[Byte]): Option[MediaMeta] = {
    val start = id3v2Size(payload)
    mp3FrameAt(payload, start).flatMap { case (_, _, rate, channels) =>
      var off = start
      var frames = 0L
      var samples = 0L
      var continue = true
      while (continue) {
        mp3FrameAt(payload, off) match {
          case Some((len, spf, _, _)) if off + len <= payload.length =>
            frames += 1; samples += spf; off += len
          case _ => continue = false
        }
      }
      if (frames == 0) None
      else {
        val crc = new java.util.zip.CRC32()
        crc.update(payload)
        Some(MediaMeta(
          doc_id = docId,
          octets = payload.length.toLong,
          width = rate.toLong,
          height = channels.toLong,
          n_frames = samples,
          checksum = crc.getValue))
      }
    }
  }

  /** Ogg capture pattern + stream-structure version 0. */
  def looksLikeOgg(b: Array[Byte]): Boolean =
    b.length >= 28 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
      b(3) == 'S' && b(4) == 0

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], off: Int): Long =
    (le32(b, off).toLong & 0xffffffffL) |
      ((le32(b, off + 4).toLong & 0xffffffffL) << 32)

  private def bytesAt(b: Array[Byte], off: Int, pat: Array[Byte]): Boolean =
    off >= 0 && off + pat.length <= b.length &&
      pat.indices.forall(i => b(off + i) == pat(i))

  /** REAL Ogg (Vorbis/Opus) metadata from the container itself: the
    * codec id header in the first page gives channels and the rate;
    * the LAST page's granule position is the total sample count.
    * `width` = the rate granules are counted at (the Vorbis sample
    * rate; 48000 for Opus regardless of the input rate — the Opus
    * spec's granule clock), so duration = n_frames / width holds for
    * both. None for non-audio Ogg streams (the id header is neither
    * Vorbis nor OpusHead) or a stream with no finished page.
    */
  def oggDecode(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    try {
      if (!looksLikeOgg(payload)) return None
      val segCount = payload(26) & 0xff
      val dataOff = 27 + segCount
      val vorbisMagic =
        Array[Byte](1, 'v'.toByte, 'o'.toByte, 'r'.toByte, 'b'.toByte,
          'i'.toByte, 's'.toByte)
      val opusMagic = "OpusHead".getBytes("US-ASCII")
      val idInfo: Option[(Int, Int)] = // (channels, granule rate)
        if (bytesAt(payload, dataOff, vorbisMagic) &&
            dataOff + 16 <= payload.length)
          Some((payload(dataOff + 11) & 0xff, le32(payload, dataOff + 12)))
        else if (bytesAt(payload, dataOff, opusMagic) &&
            dataOff + 10 <= payload.length)
          Some((payload(dataOff + 9) & 0xff, 48000))
        else None
      idInfo.flatMap { case (channels, granuleRate) =>
        if (channels <= 0 || granuleRate <= 0) None
        else {
          // total samples: granule position of the LAST page — scan
          // backward for the final capture pattern (bounded, no alloc)
          var i = payload.length - 27
          var granule = -1L
          while (granule < 0 && i >= 0) {
            if (payload(i) == 'O' && payload(i + 1) == 'g' &&
                payload(i + 2) == 'g' && payload(i + 3) == 'S' &&
                payload(i + 4) == 0 && i + 14 <= payload.length)
              granule = le64(payload, i + 6)
            i -= 1
          }
          if (granule < 0) None
          else {
            val crc = new java.util.zip.CRC32()
            crc.update(payload)
            Some(MediaMeta(
              doc_id = docId,
              octets = payload.length.toLong,
              width = granuleRate.toLong,
              height = channels.toLong,
              n_frames = granule,
              checksum = crc.getValue))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF/WAVE container magic alone — the subset of [[looksLikeAudio]]
    * whose PCM the JDK's WAVE writer can re-encode losslessly; shared by
    * every WAV-gated path so the sniff can never drift between them.
    */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF) —
    * header-only: `AudioSystem.getAudioFileFormat` parses the container
    * header without decoding samples, so nothing is allocated from
    * header-claimed sizes (no decompression-bomb surface, unlike the
    * image raster path that needs [[MaxDecodePixels]]). [[MediaMeta]]
    * reuses its image-named fields for the audio axes: `width` = sample
    * rate (Hz), `height` = channel count, `n_frames` = sample-frame
    * count — duration in seconds follows as `n_frames / width`.
    * `checksum` = CRC-32 of the payload, as for images. None when the
    * parser rejects the bytes — callers fall back to [[fakeDecode]].
    */
  def audioDecode(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ff.getFormat
      val rate = fmt.getSampleRate
      val channels = fmt.getChannels
      val frames = ff.getFrameLength
      if (rate <= 0 || channels <= 0 || frames < 0) None
      else {
        val crc = new java.util.zip.CRC32()
        crc.update(payload)
        Some(MediaMeta(
          doc_id = docId,
          octets = payload.length.toLong,
          width = rate.toLong,
          height = channels.toLong,
          n_frames = frames.toLong,
          checksum = crc.getValue))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Byte cap for FULL PCM decodes (audio feature/frame paths): the
    * frame count is header-CLAIMED, so a hostile container could demand
    * an arbitrarily large sample buffer — the audio analogue of
    * [[MaxDecodePixels]]. 64 MB covers ~6 min of 44.1 kHz stereo 16-bit.
    */
  private[operators] val MaxAudioBytes: Long = 64L * 1024 * 1024

  /** Decode a WAV/AIFF payload's FULL PCM to channel-averaged samples in
    * [-1, 1]. Real decode via `AudioSystem.getAudioInputStream`; bounded
    * by [[MaxAudioBytes]] BEFORE any buffer exists. None for non-PCM
    * encodings (compressed audio needs codecs this container lacks),
    * unusual sample layouts, or oversized claims.
    */
  private def pcmSamples(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val frames = in.getFrameLength
        val frameSize = fmt.getFrameSize
        val signed =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned8 = bits == 8 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val supported = (signed || unsigned8) &&
          (bits == 8 || bits == 16) && ch > 0 && frames > 0 &&
          frameSize == ch * (bits / 8) &&
          frames * frameSize <= MaxAudioBytes
        if (!supported) None
        else {
          val raw = in.readNBytes((frames * frameSize).toInt)
          val n = raw.length / frameSize
          val out = new Array[Float](n)
          val big = fmt.isBigEndian
          var i = 0
          while (i < n) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val off = i * frameSize + c * (bits / 8)
              val v =
                if (bits == 8) {
                  if (signed) raw(off) / 128.0f
                  else ((raw(off) & 0xff) - 128) / 128.0f
                } else {
                  val (hi, lo) =
                    if (big) (raw(off), raw(off + 1))
                    else (raw(off + 1), raw(off))
                  ((hi << 8) | (lo & 0xff)).toShort / 32768.0f
                }
              acc += v
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio feature for WAV/AIFF: RMS energy over `dims` equal
    * windows of the channel-averaged waveform — the classic
    * energy-envelope baseline, values in [0, 1], ANN-ready like
    * [[imageFeature]]'s pooled luminance. None when [[pcmSamples]]
    * refuses the payload.
    */
  def audioFeature(payload: Array[Byte], dims: Int): Option[Array[Float]] =
    pcmSamples(payload).filter(_.nonEmpty).map { s =>
      val out = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        val lo = (s.length.toLong * d / dims).toInt
        val hi = math.max(lo + 1, (s.length.toLong * (d + 1) / dims).toInt)
        var acc = 0.0
        var i = lo
        while (i < hi && i < s.length) { acc += s(i) * s(i); i += 1 }
        out(d) = math.sqrt(acc / math.max(1, math.min(hi, s.length) - lo)).toFloat
        d += 1
      }
      out
    }

  /** Pixel-count cap for FULL decodes (feature/resize/frame paths):
    * `ImageIO.read` allocates the raster from header-CLAIMED dimensions,
    * so a decompression-bomb payload (tiny bytes, huge declared size)
    * would throw `OutOfMemoryError` — which no `NonFatal` handler
    * intercepts; the task, and with it the executor slot, dies instead
    * of degrading to the stub as documented. 4096×4096 (≈64 MB ARGB
    * raster) comfortably covers real pipeline images while bounding the
    * worst-case allocation; dimensions are read header-only FIRST and
    * oversized payloads degrade to `None` before any raster exists.
    */
  private[operators] val MaxDecodePixels: Long = 4096L * 4096L

  /** Full decode behind the dimension guard: header dims via the
    * ImageReader, bail above [[MaxDecodePixels]], only then `read(0)`.
    * `NonFatal` (not bare `Exception`) so deliberate codec failures
    * degrade while genuinely fatal errors still surface.
    */
  private def guardedRead(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image decode via `javax.imageio`: width/height/frame-count from
    * the actual codec, checksum = CRC-32 of the payload. Returns None if
    * no installed reader claims the bytes or the codec rejects them —
    * callers then fall back to the [[fakeDecode]] stub, so corrupt or
    * non-image payloads degrade instead of failing the partition.
    */
  def imageDecode(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val nFrames =
              try math.max(1, r.getNumImages(true))
              catch { case _: Exception => 1 }
            val crc = new java.util.zip.CRC32()
            crc.update(payload)
            Some(MediaMeta(
              doc_id = docId,
              octets = payload.length.toLong,
              width = r.getWidth(0).toLong,
              height = r.getHeight(0).toLong,
              n_frames = nFrames.toLong,
              checksum = crc.getValue))
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-parallel decode: binary payloads in, typed metadata out.
    * One decoder instantiation per partition (the mapPartitions shape
    * that amortizes codec setup at scale), no shuffle. Image-magic
    * payloads take the real [[imageDecode]] path; everything else the
    * deterministic stub.
    */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (if (looksLikeImage(bytes)) imageDecode(id, bytes)
           else if (looksLikeAudio(bytes)) audioDecode(id, bytes)
           else if (looksLikeMidi(bytes)) midiDecode(id, bytes)
           else if (looksLikeMp3(bytes)) mp3Decode(id, bytes)
           else if (looksLikeOgg(bytes)) oggDecode(id, bytes)
           else None)
            .getOrElse(fakeDecode(id, bytes))
        }
      }
  }

  /** Documents → fake media payloads (UTF-8 bytes of the text stand in
    * for an image blob) → decoded metadata table.
    */
  def documentMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))).toDF()

  /** REAL image feature: decode, scale to an s×s luminance grid with the
    * same offscreen-Graphics2D path as [[imageResize]], and emit the
    * pooled pixel intensities in [0,1] — average-pool features from
    * actual decoded pixels (the classic pre-CNN baseline), pure JDK.
    * `dims` must be a square (s²). None when no codec claims the bytes.
    */
  def imageFeature(payload: Array[Byte], dims: Int): Option[Array[Float]] = {
    val side = math.sqrt(dims.toDouble).toInt
    if (side * side != dims) return None
    try {
      guardedRead(payload).map { img =>
        val out = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, side, side, null)
        } finally g.dispose()
        val v = new Array[Float](dims)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val rgb = out.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            v(y * side + x) = (lum / 255.0).toFloat
            x += 1
          }
          y += 1
        }
        v
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Feature extraction: binary payload → fixed-dim float vector — the
    * model-inference slot of the pipeline. Tiered like [[decodeMeta]]:
    * payloads with an image magic get a REAL vector ([[imageFeature]] —
    * pooled luminance of the actual decoded pixels), WAV/AIFF a REAL
    * energy envelope ([[audioFeature]] — RMS over the decoded PCM);
    * everything else a deterministic arithmetic stand-in (video
    * embedding models are not in this container; a production build
    * loads its model once per partition exactly where these branches
    * sit). The Spark-side
    * contract is identical either way: binary in, `array<float>` out,
    * partition-parallel `mapPartitions` with per-partition codec/model
    * init, no shuffle — and the output column feeds [[Similarity]]'s
    * ANN operators directly (embedding-shaped).
    */
  def featureExtract(
      spark: SparkSession, payloads: DataFrame, dims: Int): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val real =
            if (looksLikeImage(bytes)) imageFeature(bytes, dims)
            else if (looksLikeAudio(bytes)) audioFeature(bytes, dims)
            else None
          val v = real.getOrElse {
            val octets = bytes.length.toLong
            val first = if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L
            Array.tabulate(dims)(d =>
              (((octets * (d + 1) + first * (d + 3)) % 97L).toFloat / 97.0f))
          }
          (id, v)
        }
      }
      .toDF("doc_id", "feature")
  }

  /** Resized media row: target dims plus the resized payload. */
  final case class Resized(
      doc_id: Long, out_width: Long, out_height: Long, out_octets: Long,
      resized_payload: Array[Byte])

  /** REAL image resize, pure JDK: decode via `javax.imageio`, scale with
    * an offscreen `Graphics2D` (bilinear; headless-safe — BufferedImage
    * rasters never touch a display), re-encode as PNG. None when no
    * codec claims the bytes or decode fails — callers fall back to the
    * byte-sampling stub, so corrupt images degrade instead of failing
    * the partition.
    */
  def imageResize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      guardedRead(payload).map { img =>
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resize media payloads to target dimensions. Two-tier like
    * [[decodeMeta]]: payloads with an image magic go through the REAL
    * codec path ([[imageResize]] — actual pixel resampling, PNG out);
    * everything else keeps one byte per `stride = ceil(octets / (w·h))`
    * input bytes (the deterministic stand-in; audio/video resampling
    * slots in the same way). Same partition-parallel batch shape
    * either way: binary in, binary out, no shuffle, codec init amortized
    * per partition.
    */
  def resize(
      spark: SparkSession, payloads: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val target = w.toLong * h
        it.map { case (id, bytes) =>
          val real =
            if (looksLikeImage(bytes)) imageResize(bytes, w, h) else None
          real match {
            case Some(out) =>
              Resized(id, w.toLong, h.toLong, out.length.toLong, out)
            case None =>
              val n = bytes.length.toLong
              val stride = math.max(1L, (n + target - 1) / target)
              val outLen = ((n + stride - 1) / stride).toInt
              val out = new Array[Byte](outLen)
              var i = 0
              while (i < outLen) { out(i) = bytes((i * stride).toInt); i += 1 }
              Resized(id, w.toLong, h.toLong, outLen.toLong, out)
          }
        }
      }
  }

  /** Sampled frame row: byte-range coordinates into the payload plus the
    * extracted slice. A real video path replaces the slice arithmetic
    * with codec seeks; the 1→N row-expansion shape, the binary column
    * riding along, and the sampling predicate are the Spark-side contract.
    */
  final case class Frame(
      doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long,
      frame_payload: Array[Byte])

  /** REAL frame extraction for the one multi-frame format the JDK can
    * decode — animated GIF: every `everyN`-th frame is read by the
    * actual codec and re-encoded as a standalone PNG. Returned frames
    * carry `frame_off = -1` (a DECODED frame is not a byte range of the
    * container) and `frame_len` = the PNG's size. None when the reader
    * rejects the bytes — callers fall back to the byte-slicing stub.
    */
  def gifFrames(
      docId: Long, payload: Array[Byte], everyN: Int): Option[Seq[Frame]] =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val n = math.max(1, r.getNumImages(true))
            val sampled = (0 until n).filter(_ % everyN == 0)
            // per-frame dimension guard BEFORE any full frame decode —
            // same decompression-bomb rationale as [[MaxDecodePixels]]:
            // one oversized frame degrades the whole payload to the stub
            val safe = sampled.forall { k =>
              val w = r.getWidth(k).toLong
              val h = r.getHeight(k).toLong
              w > 0 && h > 0 && w * h <= MaxDecodePixels
            }
            if (!safe) None
            else Some(sampled.map { k =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(r.read(k), "png", bos)
              val png = bos.toByteArray
              Frame(docId, k.toLong, -1L, png.length.toLong, png)
            })
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL frame extraction for RIFF/WAVE audio: the payload's PCM is
    * split into one-SECOND windows (the natural audio frame unit —
    * sample-rate frames each), every `everyN`-th window re-encoded as a
    * standalone WAV via the JDK's own writer. Mirrors [[gifFrames]]:
    * `frame_off = -1` (a re-encoded window is not a byte range of the
    * container), `frame_len` = the WAV's size. WAV only — AIFF carries
    * big-endian PCM the WAVE writer would misencode. None when the
    * parser rejects the bytes or the claimed PCM exceeds
    * [[MaxAudioBytes]]; callers fall back to the byte-slicing stub.
    */
  def audioFrames(
      docId: Long, payload: Array[Byte], everyN: Int): Option[Seq[Frame]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val frameSize = fmt.getFrameSize
        val rate = math.round(fmt.getFrameRate).toLong
        if (frames <= 0 || frameSize <= 0 || rate <= 0 ||
            frames * frameSize > MaxAudioBytes) None
        else {
          val raw = in.readNBytes((frames * frameSize).toInt)
          val total = raw.length / frameSize
          val nWin = ((total + rate - 1) / rate).toInt
          // a header claiming frames over a truncated/absent body reads
          // zero windows — that is a REJECTED payload (None -> stub),
          // not a silent zero-row document (every other frameSample
          // path emits >= 1 row per payload)
          if (nWin == 0) None
          else Some((0 until nWin).filter(_ % everyN == 0).map { k =>
            val lo = (k.toLong * rate).toInt
            val hi = math.min(total, (k + 1L) * rate).toInt
            val slice = java.util.Arrays.copyOfRange(
              raw, lo * frameSize, hi * frameSize)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(slice), fmt, (hi - lo).toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            val wav = bos.toByteArray
            Frame(docId, k.toLong, -1L, wav.length.toLong, wav)
          })
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling over video-like payloads. Tiered like
    * [[decodeMeta]]: GIF payloads (the JDK's one multi-frame codec) go
    * through REAL per-frame decode ([[gifFrames]] — each sampled frame
    * a standalone PNG), WAV audio through REAL one-second PCM windows
    * ([[audioFrames]] — each a standalone WAV); other payloads split
    * into [[fakeDecode]]'s
    * n_frames equal byte ranges (the stand-in shape a production build
    * replaces with its video codec's seeks). Narrow row expansion — no
    * shuffle; downstream feature extraction (resize, embed) maps over
    * `frame_payload` with the same `mapPartitions` shape as
    * [[decodeMeta]].
    */
  def frameSample(
      spark: SparkSession, payloads: DataFrame, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // full GIF87a/GIF89a signature, same rigor as looksLikeImage:
          // a text payload starting with "GIF" must never engage the
          // (lenient) codec path
          val isGif = bytes.length >= 6 && bytes(0) == 'G' &&
            bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
            (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'
          // RIFF/WAVE only: AIFF's big-endian PCM has no lossless WAVE
          // re-encode through the JDK writer, so it keeps the stub
          val real =
            if (isGif) gifFrames(id, bytes, everyN)
            else if (looksLikeWav(bytes)) audioFrames(id, bytes, everyN)
            else None
          real match {
            case Some(frames) => frames.iterator
            case None =>
              val meta = fakeDecode(id, bytes)
              val flen = meta.octets / meta.n_frames
              (0L until meta.n_frames).iterator
                .filter(_ % everyN == 0)
                .map { k =>
                  val off = k * flen
                  // the LAST frame absorbs the octets % n_frames
                  // remainder so the frames partition the payload with
                  // no dropped bytes
                  val len =
                    if (k == meta.n_frames - 1) meta.octets - off else flen
                  Frame(id, k, off, len, java.util.Arrays.copyOfRange(
                    bytes, off.toInt, (off + len).toInt))
                }
          }
        }
      }
  }
}
