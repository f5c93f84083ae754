package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frameSample slices are contiguous real byte ranges of the payload") {
    val payload = ("x" * 100).getBytes("UTF-8") // first byte 'x'=120 -> n_frames=1+120%8=1
    val payload2 = ("a" * 90).getBytes("UTF-8") // 'a'=97 -> n_frames=1+97%8=2
    val df = Seq((1L, payload), (2L, payload2)).toDF("doc_id", "payload")
    val frames = Multimodal.frameSample(spark, df, everyN = 1)
      .collect().groupBy(_.doc_id)

    // doc 2: 2 frames of 45 bytes each, offsets 0 and 45
    val f2 = frames(2L).sortBy(_.frame_idx)
    assert(f2.map(f => (f.frame_idx, f.frame_off, f.frame_len)).toSeq ==
      Seq((0L, 0L, 45L), (1L, 45L, 45L)))
    // slices re-concatenate to the original payload
    assert(f2.flatMap(_.frame_payload).toSeq == payload2.toSeq)

    // doc 1: single frame covering everything
    assert(frames(1L).head.frame_payload.toSeq == payload.toSeq)
  }

  test("last frame absorbs the remainder of a non-divisible payload") {
    val p = ("a" * 91).getBytes("UTF-8") // 'a'=97 -> n_frames=2, 45+46
    val df = Seq((1L, p)).toDF("doc_id", "payload")
    val fs = Multimodal.frameSample(spark, df, everyN = 1)
      .collect().sortBy(_.frame_idx)
    assert(fs.map(f => (f.frame_off, f.frame_len)).toSeq ==
      Seq((0L, 45L), (45L, 46L)))
    assert(fs.flatMap(_.frame_payload).toSeq == p.toSeq)
  }

  test("frameSample everyN=2 keeps even frame indices only") {
    val p = ("g" * 80).getBytes("UTF-8") // 'g'=103 -> n_frames=1+103%8=8
    val df = Seq((1L, p)).toDF("doc_id", "payload")
    val idx = Multimodal.frameSample(spark, df, everyN = 2)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(idx == Seq(0L, 2L, 4L, 6L))
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("real decode: PNG and JPEG payloads yield true dimensions") {
    val png = pngBytes(20, 14)
    val jpg = jpegBytes(33, 9)
    val txt = "just some text payload".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpg), (3L, txt)).toDF("doc_id", "payload")
    val metas = Multimodal.decodeMeta(spark, df).collect()
      .map(m => m.doc_id -> m).toMap

    assert(metas(1L).width == 20 && metas(1L).height == 14)
    assert(metas(1L).n_frames == 1)
    assert(metas(1L).octets == png.length)
    val crc = new java.util.zip.CRC32(); crc.update(png)
    assert(metas(1L).checksum == crc.getValue)

    assert(metas(2L).width == 33 && metas(2L).height == 9)

    // non-image payload falls back to the deterministic stub
    assert(metas(3L) == Multimodal.fakeDecode(3L, txt))
  }

  test("real decode: corrupt image magic degrades to the stub, not a crash") {
    val broken = pngBytes(8, 8).take(20) // valid PNG magic, truncated body
    val df = Seq((1L, broken)).toDF("doc_id", "payload")
    val m = Multimodal.decodeMeta(spark, df).collect().head
    // either the codec still reads the header dims or the stub answers;
    // both are fine — the contract is no task failure and determinism
    val again = Multimodal.decodeMeta(spark, df).collect().head
    assert(m == again)
  }

  test("featureExtract vectors feed the ANN operators directly") {
    val docs = Seq(
      (1L, "alpha beta gamma".getBytes("UTF-8")),
      (2L, "alpha beta gamma".getBytes("UTF-8")), // identical payload
      (3L, "totally different content here".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val feats = Multimodal.featureExtract(spark, docs, dims = 16)
      .withColumnRenamed("feature", "embedding")
    // identical payloads -> identical vectors -> cosine 1.0 top neighbor
    val top = Similarity.bruteForceTopK(feats, "doc_id", "embedding",
      col("doc_id") === 1, k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(top.head == 2L)
    val vecs = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) == vecs(2L) && vecs(1L) != vecs(3L))
    assert(vecs(1L).length == 16)
  }

  test("real resize: a PNG scales to true 16x16 pixel data; text keeps the stub") {
    // constant-color image: every resampled pixel must keep the color —
    // pins that the path is real pixel interpolation, not byte sampling
    val w0 = 32; val h0 = 24
    val img = new java.awt.image.BufferedImage(
      w0, h0, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w0).foreach(x => (0 until h0).foreach(y =>
      img.setRGB(x, y, 0x336699)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val txt = "not an image at all, just text".getBytes("UTF-8")

    val out = Multimodal.resize(spark,
      Seq((1L, png), (2L, txt)).toDF("doc_id", "payload"), 16, 16)
      .collect().map(r => r.doc_id -> r).toMap

    // image path: output is a REAL 16x16 PNG whose pixels kept the color
    val r1 = out(1L)
    assert(r1.out_width == 16 && r1.out_height == 16)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r1.resized_payload))
    assert(decoded.getWidth == 16 && decoded.getHeight == 16)
    assert((decoded.getRGB(0, 0) & 0xffffff) == 0x336699)
    assert((decoded.getRGB(8, 8) & 0xffffff) == 0x336699)
    assert((decoded.getRGB(15, 15) & 0xffffff) == 0x336699)
    assert(r1.out_octets == r1.resized_payload.length.toLong)

    // gradient image: resize is deterministic across invocations
    val g1 = Multimodal.resize(spark,
      Seq((9L, pngBytes(40, 30))).toDF("doc_id", "payload"), 16, 16)
      .collect().head.resized_payload.toSeq
    val g2 = Multimodal.resize(spark,
      Seq((9L, pngBytes(40, 30))).toDF("doc_id", "payload"), 16, 16)
      .collect().head.resized_payload.toSeq
    assert(g1 == g2)

    // non-image payload keeps the deterministic byte-sampling stub
    val r2 = out(2L)
    assert(r2.resized_payload.toSeq ==
      txt.toSeq) // stride 1: 30 bytes < 256 target keeps every byte
  }

  test("real image features: pooled luminance of actual pixels, ANN-ready") {
    // black and white constant images must map to ~0 and ~1 vectors;
    // a mid-gray sits between — i.e. the vector reflects real pixel
    // content, not payload arithmetic
    def flat(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        24, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 24).foreach(x => (0 until 24).foreach(y => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, flat(0x000000)), (2L, flat(0xffffff)), (3L, flat(0x808080)),
      (4L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val vecs = Multimodal.featureExtract(spark, df, dims = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L).forall(_ < 0.05f))
    assert(vecs(2L).forall(_ > 0.95f))
    assert(vecs(3L).forall(v => v > 0.4f && v < 0.6f))
    assert(vecs.values.forall(_.length == 16))
    // non-image payloads keep the deterministic stand-in
    assert(vecs(4L).toSeq ==
      Multimodal.featureExtract(spark,
        Seq((4L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        16).collect().head.getSeq[Float](1).toSeq)
    // non-square dims fall back cleanly even for images
    val ns = Multimodal.featureExtract(spark,
      Seq((9L, flat(0x123456))).toDF("doc_id", "payload"), dims = 12)
      .collect().head.getSeq[Float](1)
    assert(ns.length == 12)
  }

  test("real frame sampling: animated GIF frames decode via the actual codec") {
    // 4-frame animated GIF (constant-color frames), everyN=2 -> frames
    // 0 and 2, each re-encoded as a standalone PNG of the TRUE pixels
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(
        10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(x => (0 until 10).foreach(y => img.setRGB(x, y, c)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray
    assert(Multimodal.looksLikeImage(gif))

    val frames = Multimodal.frameSample(spark,
      Seq((1L, gif)).toDF("doc_id", "payload"), everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(frames.forall(_.frame_off == -1L), "decoded frames are not byte ranges")
    frames.zip(Seq(0xff0000, 0x0000ff)).foreach { case (f, expected) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_payload))
      assert(img.getWidth == 10 && img.getHeight == 10)
      assert((img.getRGB(5, 5) & 0xffffff) == expected,
        f"frame ${f.frame_idx} color ${img.getRGB(5, 5) & 0xffffff}%06x")
      assert(f.frame_len == f.frame_payload.length.toLong)
    }

    // non-GIF payloads keep the byte-slicing stub contract
    val txt = ("a" * 90).getBytes("UTF-8")
    val stub = Multimodal.frameSample(spark,
      Seq((2L, txt)).toDF("doc_id", "payload"), everyN = 1)
      .collect().sortBy(_.frame_idx)
    assert(stub.flatMap(_.frame_payload).toSeq == txt.toSeq)
  }

  /** A real PCM WAV/AIFF container built by the JDK's own encoder. */
  private def audioBytes(
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      rate: Float, channels: Int, seconds: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rate, 16, channels, true, tpe.toString == "AIFF")
    val frames = (rate * seconds).toLong
    val pcm = new Array[Byte]((frames * channels * 2).toInt)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  test("real audio decode: WAV/AIFF headers yield true rate/channels/frames") {
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
    val wav = audioBytes(wave, rate = 8000f, channels = 2, seconds = 1.5)
    val aif = audioBytes(aiff, rate = 11025f, channels = 1, seconds = 0.5)
    assert(Multimodal.looksLikeAudio(wav) && Multimodal.looksLikeAudio(aif))
    assert(!Multimodal.looksLikeImage(wav))

    val df = Seq((1L, wav), (2L, aif),
      (3L, "RIFF but not really audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decodeMeta(spark, df).collect()
      .map(m => m.doc_id -> m).toMap

    // width = sample rate, height = channels, n_frames = sample frames;
    // duration reconstructs from the REAL header: frames / rate
    assert(metas(1L).width == 8000L && metas(1L).height == 2L)
    assert(metas(1L).n_frames == 12000L) // 1.5 s at 8 kHz
    assert(metas(1L).n_frames.toDouble / metas(1L).width == 1.5)
    val crc = new java.util.zip.CRC32(); crc.update(wav)
    assert(metas(1L).checksum == crc.getValue)

    assert(metas(2L).width == 11025L && metas(2L).height == 1L)
    assert(metas(2L).n_frames == 5512L) // 0.5 s at 11.025 kHz

    // "RIFF" text without the WAVE tag never engages the parser
    assert(metas(3L) ==
      Multimodal.fakeDecode(3L, "RIFF but not really audio".getBytes("UTF-8")))
  }

  /** PCM WAV with explicit per-sample content: `gen(frameIdx) -> Short`. */
  private def pcmWav(rate: Float, seconds: Double)(
      gen: Int => Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val frames = (rate * seconds).toInt
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val s = gen(i)
      pcm(2 * i) = (s & 0xff).toByte           // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio features: RMS envelope of actual PCM, ANN-ready") {
    // 2 s at 8 kHz: first second silence, second second a full-scale
    // square wave -> with dims=4, windows 0-1 ~ 0 and windows 2-3 ~ 1.
    // Pins that the vector reflects decoded samples, not payload bytes.
    val wav = pcmWav(8000f, 2.0) { i =>
      if (i < 8000) 0.toShort
      else if (i % 2 == 0) 32767.toShort else (-32768).toShort
    }
    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val vecs = Multimodal.featureExtract(spark, df, dims = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L)(0) < 0.01f && vecs(1L)(1) < 0.01f)
    assert(vecs(1L)(2) > 0.99f && vecs(1L)(3) > 0.99f)
    // non-audio payloads keep the deterministic stand-in
    assert(vecs(2L).toSeq == Multimodal.featureExtract(spark,
      Seq((2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload"), 4)
      .collect().head.getSeq[Float](1).toSeq)
  }

  test("real audio frames: WAV splits into decodable one-second windows") {
    // 3 s at 8 kHz, everyN=2 -> windows 0 and 2, each a standalone WAV
    // holding exactly its second of samples
    val wav = pcmWav(8000f, 3.0) { i => (i / 8000) match {
      case 0 => 1000.toShort
      case 1 => 2000.toShort
      case _ => 3000.toShort
    }}
    val frames = Multimodal.frameSample(spark,
      Seq((1L, wav)).toDF("doc_id", "payload"), everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(frames.forall(_.frame_off == -1L),
      "re-encoded windows are not byte ranges")
    frames.foreach { f =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(f.frame_payload))
      assert(ais.getFrameLength == 8000L,
        s"window ${f.frame_idx}: ${ais.getFrameLength} frames")
      // constant-amplitude window: the decoded samples carry the value
      // this second was generated with (real slicing, not byte math)
      val raw = ais.readNBytes(16000)
      val sample = ((raw(1) << 8) | (raw(0) & 0xff)).toShort
      assert(sample == (if (f.frame_idx == 0L) 1000 else 3000),
        s"window ${f.frame_idx} sample $sample")
      ais.close()
      assert(f.frame_len == f.frame_payload.length.toLong)
    }
  }

  test("real AU and MIDI decode: the JDK's remaining built-in parsers engage") {
    // AU: third javax.sound.sampled container, same header-only path
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](8000 * 2) // 1 s mono
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8000L)
    val auBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AU, auBos)
    val au = auBos.toByteArray
    assert(Multimodal.looksLikeAudio(au))

    // MIDI: two tracks, explicit tick extent via end-of-track placement
    val seq = new javax.sound.midi.Sequence(javax.sound.midi.Sequence.PPQ, 24)
    val tr1 = seq.createTrack(); val tr2 = seq.createTrack()
    val on = new javax.sound.midi.ShortMessage(
      javax.sound.midi.ShortMessage.NOTE_ON, 0, 60, 93)
    val off = new javax.sound.midi.ShortMessage(
      javax.sound.midi.ShortMessage.NOTE_OFF, 0, 60, 0)
    tr1.add(new javax.sound.midi.MidiEvent(on, 0))
    tr1.add(new javax.sound.midi.MidiEvent(off, 96))
    tr2.add(new javax.sound.midi.MidiEvent(on, 48))
    val midiBos = new java.io.ByteArrayOutputStream()
    javax.sound.midi.MidiSystem.write(seq, 1, midiBos)
    val midi = midiBos.toByteArray
    assert(Multimodal.looksLikeMidi(midi))

    val df = Seq((1L, au), (2L, midi),
      (3L, "MThd but not really midi".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val metas = Multimodal.decodeMeta(spark, df).collect()
      .map(m => m.doc_id -> m).toMap
    // AU: real rate/channels/frames from the header
    assert(metas(1L).width == 8000L && metas(1L).height == 1L)
    assert(metas(1L).n_frames == 8000L)
    // MIDI: 2 tracks, tick length from the real event extents (>= 96)
    assert(metas(2L).height == 2L)
    assert(metas(2L).n_frames >= 96L)
    assert(metas(2L).width > 0L) // microsecond duration
    // a text payload wearing the magic degrades to the stub
    assert(metas(3L) == Multimodal.fakeDecode(3L,
      "MThd but not really midi".getBytes("UTF-8")))
  }

  test("corrupt audio magic degrades to the stub, not a crash") {
    // valid RIFF/WAVE magic, truncated body — the parser must reject it
    // and the pipeline must fall back deterministically
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val broken = audioBytes(wave, 8000f, 1, 0.25).take(16)
    assert(Multimodal.looksLikeAudio(broken))
    assert(Multimodal.audioDecode(1L, broken).isEmpty)
    val df = Seq((1L, broken)).toDF("doc_id", "payload")
    val m = Multimodal.decodeMeta(spark, df).collect().head
    assert(m == Multimodal.fakeDecode(1L, broken))
  }

  /** Synthesize a CBR MPEG-1 Layer III stream: `n` frames of 44.1 kHz
    * stereo at 128 kbps (frame length = 1152/8*128000/44100 = 417
    * bytes, no padding), headers real, audio payload zeroed — the
    * metadata walk reads headers only.
    */
  private def mp3Bytes(n: Int, id3: Boolean = false): Array[Byte] = {
    val frame = new Array[Byte](417)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte // sync, MPEG-1 L3 no-CRC
    frame(2) = 0x90.toByte // bitrate idx 9 (128k), rate idx 0 (44100)
    frame(3) = 0x00        // stereo
    val tag =
      if (id3) Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 20) ++
        new Array[Byte](20)
      else Array.empty[Byte]
    tag ++ Array.fill(n)(frame).flatten
  }

  test("real MP3 metadata: frame-header walk yields rate/channels/samples") {
    val clean = mp3Bytes(5)
    assert(Multimodal.looksLikeMp3(clean))
    val m = Multimodal.mp3Decode(7L, clean).get
    assert((m.width, m.height, m.n_frames) == (44100L, 2L, 5L * 1152))

    // an ID3v2 tag ahead of the frames is skipped, not mistaken for data
    val tagged = mp3Bytes(3, id3 = true)
    assert(Multimodal.looksLikeMp3(tagged))
    assert(Multimodal.mp3Decode(8L, tagged).get.n_frames == 3L * 1152)

    // the pipeline tier engages end-to-end
    val df = Seq((7L, clean)).toDF("doc_id", "payload")
    val row = Multimodal.decodeMeta(spark, df).collect().head
    assert(row.width == 44100L && row.n_frames == 5L * 1152)

    // a lone sync byte in random binary is NOT claimed (needs one full
    // frame + continuation), so arbitrary payloads keep the stub
    val junk = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
      Array.fill(40)('x'.toByte)
    assert(!Multimodal.looksLikeMp3(junk))
  }

  /** Minimal two-page Ogg Vorbis stream: a BOS page whose single packet
    * is the Vorbis id header (channels=2, rate=44100), then an EOS page
    * with granule position 88200 (= 2 s of samples).
    */
  private def oggBytes(granule: Long): Array[Byte] = {
    def page(tpe: Byte, gran: Long, segLens: Seq[Int],
        body: Array[Byte]): Array[Byte] = {
      val head = java.nio.ByteBuffer.allocate(27 + segLens.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put("OggS".getBytes("US-ASCII")).put(0: Byte).put(tpe)
        .putLong(gran).putInt(1).putInt(0).putInt(0)
        .put(segLens.size.toByte)
      segLens.foreach(l => head.put(l.toByte))
      head.array() ++ body
    }
    val id = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    id.put(1: Byte).put("vorbis".getBytes("US-ASCII"))
      .putInt(0).put(2: Byte).putInt(44100)
    page(2, 0L, Seq(30), id.array()) ++
      page(4, granule, Seq(0), Array.empty)
  }

  test("real Ogg metadata: id header + last-page granule yield rate/channels/duration") {
    val ogg = oggBytes(88200L)
    assert(Multimodal.looksLikeOgg(ogg))
    val m = Multimodal.oggDecode(9L, ogg).get
    assert((m.width, m.height, m.n_frames) == (44100L, 2L, 88200L))
    // duration = n_frames / width = 2 s

    // a non-audio Ogg stream (unknown id header) degrades to the stub
    val alien = ogg.clone()
    alien(28) = 'X'.toByte // corrupt the id magic inside the first page
    assert(Multimodal.oggDecode(9L, alien).isEmpty)
    val df = Seq((9L, alien)).toDF("doc_id", "payload")
    assert(Multimodal.decodeMeta(spark, df).collect().head ==
      Multimodal.fakeDecode(9L, alien))
  }

  test("magic sniffing never claims text payloads") {
    Seq("plain text", "BM-prefixed but short", "GIF8 not quite").foreach { s =>
      val b = s.getBytes("UTF-8")
      if (Multimodal.looksLikeImage(b))
        assert(Multimodal.imageDecode(1L, b).isEmpty)
    }
  }

  /** A syntactically valid PNG whose IHDR CLAIMS w×h but carries no
    * pixel data — the decompression-bomb shape: tiny payload, raster
    * allocation driven entirely by the header.
    */
  private def bombPng(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val typed = "IHDR".getBytes("US-ASCII") ++ ihdr
    val crc = new java.util.zip.CRC32(); crc.update(typed)
    java.nio.ByteBuffer.allocate(sig.length + 4 + typed.length + 4)
      .put(sig).putInt(13).put(typed).putInt(crc.getValue.toInt)
      .array()
  }

  test("decompression-bomb headers degrade to the stub, never allocate") {
    // 100k × 100k claimed = a 40 GB raster if decoded; the dimension
    // guard must bail header-only, well before any allocation
    val bomb = bombPng(100000, 100000)
    assert(Multimodal.looksLikeImage(bomb))
    assert(Multimodal.imageResize(bomb, 4, 4).isEmpty)
    assert(Multimodal.imageFeature(bomb, 16).isEmpty)

    // metadata decode is header-only by construction and still reports
    // the claimed dimensions — no raster involved
    val meta = Multimodal.imageDecode(9L, bomb)
    assert(meta.exists(m => m.width == 100000L && m.height == 100000L))

    // the full pipeline degrades to the byte-sampling stub instead of
    // killing the task
    import spark.implicits._
    val out = Multimodal.resize(spark,
      Seq((9L, bomb)).toDF("doc_id", "payload"), 4, 4).collect()
    assert(out.length == 1 && out(0).out_octets <= bomb.length.toLong)

    // an in-cap image still takes the real path
    assert(Multimodal.imageResize(pngBytes(20, 20), 4, 4).nonEmpty)
  }
}
