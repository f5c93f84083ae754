package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: ADVERSARIAL media headers — decompression-bomb dimensions,
  * zero/negative dimensions, truncated bodies, frame descriptors with no
  * data — never throw out of any decode path and never reach a full
  * decode past the [[Multimodal.MaxDecodePixels]] guard. Every payload
  * either decodes for real (in-cap, well-formed) or degrades
  * deterministically to the stub; no input may fail the partition.
  */
class MultimodalBombPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- adversarial PNG: a syntactically valid signature + IHDR whose
  // CLAIMED dimensions are hostile; body optionally truncated/absent ----

  private def pngHeader(w: Int, h: Int, goodCrc: Boolean): Array[Byte] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val typed = "IHDR".getBytes("US-ASCII") ++ ihdr
    val crc = new java.util.zip.CRC32(); crc.update(typed)
    val crcVal = if (goodCrc) crc.getValue.toInt else crc.getValue.toInt ^ 0x5a5a5a5a
    java.nio.ByteBuffer.allocate(sig.length + 4 + typed.length + 4)
      .put(sig).putInt(13).put(typed).putInt(crcVal)
      .array()
  }

  // ---- adversarial GIF: valid GIF89a signature + screen descriptor,
  // then frame descriptors claiming hostile dimensions with empty or
  // missing pixel data (the frame-count/data mismatch shape) ----

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def gifBytes(
      screenW: Int, screenH: Int, frames: Seq[(Int, Int)],
      trailer: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    bos.write(le16(screenW)); bos.write(le16(screenH))
    bos.write(0x00); bos.write(0); bos.write(0) // no global color table
    frames.foreach { case (w, h) =>
      bos.write(0x2c) // image separator
      bos.write(le16(0)); bos.write(le16(0))
      bos.write(le16(w)); bos.write(le16(h))
      bos.write(0x00) // no local color table
      bos.write(0x02) // LZW min code size
      bos.write(0x00) // zero-length data sub-block: descriptor, no pixels
    }
    if (trailer) bos.write(0x3b)
    bos.toByteArray
  }

  // hostile dimension pool: zero, negative, just-over-cap, 16/32-bit max
  private val dimGen: Gen[Int] = Gen.oneOf(
    0, 1, 64, 4096, 4097, 5000, 65535, 100000, 1 << 20,
    Int.MaxValue, -1, Int.MinValue)

  private val pngGen: Gen[Array[Byte]] = for {
    w <- dimGen
    h <- dimGen
    goodCrc <- Gen.oneOf(true, false)
    keep <- Gen.chooseNum(8, 33) // truncate anywhere past the signature
    truncate <- Gen.oneOf(true, false)
  } yield {
    val full = pngHeader(w, h, goodCrc)
    if (truncate) full.take(keep) else full
  }

  private val gifGen: Gen[Array[Byte]] = for {
    sw <- dimGen.map(d => d & 0xffff)
    sh <- dimGen.map(d => d & 0xffff)
    nFrames <- Gen.chooseNum(0, 4) // incl. ZERO descriptors
    dims <- Gen.listOfN(nFrames,
      for { w <- dimGen.map(_ & 0xffff); h <- dimGen.map(_ & 0xffff) }
        yield (w, h))
    trailer <- Gen.oneOf(true, false)
  } yield gifBytes(sw, sh, dims, trailer)

  private def cases(gen: Gen[Array[Byte]], n: Int): Seq[Array[Byte]] =
    (1 to n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong * 31)))

  test("adversarial PNG headers: every path degrades, none throws or allocates") {
    cases(pngGen, 120).zipWithIndex.foreach { case (p, i) =>
      // full-decode paths must refuse anything hostile — claimed
      // dimensions <= 0 or past the cap never reach a raster
      val resized = Multimodal.imageResize(p, 4, 4)
      val feature = Multimodal.imageFeature(p, 16)
      // a bomb header has no pixel data, so a real decode can only
      // happen for benign claims — and these payloads carry none
      assert(resized.isEmpty, s"case $i: resize decoded a bomb header")
      assert(feature.isEmpty, s"case $i: feature decoded a bomb header")
      // header-only metadata never allocates a raster; either answer
      // (claimed dims or None) is fine as long as it returns
      Multimodal.imageDecode(1L, p)
    }
  }

  test("adversarial GIF headers: frame paths degrade, none throws") {
    cases(gifGen, 120).zipWithIndex.foreach { case (g, i) =>
      assert(Multimodal.gifFrames(1L, g, 1).forall(_.forall(f =>
        f.frame_len == f.frame_payload.length.toLong)),
        s"case $i: gifFrames returned an inconsistent frame")
      Multimodal.imageDecode(1L, g)
      assert(Multimodal.imageResize(g, 4, 4).forall(_.nonEmpty))
    }
  }

  // ---- adversarial WAV: valid RIFF/WAVE + fmt chunk, data chunk
  // CLAIMING a hostile byte count with little or no actual PCM ----

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wavHeader(
      claimedDataBytes: Long, actualBytes: Int, rate: Int,
      channels: Int, bits: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val blockAlign = math.max(1, channels * (bits / 8))
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(36L + claimedDataBytes), 0, 4)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    bos.write(le32(16), 0, 4)
    bos.write(Array(1.toByte, 0.toByte)) // PCM
    bos.write(le32(channels.toLong & 0xffff).take(2), 0, 2)
    bos.write(le32(rate.toLong), 0, 4)
    bos.write(le32(rate.toLong * blockAlign), 0, 4)
    bos.write(le32(blockAlign.toLong).take(2), 0, 2)
    bos.write(le32(bits.toLong).take(2), 0, 2)
    bos.write("data".getBytes("US-ASCII"))
    bos.write(le32(claimedDataBytes), 0, 4)
    bos.write(new Array[Byte](actualBytes))
    bos.toByteArray
  }

  private val wavGen: Gen[Array[Byte]] = for {
    claimed <- Gen.oneOf(0L, 2L, 0x7fffffffL, 0xfffffff0L,
      Multimodal.MaxAudioBytes + 2, 1L << 40)
    actual <- Gen.chooseNum(0, 64)
    rate <- Gen.oneOf(0, 1, 8000, Int.MaxValue)
    channels <- Gen.oneOf(0, 1, 2, 0xffff)
    bits <- Gen.oneOf(0, 8, 16, 24, 255)
  } yield wavHeader(claimed, actual, rate, channels, bits)

  test("adversarial WAV headers: audio paths degrade, none throws or allocates") {
    cases(wavGen, 120).zipWithIndex.foreach { case (w, i) =>
      // header-only metadata returns (claimed numbers or stub — fine)
      Multimodal.audioDecode(1L, w)
      // full-PCM paths: a claim past MaxAudioBytes (or any hostile
      // layout) must refuse before any sample buffer exists
      val feat = Multimodal.audioFeature(w, 8)
      assert(feat.forall(_.length == 8), s"case $i: bad feature shape")
      assert(Multimodal.audioFrames(1L, w, 1).forall(_.forall(f =>
        f.frame_len == f.frame_payload.length.toLong)),
        s"case $i: inconsistent audio frame")
    }
  }

  test("the full pipeline over a hostile batch completes deterministically") {
    import spark.implicits._
    val payloads = (cases(pngGen, 40) ++ cases(gifGen, 40) ++
      cases(wavGen, 40))
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val df = payloads.toDF("doc_id", "payload")

    def run() = (
      Multimodal.decodeMeta(spark, df).collect().sortBy(_.doc_id).toSeq,
      Multimodal.resize(spark, df, 4, 4).collect().sortBy(_.doc_id)
        .map(r => (r.doc_id, r.out_octets)).toSeq,
      Multimodal.frameSample(spark, df, 1).collect()
        .map(f => (f.doc_id, f.frame_idx, f.frame_len)).sortBy(identity).toSeq,
      Multimodal.featureExtract(spark, df, 16).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).sortBy(_._1).toSeq)

    val a = run()
    val b = run()
    // one metadata row per payload — nothing dropped, nothing crashed
    assert(a._1.size == payloads.size)
    assert(a._4.forall(_._2.size == 16))
    // frameSample never silently drops a document: every payload emits
    // at least one frame (a rejected real path falls to the stub, which
    // always produces >= 1) — pins the truncated-WAV zero-window case
    assert(a._3.map(_._1).distinct.size == payloads.size,
      "frameSample dropped a document")
    // byte-identical across runs: degradation is deterministic
    assert(a == b)
  }
}
