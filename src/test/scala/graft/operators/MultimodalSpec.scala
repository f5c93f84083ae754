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
}
