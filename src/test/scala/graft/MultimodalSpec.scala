package graft

import graft.multimodal.{DecodedFrame, MediaRecord, Multimodal}

/** Multimodal plumbing: partition-local stub decode, resize math,
  * determinism of derived features.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media =
    Multimodal.mediaFromDocuments(spark, sf()).as[MediaRecord]

  test("decode stub is deterministic and partition-shape preserving") {
    val a = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeStub(media.repartition(7)).collect()
      .sortBy(_.media_id)
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq) // decode independent of partitioning
    assert(a.forall(f => f.mean_intensity > 0 && f.mean_intensity < 256))
  }

  test("resize stub caps the longest side and keeps ids") {
    val resized = Multimodal.resizeStub(
      Seq(DecodedFrame(1L, 0, 640, 480, 1.0),
        DecodedFrame(2L, 0, 10, 20, 2.0)).toDS(), 64).collect()
    val big = resized.find(_.media_id == 1L).get
    assert(big.width == 64 && big.height == 48)
    val small = resized.find(_.media_id == 2L).get
    assert(small.width == 10 && small.height == 20) // never upscale
  }

  test("frame offsets are capped at 5 per asset") {
    val f = Multimodal.frameOffsets(
      Multimodal.mediaFromDocuments(spark, sf()))
    val counts = f.groupBy($"media_id").count().select($"count")
      .as[Long].collect()
    assert(counts.forall(c => c >= 1 && c <= 5))
  }
}
