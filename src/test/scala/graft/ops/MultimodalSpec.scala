package graft.ops

import graft.SparkSpec

/** Exercises the multimodal plumbing: typed binary rows through the
  * partition-batched (stubbed) decode, and the frame sampler.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8"), MediaMeta(64, 64, 0, 0L)),
      MediaRow(2L, "audio", "fake-wav-bytes-bbbbbb".getBytes("UTF-8"), MediaMeta(0, 0, 16000, 2000L)),
      MediaRow(3L, "video", Array.emptyByteArray, MediaMeta(128, 128, 0, 5000L)))
      .toDS()
  }

  test("decodeFeatures preserves ids, byte counts, and feature dimension") {
    val out = Multimodal.decodeFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).n_bytes === 19)
    assert(out(2L).modality === "audio")
    assert(out.values.forall(_.features.length === 8))
    assert(out(3L).features.forall(_ === 0.0f)) // empty content → zero features
  }

  test("stub decode is deterministic (pure function of bytes)") {
    val a = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) => assert(x.features.toSeq === y.features.toSeq) }
  }

  test("frameSample slices evenly and handles empty content") {
    val frames = Multimodal.frameSample("0123456789".getBytes("UTF-8"), 3)
    assert(frames.length === 3)
    assert(frames.forall(_.nonEmpty))
    assert(new String(frames.head, "UTF-8") === "012")
    val empty = Multimodal.frameSample(Array.emptyByteArray, 2)
    assert(empty.length === 2 && empty.forall(_.isEmpty))
  }
}
