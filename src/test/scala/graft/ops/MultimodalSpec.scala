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

  test("readMediaDir ingests real binary files end-to-end through decodeFeatures") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // write a real on-disk fixture dir: the binaryFile source must see
    // actual files (modality from extension, content bytes verbatim)
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    val pngBytes = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    write("a.png", pngBytes)
    write("b.wav", "RIFFfakewavdata".getBytes("UTF-8"))
    write("c.bin", Array[Byte](0, 1, 2, 3, 4))

    val ingested = Multimodal.readMediaDir(spark, dir.getAbsolutePath)
    val byMod = ingested.collect()
      .map(r => r.getAs[String]("modality") -> r.getAs[Long]("n_bytes")).toMap
    assert(byMod === Map("image" -> 7L, "audio" -> 15L, "binary" -> 5L))

    // full path: binaryFile ingest → MediaRow → partition-batched decode
    val ds = ingested.select(
      col("media_id"), col("modality"), col("content"),
      struct(lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRateHz"), lit(0L).as("durationMs")).as("meta"))
      .as[MediaRow]
    val feats = Multimodal.decodeFeatures(ds, dim = 4).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.features.length === 4))
    val img = feats.find(_.modality == "image").get
    assert(img.n_bytes === 7)
    // content arrived byte-exact: features equal a direct stubDecode of them
    assert(img.features.toSeq === Multimodal.stubDecode(pngBytes, 4).toSeq)
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
