package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** The binaryFile ingestion path for multimodal dirs: one row per file,
  * modality classified from the extension, content bytes intact.
  */
class BinarySourceSpec extends SparkSpec {

  test("readMediaDir ingests a directory of media files as binary rows") {
    val dir = Files.createTempDirectory("graft-media")
    Files.write(dir.resolve("a.png"), "fake-png".getBytes("UTF-8"))
    Files.write(dir.resolve("b.WAV"), "fake-wav-bytes".getBytes("UTF-8"))
    Files.write(dir.resolve("c.mp4"), "fake-video".getBytes("UTF-8"))
    Files.write(dir.resolve("d.bin"), Array[Byte](0, 1, 2))

    val rows = Multimodal.readMediaDir(spark, dir.toString).collect()
      .map(r => r.getAs[String]("path").split('/').last ->
        (r.getAs[String]("modality"), r.getAs[Long]("n_bytes")))
      .toMap
    assert(rows.keySet === Set("a.png", "b.WAV", "c.mp4", "d.bin"))
    assert(rows("a.png") === ("image", 8L))
    assert(rows("b.WAV") === ("audio", 14L))
    assert(rows("c.mp4") === ("video", 10L))
    assert(rows("d.bin") === ("binary", 3L))

    // content survives byte-for-byte and feeds the decode stage
    val png = Multimodal.readMediaDir(spark, dir.toString, glob = "*.png")
      .collect().head
    assert(new String(png.getAs[Array[Byte]]("content"), "UTF-8") === "fake-png")
  }
}
