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
    // NOT a decodable PNG (just magic bytes): must fall back to the stub
    // with zero dimensions, and content arrived byte-exact — features
    // equal a direct stubDecode of the same bytes
    assert(img.width === 0 && img.height === 0)
    assert(img.features.toSeq === Multimodal.stubDecode(pngBytes, 4).toSeq)
  }

  test("real PNG bytes decode to true dimensions and pixel-derived features") {
    import spark.implicits._
    // the SAME image d61 ingests (shared builder — a drifted copy here
    // would validate a different image than the fixture)
    val bytes = Multimodal.fixturePngBytes
    val bimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

    val (w, h, feats) = Multimodal.decodeImage(bytes, 3).get
    assert(w === 8 && h === 6)
    // strip means recomputed directly from the source image: strips are
    // y-ranges [0,1], [2,3], [4,5] for dim=3 over h=6
    val expect = (0 until 3).map { strip =>
      val ys = (0 until 6).filter(y => math.min(2, y * 3 / 6) == strip)
      val lums = for (y <- ys; x <- 0 until 8) yield {
        val rgb = bimg.getRGB(x, y)
        (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0f
      }
      lums.sum / lums.size
    }
    feats.toSeq.zip(expect).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-3, s"strip mean $a vs $b")
    }
    // and through the full Dataset decode path: real dims ride the row
    val ds = Seq(MediaRow(9L, "image", bytes, MediaMeta(0, 0, 0, 0L))).toDS()
    val f = Multimodal.decodeFeatures(ds, dim = 3).collect().head
    assert(f.width === 8 && f.height === 6)
    assert(f.features.toSeq === feats.toSeq)
  }

  test("real WAV bytes decode to true rate, duration, and RMS features") {
    import spark.implicits._
    // the SAME wav d61 ingests (shared builder, like the PNG path)
    val bytes = Multimodal.fixtureWavBytes
    val (rate, durMs, feats) = Multimodal.decodeWav(bytes, 4).get
    assert(rate === 8000)
    assert(durMs === 50L) // 400 samples / 8000 Hz
    // RMS recomputed directly from the triangle-wave definition: windows
    // are frame-ranges [0,100), [100,200), [200,300), [300,400) for dim=4
    val samples = (0 until 400).map(i => (((i % 100) - 50) * 500).toShort)
    val expect = (0 until 4).map { w =>
      val xs = (0 until 400).filter(i => math.min(3, i * 4 / 400) == w)
        .map(i => samples(i) / 32768.0)
      math.sqrt(xs.map(x => x * x).sum / xs.size).toFloat
    }
    feats.toSeq.zip(expect).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"window rms $a vs $b")
    }
    // undecodable audio bytes still fall back to the stub contract
    assert(Multimodal.decodeWav("RIFFnotawave".getBytes("US-ASCII"), 4).isEmpty)
    // and through the full Dataset decode path: rate/duration ride the row
    val ds = Seq(MediaRow(9L, "audio", bytes, MediaMeta(0, 0, 0, 0L))).toDS()
    val f = Multimodal.decodeFeatures(ds, dim = 4).collect().head
    assert(f.sample_rate_hz === 8000 && f.duration_ms === 50L)
    assert(f.features.toSeq === feats.toSeq)
    assert(f.width === 0 && f.height === 0)
  }

  test("G.711 expansion matches the canonical code points") {
    import Multimodal._
    // µ-law: full-scale and zero codes from the ITU-T G.711 tables —
    // pinned INDEPENDENTLY of the encoders, so a matched encode/decode
    // bug cannot hide behind the round-trip test below
    assert(ulawToPcm16(0x00) === -32124)
    assert(ulawToPcm16(0x80) === 32124)
    assert(ulawToPcm16(0xFF) === 0)
    assert(ulawToPcm16(0x7F) === 0) // negative zero code
    // A-law: sign bit SET is positive (the G.711 inversion)
    assert(alawToPcm16(0x2A) === -32256)
    assert(alawToPcm16(0xAA) === 32256)
    assert(alawToPcm16(0x55) === -8)
    assert(alawToPcm16(0xD5) === 8)
  }

  test("G.711 round trip stays within companding quantization error") {
    import Multimodal._
    // error bound: half the segment step = 2^(seg-1)·4 for µ-law; check
    // the relative form — |decoded − s| ≤ |s|/16 + 16 covers both laws'
    // 4-bit mantissa over all 8 segments, zero and sign included
    val probes = (-32768 to 32767 by 97) ++ Seq(-32768, -1, 0, 1, 32767)
    probes.foreach { s =>
      val du = ulawToPcm16(pcm16ToUlaw(s))
      val da = alawToPcm16(pcm16ToAlaw(s))
      assert(math.abs(du - s) <= math.abs(s) / 16 + 17, s"ulaw $s -> $du")
      assert(math.abs(da - s) <= math.abs(s) / 16 + 17, s"alaw $s -> $da")
    }
  }

  test("G.711 WAVs decode through the compressed branch, RMS tracks PCM") {
    val (rate, durMs, pcmF) = Multimodal.decodeWav(Multimodal.fixtureWavBytes, 4).get
    val (rateU, durU, ulawF) = Multimodal.decodeWav(Multimodal.fixtureUlawWavBytes, 4).get
    val (rateA, durA, alawF) = Multimodal.decodeWav(Multimodal.fixtureAlawWavBytes, 4).get
    // same waveform, same container params → same rate/duration
    assert(rateU === rate && rateA === rate && rate === 8000)
    assert(durU === durMs && durA === durMs && durMs === 50L)
    // companding is near-lossless at this amplitude: per-window RMS of the
    // expanded signal must track the PCM16 original within ~1%
    pcmF.zip(ulawF).zip(alawF).foreach { case ((p, u), a) =>
      assert(math.abs(u - p) <= 0.01f * math.max(p, 0.01f), s"ulaw rms $u vs $p")
      assert(math.abs(a - p) <= 0.01f * math.max(p, 0.01f), s"alaw rms $a vs $p")
    }
  }

  test("real animated-GIF bytes decode to true frames, duration, and features") {
    import spark.implicits._
    // the SAME gif d61 ingests (committed resource, like the PNG path)
    val bytes = Multimodal.fixtureGifBytes
    val (w, h, nFrames, durMs, feats) = Multimodal.decodeGif(bytes, 3).get
    assert(w === 8 && h === 6)
    assert(nFrames === 3)         // a real multi-frame decode, not a still
    assert(durMs === 300L)        // 3 frames x 10 cs GraphicControlExtension
    // features are cross-frame strip means, recomputed from the decoded
    // frames directly (palette quantization included on both sides)
    val readers = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis, false)
    val lums = Array.fill(3)(List.empty[Double])
    (0 until 3).foreach { f =>
      val img = reader.read(f)
      for (y <- 0 until 6; x <- 0 until 8) {
        val strip = math.min(2, y * 3 / 6)
        val rgb = img.getRGB(x, y)
        lums(strip) ::= (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
      }
    }
    reader.dispose(); iis.close()
    feats.toSeq.zipWithIndex.foreach { case (a, i) =>
      val b = lums(i).sum / lums(i).size
      assert(math.abs(a - b) < 1e-3, s"strip mean $a vs $b")
    }
    // undecodable video bytes (a perceptual codec) fall back to the stub
    assert(Multimodal.decodeGif("not-a-gif".getBytes("US-ASCII"), 3).isEmpty)
    // and through the full Dataset decode path: frames/duration ride the row
    val ds = Seq(MediaRow(9L, "video", bytes, MediaMeta(0, 0, 0, 0L))).toDS()
    val f = Multimodal.decodeFeatures(ds, dim = 3).collect().head
    assert(f.width === 8 && f.height === 6)
    assert(f.n_frames === 3 && f.duration_ms === 300L)
    assert(f.features.toSeq === feats.toSeq)
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
