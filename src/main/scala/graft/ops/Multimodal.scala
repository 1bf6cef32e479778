package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import Q.t

/** Typed media metadata carried alongside opaque content bytes. */
case class MediaMeta(width: Int, height: Int, sampleRateHz: Int, durationMs: Long)

/** One multimodal row: image/audio/video as an opaque binary column plus
  * typed metadata — the schema pattern for mixed-modality training data.
  */
case class MediaRow(media_id: Long, modality: String, content: Array[Byte], meta: MediaMeta)

/** Output of the decode+featurize stage. `width`/`height` are real decoded
  * dimensions for images and video; `n_frames` the real decoded frame
  * count (1 for a still image); `sample_rate_hz`/`duration_ms` real
  * decoded audio/video timing; each 0 for other modalities / undecodable
  * bytes.
  */
case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int, sample_rate_hz: Int,
    duration_ms: Long, features: Array[Float])

/** Multimodal-column plumbing: binary content + typed metadata, partition-
  * batched decode/feature-extraction, frame sampling. IMAGE decode is REAL
  * (javax.imageio is pure-JVM: PNG/BMP/JPEG, no native libs needed);
  * AUDIO decode is REAL for WAV/PCM and for G.711 µ-law/A-law compressed
  * audio (pure-JVM RIFF parse + exact integer companding tables — sample
  * rate, duration, per-window RMS features); VIDEO decode is REAL for
  * animated GIF (an LZW-compressed multi-frame moving-picture format
  * javax.imageio reads frame-by-frame — frame count, dimensions, frame
  * delays, per-frame featurization). Perceptual codecs (MP3/FLAC/Vorbis,
  * MP4/H.264/VP9) remain STUBS by declared de-scope: no pure-JVM decoder
  * for them exists on this classpath and native libraries are not in this
  * container (SURVEY §2-C records the de-scope). The Spark-side shape
  * (schema, encoders, mapPartitions batching, shuffle-free narrow
  * execution) is real and tested in MultimodalSpec either way.
  */
object Multimodal {

  def pack: Seq[Q] = Seq(d60MultimodalMeta, d61MediaIngest)

  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Decode + featurize, batched per partition (the shape a real codec
    * needs: amortize per-partition init — model load, codec context —
    * across rows, never per-row). Images go through the real imageio
    * decode, audio through the real WAV/PCM parse; undecodable bytes and
    * every other modality fall back to the deterministic stub with zero
    * dimensions.
    */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      // per-partition init would go here (perceptual-codec context)
      rows.map { r =>
        val img = if (r.modality == "image") decodeImage(r.content, dim) else None
        val aud = if (r.modality == "audio") decodeWav(r.content, dim) else None
        val vid = if (r.modality == "video") decodeGif(r.content, dim) else None
        (img, aud, vid) match {
          case (Some((w, h, f)), _, _) =>
            MediaFeatures(r.media_id, r.modality, r.content.length, w, h, 1,
              0, 0L, f)
          case (_, Some((rate, durMs, f)), _) =>
            MediaFeatures(r.media_id, r.modality, r.content.length, 0, 0, 0,
              rate, durMs, f)
          case (_, _, Some((w, h, nf, durMs, f))) =>
            MediaFeatures(r.media_id, r.modality, r.content.length, w, h, nf,
              0, durMs, f)
          case _ =>
            MediaFeatures(r.media_id, r.modality, r.content.length, 0, 0, 0,
              0, 0L, stubDecode(r.content, dim))
        }
      }
    }

  /** REAL image decode: width/height plus `dim` horizontal-strip mean
    * luminances as the feature vector. Pure JVM (javax.imageio), pure
    * function of the pixel content — byte-level PNG encoding differences
    * cannot change it. None when the bytes are not a decodable image.
    */
  def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        var y = 0
        while (y < h) {
          val strip = math.min(dim - 1, y * dim / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(strip) +=
              (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0f
            cnt(strip) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < dim) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video decode: animated GIF through javax.imageio's frame-indexed
    * reader — (width, height, frame count, duration from the per-frame
    * GraphicControlExtension delays, features). The feature vector is the
    * image path's `dim` strip luminances averaged ACROSS frames, i.e. the
    * temporal mean of the per-frame featurization — the keyframe-embedding
    * shape with the embedding model replaced by the strip statistic.
    * Frames are featurized as stored (no canvas compositing; fixtures and
    * typical training thumbnails carry full frames). None when the bytes
    * are not a decodable GIF — perceptual video codecs (MP4/H.264) fall
    * back to the stub by declared de-scope.
    *
    * Dimensions are the LOGICAL SCREEN DESCRIPTOR's (header bytes 6-9,
    * little-endian) — the canvas every frame composites onto — so a GIF
    * whose later frames exceed frame 0 still reports full canvas size;
    * frame 0 is only the fallback for a malformed header. Duration sums
    * per-frame GraphicControlExtension delays: a multi-frame GIF with no
    * GCE blocks (or all-zero delays, which players clamp to ~100 ms each)
    * legitimately reports duration_ms = 0, meaning "unknown/player-
    * defined", NOT "instantaneous" — consumers of max_duration_ms must
    * treat 0 from a multi-frame asset as unknown.
    */
  def decodeGif(bytes: Array[Byte], dim: Int): Option[(Int, Int, Int, Long, Array[Float])] = {
    val readers = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        val acc = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var durMs = 0L
        // logical screen descriptor: canvas width/height as LE uint16 at
        // header offsets 6/8 — authoritative even when later frames are
        // larger than frame 0
        var w =
          if (bytes.length >= 10)
            (bytes(6) & 0xFF) | ((bytes(7) & 0xFF) << 8)
          else 0
        var h =
          if (bytes.length >= 10)
            (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
          else 0
        var f = 0
        while (f < n) {
          val img = reader.read(f)
          if (f == 0 && (w <= 0 || h <= 0)) { w = img.getWidth; h = img.getHeight }
          val fh = img.getHeight
          var y = 0
          while (y < fh) {
            val strip = math.min(dim - 1, y * dim / fh)
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              acc(strip) +=
                (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
              cnt(strip) += 1
              x += 1
            }
            y += 1
          }
          // frame delay (centiseconds) from the GIF image metadata; frames
          // without a GraphicControlExtension contribute 0
          val md = reader.getImageMetadata(f)
          val root = md.getAsTree(md.getNativeMetadataFormatName())
          var c = root.getFirstChild
          while (c != null) {
            if (c.getNodeName == "GraphicControlExtension") {
              val d = c.getAttributes.getNamedItem("delayTime")
              if (d != null) durMs += d.getNodeValue.toLong * 10L
            }
            c = c.getNextSibling
          }
          f += 1
        }
        if (w <= 0 || h <= 0) return None
        val out = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          if (cnt(i) > 0) out(i) = (acc(i) / cnt(i)).toFloat
          i += 1
        }
        Some((w, h, n, durMs, out))
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally reader.dispose()
  }

  // ------------------------------------------------------- G.711 companding
  // ITU-T G.711 µ-law / A-law — the telephony compressed-audio formats and
  // the one compressed codec family that is pure integer math, so it
  // decodes for real with zero native dependencies. Formulas are the
  // classic public-domain CCITT/Sun reference expansions; MultimodalSpec
  // pins the canonical extreme/zero code points independently of the
  // encoders below.

  /** Expand one µ-law byte to a linear PCM16 sample (±32124 full scale). */
  def ulawToPcm16(b: Int): Int = {
    val u = ~b & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Expand one A-law byte to a linear PCM16 sample (±32256 full scale).
    * Note G.711's inverted sign convention: a SET sign bit is positive.
    */
  def alawToPcm16(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0F) << 4
    if (seg == 0) t += 8
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Compress a linear PCM16 sample to a µ-law byte (fixture writer +
    * the encode half a telephony export sink would use).
    */
  def pcm16ToUlaw(pcm0: Int): Int = {
    val Bias = 0x84
    var pcm = pcm0
    val sign = if (pcm < 0) { pcm = -pcm; 0x80 } else 0
    pcm = math.min(pcm, 32635) + Bias
    var exp = 7
    while (exp > 0 && (pcm & (0x80 << exp)) == 0) exp -= 1
    val mant = (pcm >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** Compress a linear PCM16 sample to an A-law byte. */
  def pcm16ToAlaw(pcm0: Int): Int = {
    var pcm = pcm0
    val sign = if (pcm >= 0) 0x80 else { pcm = -pcm; 0 }
    pcm = math.min(pcm, 32767)
    // segment k ⇔ top set bit at position k+7 (k ≥ 1); below 256 → seg 0
    var exp = 7
    while (exp > 0 && (pcm & (0x80 << exp)) == 0) exp -= 1
    val mant =
      if (exp == 0) (pcm >> 4) & 0x0F
      else (pcm >> (exp + 3)) & 0x0F
    (sign | (exp << 4) | mant) ^ 0x55
  }

  /** REAL audio decode: pure-JVM RIFF/WAVE parse for uncompressed 16-bit
    * PCM (format 1) AND G.711 compressed audio (format 6 A-law, format 7
    * µ-law — 8-bit companded bytes expanded through the exact integer
    * G.711 tables above), mono or multi-channel, channels mean-mixed.
    * Returns (sampleRateHz, durationMs, per-window RMS features): the
    * content is split into `dim` equal frame windows and each feature is
    * the RMS of the normalized samples in that window — the audio
    * analogue of the image path's strip luminances. Chunk walk honors
    * RIFF's even-byte padding; None for anything else (callers fall back
    * to the stub), matching decodeImage's contract. Mirrors the
    * reference's media-ingest surface (opaque bytes → typed features)
    * without any native codec dependency.
    */
  def decodeWav(bytes: Array[Byte], dim: Int): Option[(Int, Long, Array[Float])] =
    try {
      def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
      def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
      def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = 0
      var channels = 0
      var fmt = 0
      var ok = false
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || !ok)) {
        val id = tag(off)
        val size = le32(off + 4)
        // compare in Long: off + 8 + size wraps Int for adversarial chunk
        // sizes near Int.MaxValue, which would silently bypass this guard
        if (size < 0 || off + 8 + size.toLong > bytes.length) return None
        if (id == "fmt " && size >= 16) {
          fmt = le16(off + 8)
          channels = le16(off + 10)
          rate = le32(off + 12)
          val bits = le16(off + 22)
          // PCM16, or G.711 A-law/µ-law (8-bit companded)
          ok = channels > 0 && rate > 0 &&
            ((fmt == 1 && bits == 16) ||
              ((fmt == 6 || fmt == 7) && bits == 8))
        } else if (id == "data") {
          dataOff = off + 8
          dataLen = size
        }
        off += 8 + size + (size & 1) // chunks pad to even byte boundaries
      }
      if (!ok || dataOff < 0) return None
      val bytesPerSample = if (fmt == 1) 2 else 1
      val frames = dataLen / (bytesPerSample * channels)
      if (frames <= 0) return None
      def sampleAt(idx: Int): Double = fmt match {
        case 1 => le16(dataOff + 2 * idx).toShort / 32768.0
        case 6 => alawToPcm16(bytes(dataOff + idx) & 0xFF) / 32768.0
        case _ => ulawToPcm16(bytes(dataOff + idx) & 0xFF) / 32768.0
      }
      // accumulate in DOUBLE: a float accumulator loses low bits once the
      // running sum of squares dwarfs each term (minutes-long windows)
      val acc = new Array[Double](dim)
      val cnt = new Array[Int](dim)
      var i = 0
      while (i < frames) {
        var mix = 0.0
        var ch = 0
        while (ch < channels) {
          mix += sampleAt(i * channels + ch)
          ch += 1
        }
        mix /= channels
        // long multiply: i*dim wraps Int for >Int.MaxValue/dim frames
        // (~51 min of 44.1 kHz audio at dim=16)
        val win = math.min(dim - 1, (i.toLong * dim / frames).toInt)
        acc(win) += mix * mix
        cnt(win) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) {
        if (cnt(i) > 0) out(i) = math.sqrt(acc(i) / cnt(i)).toFloat
        i += 1
      }
      Some((rate, frames * 1000L / rate, out))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder — stands in for perceptual-codec audio (MP3/FLAC) and
    * perceptual-codec video (MP4/H.264), which need native libraries not
    * present in this container (and the fallback for undecodable bytes of
    * any modality); the G.711 compressed audio formats and animated GIF
    * video decode for REAL above. Deterministic by construction (pure
    * function of the bytes) so the pipeline around it is fully testable.
    */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dim) += (h % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** STUB frame sampler — stands in for video keyframe extraction: returns
    * `nFrames` evenly-spaced byte slices of the content.
    */
  def frameSample(content: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
    require(nFrames > 0, "nFrames must be positive")
    if (content.isEmpty) Seq.fill(nFrames)(Array.emptyByteArray)
    else {
      val step = math.max(1, content.length / nFrames)
      (0 until nFrames).map { i =>
        val from = math.min(i * step, content.length - 1)
        content.slice(from, math.min(from + step, content.length))
      }
    }
  }

  /** Ingest a directory of media files as binary rows via Spark's
    * `binaryFile` source: one row per file with (path, modificationTime,
    * length, content). This is the real ingestion path for image/audio
    * dirs — partitioned by file, columnar metadata, lazily-read content —
    * mapped into the engine's MediaRow shape (modality from the extension).
    */
  def readMediaDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): org.apache.spark.sql.DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        abs(xxhash64(col("path"))).as("media_id"),
        when(col("path").rlike("(?i)\\.(png|jpe?g|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
          // .gif routes to video: animated GIF is the one moving-picture
          // format with a real pure-JVM decode (stills are 1-frame videos)
          .when(col("path").rlike("(?i)\\.(gif|mp4|mkv|webm|avi)$"), "video")
          .otherwise("binary").as("modality"),
        col("path"),
        col("length").as("n_bytes"),
        col("content"))

  /** Real binaryFile-source ingestion, end-to-end in the harness: a
    * deterministic on-disk media fixture (tiny png/wav/bin files, bytes
    * fixed by construction) is generated once per JVM, ingested through
    * `readMediaDir`, pushed through the partition-batched decode, and
    * reduced to one stable row per modality. Rows-only (DuckDB has no
    * binary-dir source to mirror); the per-file features are additionally
    * byte-exact-asserted in MultimodalSpec.
    */
  val d61MediaIngest: Q = Q(
    "d61_media_ingest",
    (s, _) => {
      import org.apache.spark.sql.functions.{round => fnRound}
      val dir = fixtureDir
      val ds = readMediaDir(s, dir)
        .select(col("media_id"), col("modality"), col("content"),
          struct(lit(0).as("width"), lit(0).as("height"),
            lit(0).as("sampleRateHz"), lit(0L).as("durationMs")).as("meta"))
        .as[MediaRow](Encoders.product[MediaRow])
      decodeFeatures(ds, dim = 8).toDF()
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          max(col("width")).as("max_width"),       // real decoded dims for image/video
          max(col("height")).as("max_height"),     // 0 for audio/binary
          max(col("n_frames")).as("max_frames"),   // real GIF frame count
          max(col("sample_rate_hz")).as("max_rate_hz"),    // real WAV decode
          max(col("duration_ms")).as("max_duration_ms"),   // real WAV/GIF timing
          fnRound(sum(element_at(col("features"), 1)), 3).as("feat0_sum"))
        .orderBy(col("modality"))
    },
    None)

  /** The real 8×6 test PNG with a deterministic pixel pattern — ONE
    * definition shared with MultimodalSpec, so the spec always validates
    * the exact image d61 ingests. The ENCODED BYTES are a committed
    * classpath resource (pixel (x,y) = RGB(x·30+y·9, y·30, x·20+5),
    * encoded once at build-fixture time), so d61's total_bytes no longer
    * depends on which JRE's PNG encoder runs the query — re-encoding at
    * runtime made the byte length stable per JRE but not across vendors.
    */
  private[ops] lazy val fixturePngBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/img_8x6.png")
    require(in != null, "fixture resource /graft/fixtures/img_8x6.png missing")
    try in.readAllBytes() finally in.close()
  }

  /** The real 3-frame 8×6 animated-GIF fixture, a committed resource like
    * the PNG (frame f pixel (x,y) = RGB(x·30+y·9+f·40, y·30+f·20,
    * x·20+5+f·10), 10 cs delay per frame — written once by a JDK
    * GIFImageWriter at build-fixture time, so bytes are vendor-stable).
    */
  private[ops] lazy val fixtureGifBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/anim_8x6.gif")
    require(in != null, "fixture resource /graft/fixtures/anim_8x6.gif missing")
    try in.readAllBytes() finally in.close()
  }

  /** The shared fixture waveform: 400 samples of an integer triangle
    * wave, sample(i) = ((i % 100) − 50)·500 — deterministic by definition.
    */
  private[ops] def fixtureSamples: IndexedSeq[Short] =
    (0 until 400).map(i => (((i % 100) - 50) * 500).toShort)

  /** Build a RIFF/WAVE byte array around pre-encoded sample data — the
    * layout is fixed by the spec, so unlike the PNG there is no encoder
    * variance to pin down. `fmtCode` 1 = PCM, 6 = A-law, 7 = µ-law.
    */
  private def buildWav(fmtCode: Short, bitsPerSample: Short,
      rateHz: Int, data: Array[Byte]): Array[Byte] = {
    val blockAlign = (bitsPerSample / 8).toShort
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmtCode)
      .putShort(1)                    // mono
      .putInt(rateHz)
      .putInt(rateHz * blockAlign)    // byte rate
      .putShort(blockAlign)
      .putShort(bitsPerSample)
    bb.put("data".getBytes("US-ASCII")).putInt(data.length)
    bb.put(data)
    bb.array()
  }

  /** The real 8000 Hz mono PCM16 test WAV — ONE definition shared with
    * MultimodalSpec, so d61's decoded rate/duration/RMS row is stable.
    */
  private[ops] lazy val fixtureWavBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(fixtureSamples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fixtureSamples.foreach(bb.putShort(_))
    buildWav(1, 16, 8000, bb.array())
  }

  /** The same waveform G.711-µ-law-companded (format 7, 8-bit) — d61's
    * real COMPRESSED-audio ingest path. Its decoded RMS must track the
    * PCM fixture's within companding error (MultimodalSpec pins that).
    */
  private[ops] lazy val fixtureUlawWavBytes: Array[Byte] =
    buildWav(7, 8, 8000,
      fixtureSamples.map(s => pcm16ToUlaw(s).toByte).toArray)

  /** The same waveform G.711-A-law-companded (format 6, 8-bit). */
  private[ops] lazy val fixtureAlawWavBytes: Array[Byte] =
    buildWav(6, 8, 8000,
      fixtureSamples.map(s => pcm16ToAlaw(s).toByte).toArray)

  /** One deterministic fixture per JVM: wav/bin bytes fixed by
    * construction; the png's pixels fixed (see [[fixturePngBytes]] on byte
    * stability). Best-effort cleanup on JVM exit (files registered after
    * the dir so deleteOnExit's LIFO order removes them first).
    */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_fixture")
    dir.toFile.deleteOnExit()
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = dir.resolve(name)
      java.nio.file.Files.write(f, bytes)
      f.toFile.deleteOnExit()
    }
    // REAL media: d61's image and audio rows exercise the true imageio and
    // WAV decode paths end-to-end (real dims, rate, duration, RMS) —
    // including both G.711 companded formats through the compressed branch
    write("a.png", fixturePngBytes)
    write("b.wav", fixtureWavBytes)
    write("c.bin", (0 until 32).map(i => (i * 7).toByte).toArray)
    write("d_ulaw.wav", fixtureUlawWavBytes)
    write("e_alaw.wav", fixtureAlawWavBytes)
    write("f_anim.gif", fixtureGifBytes)
    dir.toString
  }

  /** Opaque-binary metadata pass: treat text bytes as content, compute
    * byte length + content hash — the manifest/integrity scan a multimodal
    * pipeline runs before decode. (The test corpus has no binary media, so
    * text bytes stand in; the operators are type-agnostic over binary.)
    */
  val d60MultimodalMeta: Q = Q(
    "d60_multimodal_meta",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id").as("media_id"),
          lit("text").as("modality"),
          col("text").cast("binary").as("content"))
        .select(
          col("media_id"), col("modality"),
          length(col("content")).cast("long").as("n_bytes"),
          sha2(col("content"), 256).as("content_sha"))
        .orderBy(col("media_id")),
    Some("""
      SELECT doc_id AS media_id, 'text' AS modality,
        octet_length(encode(text)) AS n_bytes,
        sha256(text) AS content_sha
      FROM documents ORDER BY media_id"""))
}
