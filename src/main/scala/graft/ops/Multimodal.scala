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
  * dimensions for images, 0 for other modalities / undecodable bytes.
  */
case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
    width: Int, height: Int, features: Array[Float])

/** Multimodal-column plumbing: binary content + typed metadata, partition-
  * batched decode/feature-extraction, frame sampling. IMAGE decode is REAL
  * (javax.imageio is pure-JVM: PNG/GIF/BMP/JPEG, no native libs needed);
  * audio/video codecs are STUBS (their libraries are not in this
  * container). The Spark-side shape (schema, encoders, mapPartitions
  * batching, shuffle-free narrow execution) is real and tested in
  * MultimodalSpec either way.
  */
object Multimodal {

  def pack: Seq[Q] = Seq(d60MultimodalMeta, d61MediaIngest)

  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Decode + featurize, batched per partition (the shape a real codec
    * needs: amortize per-partition init — model load, codec context —
    * across rows, never per-row). Images go through the real imageio
    * decode; undecodable image bytes and every other modality fall back to
    * the deterministic stub with zero dimensions.
    */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      // per-partition init would go here (audio/video codec context)
      rows.map { r =>
        val decoded =
          if (r.modality == "image") decodeImage(r.content, dim) else None
        decoded match {
          case Some((w, h, f)) =>
            MediaFeatures(r.media_id, r.modality, r.content.length, w, h, f)
          case None =>
            MediaFeatures(r.media_id, r.modality, r.content.length, 0, 0,
              stubDecode(r.content, dim))
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

  /** STUB decoder — stands in for audio spectrogram / video embedding,
    * which need native libraries not present in this container (and the
    * fallback for undecodable image bytes). Deterministic by construction
    * (pure function of the bytes) so the pipeline around it is fully
    * testable.
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
        when(col("path").rlike("(?i)\\.(png|jpe?g|gif|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|mkv|webm|avi)$"), "video")
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
          max(col("width")).as("max_width"),   // real decoded dims for image
          max(col("height")).as("max_height"), // 0 for audio/binary (stub)
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
    // a REAL PNG: d61's image row exercises the true imageio decode path
    // end-to-end (dims 8x6 in the output; features from actual pixels)
    write("a.png", fixturePngBytes)
    write("b.wav", "RIFF".getBytes("UTF-8") ++ (0 until 128).map(i => (i * 3).toByte))
    write("c.bin", (0 until 32).map(i => (i * 7).toByte).toArray)
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
