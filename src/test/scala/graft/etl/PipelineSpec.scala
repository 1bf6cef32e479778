package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Path}
import java.util.Comparator

/** End-to-end pipeline tests: batch (json → 3 CSVs) and streaming
  * (inbox → per-batch outputs, source files archived).
  */
class PipelineSpec extends SparkSpec {

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    p
  }

  private val fixture = getClass.getResource("/playlist_fixture.json").getPath

  test("batch pipeline writes 3 header CSVs with expected row counts") {
    val in = tmpDir("graft-in")
    val out = tmpDir("graft-out")
    Files.copy(java.nio.file.Paths.get(fixture), in.resolve("spotify_raw_1.json"))

    val (nSongs, nArtists, nAlbums) =
      PipelineBatch.run(spark, in.toString, out.toString, runId = "test")
    assert((nSongs, nArtists, nAlbums) === (5L, 3L, 4L))

    // re-read what we wrote: header CSV, FK-consistent
    val songs = spark.read.option("header", true).csv(s"$out/song_data/run=test")
    assert(songs.columns.toSeq === Seq(
      "song_id", "name", "duration_ms", "url", "popularity",
      "added_date", "album_id", "artist_id"))
    assert(songs.count() === 5)

    // idempotent overwrite (reference C3 semantics)
    PipelineBatch.run(spark, in.toString, out.toString, runId = "test")
    assert(spark.read.option("header", true)
      .csv(s"$out/song_data/run=test").count() === 5)
  }

  test("CSV output quotes commas, quotes, and newlines in track names") {
    import spark.implicits._
    val nasty = "Track, with \"quotes\" and\nnewline"
    val json =
      ("""{"items":[{"added_at":"2023-01-01T00:00:00Z","track":{"id":"tq",
         |"name":""" + "\"Track, with \\\"quotes\\\" and\\nnewline\"" + ""","duration_ms":1,"popularity":1,
         |"external_urls":{"spotify":"u"},
         |"album":{"id":"alq","name":"A","release_date":"2020","total_tracks":1,
         |"external_urls":{"spotify":"u"}},
         |"artists":[{"id":"arq","name":"N","external_urls":{"spotify":"u"}}]}}]}""").stripMargin
        .replace("\n|", "").replace("|", "")
    val in = tmpDir("graft-csvq")
    val out = tmpDir("graft-csvq-out")
    Files.writeString(in.resolve("nasty.json"), json)
    PipelineBatch.run(spark, in.toString, out.toString, runId = "q")
    // a round-trip read must reconstruct the exact name, newline included
    val got = spark.read.option("header", true).option("multiLine", true)
      .csv(s"$out/song_data/run=q").collect().head.getAs[String]("name")
    assert(got === nasty)
  }

  test("streaming pipeline processes inbox files and archives the source") {
    val inbox = tmpDir("graft-inbox")
    val out = tmpDir("graft-sout")
    val archive = tmpDir("graft-archive")
    val ckpt = tmpDir("graft-ckpt")
    Files.copy(java.nio.file.Paths.get(fixture), inbox.resolve("spotify_raw_a.json"))

    val q = PipelineStream.start(
      spark, inbox.toString, out.toString, archive.toString, ckpt.toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      val songs = spark.read.option("header", true).csv(s"$out/song_data/run=0")
      assert(songs.count() === 5)

      // a second arriving file commits batch 0; its source then gets archived
      Files.copy(java.nio.file.Paths.get(fixture), inbox.resolve("spotify_raw_b.json"))
      q.processAllAvailable()

      // cleanSource=archive is async — poll for the move out of the inbox
      val deadline = System.currentTimeMillis() + 30000
      def archivedCount(): Long = Files.walk(archive)
        .filter(p => p.toString.endsWith(".json")).count()
      while (archivedCount() < 1 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(200)
      }
      assert(archivedCount() >= 1)
    } finally q.stop()
  }
}
