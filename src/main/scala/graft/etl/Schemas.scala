package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the playlist-ETL domain.
  *
  * The raw input is a Spotify `playlist_tracks` page: a top-level object with
  * an `items` array of `{added_at, track{album, artists[], ...}}` structs
  * (shape per the reference's field accesses, `spotifytransform.py:26-64`,
  * and its README spec, `Readme.MD:170-187`). Schemas are declared — never
  * inferred — so production reads are single-pass and drift fails loudly at
  * analysis time instead of silently reshaping output.
  */
object Schemas {

  val ExternalUrls: StructType = StructType(Seq(
    StructField("spotify", StringType)))

  val ArtistStruct: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("external_urls", ExternalUrls)))

  val AlbumStruct: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("release_date", StringType), // multi-precision: yyyy[-MM[-dd]]
    StructField("total_tracks", IntegerType),
    StructField("external_urls", ExternalUrls)))

  val TrackStruct: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("duration_ms", LongType),
    StructField("popularity", IntegerType),
    StructField("external_urls", ExternalUrls),
    StructField("album", AlbumStruct),
    StructField("artists", ArrayType(ArtistStruct))))

  val ItemStruct: StructType = StructType(Seq(
    StructField("added_at", StringType), // ISO-8601 UTC → TimestampType downstream
    StructField("track", TrackStruct)))

  /** Schema of one raw landed playlist JSON document. */
  val PlaylistSchema: StructType = StructType(Seq(
    StructField("items", ArrayType(ItemStruct))))

  // ---- Output tables (star schema; column names fixed by the reference's
  // ---- frame construction, spotifytransform.py:91,94,97) ----

  val SongSchema: StructType = StructType(Seq(
    StructField("song_id", StringType),
    StructField("name", StringType),
    StructField("duration_ms", LongType),
    StructField("url", StringType),
    StructField("popularity", IntegerType),
    StructField("added_date", TimestampType),
    StructField("album_id", StringType),
    StructField("artist_id", StringType)))

  val ArtistSchema: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("name", StringType),
    StructField("url", StringType)))

  val AlbumSchema: StructType = StructType(Seq(
    StructField("album_id", StringType),
    StructField("name", StringType),
    StructField("release_date", DateType),
    StructField("total_tracks", IntegerType),
    StructField("url", StringType)))
}

/** Typed rows for the star-schema outputs (Dataset[T] at the typed core). */
case class Song(
    song_id: String,
    name: String,
    duration_ms: Option[Long],
    url: String,
    popularity: Option[Int],
    added_date: Option[java.sql.Timestamp],
    album_id: String,
    artist_id: String)

case class Artist(artist_id: String, name: String, url: String)

case class Album(
    album_id: String,
    name: String,
    release_date: Option[java.sql.Date],
    total_tracks: Option[Int],
    url: String)
