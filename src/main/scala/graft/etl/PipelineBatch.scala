package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch entry for the playlist ETL: landed JSON page(s) in → the 3-table
  * star schema out as CSV-with-header (the reference's output contract,
  * `spotifytransform.py:102-130`: header, UTF-8, overwrite).
  *
  * Output layout mirrors the reference's per-table dirs
  * (`raw/transformed_data/{song,album,artist}_data/`), with a `run=<id>`
  * subdirectory in place of its timestamp-suffixed file names — which makes
  * runs idempotent (SaveMode.Overwrite per run dir) and gives downstream
  * readers partition pruning on run id for free.
  */
object PipelineBatch {

  /** Read every landed playlist JSON in `inDir` (pretty-printed multi-line
    * documents, as the reference lands them with `indent=2`,
    * `spotifyextract.py:100`).
    */
  def readLanding(spark: SparkSession, inDir: String): DataFrame =
    spark.read
      .schema(Schemas.PlaylistSchema)
      .option("multiLine", value = true)
      .json(inDir)

  /** Transform and write the three tables. Returns the output row counts
    * (songs, artists, albums) so callers can assert/log.
    */
  def run(spark: SparkSession, inDir: String, outDir: String, runId: String): (Long, Long, Long) = {
    val raw = readLanding(spark, inDir)
    val (songs, artists, albums) = SpotifyTransform(raw)

    // persist around write+count so each table's transform (and the input
    // JSON parse) runs once, not once per action; counts then agree with
    // exactly what was written even if the landing dir changes mid-run
    def write(df: DataFrame, table: String): Long = {
      df.persist()
      try {
        df.write
          .mode(SaveMode.Overwrite)
          .option("header", value = true)
          .csv(s"$outDir/${table}_data/run=$runId")
        df.count()
      } finally df.unpersist()
    }

    (write(songs, "song"), write(artists, "artist"), write(albums, "album"))
  }
}
