package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date helpers with the reference's lenient parsing semantics.
  *
  * Spotify's `album.release_date` arrives at three precisions —
  * `"yyyy"`, `"yyyy-MM"`, `"yyyy-MM-dd"` — and the reference parses all three
  * leniently via pandas `to_datetime` (`spotifytransform.py:99`). A single
  * Spark `to_date(c, fmt)` would silently null two of the three, so we
  * coalesce `try_to_date` over the formats from most- to least-specific.
  * `try_to_date` (not `to_date`) keeps the expression total under ANSI mode
  * (Spark 4 default): malformed input yields NULL instead of throwing, which
  * is the lenient superset of the reference's behavior.
  */
object Dates {

  /** Parse yyyy | yyyy-MM | yyyy-MM-dd to a DateType column (first-of-period
    * for partial precision, matching pandas' to_datetime).
    */
  def parseReleaseDate(c: Column): Column = coalesce(
    try_to_date(c, "yyyy-MM-dd"),
    try_to_date(c, "yyyy-MM"),
    try_to_date(c, "yyyy"))

  /** DuckDB-equivalent SQL fragment for oracle parity. */
  def parseReleaseDateSql(expr: String): String =
    s"coalesce(try_strptime($expr, '%Y-%m-%d'), try_strptime($expr, '%Y-%m'), try_strptime($expr, '%Y'))::date"
}
