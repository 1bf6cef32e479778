package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline OBSERVABILITY via `Dataset.observe` — accumulator-backed
  * metrics collected DURING a pass, not by re-running it: row counts,
  * null rates, and value bounds ride the action that materializes the
  * query (one extra projection, zero extra scans/shuffles). This is how a
  * production pipeline exports per-batch data-quality counters to its
  * scheduler without doubling its I/O — the programmatic twin of the SQL
  * metrics q72's custom operator exposes in the UI.
  */
object Observability {

  /** Attach a standard data-quality observation over `cols` of `df`.
    * Returns the instrumented frame and the [[Observation]] handle —
    * read `obs.get` AFTER an action has materialized the frame.
    *
    * Metrics per column c: `<c>_nulls`; plus global `n_rows`. Null
    * counting uses count(when(isNull)) — a codegen conditional count,
    * no shuffle of its own.
    */
  def withQualityMetrics(df: DataFrame, cols: Seq[String])
      : (DataFrame, Observation) = {
    val obs = Observation()
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => count(when(col(c).isNull, 1)).as(s"${c}_nulls"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Attach min/max bounds observation for a numeric column — the cheap
    * range assertion a pipeline checks before publishing a partition.
    */
  def withBounds(df: DataFrame, c: String): (DataFrame, Observation) = {
    val obs = Observation()
    (df.observe(obs, min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max"), count(lit(1)).as("n_rows")), obs)
  }
}
