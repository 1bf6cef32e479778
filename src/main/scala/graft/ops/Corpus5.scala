package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Fifth corpus-curation pack: sampling-policy arithmetic. d39/d66/d81
  * decide WHAT goes into a mix; this pack covers the standard published
  * policy transforms applied to those counts — starting with
  * temperature-scaled source weighting (the multilingual-corpus
  * flattening rule, weights ∝ countᵝ with β = 1/T < 1).
  */
object Corpus5 {

  def pack: Seq[Q] = Seq(d88TemperatureMix)

  /** d88: TEMPERATURE-SCALED SOURCE MIX — per-source sampling weights
    * flattened at T=2 (w ∝ √tokens), vs the natural token-proportional
    * weights, plus the token allocation of a fixed 1M-token budget and
    * each source's resulting oversampling factor (epochs, in bp).
    *
    * T=2 is the one temperature whose power is cross-engine exact: IEEE
    * sqrt is correctly rounded in both engines, and every later step is
    * integer arithmetic on the 10⁻⁶ grid (round(√t·10⁶) → BIGINT), so
    * weights, allocations and epoch factors hash-match bit-exactly. A
    * fractional temperature would route through pow(), whose libm results
    * are not specified to the last ulp.
    *
    * Scale shape: ONE keyed aggregation over the corpus (per-source token
    * counts — map-side partial combine does almost all the work); the
    * policy arithmetic then runs on |sources| rows with the grand total
    * attached as a 1-row broadcast cross join. At 100 TB the heavy pass
    * is the same single aggregation; everything after is O(|sources|).
    */
  /** Core builder, exposed for planted-count specs: the T=2 policy table
    * over any (source, text) frame. */
  def temperatureMix(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perSource = docs
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .withColumn("grid",
        round(sqrt(col("tokens").cast("double")) * lit(1000000.0))
          .cast("long"))
    val tot = perSource.agg(sum(col("tokens")).as("tt"),
      sum(col("grid")).as("tg"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        expr("(tokens * 10000) div tt").as("natural_bp"),
        expr("(grid * 10000) div tg").as("flat_bp"),
        expr("(grid * 1000000) div tg").as("alloc_tokens"),
        expr("(((grid * 1000000) div tg) * 10000) div tokens")
          .as("epochs_bp"))
      .orderBy(col("source"))
  }

  val d88TemperatureMix: Q = Q(
    "d88_temperature_mix",
    (s, dir) => temperatureMix(Q.spread(t(s, dir, "documents"), "doc_id")),
    Some("""
      WITH per AS (
        SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
          CAST(round(sqrt(CAST(sum(len(string_split(text, ' ')))
                              AS DOUBLE)) * 1000000.0) AS BIGINT) AS grid
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
                     CAST(sum(grid) AS BIGINT) AS tg FROM per)
      SELECT source, tokens,
        CAST((tokens * 10000) // tt AS BIGINT) AS natural_bp,
        CAST((grid * 10000) // tg AS BIGINT) AS flat_bp,
        CAST((grid * 1000000) // tg AS BIGINT) AS alloc_tokens,
        CAST((((grid * 1000000) // tg) * 10000) // tokens AS BIGINT)
          AS epochs_bp
      FROM per CROSS JOIN tot ORDER BY source"""))
}
