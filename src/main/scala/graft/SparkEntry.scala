package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Clustering, Corpus, Corpus2, Corpus3, Corpus4, Corpus5, Corpus6, CustomExprQueries, Dedup, EventPatterns, EventWindows, Formats, Graph, Graph2, Graph3, Graph4, Graph5, GridLsh, IvfPq, Multimodal, PortableSketches, Profiling, Q, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, Relational8, ScalePatterns, Similarity, Similarity2, Similarity3, Similarity4, Similarity5, Similarity6, Similarity7, TextAnalysis, VersionedTable}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a [[graft.ops.Q]] in one
  * of the packs below: a named Spark query over the driver's test tables
  * plus (when SQL-expressible) a DuckDB oracle the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    Relational.pack ++ Relational2.pack ++ Relational3.pack ++
      Relational4.pack ++ Relational5.pack ++ Relational6.pack ++
      Relational7.pack ++ Relational8.pack ++ PortableSketches.pack ++
      Formats.pack ++ VersionedTable.pack ++
      EventWindows.pack ++ EventPatterns.pack ++ TextAnalysis.pack ++
      Dedup.pack ++
      Corpus.pack ++ Corpus2.pack ++ Corpus3.pack ++ Corpus4.pack ++
      Corpus5.pack ++ Corpus6.pack ++
      Similarity.pack ++ Similarity2.pack ++ Similarity3.pack ++
      Similarity4.pack ++ Similarity5.pack ++ Similarity6.pack ++
      Similarity7.pack ++
      IvfPq.pack ++ GridLsh.pack ++
      Multimodal.pack ++ CustomExprQueries.pack ++ ScalePatterns.pack ++
      Clustering.pack ++ Graph.pack ++ Graph2.pack ++ Graph3.pack ++
      Graph4.pack ++ Graph5.pack ++
      Profiling.pack

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RegionalRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
