package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located join path.
  *
  * A fact-fact join (orders ⋈ lineitem) normally hash-shuffles BOTH sides
  * on every query. Writing each table bucketed (and sorted) by the join key
  * moves that shuffle to write time, once: readers see compatible
  * partitioning, so every subsequent join on the key is bucket-local —
  * no Exchange on either side. At 100 TB this converts the dominant
  * recurring cost of a star-schema workload into a one-time layout
  * decision. BucketingSpec asserts the exchange-free plan and result
  * equality with the shuffled join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). The bucket
    * count is a layout contract: both join sides must use the same number
    * on the same key expression for the co-located path to engage.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
