package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a DERIVED sf1-scale dataset for the scale REHEARSAL (SCALING.md):
  * ten key-shifted copies of every sf0.1 table, so row counts and key
  * cardinalities grow 10× while per-key densities and join fan-outs stay
  * at the generator's shape (verbatim replication would instead multiply
  * every join hit 10× and misrepresent the workload). This is a
  * PERFORMANCE fixture only — correctness stays pinned to the driver's
  * own testdata (TESTDATA.md: do not regenerate), which tops out at
  * sf0.1; the rehearsal answers the "measured point beyond the curve"
  * question, not any oracle.
  *
  * Key columns shift by copy·10^8 (above every generator key — sf0.1
  * maxima are ≤1.5·10^5 — while keeping shifted ids under 2^31 so the
  * graph queries' packed-id orientation guards stay within budget). Dimension keys that queries treat
  * as CATEGORIES (nationkey, regionkey, mktsegment …) are left alone —
  * dimensions don't grow with fact data. `documents.text` gets a short
  * per-copy suffix so cross-copy texts are near- (not exact-) duplicates:
  * exact-dup queries keep realistic selectivity, near-dup queries still
  * find the cross-copy pairs (noted caveat: near-dup candidate volume
  * grows faster than data, which is the stress the rehearsal wants).
  *
  * Usage: `sbt "runMain graft.tools.ScaleRehearsal [outDir] [copies]"`
  * (defaults /tmp/sfx1, 10).
  */
object ScaleRehearsal {

  private val Shift = 100000000L // 10^8: above every key, under 2^31·copies

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sfx1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact/entity key columns per table; everything else copies verbatim
    val shifted: Map[String, Seq[String]] = Map(
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "region" -> Nil, // true dimensions: carried once, unscaled
      "nation" -> Nil)

    shifted.foreach { case (table, keys) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      val scaledUp: DataFrame =
        if (keys.isEmpty) base
        else {
          val withCopy = base.crossJoin(
            spark.range(copies).select(col("id").as("_copy")))
          val keyed = keys.foldLeft(withCopy)((d, k) =>
            d.withColumn(k, col(k) + col("_copy") * Shift))
          val perturbed =
            if (table == "documents")
              keyed.withColumn("text",
                concat(col("text"), lit(" "),
                  format_string("c%02d", col("_copy"))))
            else keyed
          perturbed.drop("_copy")
        }
      scaledUp
        .repartition(if (keys.isEmpty) 1 else 32)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      val n = spark.read.parquet(s"$out/$table.parquet").count()
      println(s"[rehearsal] $table -> $n rows")
    }
    spark.stop()
  }
}
