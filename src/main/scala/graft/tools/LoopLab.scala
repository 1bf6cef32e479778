package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev experiment bench for the iterative-graph loop shape (g60 family):
  * times the PageRank pipeline end-to-end under (checkpoint cadence ×
  * AQE) variants at one sf, min-of-3 each, to decide the loop's round
  * structure with measurements instead of folklore. Results feed the
  * Graph.scala doc comments; the registered queries always run one shape.
  *
  * {{{ SPARK_GRAFT_SF_DIR=... runMain graft.tools.LoopLab }}}
  */
object LoopLab {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ToolSession.local()
    import graft.ops.{Graph, Q}

    def edges: DataFrame = {
      val o = Q.t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = Q.t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    }

    /** pageRank with a configurable checkpoint cadence: `cadence` lazy
      * rounds are stacked per eager checkpoint.
      */
    def prCadence(cadence: Int): DataFrame = {
      val (e, deg, ew, ncnt) = Graph.edgeState(edges)
      val n = ncnt.head().getLong(0)
      var ranks = deg
        .select(col("src").as("node"), lit(Graph.Scale / n).as("r"))
        .localCheckpoint(true)
      var done = 0
      while (done < Graph.Iters) {
        val k = math.min(cadence, Graph.Iters - done)
        var next = ranks
        (1 to k).foreach(_ => next = Graph.round(ew, deg, n, next))
        val mat = next.localCheckpoint(true)
        Q.releaseBlocks(ranks)
        ranks = mat
        done += k
      }
      ew.unpersist(); deg.unpersist(); e.unpersist()
      ranks
    }

    def time(label: String)(body: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        Q.releaseAll(spark)
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[looplab] $label%-28s min=${times.min}%.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup
    prCadence(1).write.format("noop").mode("overwrite").save()

    Seq("true", "false").foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      Seq(1, 2, 5).foreach { c =>
        time(s"cadence=$c aqe=$aqe")(prCadence(c))
      }
      // prep-only baseline: edge derivation + edgeState caching + n read
      time(s"prep-only aqe=$aqe") {
        val (e, deg, ew, ncnt) = Graph.edgeState(edges)
        val n = ncnt.head().getLong(0)
        val r = deg.select(col("src").as("node"), lit(Graph.Scale / n).as("r"))
          .localCheckpoint(true)
        ew.unpersist(); deg.unpersist(); e.unpersist()
        r
      }
    }
    spark.stop()
  }
}
