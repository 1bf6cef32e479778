package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: sweep every registered query's physical plan and flag scale
  * hazards — cartesian products, nested-loop joins, and exchange counts.
  *
  * {{{ runMain graft.tools.PlanAudit <sfDir> }}}
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = ToolSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-26s ${"exch"}%5s ${"bcast"}%5s ${"sorts"}%5s  hazards")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).length
        // BroadcastNestedLoopJoin is NOT flagged: it is the intended plan
        // for the similarity queries' broadcast(query-set) × corpus cross
        // join (k rows against n — the loop is over the broadcast side).
        // An unpartitioned CartesianProduct is always a hazard.
        val hazards = Seq("CartesianProduct" -> n("CartesianProduct"))
          .filter(_._2 > 0).map { case (k, v) => s"$k x$v" }.mkString(", ")
        val bnlj = if (n("BroadcastNestedLoopJoin") > 0) s"bnlj=${n("BroadcastNestedLoopJoin")}" else ""
        println(f"$name%-26s ${n("Exchange hashpartitioning")}%5d ${n("BroadcastExchange")}%5d ${n("Sort ")}%5d  ${if (hazards.isEmpty) if (bnlj.isEmpty) "-" else bnlj else "!! " + hazards}")
      } catch { case e: Throwable =>
        println(f"$name%-26s PLAN FAILED: ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
