package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print the formatted physical plan and wall time for one or
  * more named queries.
  *
  * {{{ runMain graft.tools.Explain <sfDir> <queryName> [queryName...] }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = ToolSession.local()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"==== $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
