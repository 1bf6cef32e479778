package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Proves the cost-based optimizer consumes [[CboStats]]' ANALYZE
  * statistics end-to-end: the worst-first star query's innermost join
  * flips from fact⋈dim (syntactic order) to dim⋈dim (stats order) when
  * CBO + join reorder are enabled, and the results are identical.
  */
class CboSpec extends SparkSpec {

  /** The table-prefix sets of the two inputs of the INNERMOST join (the
    * join neither of whose children contains another join).
    */
  private def innermostJoinSides(df: DataFrame): Seq[Set[String]] = {
    val plan = df.queryExecution.optimizedPlan
    val innermost = plan.collect { case j: Join => j }
      .filter(_.children.forall(_.collect { case jj: Join => jj }.isEmpty))
    assert(innermost.size == 1, s"expected one innermost join:\n$plan")
    innermost.head.children.map(
      _.output.map(_.name.takeWhile(_ != '_')).toSet)
  }

  /** Run `body` with CBO toggled; everything plan- or result-dependent
    * must happen INSIDE (optimization is lazy — a DataFrame built here
    * but optimized after the conf is restored would silently use the
    * restored setting).
    */
  private def withCbo[A](on: Boolean)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prior = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(k => spark.conf.set(k, on.toString))
      body
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE stats drive a join reorder; results are unchanged") {
    CboStats.ensureAnalyzed(spark, sf0001, Seq("orders", "customer", "nation"))

    // catalog stats really landed (rowCount present on the analyzed table)
    val cat = spark.sessionState.catalog
    val stats = cat.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("nation_cbo")).stats
    assert(stats.exists(_.rowCount.nonEmpty), s"no rowCount in $stats")

    val offSides = withCbo(on = false)(innermostJoinSides(CboStats.starQuery(spark)))
    val onSides = withCbo(on = true)(innermostJoinSides(CboStats.starQuery(spark)))

    // syntactic order joins the fact first …
    assert(offSides.exists(_.contains("o")) && offSides.exists(_.contains("c")),
      s"expected orders⋈customer innermost without CBO, got $offSides")
    // … the stats-driven order collapses the dims first, fact last
    assert(onSides.exists(_.contains("c")) && onSides.exists(_.contains("n")) &&
      !onSides.exists(_.contains("o")),
      s"expected customer⋈nation innermost with CBO, got $onSides")

    // the reorder is a pure physical win: bit-identical results
    val a = withCbo(on = false)(CboStats.starQuery(spark).collect().map(_.toSeq).toSeq)
    val b = withCbo(on = true)(CboStats.starQuery(spark).collect().map(_.toSeq).toSeq)
    assert(a == b, s"results diverged: $a vs $b")
  }
}
