package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the deterministic integer-grid LSH (e61) on planted geometry: an
  * exact duplicate must collide in every table (identical grid vector ⇒
  * identical buckets by construction) and surface at rank 1 with distance
  * 0; a planted near-duplicate must be retrieved; and the bucket semi-join
  * must actually prune (candidates ⊂ corpus), or the index is a cross join
  * in disguise.
  */
class GridLshSpec extends SparkSpec {

  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec(): Seq[Float] = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows =
      Seq((0L, base)) ++                       // query
        (5L until 80L).map(i => (i, vec())) ++ // random candidates
        Seq((80L, nearDup), (90L, base))       // planted neighbor + exact dup
    rows.toDF("vec_id", "embedding")
  }

  test("exact duplicate collides in every table and ranks 1 at dist 0") {
    val top = GridLsh.gridLshTopK(emb, k = 5).collect()
    assert(top.nonEmpty, "grid LSH returned no candidates")
    val r1 = top.find(r => r.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("cid") === 90L)
    assert(r1.getAs[Long]("dist") === 0L)
  }

  test("planted near-duplicate is retrieved in the top-k") {
    val cids = GridLsh.gridLshTopK(emb, k = 5)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    assert(cids.contains(80L),
      s"near-duplicate 80 missing from top-k candidates $cids")
  }

  test("bucket semi-join prunes: candidates are a strict corpus subset") {
    val nCand = GridLsh.candidates(emb).count()
    val nCorpus = emb.filter(col("vec_id") >= 5).count()
    assert(nCand > 0, "no candidates at all")
    assert(nCand < nCorpus,
      s"bucket join degenerated to all-pairs: $nCand of $nCorpus")
  }

  test("e66 plan: the attribute filter is a hash join, not a cross join") {
    import spark.implicits._
    val labeled = emb.withColumn("label",
      (col("vec_id") % 3).cast("int"))
    val plan = Similarity2.filteredTopK(labeled, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"label constraint not pushed into candidate generation:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join on label:\n$plan")
  }
}
