package graft.ops

import graft.SparkSpec

/** Pins the non-oracle dedup pipelines (MinHash+LSH, SimHash) on planted
  * near-duplicates: known dupes must surface, unrelated docs must not.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the band plays on tonight"),
      (2L, "the quick brown fox jumps over the lazy cat while the band plays on tonight"),
      (3L, "completely different content about spark plans and shuffle exchanges at scale"),
      (4L, "the quick brown fox jumps over the lazy dog while the band plays on tonight"),
      (5L, "unrelated text mentioning neither foxes nor bands just parquet files and joins"))
      .toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact copy
    assert(pairs.contains((1L, 2L))) // one word changed
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash signature estimate tracks exact jaccard") {
    val rows = Dedup.minhashNearDups(docs, threshold = 0.5).collect()
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val exact = r.getAs[Double]("jaccard")
      assert(math.abs(est - exact) < 0.35, s"est=$est exact=$exact")
    }
    // the exact copy must have jaccard 1.0 and a perfect signature match
    val copy = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L).get
    assert(copy.getAs[Double]("jaccard") === 1.0)
    assert(copy.getAs[Double]("est_jaccard") === 1.0)
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Int]("hamming"))).toMap
    assert(pairs(( 1L, 4L)) === 0) // identical text → identical simhash
    assert(pairs.get((1L, 2L)).forall(_ <= 16)) // one-word edit stays close
    // strict threshold keeps only real dupes
    val strict = Dedup.simhashNearDups(docs, maxHamming = 0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((1L, 4L)))
  }

  test("dedup keep-first is idempotent on the planted corpus") {
    val once = Dedup.minhashNearDups(docs, threshold = 0.5).count()
    val twice = Dedup.minhashNearDups(docs, threshold = 0.5).count()
    assert(once === twice)
  }
}
