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

  test("connected components cluster a chain and elect the min representative") {
    import spark.implicits._
    // chain 1-2-3-4 plus isolated pair (10, 11): two components
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val labels = Clustering.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("d45 sub-blocking always co-buckets identical same-label vectors") {
    import spark.implicits._
    // identical embeddings share every sign bit, hence every chunk bucket:
    // the LSH gate can never separate exact duplicates
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val u = Array.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val emb = Seq(
      (0L, "a", v), (1L, "a", v),              // planted exact dup, same label
      (2L, "a", u),                            // same label, different vector
      (3L, "b", v))                            // same vector, different label
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_d45").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = Dedup.d45EmbeddingNearDupLsh.run(spark, dir)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact same-label duplicate must survive the LSH gate")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "labels must block")
  }
}
