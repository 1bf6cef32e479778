package graft

import graft.etl.{Dates, SpotifyTransform}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4), driven by ScalaCheck
  * generators with a fixed seed (the scalatest-scalacheck bridge is not on
  * the offline classpath, so sampling is explicit): multi-format date
  * parsing is total over all three precisions, explode row counts equal the
  * sum of array sizes, and keep-first dedup is idempotent and keeps the
  * minimum position per key.
  */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val dateGen: Gen[(String, String)] = for {
    y <- Gen.choose(1900, 2099)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    precision <- Gen.oneOf(0, 1, 2)
  } yield precision match {
    case 0 => (f"$y%04d", f"$y%04d-01-01")
    case 1 => (f"$y%04d-$m%02d", f"$y%04d-$m%02d-01")
    case _ => (f"$y%04d-$m%02d-$d%02d", f"$y%04d-$m%02d-$d%02d")
  }

  test("parseReleaseDate is total over yyyy / yyyy-MM / yyyy-MM-dd") {
    import spark.implicits._
    val cases = sample(dateGen, 200)
    val got = cases.map(_._1).toDF("raw")
      .select(Dates.parseReleaseDate(col("raw")).cast("string").as("parsed"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("codegen shingle posting lists match a reference implementation") {
    import spark.implicits._
    // hostile texts: runs of spaces, leading/trailing spaces, empty and
    // short docs — exactly the cases where token re-joining diverges
    val word = Gen.oneOf("fox", "the", "a", "", "jumps", "dog9", "!")
    val textGen = for {
      n <- Gen.choose(0, 8)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ")
    } yield ws.mkString(sep)
    val texts = sample(textGen, 120).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def reference(text: String): Set[String] = {
      val toks = text.split(" ", -1)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(text)
    }
    val got = graft.ops.Dedup.shinglePostings(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === reference(text),
        s"doc $id text='$text'")
    }
  }

  test("lane-packed simhash equals a per-bit reference vote") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2", "z")
    val textGen = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val texts = sample(textGen, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val packed = graft.ops.Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the same md5-60bit base hash recomputed in plain JVM
    // code (MessageDigest, no Spark expression), then a plain Scala
    // majority vote per bit — independent of the lane-packed aggregate
    // AND of Spark's md5/conv expressions
    def mh60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    texts.foreach { case (id, text) =>
      val hs = text.split(" ").distinct.toSeq.map(mh60)
      val expected = (0 until 60).map { b =>
        val ones = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * ones > hs.length) 1L << b else 0L
      }.sum
      assert(packed(id) === expected, s"doc $id")
    }
  }

  test("parseReleaseDate yields null only for garbage") {
    import spark.implicits._
    val junk = Seq("not-a-date", "13-13", "", "20231315").toDF("raw")
      .select(Dates.parseReleaseDate(col("raw")).as("parsed"))
    assert(junk.collect().forall(_.isNullAt(0)))
  }

  test("explode row count equals the sum of array sizes") {
    import spark.implicits._
    val arrays = sample(Gen.listOf(Gen.alphaStr), 50)
    val df = arrays.toDF("arr")
    assert(df.select(explode(col("arr"))).count() ===
      arrays.map(_.size.toLong).sum)
  }

  test("star-contraction CC ≡ label-propagation CC ≡ local union-find " +
      "on random graphs") {
    import spark.implicits._
    // three independent implementations of one fixpoint: the two
    // distributed algorithms (different loop structures, different state)
    // and a driver-local union-find reference
    val graphGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m,
        for { a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong) }
          yield (a, b))
    } yield edges.filter { case (a, b) => a != b }
    sample(graphGen, 3).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("d1", "d2")
      val (star, _) = graft.ops.Graph.ccStarContraction(df)
      val prop = graft.ops.Clustering.connectedComponents(df)
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonicalize all three to node → min(component) maps
      val ref = nodes.map { n =>
        val root = find(n)
        n -> nodes.filter(m => find(m) == root).min
      }.toMap
      val a = star.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val b = prop.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(a === ref, s"star contraction diverged on $edges")
      assert(b === ref, s"label propagation diverged on $edges")
    }
  }

  test("two-phase interval sweep equals a naive endpoint scan on random input") {
    import spark.implicits._
    val ivGen = for {
      t0 <- Gen.choose(0L, 500L)
      dur <- Gen.choose(1L, 200L)
    } yield (t0, dur)
    for (round <- 0 until 5) {
      val ivs = (0 until 40).map(i =>
        ivGen.pureApply(Gen.Parameters.default, Seed(round * 100L + i)))
      val got = graft.ops.Relational4.peakConcurrency(ivs.toDF("t0", "dur"))
        .collect().head
      // naive reference: sweep all endpoints in (t, delta) order
      val eps = ivs.flatMap { case (t0, d) => Seq((t0, 1), (t0 + d, -1)) }
        .sortBy { case (t, delta) => (t, delta) }
      var cur = 0L; var peak = 0L; var peakAt = Long.MaxValue
      eps.foreach { case (t, delta) =>
        cur += delta
        if (cur > peak) { peak = cur; peakAt = t }
      }
      assert(got.getAs[Long]("peak_concurrency") === peak, s"round $round")
      val at = got.getAs[java.sql.Timestamp]("first_peak_at").toInstant
      assert(at.getEpochSecond * 1000000 + at.getNano / 1000 === peakAt,
        s"round $round")
    }
  }

  test("bloom pre-join never drops a true match on random key sets") {
    import spark.implicits._
    for (round <- 0 until 3) {
      val dimKeys = sample(Gen.choose(1L, 5000L), 30 + round * 20).distinct
      val factKeys = sample(Gen.choose(1L, 5000L), 300)
      val r = graft.ops.Relational4.bloomPrejoin(
        dimKeys.toDF("k"),
        factKeys.map(k => (k, 1.0)).toDF("k", "l_extendedprice"))
        .collect().head
      val expectTrue = factKeys.count(dimKeys.toSet)
      assert(r.getAs[Long]("n_true") === expectTrue.toLong, s"round $round")
      assert(r.getAs[Long]("n_bloom_pass") >= expectTrue.toLong)
      assert(r.getAs[Long]("n_bloom_pass") ===
        r.getAs[Long]("n_true") + r.getAs[Long]("n_false_pos"))
    }
  }

  test("converged k-core survivors all keep degree >= k on random graphs") {
    import spark.implicits._
    for (round <- 0 until 3) {
      val pairs = sample(for {
        a <- Gen.choose(0L, 25L); b <- Gen.choose(0L, 25L) if a != b
      } yield (math.min(a, b), math.max(a, b)), 40).distinct
      val sym = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
      val rows = graft.ops.Graph.kCore(sym, k = 3, rounds = 12).collect()
      if (rows.nonEmpty) {
        assert(rows.forall(_.getAs[Boolean]("converged")), s"round $round")
        // internal consistency: the reported subgraph IS a 3-core — every
        // survivor's edges to fellow survivors number >= 3
        val alive = rows.map(_.getAs[Long]("node")).toSet
        val deg = rows.map(r =>
          r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
        val adj = (pairs ++ pairs.map(_.swap))
          .filter(e => alive(e._1) && alive(e._2)).groupBy(_._1)
        alive.foreach { n =>
          val d = adj.getOrElse(n, Nil).map(_._2).toSet.size.toLong
          assert(d === deg(n) && d >= 3L, s"round $round node $n")
        }
      }
    }
  }

  test("keepFirst is idempotent and keeps the minimum position per key") {
    import spark.implicits._
    val rows = sample(
      for {
        pos <- Gen.choose(0, 100000)
        key <- Gen.oneOf("a", "b", "c", "d")
      } yield (pos, key), 80)
      .distinctBy(_._1) // unique positions → a well-defined "first"
    val df = rows.toDF("pos", "k").withColumn("orig_pos", col("pos"))
    val once = SpotifyTransform.keepFirst(df, "k")
    val twice = SpotifyTransform.keepFirst(
      once.withColumn("pos", col("orig_pos")), "k")
    assert(once.count() === rows.map(_._2).distinct.size.toLong)
    assert(twice.collect().toSet === once.collect().toSet)
    val expect = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).min }
    val kept = once.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Int]("orig_pos")).toMap
    assert(kept === expect)
  }
}
