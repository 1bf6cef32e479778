package graft.ops

import graft.SparkSpec

/** Independent re-derivations of the portable sketches: both queries are
  * recomputed here in PLAIN Scala (java.security MessageDigest md5, Long
  * arithmetic, HashMaps) from the sf0.001 tables — no Spark expressions,
  * no shared helper code beyond the published constants — and every
  * register / counter / estimate must agree exactly with the query output.
  * Combined with the DuckDB hash oracle that's three engines agreeing on
  * the same sketch, which is as "proven" as a sketch gets.
  */
class PortableSketchesSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala mirror of Dedup.mh60: first 15 md5 hex chars as a long. */
  private def mh60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("q12c: registers, harmonic sum, and estimate match a plain-Scala HLL") {
    val out = PortableSketches.q12cPortableHll.run(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)

    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_returnflag", "l_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val alphaM2 = 0.7213 / (1 + 1.079 / 256) * (256.0 * 256) * (1L << 52).toDouble

    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val regs = scala.collection.mutable.Map.empty[Long, Int]
      grp.foreach { case (_, pk) =>
        val h = mh60(pk.toString)
        val v = h >> 8
        val rank = if (v == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
        val b = h % 256
        regs(b) = math.max(regs.getOrElse(b, 0), rank)
      }
      val nBuckets = regs.size.toLong
      val sInt = regs.values.map(m => 1L << (52 - m)).sum +
        (256 - nBuckets) * (1L << 52)
      val raw = alphaM2 / sInt.toDouble
      val vEmpty = 256 - nBuckets
      val estD = if (raw <= 2.5 * 256 && vEmpty > 0)
        256.0 * math.log(256.0 / vEmpty.toDouble) else raw
      val nExact = grp.map(_._2).distinct.length.toLong

      val (qExact, qBuckets, qEmpty, qSInt, qEst, qErr) = out(flag)
      assert(qExact == nExact, s"$flag exact")
      assert(qBuckets == nBuckets, s"$flag buckets")
      assert(qEmpty == vEmpty, s"$flag empty")
      assert(qSInt == sInt, s"$flag harmonic sum")
      assert(qEst == math.rint(estD * 1e6) / 1e6 ||
        math.abs(qEst - estD) < 1e-5, s"$flag estimate $qEst vs $estD")
      // the audit column really is the sketch's accuracy
      assert(math.abs(qErr) < 0.30, s"$flag error envelope: $qErr")
    }
  }

  test("q12c: linear-counting branch fires on a sparse planted domain") {
    // 10 distinct keys over 256 buckets: raw estimate is far below 2.5m
    // and empty buckets abound, so the query's CASE must take m·ln(m/V) —
    // recompute that branch here to prove the plumbing selects it
    val keys = (1 to 10).map(_.toString)
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    keys.foreach { k =>
      val h = mh60(k)
      val v = h >> 8
      val rank = if (v == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      regs(h % 256) = math.max(regs.getOrElse(h % 256, 0), rank)
    }
    val sInt = regs.values.map(m => 1L << (52 - m)).sum +
      (256 - regs.size) * (1L << 52)
    val alphaM2 = 0.7213 / (1 + 1.079 / 256) * (256.0 * 256) * (1L << 52).toDouble
    val raw = alphaM2 / sInt.toDouble
    assert(raw <= 2.5 * 256 && regs.size < 256, "precondition: LC branch")
    val lc = 256.0 * math.log(256.0 / (256 - regs.size).toDouble)
    // linear counting on a sparse domain is near-exact
    assert(math.abs(lc - keys.length) < 0.5, s"LC estimate $lc")
  }

  test("q34c: sample deciles match a plain-Scala resample; error stays bounded") {
    val out = PortableSketches.q34cQuantileSample.run(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet == (1L to 9L).toSet)

    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_extendedprice", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getInt(2).toLong))
    // independent resample with the plain-Scala hash
    val sample = rows.filter { case (_, ok, ln) => mh60(s"$ok#$ln") % 16 == 0 }
      .map(_._1).sorted
    val full = rows.map(_._1).sorted
    def bound(xs: Array[Double], k: Long): Double =
      xs((((k * xs.length + 9) / 10) - 1).toInt) // min v with cum >= ceil(kN/10)
    (1L to 9L).foreach { k =>
      val (exactP, sampleP, errBp) = out(k)
      assert(exactP == bound(full, k), s"decile $k exact")
      assert(sampleP == bound(sample, k), s"decile $k sample")
      // rank error audit recomputed: rank of the sample boundary in full
      val cum = full.count(_ <= sampleP).toLong
      assert(errBp == math.abs(cum * 10000 / full.length - k * 1000),
        s"decile $k err")
      // a 1/16 sample at sf0.001 (~6k rows) stays within a few percent
      assert(errBp < 500, s"decile $k error too large: $errBp bp")
    }
  }

  test("q34c: the only unpartitioned window ranks one-row-per-shard prefixes") {
    // q34c materializes eagerly, so WindowAuditSpec's sweep cannot see its
    // plan — audit the lazy builder directly (the SimilaritySpec pattern):
    // exactly ONE global window, and it runs over the per-shard aggregate
    // (value-DOMAIN-bounded), not over the data-sized histogram
    import org.apache.spark.sql.functions.col
    val values = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_extendedprice").as("v"))
    val n = graft.tools.PlanAudit.unpartitionedWindows(
      PortableSketches.cumHist(values))
    assert(n == 1, s"expected exactly the shard-prefix global window, got $n")
  }

  test("q53b: estimates equal a plain-Scala CMS; overcount is never negative") {
    val out = PortableSketches.q53bPortableCms.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    // ordered by exact count desc, then user_id
    assert(out.map(r => (-r._2, r._1)).toSeq == out.map(r => (-r._2, r._1)).sortBy(identity).toSeq)

    val users = Q.t(spark, sf0001, "events").select("user_id")
      .collect().map(_.getLong(0))
    val a = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L, 374761393L)
    val b = Seq(17L, 101L, 331L, 709L, 1049L)
    def pos(k: Long, i: Int): Long = ((k % 1000003L) * a(i) + b(i)) % 64L
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    users.foreach { k =>
      (0 until 5).foreach { i =>
        val key = (i, pos(k, i))
        counters(key) = counters.getOrElse(key, 0L) + 1L
      }
    }
    val exact = users.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    out.foreach { case (uid, nExact, nEst, over) =>
      assert(exact(uid) == nExact, s"user $uid exact")
      val expEst = (0 until 5).map(i => counters((i, pos(uid, i)))).min
      assert(nEst == expEst, s"user $uid estimate")
      assert(over == nEst - nExact && over >= 0, s"user $uid overcount")
    }
  }
}
