package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native cosine_sim expression: SQL registration, null/edge
  * semantics, agreement with the HOF/decimal path, and that the generated
  * code actually compiles and runs (CODEGEN_ONLY factory mode).
  */
class ExprSpec extends SparkSpec {

  private def sql1(q: String): Any = {
    GraftFunctions.register(spark)
    spark.sql(q).collect().head.get(0)
  }

  test("cosine_sim computes the expected value via SQL") {
    val v = sql1(
      """SELECT cosine_sim(
        |  array(cast(1.0 as float), cast(0.0 as float)),
        |  array(cast(0.6 as float), cast(0.8 as float)))""".stripMargin)
      .asInstanceOf[Double]
    assert(math.abs(v - 0.6) < 1e-7)
  }

  test("cosine_sim edge semantics: null input, zero norm, length mismatch") {
    assert(sql1("SELECT cosine_sim(NULL, array(cast(1.0 as float)))") === null)
    assert(sql1(
      """SELECT cosine_sim(array(cast(0.0 as float)), array(cast(1.0 as float)))""") === null)
    assert(sql1(
      """SELECT cosine_sim(array(cast(1.0 as float)),
        |                  array(cast(1.0 as float), cast(2.0 as float)))""".stripMargin) === null)
  }

  test("dot_product computes raw inner product with lenient edge semantics") {
    val v = sql1(
      """SELECT dot_product(
        |  array(cast(1.5 as float), cast(2.0 as float)),
        |  array(cast(2.0 as float), cast(-0.5 as float)))""".stripMargin)
      .asInstanceOf[Double]
    assert(math.abs(v - 2.0) < 1e-7)
    // zero vector dots to 0 (NOT null — no denominator, unlike cosine)
    assert(sql1(
      """SELECT dot_product(array(cast(0.0 as float)), array(cast(1.0 as float)))""") === 0.0)
    assert(sql1("SELECT dot_product(NULL, array(cast(1.0 as float)))") === null)
    assert(sql1(
      """SELECT dot_product(array(cast(1.0 as float)),
        |                   array(cast(1.0 as float), cast(2.0 as float)))""".stripMargin) === null)
  }

  test("dot_product codegen matches interpreted eval") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pair = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(call_function("dot_product", col("a.embedding"), col("b.embedding")).as("dot"))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = pair.collect().head.getDouble(0)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = pair.collect().head.getDouble(0)
      assert(gen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("cosine_sim rejects wrong input types at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("generated code path runs (CODEGEN_ONLY) and matches interpreted eval") {
    GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pair = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(call_function("cosine_sim", col("a.embedding"), col("b.embedding")).as("cos"))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = pair.collect().head.getDouble(0)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = pair.collect().head.getDouble(0)
      assert(gen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("two cosine_sim calls inline into one codegen scope without collision") {
    GraftFunctions.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      // non-nullable literal children are emitted un-braced into the same
      // generated scope — regression guard for duplicate Java locals
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val row = spark.sql(
        """SELECT
          |  cosine_sim(array(cast(1.0 as float)), array(cast(1.0 as float))) AS c1,
          |  cosine_sim(array(cast(2.0 as float)), array(cast(3.0 as float))) AS c2
          |""".stripMargin).collect().head
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("TopKAggregator keeps k best with deterministic tie-break") {
    val agg = new TopKAggregator(3)
    val items = Seq(
      Scored(5L, 1.0), Scored(1L, 3.0), Scored(2L, 3.0),
      Scored(3L, 2.0), Scored(4L, 9.0))
    val viaReduce = items.foldLeft(agg.zero)(agg.reduce)
    assert(viaReduce === Seq(Scored(4L, 9.0), Scored(1L, 3.0), Scored(2L, 3.0)))
    // merge in any split order gives the same result
    val (l, r) = items.splitAt(2)
    val viaMerge = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(viaMerge === viaReduce)
  }

  test("udaf top-k matches the window form on testdata") {
    import org.apache.spark.sql.expressions.Window
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val topk = udaf(new TopKAggregator(2))
    val viaUdaf = orders.groupBy(col("o_orderstatus"))
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_orderstatus"), explode(col("top")).as("s"))
      .select(col("o_orderstatus"), col("s.id"), col("s.score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaUdaf === viaWindow)
  }
}
