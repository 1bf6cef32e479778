package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** e61/e61b: hyperplane LSH made CROSS-ENGINE DETERMINISTIC — the
  * integer-grid L2 twin of e51's raw-float cosine ANN (since r10 both are
  * hash-oracled; e51 keeps float vectors + exact-decimal scoring, this one
  * snaps to the integer grid), extending the e59b pattern (the recall
  * claim itself is oracle-pinned, not just the output shape) to the
  * hyperplane-LSH sketch family.
  *
  * Two ingredients remove every float/seed surface:
  *   - vectors snap to the e57 1/512 integer grid, so all dot products and
  *     L2² distances are exact BIGINT arithmetic in both engines;
  *   - the projection directions are SPARSE TERNARY planes (entries in
  *     {-1, 0, +1} with density 1/3 — Achlioptas' database-friendly random
  *     projection, which preserves the sign-LSH guarantee while making each
  *     dot product a short ± sum of vector elements). The 64 planes are
  *     generated once from a fixed seed and EMBEDDED AS CONSTANTS in both
  *     the Spark plan and the generated oracle SQL, so the two engines
  *     bucket identically by construction.
  *
  * Search shape is e51's: NumTables independent tables of PlanesPerTable
  * sign bits; a candidate shares ≥1 table-bucket with the query; the query
  * side multi-probes its single-bit-flip neighbor buckets. Scoring is
  * integer L2² on the grid, ties to the lowest cid.
  *
  * Scale shape: the corpus is bucketed ONCE (NumTables narrow (cid, bucket) rows per
  * vector — a map-side projection, no shuffle); query probes broadcast
  * (nQueries × NumTables·(1+PlanesPerTable) rows); candidates come from the bucket semi-join, never
  * all-pairs; only the surviving pairs pay the 64-term distance. At 10⁹
  * vectors the bucket index is a ~32 GB narrow table and a query touches
  * ~NumTables·(1+PlanesPerTable)/2^PlanesPerTable of it.
  */
object GridLsh {

  def pack: Seq[Q] = Seq(e61GridLshTopK, e61bGridLshRecall)

  private val GridF = 512L
  private val Dim = 64
  private val NumTables = 8
  private val PlanesPerTable = 8
  private val NQueries = 5
  private val TopK = 10

  /** Sparse ternary planes, fixed seed: plane(j)(i) ∈ {-1, 0, +1} with
    * P(±1) = 1/6 each. java.util.Random's LCG is spec-pinned, so the
    * constants are stable across builds; both the Spark expressions and the
    * oracle SQL are generated from THIS array, which is what makes the
    * bucketing bit-identical across engines. A plane drawn all-zero (p ≈
    * 5e-12) would have an empty dot sum — force one +1 entry so the
    * expression stays well-formed.
    */
  private val planes: IndexedSeq[IndexedSeq[Int]] = {
    val rnd = new java.util.Random(61L)
    IndexedSeq.fill(NumTables * PlanesPerTable) {
      val p = IndexedSeq.fill(Dim) {
        rnd.nextInt(6) match {
          case 0 => 1
          case 5 => -1
          case _ => 0
        }
      }
      if (p.forall(_ == 0)) p.updated(0, 1) else p
    }
  }

  /** Integer grid projection of the embedding column. */
  private def gridded(emb: DataFrame): DataFrame =
    Q.spread(emb, "vec_id").select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * GridF).cast("long")).as("gv"))

  private def sqlDot(gvCol: String, j: Int): String =
    planes(j).zipWithIndex.collect {
      case (1, i)  => s"+$gvCol[${i + 1}]"
      case (-1, i) => s"-$gvCol[${i + 1}]"
    }.mkString

  private def sqlBucket(gvCol: String, tbl: Int): String =
    (0 until PlanesPerTable).map { p =>
      s"(CASE WHEN ${sqlDot(gvCol, tbl * PlanesPerTable + p)} >= 0 " +
        s"THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", s" + ${tbl.toLong * (1L << PlanesPerTable)})")

  /** The nonzero plane entries as a ~1.4k-row broadcast relation
    * (plane, pos, sign). The Spark side computes sign dots DATAFLOW-style —
    * posexplode the grid vector, broadcast-join this table on position,
    * two keyed partial aggregates — rather than as 64 inlined ±21-term
    * expressions: the expression form generated whole-stage code past the
    * JIT's huge-method limit, so Spark compiled it, then DISABLED it and
    * fell back to interpretation, paying multi-second Janino cost per
    * execution for nothing (measured 5.5 s/query at sf0.1; the dataflow
    * form keeps every operator inside small codegen and map-side combine
    * keeps the shuffle at 64→8 rows per vector). The oracle SQL keeps the
    * algebraically identical inline form — DuckDB has no codegen cliff.
    */
  private def planesDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      j <- planes.indices
      (s, i) <- planes(j).zipWithIndex if s != 0
    } yield (j, i, s.toLong)).toDF("plane", "pos", "sign")
  }

  /** (vec_id, bucket): the NumTables tagged sign-buckets of each vector. */
  private def buckets(gv: DataFrame): DataFrame = {
    val dots = gv
      .select(col("vec_id"), posexplode(col("gv")).as(Seq("pos", "x")))
      .join(broadcast(planesDF(gv.sparkSession)), "pos")
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("sign") * col("x")).as("dot"))
    dots
      .groupBy(col("vec_id"), expr(s"plane div $PlanesPerTable").as("tbl"))
      .agg(sum(when(col("dot") >= 0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(plane % $PlanesPerTable AS INT))"))
        .otherwise(lit(0L))).as("bits"))
      .select(col("vec_id"),
        (col("bits") + col("tbl") * (1L << PlanesPerTable)).as("bucket"))
  }

  /** Flat 64-term integer L2² between two grid columns. */
  private def l2(a: String, b: String): Column =
    (0 until Dim).map { i =>
      val d = element_at(col(a), i + 1) - element_at(col(b), i + 1)
      d * d
    }.reduce(_ + _)

  private def sqlL2(a: String, b: String): String =
    (1 to Dim).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString("+")

  /** Candidate (qid, cid) pairs from the bucket semi-join with single-bit
    * multi-probe on the query side, over an already-gridded frame. The
    * bucket dataflow (explode → plane join → two aggregates) is the
    * expensive per-row stage — callers hand in ONE (ideally persisted)
    * grid table so it runs exactly once per side per query.
    */
  private def candidatesFromGrid(gv: DataFrame): DataFrame = {
    val cb = buckets(gv.filter(col("vec_id") >= NQueries))
      .select(col("vec_id").as("cid"), col("bucket"))
    val qb = buckets(gv.filter(col("vec_id") < NQueries))
      .withColumnRenamed("bucket", "b0")
      // multi-probe: the bucket itself + its PlanesPerTable bit-flip
      // neighbors (flips stay below the table tag)
      .select(col("vec_id").as("qid"), explode(array(
        col("b0") +: (0 until PlanesPerTable).map(p =>
          col("b0").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    cb.join(broadcast(qb), "bucket").select(col("qid"), col("cid")).distinct()
  }

  /** Spec surface: candidates from a raw (vec_id, embedding) frame. */
  def candidates(emb: DataFrame): DataFrame =
    candidatesFromGrid(gridded(emb))

  private def topKFromGrid(gv: DataFrame, k: Int): DataFrame = {
    val c = gv.filter(col("vec_id") >= NQueries)
      .select(col("vec_id").as("cid"), col("gv").as("cv"))
    val q = gv.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("gv").as("qv"))
    val scored = candidatesFromGrid(gv)
      .join(c, "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), l2("qv", "cv").as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** The full e61 transform: candidates → integer-L2 top-k. Exposed for
    * planted-corpus specs. Grids once, persists, derives the bucket index
    * and the scoring joins from the one materialization.
    */
  def gridLshTopK(emb: DataFrame, k: Int = TopK): DataFrame = {
    val gv = gridded(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Q.materialized(topKFromGrid(gv, k), gv)
  }

  private def sqlCommon: String = {
    val probeList = "b0" +: (0 until PlanesPerTable)
      .map(p => s"xor(b0, ${1L << p})")
    s"""
      gvt AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$GridF) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, gv AS qv FROM gvt WHERE vec_id < $NQueries),
      c AS (SELECT vec_id AS cid, gv AS cv FROM gvt WHERE vec_id >= $NQueries),
      cbk AS (
        SELECT cid, unnest([${(0 until NumTables).map(sqlBucket("cv", _)).mkString(", ")}]) AS bucket
        FROM c),
      qb0 AS (
        SELECT qid, unnest([${(0 until NumTables).map(sqlBucket("qv", _)).mkString(", ")}]) AS b0
        FROM q),
      qpr AS (SELECT qid, unnest([${probeList.mkString(", ")}]) AS bucket FROM qb0),
      cand AS (SELECT DISTINCT qid, cid FROM cbk JOIN qpr USING (bucket)),
      scored AS (
        SELECT cand.qid, cand.cid, ${sqlL2("q.qv", "c.cv")} AS dist
        FROM cand JOIN q USING (qid) JOIN c USING (cid)),
      ann AS (
        SELECT qid, cid, dist, CAST(row_number() OVER (PARTITION BY qid
          ORDER BY dist, cid) AS INT) AS rank
        FROM scored)"""
  }

  val e61GridLshTopK: Q = Q(
    "e61_grid_lsh_topk",
    (s, dir) => gridLshTopK(t(s, dir, "embeddings")),
    Some(s"""
      WITH $sqlCommon
      SELECT qid, cid, dist, rank FROM ann
      WHERE rank <= $TopK ORDER BY qid, rank"""))

  /** e61b: grid-LSH-vs-exact recall@10, FULLY ORACLED — both the bucketed
    * ANN side and the exact side are pure integer arithmetic, so the driver
    * hash-pins the accuracy number itself (the e59b pattern). The exact side
    * is one full-scan integer-L2 ranking; the compare joins two ≤
    * NQueries·TopK row sets.
    */
  val e61bGridLshRecall: Q = Q(
    "e61b_grid_lsh_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // ONE persisted grid table feeds both the ANN side's bucket index
      // and the exact side's full scan — the recall audit costs one grid
      // materialization, not two pipelines from the raw parquet
      val gv = gridded(emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = gv.filter(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cid"), col("gv").as("cv"))
      val q = gv.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("gv").as("qv"))
      val wE = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
      val exact = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"), l2("qv", "cv").as("dist"))
        .withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("cid"))
      val ann = topKFromGrid(gv, TopK)
        .select(col("qid"), col("cid"), lit(1).as("hit"))
      val res = exact.join(ann, Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .select(col("qid"), col("n_exact"), col("n_overlap"),
          round(col("n_overlap").cast("double") /
            col("n_exact").cast("double"), 6).as("recall_at_10"))
        .orderBy(col("qid"))
      Q.materialized(res, gv)
    },
    Some(s"""
      WITH $sqlCommon,
      exact AS (
        SELECT qid, cid FROM (
          SELECT q.qid, c.cid, CAST(row_number() OVER (PARTITION BY q.qid
            ORDER BY ${sqlL2("q.qv", "c.cv")}, c.cid) AS INT) AS rank
          FROM c CROSS JOIN q) t
        WHERE rank <= $TopK),
      hits AS (SELECT qid, cid, 1 AS hit FROM ann WHERE rank <= $TopK)
      SELECT e.qid, count(*) AS n_exact,
        CAST(sum(coalesce(h.hit, 0)) AS BIGINT) AS n_overlap,
        round(CAST(sum(coalesce(h.hit, 0)) AS DOUBLE) / count(*), 6)
          AS recall_at_10
      FROM exact e LEFT JOIN hits h ON e.qid = h.qid AND e.cid = h.cid
      GROUP BY e.qid ORDER BY e.qid"""))
}
