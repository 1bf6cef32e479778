package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** Near-duplicate CLUSTERING: turn pairwise near-dup edges into connected
  * components and elect one representative per component — the step that
  * converts "these documents look alike" into "drop these documents", i.e.
  * the actual deliverable of a dedup pipeline.
  */
object Clustering {

  def pack: Seq[Q] = Seq(d46DedupClusters)

  /** Distributed connected components by min-label propagation: every node
    * starts labeled with itself; each round every node takes the min label
    * over itself and its neighbours; stop when no label changes. Converges
    * in O(graph diameter) rounds — near-dup graphs are unions of small
    * cliques-ish clusters, so a handful of rounds in practice (`maxIters`
    * bounds pathological chains).
    *
    * Scale design: the loop is DRIVER-CONTROLLED but the data never leaves
    * the cluster — each round is one shuffle join (edges ⋈ labels) + one
    * min-aggregate, the same shape GraphX/GraphFrames CC lowers to. Each
    * round's labels are eagerly checkpointed (see the loop comment), so
    * round N+1 and the convergence count reuse one flat materialization
    * and the returned table carries no round-over-round lineage.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    // materialize the (possibly expensive) edge input ONCE — the two union
    // branches of sym would otherwise re-execute its whole lineage twice
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val sym = e.select(col("d1").as("src"), col("d2").as("dst"))
      .union(e.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Loop state is EAGERLY localCheckpoint'ed each round: the checkpoint
    // both materializes the round ONCE (the convergence count then reads
    // it back) and truncates the lineage, so every round's plan stays
    // flat — persist() alone left round N's plan nesting round N-1's and
    // measured 2× slower per round. Superseded round checkpoints are
    // released explicitly once the next round lands (round N+1 reads only
    // round N's blocks), so the loop holds at most two label tables, not
    // maxIters of them. On a real cluster swap in `checkpoint()` over
    // durable storage for fault-tolerant cuts.
    var cur = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val labels = cur.select(col("node"), col("lbl"))
      // carry each node's previous label through the same aggregate
      // (max over the self-tagged row) so convergence needs no extra join
      val prop = sym
        .join(labels.select(col("node").as("src"), col("lbl")), "src")
        .select(col("dst").as("node"), col("lbl"), lit(null).cast("long").as("own"))
        .union(labels.select(col("node"), col("lbl"), col("lbl").as("own")))
      // no pointer jumping on purpose: near-dup graphs are clique-like
      // (one round converges; measured 2 rounds on the driver corpus), so
      // a label-of-label self-join per round costs more than it saves —
      // revisit only if edge semantics ever produce long chains
      val next = prop.groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"), max(col("own")).as("own"))
        .localCheckpoint(true)
      changed = next.filter(col("lbl") =!= col("own")).count()
      Q.releaseBlocks(cur) // round N's blocks are dead once N+1 landed
      cur = next
      iter += 1
    }
    // silent non-convergence would return WRONG labels (and diverge from
    // the recursive-CTE oracle) — fail loudly instead
    require(changed == 0,
      s"connectedComponents did not converge within $maxIters rounds " +
        s"($changed labels still changing) — raise maxIters for graphs of " +
        "this diameter")
    sym.unpersist()
    e.unpersist()
    cur.select(col("node"), col("lbl"))
  }

  /** Cluster the d41 near-dup pairs (same edge semantics, stop-shingle cap
    * included) and elect min-doc_id representatives: one row per document
    * that appears in any near-dup pair, its cluster id, and whether it is
    * the kept representative. The oracle replays the same edges through a
    * recursive min-reachable-label CTE — engine-independent because the
    * component minimum is order-independent.
    */
  val d46DedupClusters: Q = Q(
    "d46_dedup_clusters",
    (s, dir) => {
      // d41 returns an eagerly MATERIALIZED pair table (Q.materialized), so
      // the clustering loop consumes a flat tiny edge list — round 2
      // re-executed the whole shingle-join lineage through every union
      // branch and propagation round
      val pairs = Dedup.d41ShingleJaccard.run(s, dir).select(col("d1"), col("d2"))
      val cc = connectedComponents(pairs)
      // the loop has converged (it is eager), so the labels are flat
      // checkpointed blocks and the edge input is dead — release it
      Q.releaseBlocks(pairs)
      cc.select(col("node").as("doc_id"), col("lbl").as("cluster"),
          (col("node") === col("lbl")).as("is_kept"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH RECURSIVE sh AS (
        SELECT doc_id,
          unnest(list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
            THEN [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                  for i in range(1, len(words)-1)]
            ELSE [text] END)) AS s
        FROM (SELECT doc_id, text, string_split(text,' ') AS words FROM documents) w),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pruned AS (
        SELECT * FROM sh
        WHERE s NOT IN (SELECT s FROM sh GROUP BY s HAVING count(*) > 50)),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT d1, d2 FROM shared
          JOIN sizes s1 ON d1 = s1.doc_id
          JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(shared AS DOUBLE)/(s1.n + s2.n - shared) >= 0.2),
      edges AS (
        SELECT d1 AS src, d2 AS dst FROM pairs
        UNION ALL SELECT d2, d1 FROM pairs),
      walk(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node)
      SELECT node AS doc_id, min(lbl) AS cluster,
        node = min(lbl) AS is_kept
      FROM walk GROUP BY node ORDER BY doc_id"""))
}
