package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS: a pair list is not actionable for dedup until
  * it is grouped into connected components with a canonical
  * representative per component (keep the rep, drop the rest).
  *
  * Components come from iterative min-label propagation: every doc starts
  * labeled with its own id; each round it takes the min of its own label
  * and its neighbors' labels; fixpoint = components labeled by their min
  * doc_id. Each round is one equi-join plus one partial-aggregable min —
  * the standard CC-on-Spark shape (GraphX/GraphFrames ship the
  * small-star/large-star variant of the same idea, which converges in
  * fewer rounds on high-diameter graphs; near-dup components are
  * low-diameter, so plain propagation converges in a handful). Labels are
  * materialized to parquet every round to truncate lineage — without
  * this, round k replays rounds 0..k-1 and the loop goes quadratic.
  *
  * The driver-side loop holds only a changed-row COUNT per round, never
  * data; convergence detection is part of the algorithm (same pattern as
  * the k-means fit in AnnIvf).
  */
object DedupClusters {

  /** Component label (min doc_id reachable) for every doc in `pairs`. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame =
    connectedComponentsWithRounds(pairs, maxIters)._1

  /** [[connectedComponents]] plus the number of propagation rounds it ran
    * until fixpoint — the scale diagnostic (rounds track component
    * diameter, which must NOT grow with corpus size when the expansion
    * adds disjoint copies; reported at both scale points in
    * BENCH_NOTES.md). */
  def connectedComponentsWithRounds(pairs: DataFrame,
      maxIters: Int = 20): (DataFrame, Int) = {
    val s = pairs.sparkSession
    val tmp = graft.core.TempDirs.create("graft-cc")
    // Materialize the edge list ONCE: `pairs` is usually an expensive
    // plan (q31's blocked token self-join), and every propagation round
    // joins the edges — an unmaterialized edge frame replays that plan
    // per round, turning k rounds into k full pair recomputations
    // (measured: 110 s for q_dedup_clusters at the 10× scale point,
    // ~q31-per-round; materialized it is pairs-once + k cheap joins).
    // Both orientations from ONE pass over the pair plan (a union of two
    // selects would scan it twice even inside the single write).
    pairs.select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .write.mode("overwrite").parquet(s"$tmp/edges")
    val edges = s.read.parquet(s"$tmp/edges")
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // ONE job per round (optimization r16, the PageRank observe canon):
      // the changed-row count rides the snapshot write as an observe()
      // metric over a prev-label join — the old shape wrote the snapshot
      // and then ran a second read-back join job just for the count.
      // updated's id set equals labels' id set (labels start as every
      // edge endpoint and propagation never drops a node), so the inner
      // prev-join preserves every row and the written labels are
      // identical. count(when(...)) not sum(): count is 0 — never null —
      // on an empty graph, keeping the empty-pairs exit path.
      val cObs = org.apache.spark.sql.Observation(s"cc-changed-$iter")
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("comp")), "b")
        .select(col("a").as("id"), col("comp"))
      val updated = neighborMin.union(labels)
        .groupBy("id").agg(min("comp").as("comp"))
      updated
        .join(labels.withColumnRenamed("comp", "old"), "id")
        .observe(cObs,
          count(when(col("comp") =!= col("old"), lit(1))).as("changed"))
        .select("id", "comp")
        .write.mode("overwrite").parquet(s"$tmp/iter=$iter")
      changed = cObs.get("changed").asInstanceOf[Long]
      labels = s.read.parquet(s"$tmp/iter=$iter")
      // The snapshot write above is the last reader of iter-1: every
      // later job rescans only the newest snapshot, so earlier iterations
      // can be dropped immediately (bounded scratch, not O(iters) disk).
      if (iter >= 1) graft.core.TempDirs.delete(s"$tmp/iter=${iter - 1}")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIters iterations " +
          s"($changed labels still changing) — labels would be wrong; raise maxIters " +
          "(component diameter exceeds the iteration budget)")
    // The final round's join was the last reader of the edge table (the
    // returned labels plan scans only the newest iter snapshot), so the
    // corpus-pair-sized edges can be dropped NOW — leaving them until
    // process-exit cleanup inflates the scratch-disk high-water mark
    // across a multi-query bench run (ADVICE r5).
    graft.core.TempDirs.delete(s"$tmp/edges")
    (labels, iter)
  }

  /** Registry entry: cluster every doc that appears in an exact Q31
    * near-dup pair; emit (doc_id, rep = min id in component, size). */
  def query(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.queries.TextOps.queries("q31_jaccard_pairs")(s, dir)
      .select("id1", "id2")
    val comp = connectedComponents(pairs)
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Cluster-size HISTOGRAM: per cluster size, how many clusters, how
    * many docs they hold, and how many a keep-one-rep dedup would drop —
    * the "what did dedup find" summary read before shipping a dedup pass
    * (a corpus whose mass sits in giant clusters needs different
    * treatment — template/boilerplate removal — than one with many
    * pairs). Domain is bounded by the largest cluster, so the final agg
    * is tiny; the cost is the same CC the cluster queries share. */
  def statsQuery(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.queries.TextOps.queries("q31_jaccard_pairs")(s, dir)
      .select("id1", "id2")
    connectedComponents(pairs)
      .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"),
        col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("removable"))
      .orderBy("cluster_size")
  }

  val statsOracle: String = {
    val pairs = s"(${graft.queries.TextOps.q31OracleSql})"
    s"""
      WITH RECURSIVE p AS (SELECT id1, id2 FROM $pairs),
      edges AS (
        SELECT id1 AS a, id2 AS b FROM p
        UNION
        SELECT id2, id1 FROM p),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      r(id, n) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.id, e.b FROM r JOIN edges e ON r.n = e.a),
      comp AS (SELECT id, min(n) AS rep FROM r GROUP BY id),
      sizes AS (SELECT rep, count(*) AS cluster_size FROM comp GROUP BY rep)
      SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
             CAST((cluster_size - 1) * count(*) AS BIGINT) AS removable
      FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""
  }

  /** Canonical-doc SELECTION: within each near-dup cluster keep the
    * highest-QUALITY doc (corpus-clean scoring formula), not merely the
    * min-id — what a production dedup actually ships downstream. One
    * extra per-doc projection + a max_by over the cluster groupBy; the
    * argmax is partial-aggregable (no per-cluster sort). */
  def keepBestQuery(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.queries.TextOps.queries("q31_jaccard_pairs")(s, dir)
      .select("id1", "id2")
    val comp = connectedComponents(pairs)
    val q = graft.core.Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.queries.TextOps.qualityExpr.as("quality"))
    comp.join(q, comp("id") === q("doc_id"))
      .groupBy(col("comp").as("rep"))
      .agg(count(lit(1)).as("cluster_size"),
        max_by(col("doc_id"), struct(col("quality"), (-col("doc_id")).as("o"))).as("best_doc"),
        max(col("quality")).as("best_quality"))
      .orderBy("rep")
  }

  val keepBestOracle: String = {
    val pairs =
      s"(SELECT id1, id2 FROM (${graft.queries.TextOps.oracle("q31_jaccard_pairs")}))"
    s"""
      WITH RECURSIVE edges AS (
        SELECT id1 AS a, id2 AS b FROM $pairs
        UNION
        SELECT id2, id1 FROM $pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      r(id, n) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.id, e.b FROM r JOIN edges e ON r.n = e.a),
      comp AS (SELECT id, min(n) AS rep FROM r GROUP BY id),
      m AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
          len(list_distinct(string_split(text, ' '))) AS n_distinct,
          len(list_filter(string_split(text, ' '),
              x -> x IN ('the','a','of','and','is','in','to'))) AS n_stop
        FROM documents),
      q AS (
        SELECT doc_id, round(0.4 * least(CAST(n_tok AS DOUBLE) / 50, 1.0)
            + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tok)
            + 0.3 * CAST(n_distinct AS DOUBLE) / n_tok, 6) AS quality
        FROM m),
      j AS (SELECT c.rep, c.id, q.quality FROM comp c JOIN q ON c.id = q.doc_id),
      ranked AS (
        SELECT rep, id, quality,
               row_number() OVER (PARTITION BY rep ORDER BY quality DESC, id ASC) AS rn
        FROM j)
      SELECT r1.rep, CAST(cnt.n AS BIGINT) AS cluster_size,
             r1.id AS best_doc, r1.quality AS best_quality
      FROM ranked r1 JOIN (SELECT rep, count(*) AS n FROM j GROUP BY rep) cnt USING (rep)
      WHERE rn = 1 ORDER BY rep"""
  }

  /** DuckDB oracle: transitive closure by recursive CTE over the SAME
    * pair query (q31's oracle text reused verbatim), min per node. */
  val oracle: String = {
    val pairs =
      s"(SELECT id1, id2 FROM (${graft.queries.TextOps.oracle("q31_jaccard_pairs")}))"
    s"""
      WITH RECURSIVE edges AS (
        SELECT id1 AS a, id2 AS b FROM $pairs
        UNION
        SELECT id2, id1 FROM $pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      r(id, n) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.id, e.b FROM r JOIN edges e ON r.n = e.a),
      comp AS (SELECT id, min(n) AS rep FROM r GROUP BY id)
      SELECT c.id AS doc_id, c.rep AS rep, CAST(cnt.n AS BIGINT) AS cluster_size
      FROM comp c JOIN (SELECT rep, count(*) AS n FROM comp GROUP BY rep) cnt USING (rep)
      ORDER BY doc_id"""
  }
}
