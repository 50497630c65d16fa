package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Graph and pairwise-comparison operators.
  *
  * - `q_pagerank_parts`: delta-terminated PageRank (d = 0.85) over the
  *   part co-occurrence graph (parts sharing an order, distinct directed
  *   edges both ways). Each iteration is one shuffle join (contributions
  *   = rank/out-degree shipped along edges) plus one partial-aggregable
  *   sum per destination — the classic Pregel-as-SQL shape that scales:
  *   the edge list partitions on src, the rank vector on node. The edge
  *   list and rank snapshots materialize to parquet per round (the
  *   DedupClusters lineage-truncation pattern — without it round k
  *   replays rounds 0..k-1 and the loop goes quadratic); the driver
  *   holds only the 1-row convergence scalar per round, never data.
  *   Termination: stop after the first iteration whose max |Δrank|,
  *   relative to the uniform rank 1/N (i.e. N·max|Δ|), drops below
  *   [[PrEps]], else after [[PrMaxIter]] iterations; the executed count
  *   is reported in the `iters` column. The delta is rounded to 9 dp
  *   before the compare so both engines decide from the same grain
  *   (cross-engine sum-order error is ~1e-15 relative, while successive
  *   deltas shrink geometrically — a boundary collision needs the delta
  *   within ~1e-12 of the threshold at exactly the stopping round).
  *   The oracle unrolls [[PrMaxIter]] iterations as chained MATERIALIZED
  *   CTEs with a per-iteration delta scalar and a CASE that picks the
  *   first converged round — DuckDB forbids aggregates inside recursive
  *   CTEs, so unrolling IS the honest SQL twin. Every node here has
  *   out-edges (undirected construction), so there is no dangling-mass
  *   term.
  * - `q_edit_distance`: blocked Levenshtein near-dup profile. All-pairs
  *   edit distance is O(n²·len²) and unrunnable at scale, so pairs are
  *   generated only within (lang, source) blocks over short docs
  *   (n_chars ≤ 200) with a ±20-char length prefilter (|len(a)-len(b)|
  *   is a lower bound on edit distance, so the prefilter is lossless
  *   for the ≤20 threshold). Output is the per-block profile — block
  *   size, surviving pair count, min distance, pairs within 30 edits —
  *   which stays non-empty even when a corpus has no short near-dups.
  *
  * Determinism: PageRank ranks are IEEE doubles; contributions per node
  * are few hundred at most, so cross-engine summation-order error is
  * ~1e-15 relative while the 6 dp output rounding grain is ~2e-3 of the
  * rank magnitude — boundary collisions are effectively impossible.
  * Levenshtein is the standard unit-cost edit distance in both engines.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Convergence threshold on N·max|Δrank| (delta relative to the uniform
    * rank). Shared by the Spark loop and the unrolled oracle. */
  val PrEps = 0.001
  /** Iteration cap; also the oracle's unroll depth, so the two always
    * agree on the worst-case output. */
  val PrMaxIter = 12

  /** BFS hop cap — also the oracle's recursion depth bound, so both
    * engines agree when the cap (not frontier exhaustion) terminates. */
  val BfsMaxHops = 6

  /** Part co-occurrence pairs (x ≠ y, both directions, once per order) —
    * the edge feed all four graph queries share. Built by aggregating
    * each order's distinct part set and exploding the pairs from the
    * array (optimization r16, guide §2.4): the old spelling paid a
    * distinct shuffle on (orderkey, partkey) and then RE-shuffled both
    * sides of a self-join on orderkey — three corpus-sized exchanges
    * where one grouping does the same work (collect_set dedupes exactly
    * like the distinct; per-order pair fan-out is identical to the
    * self-join's). Row multiset out is unchanged, so every downstream
    * support count / distinct is byte-identical. */
  private def coPairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(collect_set("l_partkey").as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .where(col("src") =!= col("dst"))

  val queries: Map[String, Q] = Map(
    "q_pagerank_parts" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-pr")
      coPairs(s, dir)
        .distinct()
        .write.mode("overwrite").parquet(s"$tmp/edges")
      val e = s.read.parquet(s"$tmp/edges")
      // Degree folded INTO the edge table in ONE init job (optimization
      // r17, VERDICT r16 item 4; guide §2.4): the degree used to be its
      // own corpus-derived write (deg) that edeg then re-joined — but
      // d = count per src IS a window over the same src key the edeg
      // table already groups on, so the deg write/read/join is gone
      // (init jobs 4 → 3, edge-table passes 2 → 2, one table fewer).
      // Same (src, dst, d) row multiset, so every rank is identical.
      e.withColumn("d", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .write.mode("overwrite").parquet(s"$tmp/edeg")
      val edeg = s.read.parquet(s"$tmp/edeg")
      // The node count rides the iter-0 write as an observe() metric and
      // the snapshot stores NODES ONLY — the uniform rank 1/n cannot be
      // computed before n is known, so it is projected as the same
      // lit(1.0 / n) onto the read-back instead of being stored (the
      // loop's first join sees identical (node, rank) rows either way).
      val nObs = org.apache.spark.sql.Observation("pr-n")
      edeg.select(col("src").as("node")).distinct()
        .observe(nObs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$tmp/iter=0")
      val n = nObs.get("n").asInstanceOf[Long].toDouble
      var r = s.read.parquet(s"$tmp/iter=0")
        .withColumn("rank", lit(1.0 / n))
      var iter = 0
      var deltaRel = Double.MaxValue
      while (iter < PrMaxIter && deltaRel >= PrEps) {
        // ONE job per iteration (was two): the convergence delta rides
        // the same write as an observe() max — the old shape wrote the
        // snapshot, then ran a second read-back join job for the delta.
        // The prev-rank join adds nothing the delta job didn't already
        // pay, and every node keeps a row (undirected graph ⇒ every node
        // receives contributions), so the written ranks are identical.
        val dObs = org.apache.spark.sql.Observation(s"pr-delta-$iter")
        edeg.join(r, col("src") === col("node"))
          .select(col("dst"), (col("rank") / col("d")).as("c"))
          .groupBy("dst").agg(sum("c").as("m"))
          .select(col("dst").as("node"),
            (lit(0.15 / n) + lit(0.85) * col("m")).as("rank"))
          .join(r.select(col("node"), col("rank").as("prev")), "node")
          .observe(dObs, max(abs(col("rank") - col("prev"))).as("delta"))
          .select("node", "rank")
          .write.mode("overwrite").parquet(s"$tmp/iter=${iter + 1}")
        val d = dObs.get("delta").asInstanceOf[Double]
        deltaRel = math.round(d * n * 1e9) / 1e9
        // The write above was the last reader of iter-1's snapshot.
        if (iter >= 1) graft.core.TempDirs.delete(s"$tmp/iter=${iter - 1}")
        r = s.read.parquet(s"$tmp/iter=${iter + 1}")
        iter += 1
      }
      r.select(col("node"), round(col("rank"), 6).as("rank"),
          lit(iter).as("iters"))
        .orderBy(desc("rank"), asc("node"))
        .limit(20)
    },

    // Triangle count over the part co-occurrence graph on a degree-capped
    // subgraph (standard hub-truncation: drop nodes with degree > 128
    // BEFORE wedge generation, so the wedge join is bounded by cap·|E| —
    // linear in edges with a fixed constant — instead of Σd², which a
    // single celebrity key makes quadratic at 100 TB). Canonical src<dst
    // orientation means each triangle is generated exactly once as
    // a<b<c. The truncation is part of the declared semantics; the
    // output reports how much of the graph survived the cap.
    "q_triangle_count" -> { (s, dir) =>
      // Materialized twice: e0 feeds the degree union (2x) and the
      // truncated edge build; e feeds both wedge-join sides, the closing
      // join and the edge count. Unbarriered the replays CASCADE — every
      // consumer of e replays e0, which replays the pair build and the
      // degree branches — and the executed plan carried 44 corpus
      // scans (ReuseProbe r9). With the two barriers: one pair-build pass.
      val e0 = graft.core.Materialize(
        coPairs(s, dir)
          .where(col("src") < col("dst"))
          .distinct(),
        "tri-e0")
      val deg = e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") <= 128).select("node")
      val e = graft.core.Materialize(
        e0.join(keep.withColumnRenamed("node", "src"), "src")
          .join(keep.withColumnRenamed("node", "dst"), "dst")
          .select("src", "dst"),
        "tri-e")
      val wedges = e.as("x")
        .join(e.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
      val tri = wedges
        .join(e.as("z"), col("u") === col("z.src") && col("w") === col("z.dst"))
      tri.agg(count(lit(1)).as("n_triangles"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .crossJoin(keep.agg(count(lit(1)).as("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    },

    "q_edit_distance" -> { (s, dir) =>
      val short = t(s, dir, "documents")
        .filter(col("n_chars") <= 200)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
      val blocks = short.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"))
      val pairStats = short.as("a")
        .join(short.as("b"), Seq("lang", "source"))
        .where(col("a.doc_id") < col("b.doc_id") &&
          abs(length(col("a.text")) - length(col("b.text"))) <= 20)
        .select(col("lang"), col("source"),
          levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_pairs"), min("dist").as("min_dist"),
          sum(when(col("dist") <= 30, 1L).otherwise(0L)).as("n_close"))
      blocks.join(pairStats, Seq("lang", "source"), "left")
        .select(col("lang"), col("source"), col("n_docs"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          col("min_dist"),
          coalesce(col("n_close"), lit(0L)).as("n_close"))
        .orderBy("lang", "source")
    },

    // Multi-source BFS (frontier algorithm) over the min-support-2 part
    // co-occurrence graph: hop distance from the p_size=50 seed set,
    // reported as a per-level histogram with a node-id checksum plus a
    // dist=-1 row for nodes the cap never reaches. Each level is ONE
    // equi-join (frontier ⋈ edges on src) and ONE left-anti join against
    // the visited set — the textbook distributed BFS shape: work is
    // O(edges touched per level), state is the visited table, and both
    // partition on the node key. Frontier and visited snapshots
    // materialize to parquet per level (lineage truncation, the PageRank
    // canon) and the driver holds only the 1-row frontier count that
    // drives early termination. The min-support-2 edge filter keeps the
    // graph sparse enough to have real depth at the verify scale (sf0.01:
    // levels 0..6 plus unreached nodes, so the hop cap binds; at sf0.001
    // the graph is denser relative to its size and BFS saturates in 2
    // hops, exercising the frontier-empty termination path instead. The
    // support-1 graph's diameter is 2 everywhere — every frequent part
    // pair rides one hub order).
    // Oracle: DuckDB WITH RECURSIVE, UNION-distinct on (node, dist),
    // same BfsMaxHops cap, min(dist) collapse outside the recursion.
    "q_bfs_hops" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-bfs")
      coPairs(s, dir)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("src", "dst")
        .write.mode("overwrite").parquet(s"$tmp/edges")
      val e = s.read.parquet(s"$tmp/edges")
      val nodes = e.select(col("src").as("node")).distinct()
      // The visited set accumulates as lvl=<k> SUBDIRS of one dir
      // (optimization r17, refining the r16 append-mode cut): the r16
      // loop wrote each level's frontier TWICE — once to its own
      // frontier=<k> dir, then appended the same rows to visited (two
      // jobs per level). Writing the frontier directly into
      // visited/lvl=<k> makes the level's ONE write serve both readers:
      // the next level's anti-join reads the visited root (whose eager
      // file listing happens at DataFrame creation, BEFORE the level's
      // subdir exists — so it sees exactly the pre-level snapshot, same
      // as the r16 append), and the next frontier reads the lvl=<k> leaf
      // path directly. Jobs per level 2 → 1, write volume halved; the
      // same (node, dist) rows land in visited either way.
      nodes.join(t(s, dir, "part").filter(col("p_size") === 50)
            .select(col("p_partkey").as("node")), "node")
        .select(col("node"), lit(0).as("dist"))
        .write.mode("overwrite").parquet(s"$tmp/visited/lvl=0")
      var frontier = s.read.parquet(s"$tmp/visited/lvl=0").select("node")
      var level = 0
      var frontierSize = frontier.count()
      while (level < BfsMaxHops && frontierSize > 0) {
        level += 1
        // Frontier size rides the frontier write as an observe() count —
        // the old shape ran a third read-back count job per level.
        val fObs = org.apache.spark.sql.Observation(s"bfs-front-$level")
        frontier.join(e, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(s.read.parquet(s"$tmp/visited").select("node"),
            Seq("node"), "left_anti")
          .select(col("node"), lit(level).as("dist"))
          .observe(fObs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$tmp/visited/lvl=$level")
        frontier = s.read.parquet(s"$tmp/visited/lvl=$level").select("node")
        frontierSize = fObs.get("n").asInstanceOf[Long]
      }
      nodes.join(s.read.parquet(s"$tmp/visited"), Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("dist"), lit(-1)).as("dist"))
        .groupBy("dist")
        .agg(count(lit(1)).as("n_nodes"), sum("node").as("node_sum"))
        .orderBy("dist")
    },

    // Degree distribution of the min-support-2 co-occurrence graph —
    // the first thing to look at before ANY graph algorithm at scale
    // (a heavy tail says salt the hubs; see the MinHash rerank).
    // Out-degree = in-degree (undirected construction), so one groupBy
    // on src suffices; the histogram re-aggregates on the tiny degree
    // domain. Edges stay in the shuffle, never the driver.
    "q_degree_dist" -> { (s, dir) =>
      coPairs(s, dir)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_bfs_hops" -> s"""
      WITH RECURSIVE
      li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS MATERIALIZED (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      seeds AS (SELECT node FROM nodes JOIN part ON p_partkey = node
                WHERE p_size = 50),
      bfs(node, dist) AS (
        SELECT node, 0 FROM seeds
        UNION
        SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON bfs.node = e.src
        WHERE bfs.dist < ${BfsMaxHops}),
      dists AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
      SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS node_sum
      FROM (SELECT n.node, coalesce(d.dist, -1) AS dist
            FROM nodes n LEFT JOIN dists d USING (node))
      GROUP BY dist ORDER BY dist
    """,
    "q_pagerank_parts" -> {
      // PrMaxIter unrolled power iterations (rK = rank vector after K)
      // each with its 1-row relative-delta scalar dK; `pick` selects the
      // first converged round exactly like the Spark loop's early stop.
      // Every rK is referenced up to three times (r(K+1), dK, the final
      // union), so MATERIALIZED (a DuckDB-only hint; Spark never parses
      // oracles) is what keeps the unroll linear instead of exponential.
      val iters = (1 to PrMaxIter).map { k =>
        s"""r$k AS MATERIALIZED (
          SELECT e.dst AS node,
                 0.15 / max(n.n) + 0.85 * sum(r${k - 1}.rank / deg.d) AS rank
          FROM e JOIN deg ON e.src = deg.src
                 JOIN r${k - 1} ON e.src = r${k - 1}.node, n
          GROUP BY e.dst),
      d$k AS (
          SELECT round(max(abs(r$k.rank - r${k - 1}.rank)) * (SELECT n FROM n), 9) AS delta
          FROM r$k JOIN r${k - 1} ON r$k.node = r${k - 1}.node)"""
      }.mkString(",\n      ")
      val pickArms = (1 to PrMaxIter - 1).map { k =>
        s"WHEN (SELECT delta FROM d$k) < $PrEps THEN $k"
      }.mkString("\n        ")
      val union = (1 to PrMaxIter).map { k =>
        s"SELECT node, rank, $k AS k FROM r$k"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e0 AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey <> b.l_partkey),
      e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0),
      deg AS MATERIALIZED (SELECT src, count(*) AS d FROM e GROUP BY src),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
      r0 AS MATERIALIZED (SELECT deg.src AS node, 1.0 / n.n AS rank FROM deg, n),
      $iters,
      pick AS (SELECT CASE
        $pickArms
        ELSE $PrMaxIter END AS it),
      ranks AS (
        $union)
      SELECT ranks.node, round(ranks.rank, 6) AS rank, pick.it AS iters
      FROM ranks, pick WHERE ranks.k = pick.it
      ORDER BY rank DESC, ranks.node LIMIT 20"""
    },

    "q_triangle_count" -> """
      WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey),
      deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)
        GROUP BY node),
      keep AS (SELECT node FROM deg WHERE d <= 128),
      e AS MATERIALIZED (
        SELECT src, dst FROM e0
        JOIN keep ka ON e0.src = ka.node
        JOIN keep kb ON e0.dst = kb.node)
      SELECT (SELECT count(*) FROM keep) AS n_nodes,
             (SELECT count(*) FROM e) AS n_edges,
             (SELECT count(*)
              FROM e x JOIN e y ON x.dst = y.src
                       JOIN e z ON z.src = x.src AND z.dst = y.dst)
               AS n_triangles""",

    "q_edit_distance" -> """
      WITH short AS (
        SELECT doc_id, lang, source, text FROM documents WHERE n_chars <= 200),
      blocks AS (
        SELECT lang, source, count(*) AS n_docs FROM short GROUP BY 1, 2),
      ps AS (
        SELECT a.lang, a.source, count(*) AS n_pairs,
               min(levenshtein(a.text, b.text)) AS min_dist,
               CAST(sum(CASE WHEN levenshtein(a.text, b.text) <= 30
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_close
        FROM short a JOIN short b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE abs(len(a.text) - len(b.text)) <= 20
        GROUP BY 1, 2)
      SELECT b.lang, b.source, b.n_docs,
             coalesce(ps.n_pairs, 0) AS n_pairs, ps.min_dist,
             coalesce(ps.n_close, 0) AS n_close
      FROM blocks b LEFT JOIN ps ON b.lang = ps.lang AND b.source = ps.source
      ORDER BY b.lang, b.source""",

    "q_degree_dist" -> """
      WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e0 AS (SELECT a.p AS src, b.p AS dst, count(*) AS support
             FROM pp a JOIN pp b ON a.o = b.o AND a.p <> b.p
             GROUP BY a.p, b.p),
      e AS (SELECT src, dst FROM e0 WHERE support >= 2),
      d AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
      SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
      FROM d GROUP BY deg ORDER BY deg"""
  )
}
