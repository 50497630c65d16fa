package graft

import graft.queries.TextOps

/** Internal-consistency gates for the round-9 curation report operators.
  * The DuckDB oracle pins exact values; these assert the cross-query
  * invariants a correct implementation cannot violate, so a future edit
  * that keeps each query self-consistent but breaks their shared
  * semantics still fails. */
class CurationReportSpec extends SparkSpec {

  test("threshold sweep is monotone and anchored to the q31 pair set") {
    val rows = TextOps.queries("q_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // Raising the threshold can only remove pairs and involved docs.
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, s"sweep not monotone: $p1->$p2 / $d1->$d2")
    }
    val q31 = TextOps.queries("q31_jaccard_pairs")(spark, sf).count()
    assert(rows.head._2 == q31,
      "threshold 0.5 row must equal the full q31 pair count")
  }

  test("cluster size stats account for every paired doc exactly once") {
    val stats = graft.dedup.DedupClusters.statsQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.forall(_._1 >= 2), "a cluster needs at least two members")
    assert(stats.forall { case (sz, n, docs, rem) =>
      docs == sz * n && rem == (sz - 1) * n })
    val pairedDocs = TextOps.queries("q31_jaccard_pairs")(spark, sf)
      .select("id1").union(
        TextOps.queries("q31_jaccard_pairs")(spark, sf).select("id2"))
      .distinct().count()
    assert(stats.map(_._3).sum == pairedDocs,
      "histogram doc mass must equal the distinct paired-doc count")
  }

  test("dup inflation: tokens conserved, inflation >= 1, keeps rep per cluster") {
    val rows = TextOps.queries("q_dup_inflation")(spark, sf).collect()
    val docs = graft.core.Tables.t(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "docs conserved")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "docs_after <= docs")
      assert(r.getLong(4) <= r.getLong(2), "tokens_after <= tokens")
      assert(r.getDouble(5) >= 1.0, "inflation below 1 is impossible")
    }
  }

  test("quota sample: at most CAP docs per source, deterministic across runs") {
    val a = TextOps.queries("q_quota_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val perSource = a.groupBy(_._2).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= 10), "cap exceeded")
    val b = TextOps.queries("q_quota_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.toSeq == b.toSeq, "quota sample must be deterministic")
  }
}
