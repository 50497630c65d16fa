package graft

import graft.queries.TextOps

/** Cross-operator consistency for the round-7 retrieval/dedup additions.
  * Containment and Jaccard are algebraically linked: if C(A→B) ≥ 0.8 AND
  * C(B→A) ≥ 0.8 then J(A,B) = |A∩B|/(|A|+|B|−|A∩B|) ≥ 0.8/(2−0.8) = 2/3
  * > 0.5, so every mutually-contained pair MUST appear in Q31's
  * jaccard ≥ 0.5 output — the two independently-written operators check
  * each other. BM25 gets the sanity floor its oracle cannot express:
  * the positive-idf variant never emits a non-positive score, and every
  * returned doc actually contains a query token.
  */
class ContainmentSpec extends SparkSpec {

  test("mutual containment >= 0.8 implies membership in Q31's jaccard pairs") {
    val cont = TextOps.queries("q_containment_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = cont.filter { case (a, b) => cont.contains((b, a)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val jac = TextOps.queries("q31_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual.nonEmpty, "fixture should plant at least one mutual pair")
    val missing = mutual.filterNot(jac.contains)
    assert(missing.isEmpty,
      s"mutually-contained pairs absent from q31 (violates J >= 2/3): $missing")
  }

  test("bm25 scores are positive and only match docs containing query tokens") {
    val rows = TextOps.queries("q_bm25_rank")(spark, sf).collect()
    assert(rows.nonEmpty, "fixture vocabulary should match the demo query")
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0, s"non-positive bm25 for doc ${r.getLong(0)}")
    }
    val matched = spark.read.parquet(s"$sf/documents.parquet")
      .where("array_contains(split(text, ' '), 'spark') OR " +
        "array_contains(split(text, ' '), 'window') OR " +
        "array_contains(split(text, ' '), 'hash')")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val strays = rows.map(_.getLong(0)).filterNot(matched.contains)
    assert(strays.isEmpty, s"bm25 returned docs with no query token: $strays")
  }
}
