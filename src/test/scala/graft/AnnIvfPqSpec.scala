package graft

import graft.similarity.AnnIvfPq

/** IVFPQ hybrid gate: the coarse-route + residual-code composition must
  * keep the planted-cluster recall requirement the sibling families
  * carry (≥ 0.9) while probing a quarter of the cells, search must run
  * purely from the persisted five-table index, and the ADC shortlist
  * must genuinely restrict work to probed cells (candidate count
  * sanity).
  */
class AnnIvfPqSpec extends SparkSpec {

  test("planted clusters: IVFPQ recall >= 0.9 at nprobe=8 of 64 cells") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivfpq-planted")
    AnnIvfPq.fit(e, idx, coarseK = 32, iters = 2)
    val exact = PlantedEmbeddings.exactTopK(e, AnnIvfPq.TOP_K)
    val approx = AnnIvfPq.search(spark, idx, PlantedEmbeddings.queries(e))
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = PlantedEmbeddings.recall(exact, approx)
    assert(recall >= 0.9, s"ivfpq planted recall $recall below 0.9")
  }

  test("10x planted corpus: persisted-index recall >= 0.9 at the production probe ratio") {
    // Closes the r7 "exponent measured, recall not" gap at the scale
    // point: 500 planted clusters (5000 vectors — the same 10× step the
    // sf0.1→sf1 exponent suite measures) fit into a 64-cell persisted
    // index, searched at the default nprobe=8 — a 1/8 probe ratio,
    // SHARPER than the toy case's 8-of-32 — with 100 queries instead of
    // 10. Recall here is a requirement of the planted structure, not a
    // restatement of measured behavior.
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark, numClusters = 500)
    val idx = graft.core.TempDirs.create("graft-ivfpq-10x")
    AnnIvfPq.fit(e, idx, coarseK = 64, iters = 2)
    val q = PlantedEmbeddings.queries(e, maxQid = 1000)
    assert(q.count() == 100, "expected 100 scale-point queries")
    val exact = PlantedEmbeddings.exactTopK(e, AnnIvfPq.TOP_K, q)
    val approx = AnnIvfPq.search(spark, idx, q)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = PlantedEmbeddings.recall(exact, approx)
    assert(recall >= 0.9, s"10x planted recall $recall below 0.9")
  }

  test("search runs from the persisted index and a fresh session agrees") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivfpq-reuse")
    AnnIvfPq.fit(e, idx, coarseK = 32, iters = 2)
    val q = PlantedEmbeddings.queries(e)
    val out1 = AnnIvfPq.search(spark, idx, q)
    val plan = out1.queryExecution.executedPlan.toString
    assert(plan.contains(idx), s"search must scan the index dir:\n$plan")
    assert(!plan.toLowerCase.contains("posexplode"),
      "fit machinery leaked into the search plan")
    val r1 = out1.select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = spark.newSession()
    val q2 = PlantedEmbeddings.queries(PlantedEmbeddings.df(s2))
    val r2 = AnnIvfPq.search(s2, idx, q2)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2, "fresh-session search from the persisted index must agree")
  }

  test("residual codes beat cell centroids alone: ADC separates in-cell neighbors") {
    graft.GraftExtensions.ensureRegistered(spark)
    // With coarseK well below the cluster count, several planted
    // clusters share each cell — a coarse-only scorer cannot rank inside
    // a cell (every member has the same centroid dot). Recall ≥ 0.9 with
    // 16 cells for 50 clusters proves the RESIDUAL codes do the
    // separating.
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivfpq-residual")
    AnnIvfPq.fit(e, idx, coarseK = 16, iters = 2)
    val exact = PlantedEmbeddings.exactTopK(e, AnnIvfPq.TOP_K)
    val approx = AnnIvfPq.search(spark, idx, PlantedEmbeddings.queries(e),
        nprobe = 4)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = PlantedEmbeddings.recall(exact, approx)
    assert(recall >= 0.9,
      s"residual separation failed: recall $recall at 16 cells / 50 clusters")
  }
}
