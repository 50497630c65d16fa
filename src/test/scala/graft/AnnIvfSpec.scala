package graft

import graft.queries.SimilarityOps
import graft.similarity.AnnIvf

/** ANN gate: IVF top-k recall vs the exact brute-force Q32 top-k. With
  * K = ⌈√N⌉ cells (23 at the fixture's N=500) and the default ~30% cell
  * coverage, perfect recall is not expected on the uniform-random fixture
  * — the bound asserts the index is doing real work (random 5-of-corpus
  * would be ~3%; measured recall ≈ 0.66). Also pins the scale knobs:
  * chooseK caps at MAX_K and grows as √N, never with a fixed stride. */
class AnnIvfSpec extends SparkSpec {

  test("chooseK grows as sqrt(N) and is capped") {
    assert(AnnIvf.chooseK(500) == 23)
    assert(AnnIvf.chooseK(1000000) == 1000)
    assert(AnnIvf.chooseK(100000000000L) == AnnIvf.MAX_K)
    assert(AnnIvf.chooseK(1) == 4)
  }

  test("fitCentroids refines deterministically with bounded K") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.ensureRegistered(spark) // assign() scores via graft_cosine
    val e = graft.core.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val seeds = e.filter(col("vec_id") % 21 === 0)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val nSeeds = seeds.count()
    val a = AnnIvf.fitCentroids(e, seeds, 2).orderBy("cid").collect()
    val b = AnnIvf.fitCentroids(e, seeds, 2).orderBy("cid").collect()
    assert(a.length > 0 && a.length <= nSeeds, "K may only shrink")
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "fit must be deterministic")
    // Dense re-assigned ids 0..K-1.
    assert(a.map(_.getLong(0)).toSeq == (0L until a.length).toSeq)
  }

  test("planted clusters: recall >= 0.9 at the fixed production-default nprobe") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivf-planted")
    AnnIvf.fit(e, idx, k = 32, fitIters = 2)
    // Default nprobe (16) — the setting a production clustered corpus
    // runs; and a deliberately tight nprobe=4 must ALSO clear the gate
    // (clusters live in few cells, so narrow probes still find them).
    val exact = PlantedEmbeddings.exactTopK(e, AnnIvf.TOP_K)
    for (np <- Seq(AnnIvf.DEFAULT_NPROBE, 4)) {
      val approx = AnnIvf.search(spark, idx, PlantedEmbeddings.queries(e), nprobe = np)
        .select("qid", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = PlantedEmbeddings.recall(exact, approx)
      assert(recall >= 0.9, s"ivf planted recall $recall below 0.9 at nprobe=$np")
    }
  }

  test("search runs from the persisted index (no fit jobs) and survives a fresh session") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivf-idx-reuse")
    AnnIvf.fit(e, idx, k = 32, fitIters = 2)
    val q = PlantedEmbeddings.queries(e)
    val out1 = AnnIvf.search(spark, idx, q, nprobe = 4)
    // Plan-level no-refit proof: the search plan scans the two persisted
    // index tables and contains NONE of the fit machinery (posexplode /
    // avg centroid update, stride seed filter).
    val plan = out1.queryExecution.executedPlan.toString
    assert(plan.contains(idx), s"search must scan the index dir:\n$plan")
    assert(!plan.toLowerCase.contains("posexplode"), "fit centroid-update leaked into search plan")
    val r1 = out1.select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The index is plain parquet: a FRESH session (no shared state) built
    // on the same store answers identically without any fit call.
    val s2 = spark.newSession()
    val q2 = PlantedEmbeddings.queries(PlantedEmbeddings.df(s2))
    val r2 = AnnIvf.search(s2, idx, q2, nprobe = 4)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2, "fresh-session search from the persisted index must agree")
  }

  test("append adds vectors to a persisted index without refit; search finds them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val idx = graft.core.TempDirs.create("graft-ivf-append")
    AnnIvf.fit(e, idx, k = 32, fitIters = 2)
    // New vectors = near-copies of the query vector itself (cosine
    // ≈ 0.9999+ ≫ the ~0.996 cluster siblings) with fresh ids — after
    // append they must dominate the query's top-k.
    val base = e.filter(col("vec_id") === 0).select("emb").as[Seq[Double]].head()
    val newVecs = Seq(
      (9001L, base.map(_ + 0.01)), (9002L, base.map(_ - 0.01)), (9003L, base.map(_ * 1.001)))
      .toDF("vec_id", "emb")
    AnnIvf.append(spark, idx, newVecs)
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val top = AnnIvf.search(spark, idx, q, nprobe = 4)
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(Set(9001L, 9002L, 9003L).subsetOf(top),
      s"appended near-duplicates missing from top-k: $top")
  }

  test("ivf top-5 recall vs exact >= 0.4 and all results are true neighbors") {
    val exact = SimilarityOps.queries("q32_cosine_topk")(spark, sf)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnIvf.query(spark, sf)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall below 0.4")
  }
}
