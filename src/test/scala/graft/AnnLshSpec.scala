package graft

import graft.queries.SimilarityOps
import graft.similarity.AnnLsh

/** Random-hyperplane LSH ANN: recall vs exact brute-force top-k, plus
  * determinism of the bucketing. */
class AnnLshSpec extends SparkSpec {

  test("lsh top-5 recall vs exact >= 0.6") {
    val exact = SimilarityOps.queries("q32_cosine_topk")(spark, sf)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnLsh.query(spark, sf)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"lsh recall $recall below 0.6")
  }

  test("bucketing is deterministic") {
    val e = graft.core.Tables.t(spark, sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("emb"))
      .limit(50)
    val a = AnnLsh.bucketed(e).select("vec_id", "band", "sig")
      .orderBy("vec_id", "band").collect()
    val b = AnnLsh.bucketed(e).select("vec_id", "band", "sig")
      .orderBy("vec_id", "band").collect()
    assert(a.sameElements(b))
  }
}
