package graft

import graft.queries.SimilarityOps
import graft.similarity.AnnIvf

/** ANN gate: IVF top-k recall vs the exact brute-force Q32 top-k. With
  * K=10 cells and NPROBE=3 the probe set covers ~30% of the corpus, so
  * perfect recall is not expected — the bound asserts the index is doing
  * real work (random 5-of-corpus would be ~3%). */
class AnnIvfSpec extends SparkSpec {

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
