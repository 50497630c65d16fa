package graft

import org.apache.spark.sql.functions._
import graft.similarity.AnnIvf

/** q_knn_graph contract: the registry entry is the exact oracle twin;
  * the 100 TB construction path is the persisted IVF index queried with
  * every vector. On the planted-cluster fixture the IVF-built graph must
  * recover ≥ 0.9 of the exact graph's edges (cluster siblings dominate
  * every top-4 list, and siblings share IVF cells by construction — an
  * index that loses them is broken, not unlucky).
  */
class KnnGraphSpec extends SparkSpec {

  private val K = 4

  test("IVF-constructed kNN graph recalls >= 0.9 of the exact graph") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val allQ = e.select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val exact = PlantedEmbeddings.exactTopK(e, K, allQ)
    assert(exact.size == PlantedEmbeddings.N * K, "exact graph must be complete")

    val idx = graft.core.TempDirs.create("graft-knn-graph-ivf")
    AnnIvf.fit(e, idx, k = 32, fitIters = 2)
    val approx = AnnIvf.search(spark, idx, allQ, topK = K)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = PlantedEmbeddings.recall(exact, approx)
    assert(recall >= 0.9, s"IVF graph recall $recall below 0.9")
  }

  test("registry graph has exactly K ranked edges per vector, no self-loops") {
    val out = graft.queries.SimilarityOps.queries("q_knn_graph")(spark, sf)
      .collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n * K, s"expected ${n * K} edges, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to K),
        s"qid $qid ranks not 1..$K")
      assert(rows.forall(_.getLong(1) != qid), s"qid $qid has a self-loop")
      // Ranks must follow descending similarity.
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"qid $qid similarities not descending")
    }
  }
}
