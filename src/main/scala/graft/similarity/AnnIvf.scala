package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** IVF-style approximate nearest neighbor over the embedding column — the
  * scale path behind Q32's exact brute-force top-k.
  *
  * Coarse quantizer: K deterministic centroids (every 50th vector — at
  * 100 TB this would be a k-means|| fit persisted once; a fixed sample
  * keeps the POC deterministic). Every vector is assigned to its nearest
  * centroid (broadcast centroids, map-side argmin — no shuffle). A query
  * probes its NPROBE nearest centroid cells and reranks exactly inside
  * them, scanning ~NPROBE/K of the corpus instead of all of it.
  *
  * Recall vs exact Q32 top-k is asserted in AnnIvfSpec.
  */
object AnnIvf {
  val NPROBE = 3
  val TOP_K = 5

  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(a, b)

  /** Assign each embedding row to its nearest centroid id. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.join(broadcast(centroids))
      .select(col("vec_id"), col("emb"), col("cid"),
        cosine(col("emb"), col("cemb")).as("csim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("cid"))
  }

  def query(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.ensureRegistered(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val centroids = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))

    val assigned = assign(e, centroids)

    // Queries probe their NPROBE nearest centroid cells.
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val probeW = Window.partitionBy("qid").orderBy(desc("qcsim"), asc("cid"))
    val probes = q.join(broadcast(centroids))
      .select(col("qid"), col("qemb"), col("cid"),
        cosine(col("qemb"), col("cemb")).as("qcsim"))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= NPROBE)
      .select(col("qid"), col("qemb"), col("cid"))

    // Exact rerank inside probed cells only (equi-join on cell id).
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), asc("cand_id"))
    probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TOP_K)
      .orderBy("qid", "rn")
  }
}
