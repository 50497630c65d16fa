package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.SimilarityOps

/** Int8 quantization quality gate: top-5 cosine search over DEquantized
  * vectors must agree with the exact Q32 top-5 almost everywhere — int8
  * max-abs quantization at dim 64 perturbs cosines by ~0.5%, so only
  * near-ties may flip. */
class QuantizedCosineSpec extends SparkSpec {

  test("top-5 over int8-dequantized vectors: recall >= 0.8 vs exact") {
    graft.GraftExtensions.ensureRegistered(spark)
    val exact = SimilarityOps.queries("q32_cosine_topk")(spark, sf)
      .select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)

    val emb = col("embedding").cast("array<double>")
    val scale = greatest(
      aggregate(emb, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0,
      lit(1e-12))
    // quantize then dequantize: the vectors the int8 store would serve.
    val deq = graft.core.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(transform(emb, x => round(x / scale)), q => q * scale).as("emb"))
    val q = deq.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val scored = deq.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        graft.functions.CosineSimilarity.cosine(col("qemb"), col("emb")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), asc("cand_id"))
    val approx = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall below 0.8")
  }

  test("planted clusters: int8 search recall >= 0.9 as a requirement") {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = PlantedEmbeddings.df(spark)
    val exact = PlantedEmbeddings.exactTopK(e, 5)
    // Quantize-dequantize the corpus, then search with FULL-precision
    // queries against the int8 store — the production serving shape.
    val scale = greatest(
      aggregate(col("emb"), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0,
      lit(1e-12))
    val deq = e.select(col("vec_id"),
      transform(transform(col("emb"), x => round(x / scale)), q => q * scale).as("emb"))
    val q = PlantedEmbeddings.queries(e)
    val scored = deq.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand_id"),
        graft.functions.CosineSimilarity.cosine(col("qemb"), col("emb")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), asc("cand_id"))
    val approx = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("qid", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = PlantedEmbeddings.recall(exact, approx)
    assert(recall >= 0.9, s"int8 planted recall $recall below 0.9 — quantization must not lose clusters")
  }
}
