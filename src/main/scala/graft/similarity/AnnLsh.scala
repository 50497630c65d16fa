package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Random-hyperplane LSH approximate nearest neighbor — the second scale
  * path for similarity search (complements AnnIvf): SIGN_BITS fixed
  * pseudo-random hyperplanes turn each vector into a bit signature;
  * signatures are split into BANDS bands, vectors sharing any band bucket
  * become candidates (equi-join, never a cross join), and candidates are
  * reranked exactly with the native cosine expression.
  *
  * Hyperplane coefficients come from a fixed-seed SplitMix64 stream mapped
  * to [-1, 1] — deterministic across runs and engines, no RNG at runtime.
  * For sign bits only the hyperplane direction matters, so uniform
  * components are as good as Gaussian ones at dim 64.
  */
object AnnLsh {
  // 8 bands × 2 bits: for the testdata's near-orthogonal neighbors
  // (best cosine ≈ 0.4 ⇒ P(bit agree) ≈ 0.63) this gives ~0.97 recall.
  // On real clustered embeddings (neighbor cosine ≥ 0.8) the same shape
  // prunes far harder; band shape is the recall/cost dial.
  val SIGN_BITS = 16
  val BANDS = 8
  val BITS_PER_BAND: Int = SIGN_BITS / BANDS
  val TOP_K = 5

  private def planes(seed: Long, bits: Int, dim: Int): Array[Array[Double]] = {
    val rng = new graft.core.Rng(seed)
    Array.fill(bits, dim)(rng.nextSignedUnit())
  }

  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(a, b)

  /** Bit b of the signature = sign of ⟨v, plane_b⟩, as an int column. */
  private def signatureBits(emb: Column, ps: Array[Array[Double]]): Seq[Column] =
    ps.toSeq.map { plane =>
      val planeCol = array(plane.map(lit).toIndexedSeq: _*)
      (aggregate(zip_with(emb, planeCol, (x, y) => x * y), lit(0.0), _ + _) > 0)
        .cast("int")
    }

  /** (vec_id, emb, band, band_sig) bucket rows. */
  def bucketed(e: DataFrame, seed: Long = 7L, dim: Int = 64): DataFrame = {
    val ps = planes(seed, SIGN_BITS, dim)
    val bits = signatureBits(col("emb"), ps)
    val bandCols = (0 until BANDS).map { b =>
      val slice = (0 until BITS_PER_BAND).map(r => bits(b * BITS_PER_BAND + r))
      struct(lit(b).as("band"),
        concat_ws("", slice.map(_.cast("string")): _*).as("sig"))
    }
    e.select(col("vec_id"), col("emb"), explode(array(bandCols: _*)).as("bs"))
      .select(col("vec_id"), col("emb"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def query(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.ensureRegistered(s)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val buckets = bucketed(e)
    val qb = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("band"), col("sig"))
    // Candidates: any shared (band, sig) bucket; distinct before rerank.
    val cands = qb.join(buckets, Seq("band", "sig"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("vec_id").as("cand_id"), col("emb"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), asc("cand_id"))
    cands.select(col("qid"), col("cand_id"),
        round(cosine(col("qemb"), col("emb")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TOP_K)
      .orderBy("qid", "rn")
  }
}
