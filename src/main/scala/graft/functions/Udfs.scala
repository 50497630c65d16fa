package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom function surface (SURVEY.md §2B Q36): a scalar Jaccard UDF and a
  * typed weighted-mean Aggregator.
  *
  * The Aggregator accumulates in BigDecimal at scale 4 (mirroring the
  * engine-wide CAST(x AS DECIMAL(18,4)) canon) so merge order — which Spark
  * does not guarantee across partitions — cannot change the result.
  */
object Udfs {

  /** Token-set Jaccard similarity; null-safe, empty-safe. */
  def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val sa = Option(a).getOrElse(Seq.empty).toSet
    val sb = Option(b).getOrElse(Seq.empty).toSet
    val u = (sa union sb).size
    if (u == 0) 0.0 else (sa intersect sb).size.toDouble / u
  }

  /** Weighted mean with exact decimal accumulation. Input: (value, weight). */
  object WeightedMean extends Aggregator[(Double, Int), (BigDecimal, Long), Double] {
    def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(4), 0L)
    def reduce(b: (BigDecimal, Long), in: (Double, Int)): (BigDecimal, Long) = {
      val v = BigDecimal(in._1).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      (b._1 + v * in._2, b._2 + in._2)
    }
    def merge(x: (BigDecimal, Long), y: (BigDecimal, Long)): (BigDecimal, Long) =
      (x._1 + y._1, x._2 + y._2)
    // Raw ratio; callers round with the engine-wide round(col, 6) so the
    // rounding mode is identical to every other query's.
    def finish(r: (BigDecimal, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    def bufferEncoder: Encoder[(BigDecimal, Long)] =
      Encoders.product[(BigDecimal, Long)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
