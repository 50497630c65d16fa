package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Invariants tying the round-7 corpus-signal operators to ground truth
  * recomputed independently (driver-side, sf0.001 = 500 docs).
  *
  * q_prefix_dup: the whole output table must equal a driver-side
  * recomputation of the duplicated-prefix groups — Java MessageDigest +
  * String.split, sharing no code path with the Spark operator.
  *
  * q_rare_token_ratio: every doc appears exactly once; rare_frac is
  * nonzero iff the doc contains at least one token whose corpus
  * frequency sits below 0.25x the mean (threshold recomputed here from
  * raw token counts, not via the operator under test).
  */
class QualitySignalsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("prefix-dup groups equal an independent driver-side recomputation") {
    val expected = docs.select("doc_id", "text").collect()
      .map(r => (md5hex(r.getString(1).split(" ").take(8).mkString(" ")),
        r.getLong(0)))
      .groupBy(_._1)
      .collect { case (k, xs) if xs.length > 1 =>
        (k, xs.length.toLong, xs.map(_._2).min) }
      .toSet
    assert(expected.nonEmpty, "fixture should contain duplicated prefixes")
    val got = TextOps.queries("q_prefix_dup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"mismatch: extra=${got.diff(expected)} missing=${expected.diff(got)}")
  }

  test("rare_frac is nonzero exactly for docs holding a sub-threshold token") {
    val tokens = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq
    }
    val cf = tokens.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val mean = cf.values.sum.toDouble / cf.size
    val rareToks = cf.filter(_._2 < 0.25 * mean).keySet
    assert(rareToks.nonEmpty, "fixture should plant a rare token")
    val rows = TextOps.queries("q_rare_token_ratio")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq.sorted == tokens.map(_._1).toSeq.sorted,
      "every doc must appear exactly once")
    val frac = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    tokens.foreach { case (id, ts) =>
      val expectRare = ts.exists(rareToks.contains)
      assert((frac(id) > 0.0) == expectRare,
        s"doc $id rare_frac=${frac(id)} but expectRare=$expectRare")
      val expected = ts.count(rareToks.contains).toDouble / ts.length
      assert(math.abs(frac(id) - expected) < 1e-6,
        s"doc $id rare_frac=${frac(id)} != recomputed $expected")
    }
  }
}
