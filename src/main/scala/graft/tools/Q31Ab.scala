package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Same-JVM interleaved A/B: q31 with the materialized size table (the
  * registry spelling) vs the unbarriered two-replay spelling — the only
  * defensible comparison under the r9 ambient drift (same boot, same
  * JVM, alternating passes).
  */
object Q31Ab {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-q31-ab").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def unbarriered(): org.apache.spark.sql.DataFrame = {
      val tok = t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .filter(col("tok") =!= "")
      val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = tok.as("a").join(tok.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("ix"))
      val jac = col("ix").cast("double") /
        (col("s1.sz") + col("s2.sz") - col("ix"))
      inter.join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
        .filter(jac >= 0.5)
        .select(col("id1"), col("id2"), round(jac, 6).as("jaccard"))
        .orderBy("id1", "id2")
    }
    def registry(): org.apache.spark.sql.DataFrame =
      graft.SparkEntry.queries("q31_jaccard_pairs")(spark, dir)

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(registry _); time(unbarriered _)
    val (as, bs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 5) { as += time(registry _); bs += time(unbarriered _) }
    def fmt(x: Seq[Double]) = x.map(v => f"$v%.2f").mkString(" ")
    val a = as.result().toSeq; val b = bs.result().toSeq
    println(s"barrier   : ${fmt(a)}  min=${a.min}")
    println(s"unbarrier : ${fmt(b)}  min=${b.min}")
    spark.stop()
  }
}
