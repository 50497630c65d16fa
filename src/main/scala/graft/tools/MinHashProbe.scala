package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.dedup.MinHashDedup

/** Phase-level wall-clock breakdown of the q43 MinHash-LSH pipeline —
  * where do the ~4.7 s at sf0.1 actually go? Each phase is forced with
  * the same noop-write the bench uses, after one warm pass, so the
  * numbers decompose the benched steady-state cost rather than JIT.
  *
  * Measured r9 (sf0.1, 5000 docs / 271k token rows): sigs 0.6 s,
  * candidate band join 1.4 s, rerank joins 1.9 s, full 4.3 s. At this
  * corpus size the cost is per-stage scheduling + the two deliberate
  * parquet barriers, NOT data volume — a persist()-based variant was
  * measured no faster warm (4.2 s vs 4.3 s) and 3x slower cold, so the
  * committed barrier design stands (see BENCH_NOTES.md r9).
  */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-minhash-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = t(spark, dir, "documents")
    // Warm pass (full pipeline) so codegen/IO caches are hot.
    force(MinHashDedup.query(spark, dir))

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val tmp = graft.core.TempDirs.create(s"graft-probe-$rep")
      time("1 sigs compute+write") {
        MinHashDedup.signatures(docs)
          .write.mode("overwrite").parquet(s"$tmp/sigs")
      }
      val sigs = spark.read.parquet(s"$tmp/sigs")
      time("2 cands compute+write") {
        MinHashDedup.candidatePairs(MinHashDedup.bandSignatures(sigs))
          .write.mode("overwrite").parquet(s"$tmp/cands")
      }
      val cands = spark.read.parquet(s"$tmp/cands")
      val toks = MinHashDedup.tokens(docs)
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      time("3 rerank joins") {
        force(MinHashDedup.intersectionCounts(cands, toks))
      }
      time("4 full pipeline") { force(MinHashDedup.query(spark, dir)) }
    }
    spark.stop()
  }
}
