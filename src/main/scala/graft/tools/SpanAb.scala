package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch A/B: q_span_dedup window key — plain span vs (xxhash64, span). */
object SpanAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def base() = {
      val toks = split(col("text"), " ")
      val spans = when(size(toks) >= 5,
        transform(sequence(lit(1), size(toks) - 4),
          i => concat_ws(" ", slice(toks, i, lit(5))))).otherwise(array())
      graft.core.Tables.t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(spans)).as("span"))
    }
    def tail(sr: org.apache.spark.sql.DataFrame) = sr
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("owner") =!= col("doc_id"), 1L).otherwise(0L)).as("n_borrowed"))
    def plain() = tail(base().withColumn("owner",
      min("doc_id").over(Window.partitionBy("span"))))
    def hashed() = tail(base().withColumn("owner",
      min("doc_id").over(Window.partitionBy(xxhash64(col("span")), col("span")))))
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(plain _); time(hashed _)
    val (a, b) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 5) { a += time(plain _); b += time(hashed _) }
    println(f"plain-key  reps=${a.map(x => f"$x%.3f").mkString(",")} min=${a.min}%.3f")
    println(f"hash-key   reps=${b.map(x => f"$x%.3f").mkString(",")} min=${b.min}%.3f")
    s.stop()
  }
}
