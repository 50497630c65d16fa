package graft.tools

import org.apache.spark.sql.functions._

/** Scratch A/B: co-occurrence edge build via distinct+self-join vs
  * collect_set+double-explode, interleaved in one JVM (min-of-N). */
object EdgeAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def joinShape() = {
      val li = graft.core.Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"), Seq("l_orderkey"))
        .where(col("a.l_partkey") =!= col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("support")).filter(col("support") >= 2)
        .select("src", "dst")
    }
    def setShape() = {
      graft.core.Tables.t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(collect_set("l_partkey").as("ps"))
        .select(explode(col("ps")).as("src"), col("ps"))
        .select(col("src"), explode(col("ps")).as("dst"))
        .where(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("support")).filter(col("support") >= 2)
        .select("src", "dst")
    }
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(joinShape _); time(setShape _)
    val (a, b) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to 5) { a += time(joinShape _); b += time(setShape _) }
    println(f"join-shape  reps=${a.map(x => f"$x%.3f").mkString(",")} min=${a.min}%.3f")
    println(f"set-shape   reps=${b.map(x => f"$x%.3f").mkString(",")} min=${b.min}%.3f")
    s.stop()
  }
}
