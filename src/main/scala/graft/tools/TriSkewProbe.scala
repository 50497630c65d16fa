package graft.tools

import org.apache.spark.sql.functions._

/** VERDICT r16 item 7: measure the wedge-join hot-key distribution of
  * q_triangle_count's degree-capped subgraph BEFORE any salting. The
  * wedge join keys on node ids of the KEPT (deg ≤ 128) subgraph, so the
  * per-key fan-out is bounded by the cap BY CONSTRUCTION — this probe
  * records how the real distribution sits under that bound (max vs
  * median kept degree, wedge count, top-10 hubs) so the salt-or-not
  * decision is a committed measurement, not an argument.
  */
object TriSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val e0 = graft.core.Tables.t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(collect_set("l_partkey").as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .where(col("src") < col("dst")).distinct()
    val deg = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val kept = deg.filter(col("d") <= 128)
    val stats = kept.agg(count(lit(1)).as("n"), max("d").as("max_d"),
      expr("percentile_approx(d, 0.5)").as("med_d"),
      expr("percentile_approx(d, 0.99)").as("p99_d"), sum(col("d") * col("d")).as("sum_d2"))
      .collect()(0)
    println(s"TRISKEW kept_nodes=${stats.getLong(0)} max_d=${stats.getLong(1)} " +
      s"med_d=${stats.getLong(2)} p99_d=${stats.getLong(3)} wedge_ub=${stats.getLong(4)}")
    println("TRISKEW top-10 kept degrees: " + kept.orderBy(desc("d")).limit(10)
      .collect().map(r => r.getLong(1)).mkString(","))
    val dropped = deg.filter(col("d") > 128).count()
    println(s"TRISKEW dropped_hubs=$dropped")
    s.stop()
  }
}
