package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Runtime bloom-filter join pruning — the row-level sibling of
  * q_dpp_prune's partition-level pruning: a selective filter on the dim
  * side of a SHUFFLE join is turned into a bloom filter that prunes fact
  * rows before the exchange. At 100 TB this cuts the shuffled fact volume
  * by the dim selectivity; at toy scale the thresholds have to be forced,
  * which is what this spec documents. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side of a shuffle join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // Fact side is far below the 10 GB default application threshold.
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // Disable broadcast so the join actually shuffles (bloom filters
      // target shuffle joins; a broadcast join already prunes at probe).
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_returnflag")
      val ord = Tables.t(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter")
          || optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter in:\n$optimized")

      // Pruning must not change the answer: compare against the same join
      // with runtime filtering off.
      val got = joined.orderBy("l_returnflag").collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
      assert(got == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
