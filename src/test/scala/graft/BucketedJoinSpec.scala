package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.core.Tables
import graft.operators.BucketedJoin

/** The point of bucketing: the bucket-aligned sort-merge join must contain
  * NO shuffle exchange on the join path (the write-time shuffle already
  * co-located the data). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed SMJ plans without shuffle exchanges") {
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = BucketedJoin.bucketedJoin(spark,
        Tables.t(spark, sf, "lineitem"), Tables.t(spark, sf, "orders"),
        "l_orderkey", "o_orderkey", "graft_li_spec", "graft_ord_spec")
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.t(spark, sf, "lineitem")
        .join(Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.sql("DROP TABLE IF EXISTS graft_li_spec")
      spark.sql("DROP TABLE IF EXISTS graft_ord_spec")
    }
  }
}
