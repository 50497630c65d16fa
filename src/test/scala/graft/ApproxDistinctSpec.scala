package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.UdfOps

/** Q37 tolerance gate: HLL++ approx_count_distinct within ±5% of exact. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per returnflag") {
    val approx = UdfOps.queries("q37_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx=$a exact=$e")
    }
  }
}
