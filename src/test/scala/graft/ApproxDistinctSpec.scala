package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.UdfOps

/** Q37 tolerance gate: HLL++ approx_count_distinct within ±5% of exact. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx percentile within 2% of exact percentile_cont") {
    val approx = UdfOps.queries("q_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.expr(
          "percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        org.apache.spark.sql.functions.expr(
          "percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 <= 0.02, s"$k p95: $a95 vs $e95")
    }
  }

  test("hll sketch per-group and MERGED union estimates within 5% of exact") {
    val rows = UdfOps.queries("q_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPer = Tables.t(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.t(spark, sf, "orders")
      .agg(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(rows.keySet == exactPer.keySet + "ALL")
    (exactPer + ("ALL" -> exactAll)).foreach { case (k, e) =>
      assert(math.abs(rows(k) - e).toDouble / e <= 0.05,
        s"$k: hll=${rows(k)} exact=$e")
    }
    // The union row must come from sketch MERGE, not double counting:
    // distinct customers overlap heavily across statuses, so the merged
    // estimate has to be far below the per-status sum.
    assert(rows("ALL") < exactPer.values.sum,
      "union estimate should deduplicate across groups")
  }

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
