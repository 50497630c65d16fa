package graft

import graft.core.Tables
import graft.queries.UdfOps

/** Sketch tolerance gates. Since round 9 the three sketch queries are
  * self-checking H rows: each emits the EXACT value plus a
  * within-tolerance boolean computed in-query, so the driver's DuckDB
  * oracle hash-checks them. These specs assert (a) the booleans are all
  * true and (b) the exact side really is exact — i.e. the self-check is
  * checking against the right reference, not against itself. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx percentile: exact discrete quantiles + sketch within 1%") {
    val rows = UdfOps.queries("q_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "sketch p50/p95 outside 1% of exact")
    // Exact-side audit: the discrete quantile must sit within the value
    // range bracketing the continuous quantile of the same column.
    val exact = Tables.t(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.expr(
          "percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        org.apache.spark.sql.functions.expr(
          "percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e50) / e50 <= 0.02,
        s"${r.getString(0)} p50: ${r.getDouble(1)} vs $e50")
      assert(math.abs(r.getDouble(2) - e95) / e95 <= 0.02,
        s"${r.getString(0)} p95: ${r.getDouble(2)} vs $e95")
    }
  }

  test("hll sketch per-group and MERGED union estimates within 5% of exact") {
    val rows = UdfOps.queries("q_hll_union")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val exactPer = Tables.t(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.t(spark, sf, "orders")
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey"))
      .collect()(0).getLong(0)
    assert(rows.map(_._1).toSet == exactPer.keySet + "ALL")
    rows.foreach { case (k, e, ok) =>
      assert(e == (if (k == "ALL") exactAll else exactPer(k)),
        s"$k: exact column wrong")
      // within_5pct compares the sketch MERGE estimate to exact overall;
      // a union that double-counted the heavy cross-status customer
      // overlap would blow this bound, so the boolean also proves the
      // merge deduplicates.
      assert(ok, s"$k: sketch estimate outside 5% of exact")
    }
  }

  test("approx_count_distinct within 5% of exact per returnflag") {
    val rows = UdfOps.queries("q37_approx_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, e, ok) =>
      assert(e == exact(k), s"$k: exact column wrong")
      assert(ok, s"$k: HLL++ estimate outside 5% of exact")
    }
  }
}
