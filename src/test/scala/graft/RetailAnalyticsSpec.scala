package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalC

/** Driver-side ground truth for the orders-tier analytics operators.
  *
  * q_cohort_ltv: the (cohort, age) matrix must equal a sequential
  * recomputation, cohort totals must cover every order exactly once, and
  * age 0 must exist for every cohort (a customer's first order is its own
  * cohort month).
  *
  * q_rfm: quintile labels are a balanced partition of the customer
  * dimension (sizes differ by ≤ 1 per dimension), segment sizes sum to
  * the customer count, and the all-best segment (1,1,1) is non-empty on
  * the fixture (recency/frequency/monetary correlate).
  */
class RetailAnalyticsSpec extends SparkSpec {

  test("q_cohort_ltv equals a sequential cohort recomputation") {
    val orders = graft.core.Tables.t(spark, sf, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val firstM = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = orders
      .groupBy { case (ck, m, _) => (firstM(ck), (m - firstM(ck)) / 12) }
      .map { case ((cm, age), rows) =>
        val rev = rows.map(r => BigDecimal(r._3).setScale(4)).sum
        (cm.toLong, age.toLong, rows.length.toLong,
          rev.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = RelationalC.queries("q_cohort_ltv")(spark, sf).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == orders.length, "orders must partition")
    got.map(_._1).distinct.foreach { cm =>
      assert(got.exists(r => r._1 == cm && r._2 == 0L), s"cohort $cm lacks age 0")
    }
  }

  test("q_rfm quintiles are balanced and partition the customers") {
    val nCust = graft.core.Tables.t(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    val got = RelationalC.queries("q_rfm")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.map(_._4).sum == nCust, "segments must partition customers")
    for ((dim, f) <- Seq[(String, ((Int, Int, Int, Long)) => Int)](
        ("r", _._1), ("f", _._2), ("m", _._3))) {
      val sizes = got.groupBy(f).view.mapValues(_.map(_._4).sum).toMap
      assert(sizes.keySet == (1 to 5).toSet, s"$dim must use all 5 quintiles")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$dim quintiles unbalanced: $sizes")
    }
    assert(got.exists(r => r._1 == 1 && r._2 == 1 && r._3 == 1),
      "the all-best RFM segment should be populated on the fixture")
  }
}
