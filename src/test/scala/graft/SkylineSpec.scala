package graft

import graft.queries.RelationalC

/** q_skyline contract: the output is exactly the Pareto-maximal set of
  * (quantity, extendedprice) per return flag — no emitted point is
  * dominated by ANY input row, and every non-emitted (rf, q, maxp)
  * candidate is dominated by some emitted point. Brute-force O(n·k)
  * dominance check against raw collected rows, sharing no code with the
  * windowed operator.
  */
class SkylineSpec extends SparkSpec {

  test("skyline equals the brute-force Pareto-maximal set") {
    val raw = graft.core.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val out = RelationalC.queries("q_skyline")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))

    val byFlag = raw.groupBy(_._1)
    out.foreach { case (rf, q, p) =>
      val dominating = byFlag(rf).filter { case (_, q2, p2) =>
        q2 >= q && p2 >= p + 0.005 && (q2 > q || p2 > p + 0.005)
      }
      assert(dominating.isEmpty, s"emitted ($rf, $q, $p) is dominated")
    }
    // Completeness: per (rf, q) the max-price candidate must either be
    // emitted or be dominated by an emitted point with larger quantity.
    val emitted = out.groupBy(_._1)
    byFlag.foreach { case (rf, rows) =>
      rows.groupBy(_._2).foreach { case (q, qRows) =>
        val p = qRows.map(_._3).max
        val isOut = emitted(rf).exists(e => e._2 == q)
        if (!isOut) {
          assert(emitted(rf).exists { case (_, q2, p2) =>
            q2 > q && p2 >= math.floor(p * 100) / 100 },
            s"candidate ($rf, $q, $p) missing and undominated")
        }
      }
    }
    assert(out.nonEmpty && out.length < raw.length / 10,
      "skyline should be a small frontier, not the corpus")
  }
}
