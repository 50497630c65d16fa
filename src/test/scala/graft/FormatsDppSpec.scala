package graft

import graft.sources.Formats

/** Dynamic partition pruning gate for q_dpp_prune: the runtime partition
  * filter must actually reach the fact table's scan — without it the
  * query is a full-fact-table scan that merely LOOKS like a join, and at
  * 100 TB that is the whole ballgame. */
class FormatsDppSpec extends SparkSpec {

  test("q_dpp_prune plan carries dynamicpruningexpression on the fact scan") {
    val df = Formats.queries("q_dpp_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    // And the result itself is the two fast-priority groups.
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1-URGENT", "2-HIGH"))
  }
}
