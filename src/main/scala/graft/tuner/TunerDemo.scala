package graft.tuner

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry-visible tuner demo (reference EP1 loop, 3 iterations): record
  * a shuffle-heavy query, re-tune from accumulated history each round,
  * emit the recommendation trajectory NEXT TO what AQE's post-shuffle
  * coalescing actually settled on each round. The tuner recommends the
  * initial shuffle partition count; AQE refines it at runtime — and
  * because the tuner's history records post-AQE task counts, the
  * recommendation converges toward AQE's settle point instead of fighting
  * it (asserted in TunerIntegrationSpec). Rows-only driver check (the
  * decision table itself is oracle'd by ComputePartitionsSpec). */
object TunerDemo {
  def query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = graft.core.TempDirs.create("graft-tuner-demo")
    val tuner = new Tuner(tmp, "demo")
    val before = s.conf.get("spark.sql.shuffle.partitions")
    try {
      val trajectory = (0 until 3).map { _ =>
        val (_, partitions, runId) = tuner.tuneAndRun(s) {
          graft.queries.RelationalA.queries("q01_pricing_summary")(s, dir).count()
        }
        (runId, partitions)
      }
      // AQE-settled series: task count of the reducer stage of the biggest
      // shuffle, per recorded run (positional alignment like the tuner's
      // own target-stage history).
      val settled = StageRunInfo
        .reducersOfMostExpensiveShuffle(tuner.store.history(s))
        .map(_.numPartitionsUsed)
      trajectory.zipWithIndex.map { case ((runId, rec), i) =>
        (runId, rec, settled.lift(i).getOrElse(-1))
      }.toDF("run_id", "recommended_partitions", "aqe_settled_partitions")
        .orderBy("run_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", before)
  }
}
