package graft.tuner

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry-visible tuner demo (reference EP1 loop, 3 iterations): record
  * a shuffle-heavy query, re-tune from accumulated history each round,
  * emit the recommendation trajectory. Rows-only driver check (the
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
      trajectory.toDF("run_id", "recommended_partitions").orderBy("run_id")
    } finally s.conf.set("spark.sql.shuffle.partitions", before)
  }
}
