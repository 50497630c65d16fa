package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe` as the data-quality counter surface: a cleaning
  * pass reports what it dropped and why from the SAME job that does the
  * work — no second scan, no accumulator retry-double-count (observe
  * metrics come from the finished query's listener event exactly once).
  * At 100 TB a pipeline cannot afford a validation re-read per stage;
  * this is the mechanism that makes every stage self-reporting.
  */
class ObservationSpec extends SparkSpec {

  test("observe counters equal independent recomputation, from one pass") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val obs = Observation("clean_metrics")
    val shortDoc = length(col("text")) < 50
    val cleaned = docs
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(when(shortDoc, 1L).otherwise(0L)).as("n_short"),
        sum(length(col("text")).cast("long")).as("bytes_in"))
      .filter(!shortDoc)
    val kept = cleaned.count()
    val m = obs.get
    assert(m("n_in") == docs.count())
    assert(m("n_short") == docs.filter(shortDoc).count())
    assert(m("bytes_in") ==
      docs.agg(sum(length(col("text")))).head().getLong(0))
    assert(kept == m("n_in").asInstanceOf[Long] - m("n_short").asInstanceOf[Long],
      "observed drop count disagrees with the filter's survivors")
  }

  test("observe rides a write job too — the sink path stays self-reporting") {
    val tmp = graft.core.TempDirs.create("graft-observe")
    val obs = Observation("write_metrics")
    graft.core.Tables.t(spark, sf, "documents")
      .observe(obs, count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(tmp)
    assert(obs.get("n_rows") == spark.read.parquet(tmp).count())
  }
}
