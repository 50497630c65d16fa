package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tuner._

/** Listener + store integration (fills the reference's empty
  * MetricsCollectorApp stub — SURVEY.md §5 item 5): run real shuffle jobs
  * with recording, assert metrics rows are captured, persisted, re-read,
  * and that the tuning loop produces a recommendation from them. */
class TunerIntegrationSpec extends SparkSpec {

  test("recording a job captures stage+task metrics and advances run ids") {
    val dir = Files.createTempDirectory("graft-metrics").toString
    val tuner = new Tuner(dir, "itest")

    def job(): Long = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    val (_, runId0) = tuner.withRecording(spark)(job())
    assert(runId0 == 0)
    val h1 = tuner.store.history(spark)
    assert(h1.length == 1, "one recorded run expected")
    assert(h1.head.nonEmpty, "stages captured")
    assert(h1.head.exists(_.tasks.nonEmpty), "tasks captured")
    assert(h1.head.exists(_.executorCpuTimeMs > 0), "cpu time recorded")

    // Second recorded run → id 1, and the tuner now recommends from history.
    val (_, runId1) = tuner.withRecording(spark)(job())
    assert(runId1 == 1)
    val rec = tuner.recommendPartitions(spark)
    assert(rec > 0)

    // Applying sets spark.sql.shuffle.partitions on the live session.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val applied = tuner.applyTo(spark)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == applied.toString)
    spark.conf.set("spark.sql.shuffle.partitions", before) // restore for other specs
  }

  test("flight recorder persists on application end without explicit persist") {
    val dir = Files.createTempDirectory("graft-flight").toString
    val tuner = new Tuner(dir, "flight")
    val fr = tuner.attachFlightRecorder(spark)
    try {
      spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      // Deliver the real application-end event through the real listener
      // bus (stopping the shared test context would kill other suites;
      // in production Spark's shutdown hook posts this during stop()).
      org.apache.spark.graftaccess.ListenerBusAccess.postApplicationEnd(spark.sparkContext)
      org.apache.spark.graftaccess.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      val h = tuner.store.history(spark)
      assert(h.length == 1, "flushed run visible in history")
      assert(h.head.nonEmpty && h.head.exists(_.tasks.nonEmpty),
        "stages and tasks captured through the flush path")
      assert(tuner.store.nextRunId(spark) == 1,
        "flight-recorded runs advance the run-id sequence")
    } finally spark.sparkContext.removeSparkListener(fr)
  }

  test("empty store yields cold-start recommendation, not an error (Q2)") {
    val tuner = new Tuner(Files.createTempDirectory("graft-empty").toString, "none")
    assert(tuner.recommendPartitions(spark) > 0)
    assert(tuner.store.nextRunId(spark) == 0)
  }

  test("recommendedConf targets both parallelism knobs consistently") {
    val tuner = new Tuner(Files.createTempDirectory("graft-conf").toString, "none")
    val conf = tuner.recommendedConf(spark)
    assert(conf.keySet == Set("spark.sql.shuffle.partitions", "spark.default.parallelism"))
    assert(conf.values.toSet.size == 1, "both knobs must carry the same recommendation")
  }
}
