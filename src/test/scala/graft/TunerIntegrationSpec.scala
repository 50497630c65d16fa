package graft

import java.nio.file.{Files, Paths}
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

  test("tracked run's (priorHistory :+ recorded) equals a fresh store read") {
    // The q_tuner_loop one-read optimization rests on this equality: the
    // listener-assembled current run plus the pre-run history must be
    // indistinguishable from re-reading the persisted store afterward.
    val dir = Files.createTempDirectory("graft-tracked").toString
    val tuner = new Tuner(dir, "tracked")
    def job(): Long = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val r1 = tuner.tuneAndRunTracked(spark)(job())
      val r2 = tuner.tuneAndRunTracked(spark)(job())
      assert(r1.priorHistory.isEmpty && r2.priorHistory.length == 1)
      val reread = tuner.store.history(spark)
      assert(reread == r2.priorHistory :+ r2.recorded,
        "tracked view diverged from the persisted store")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("tuner loop reports AQE's settled counts and converges toward them") {
    // Live three-iteration loop through the real Tuner API (the same
    // cycle TunerDemo runs internally before emitting its canonical
    // walk): record → re-tune → record, then compare the recommendation
    // trajectory to the post-AQE settle series.
    val dir = Files.createTempDirectory("graft-loop").toString
    val tuner = new Tuner(dir, "loop")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val (recs, settled) = try {
      val runs = (0 until 3).map { _ =>
        tuner.tuneAndRunTracked(spark) {
          graft.queries.RelationalA.queries("q01_pricing_summary")(spark, sf).count()
        }
      }
      assert(runs.map(_.runId) == Seq(0, 1, 2), "run ids advance")
      val fullHistory = runs.last.priorHistory :+ runs.last.recorded
      (runs.map(_.partitions),
        graft.tuner.StageRunInfo.reducersOfMostExpensiveShuffle(fullHistory)
          .map(_.numPartitionsUsed))
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(settled.forall(_ > 0), s"AQE-settled series missing: $settled")
    // Convergence direction: the tuner learns from post-AQE task counts,
    // so the gap between its initial-count recommendation and AQE's
    // settle point must not widen over the loop, and the final round's
    // recommendation is the closest of the trajectory.
    val diffs = recs.zip(settled).map { case (r, a) => math.abs(r - a) }
    assert(diffs.last <= diffs.head,
      s"recommendation diverged from AQE settle point: $diffs")
    assert(diffs.last == diffs.min,
      s"final recommendation is not the closest to AQE: rec=$recs aqe=$settled")
  }

  test("q_tuner_loop emits the canonical decision walk with a healthy live loop") {
    val out = graft.tuner.TunerDemo.query(spark, sf).collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("cold_start", "single_run", "improving", "regressing", "plateau"),
      "all five decision branches visited in order")
    assert(out.forall(_.getBoolean(6)), "live loop self-check failed")
    assert(out.forall(_.getInt(2) > 0))
    // The planted straggler flags skew exactly once, on the plateau step.
    assert(out.map(r => r.getBoolean(5)).toSeq ==
      Seq(false, false, false, false, true))
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

  test("truncated flight jsonl line is tolerated, not fatal (crashed-writer path)") {
    val dir = Files.createTempDirectory("graft-corrupt").toString
    val tuner = new Tuner(dir, "crash")
    val fr = tuner.attachFlightRecorder(spark)
    try {
      spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      org.apache.spark.graftaccess.ListenerBusAccess.postApplicationEnd(spark.sparkContext)
      org.apache.spark.graftaccess.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(fr)
    val clean = tuner.store.history(spark)
    assert(clean.length == 1 && clean.head.nonEmpty)
    // Simulate the writer dying mid-line: append a truncated record plus a
    // parsed-but-incomplete one to the stage flight file.
    val stageDir = Paths.get(dir, "crash", "flight_stage")
    val f = stageDir.resolve("run-0.jsonl")
    Files.writeString(f,
      "{\"runId\":7,\"stageId\":9}\n{\"runId\":8,\"stag",
      java.nio.file.StandardOpenOption.APPEND)
    // Drop the Hadoop checksum sidecar: a REAL torn write dies before the
    // crc is updated too, and a stale crc would fail the read for the
    // wrong reason (checksum error, not parse error).
    Files.deleteIfExists(stageDir.resolve(".run-0.jsonl.crc"))
    // History still assembles the intact run; the torn rows are dropped
    // instead of crashing every later tuned run against this store.
    val h = tuner.store.history(spark)
    assert(h.length == 1, s"corrupt lines dropped, got ${h.length} runs")
    assert(h.head.map(_.executorCpuTimeMs).sorted == clean.head.map(_.executorCpuTimeMs).sorted)
    assert(tuner.recommendPartitions(spark) > 0)
  }

  test("run ids never reuse an existing id even when a run recorded zero stages") {
    val dir = Files.createTempDirectory("graft-runid").toString
    val tuner = new Tuner(dir, "gap")
    // A recorded run that captured NO stages (e.g. flight recorder attached
    // but the app did no work): the flight files exist but assemble to an
    // empty history — counting history would re-issue id 0 and overwrite.
    val fr = tuner.attachFlightRecorder(spark)
    org.apache.spark.graftaccess.ListenerBusAccess.postApplicationEnd(spark.sparkContext)
    org.apache.spark.graftaccess.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.removeSparkListener(fr)
    assert(tuner.store.history(spark).isEmpty, "zero-stage run assembles to empty history")
    assert(tuner.store.nextRunId(spark) == 1,
      "id allocation must clear the zero-stage run-0 files, not reuse id 0")
    val (_, runId) = tuner.withRecording(spark) {
      spark.read.parquet(s"$sf/lineitem.parquet").groupBy("l_returnflag").count().count()
    }
    assert(runId == 1)
    assert(tuner.store.nextRunId(spark) == 2)
  }

  test("recommendedConf targets both parallelism knobs and the scan split size") {
    val tuner = new Tuner(Files.createTempDirectory("graft-conf").toString, "none")
    val conf = tuner.recommendedConf(spark)
    assert(conf.keySet == Set("spark.sql.shuffle.partitions",
      "spark.default.parallelism", "spark.sql.files.maxPartitionBytes"))
    assert(conf("spark.sql.shuffle.partitions") == conf("spark.default.parallelism"),
      "both parallelism knobs must carry the same recommendation")
    val split = conf("spark.sql.files.maxPartitionBytes").toLong
    assert(split >= 4L * 1024 * 1024 && split <= 1024L * 1024 * 1024,
      s"split recommendation outside the [4MB, 1GB] clamp: $split")
  }

  test("input-split recommendation changes the scan stage's task count across runs") {
    // The memory bound binds: 64m executor memory → task working memory
    // 19.2 MB → 9.6 MB splits. The fixture below is bigger than one split
    // but smaller than the 128 MB default, so the recommendation is what
    // flips the scan from one task to several — the scan-tier analogue of
    // the shuffle hill-climb, measurable as FilePartition counts.
    val cp = new graft.tuner.ComputePartitions(Map("spark.executor.memory" -> "64m"))
    val rec = cp.maxPartitionBytes(inputSizeMb = 100000.0)
    assert(rec == math.round(9.6 * 1024 * 1024), s"unexpected recommendation $rec")
    // Cold start (no recorded scan) must still recommend from memory alone,
    // and a huge memory must clamp at 1 GB.
    assert(cp.maxPartitionBytes(0.0) == rec)
    assert(new graft.tuner.ComputePartitions(Map("spark.executor.memory" -> "512g"))
      .maxPartitionBytes(1e9) == 1024L * 1024 * 1024)
    // Tiny input across many slots clamps at the 4 MB floor (first-wave
    // bound would make sub-openCost splits).
    assert(new graft.tuner.ComputePartitions(Map(
      "spark.executor.cores" -> "32", "spark.executor.instances" -> "4"))
      .maxPartitionBytes(64.0) == 4L * 1024 * 1024)
    val dir = Files.createTempDirectory("graft-split").toString
    // ~20-30 MB of incompressible-ish parquet (md5 strings).
    spark.range(1200000L)
      .selectExpr("id", "md5(cast(id as string)) AS a",
        "md5(cast(id + 7 as string)) AS b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val key = "spark.sql.files.maxPartitionBytes"
    val before = spark.conf.getOption(key)
    def scanTasks(): Int = spark.read.parquet(dir).rdd.getNumPartitions
    try {
      spark.conf.set(key, (128L * 1024 * 1024).toString)
      val defaultTasks = scanTasks()
      spark.conf.set(key, rec.toString)
      val tunedTasks = scanTasks()
      assert(tunedTasks > defaultTasks,
        s"recommendation $rec did not change scan task count " +
          s"($defaultTasks -> $tunedTasks)")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
