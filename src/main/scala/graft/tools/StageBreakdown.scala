package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage time/IO breakdown of a registry query, using the engine's
  * own MetricsListener (VERDICT r15 item 4: "eat the dogfood"). Exists to
  * settle floor questions like q04's: the plan is gate-pinned optimal
  * (3 broadcasts + 1 shuffle join), so if the remaining wall time is scan
  * IO, no plan work can buy it back — and that should be a committed
  * stage-level record, not an argument.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageBreakdown [query] [reps]
  *
  * Bench parity: local[32], 32 shuffle partitions, noop sink, one warm
  * pass, then `reps` timed passes each under a fresh listener; the
  * REPORTED breakdown is the fastest pass's (min-of-N, same basis as the
  * published bench numbers — contention only ever adds time). Stage rows:
  * wall duration, executor CPU, input bytes, shuffle read/write; "gap" is
  * wall-clock the driver spent outside any stage (scheduling + the
  * broadcast collects that run as separate tiny jobs).
  */
object StageBreakdown {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q04_multiway_join")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-stage-breakdown").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce() // warm: codegen + parquet footers charge here, as in Bench

    var best: (Double, Seq[graft.tuner.StageMetric]) = (Double.MaxValue, Nil)
    for (r <- 1 to reps) {
      val l = new graft.tuner.MetricsListener(r)
      spark.sparkContext.addSparkListener(l)
      val sec = try {
        val s = runOnce()
        org.apache.spark.graftaccess.ListenerBusAccess.waitUntilEmpty(
          spark.sparkContext)
        s
      } finally spark.sparkContext.removeSparkListener(l)
      println(f"pass $r: $sec%.3f s, ${l.stageRows.length} stages")
      if (sec < best._1) best = (sec, l.stageRows)
    }
    val (wall, stages) = best
    val mb = 1024.0 * 1024.0
    println(f"\n$name @ $dir — fastest of $reps passes: $wall%.3f s")
    println(f"${"stage"}%-7s ${"wall_s"}%8s ${"cpu_s"}%8s ${"read_MB"}%9s " +
      f"${"shW_MB"}%8s ${"shR_MB"}%8s  role")
    stages.sortBy(_.submittedAtMs).foreach { s =>
      val role =
        if (s.bytesRead > 0) "scan"
        else if (s.shuffleBytesRead > 0) "post-shuffle"
        else "other"
      println(f"${s.stageId}%-7d ${s.stageDurationMs / 1000.0}%8.3f " +
        f"${s.executorCpuTimeMs / 1000.0}%8.3f ${s.bytesRead / mb}%9.1f " +
        f"${s.shuffleBytesWritten / mb}%8.1f ${s.shuffleBytesRead / mb}%8.1f  $role")
    }
    val stageWall = stages.map(_.stageDurationMs).sum / 1000.0
    val scanWall = stages.filter(_.bytesRead > 0).map(_.stageDurationMs).sum / 1000.0
    val scanCpu = stages.filter(_.bytesRead > 0).map(_.executorCpuTimeMs).sum / 1000.0
    println(f"stage wall sum: $stageWall%.3f s (driver gap ${wall - stageWall}%.3f s); " +
      f"scan stages: $scanWall%.3f s wall, $scanCpu%.3f s cpu, " +
      f"${stages.map(_.bytesRead).sum / mb}%.1f MB read")
    spark.stop()
  }
}
