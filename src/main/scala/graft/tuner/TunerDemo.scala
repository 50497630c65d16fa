package graft.tuner

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry-visible tuner demo (reference EP1 loop). Two layers:
  *
  *  1. LIVE loop — three `tuneAndRunTracked` iterations of a
  *     shuffle-heavy query, exactly the reference's record→re-tune cycle
  *     (listener capture, store persist, conf rewrite). Its measured
  *     values (bytes, AQE settle points) depend on the runner's CPU
  *     count, so they cannot be hash-compared; the loop's health is
  *     distilled into the `live_loop_ok` self-check column instead
  *     (3 runs recorded, strictly increasing run ids, every
  *     recommendation positive, AQE settle series present).
  *  2. CANONICAL decision-table walk — the same `ComputePartitions`
  *     hill-climb driven over a fixed synthetic history under a fixed
  *     cluster profile (8 executors × 4 cores × 8g), visiting all five
  *     branches (cold start, single run, improving, regressing,
  *     plateau) plus the scan-split and reducer-skew tiers. A pure
  *     function of the decision table, so the emitted trajectory is
  *     deterministic and the driver's DuckDB hash compare covers the
  *     tuner tier like any relational query (VERDICT r8 item 7).
  *
  * Full integration behavior (AQE convergence, store layout, flight
  * recorder) stays spec-asserted in TunerIntegrationSpec et al. */
object TunerDemo {

  /** Canonical cluster profile for the deterministic walk — independent
    * of the live session's conf so local[4] and local[32] runs emit
    * identical rows. */
  private val canonConf = Map(
    "spark.master" -> "yarn",
    "spark.executor.cores" -> "4",
    "spark.executor.instances" -> "8",
    "spark.executor.memory" -> "8g")

  /** Synthetic single-stage run: `parts` tasks whose shuffle-read bytes
    * are `reads` (balanced 64 MB unless a straggler is planted). */
  private def mkRun(runId: Int, parts: Int, cpuMs: Long,
      reads: Int => Long): List[StageRunInfo] = List(StageRunInfo(
    executorCpuTimeMs = cpuMs,
    stageTimeMs = cpuMs / 8,
    inputSizeMb = 2048.0,
    numExecutors = 8,
    shuffle = ShuffleVolume(bytesWritten = 1L << 30, bytesRead = 1L << 30),
    tasks = Seq.tabulate(parts)(i =>
      TaskMetric(runId, 0, i.toLong, "exec", 1000L, 0L, reads(i)))))

  def query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = graft.core.TempDirs.create("graft-tuner-demo")
    val tuner = new Tuner(tmp, "demo")
    val before = s.conf.get("spark.sql.shuffle.partitions")
    val beforeSplit = s.conf.getOption("spark.sql.files.maxPartitionBytes")
    val liveOk = try {
      val runs = (0 until 3).map { _ =>
        tuner.tuneAndRunTracked(s) {
          graft.queries.RelationalA.queries("q01_pricing_summary")(s, dir).count()
        }
      }
      // AQE-settled series: reducer task count of the biggest shuffle per
      // recorded run — present iff the listener captured complete runs.
      val fullHistory = runs.last.priorHistory :+ runs.last.recorded
      val settled = StageRunInfo
        .reducersOfMostExpensiveShuffle(fullHistory)
        .map(_.numPartitionsUsed)
      runs.length == 3 &&
        runs.map(_.runId) == Seq(0, 1, 2) &&
        runs.forall(_.partitions > 0) &&
        settled.nonEmpty && settled.forall(_ > 0)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", before)
      beforeSplit match {
        case Some(v) => s.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => s.conf.unset("spark.sql.files.maxPartitionBytes")
      }
    }

    // Deterministic walk: fixed history visiting every decision branch.
    val balanced: Int => Long = _ => 64L << 20
    val straggler: Int => Long = i => if (i == 0) 512L << 20 else 64L << 20
    val h1 = mkRun(0, 32, 90000L, balanced)
    val h2 = mkRun(1, 40, 70000L, balanced) // fewer CPU-ms at more parts
    val h3 = mkRun(2, 48, 80000L, balanced) // regression past the sweet spot
    val h4 = mkRun(3, 40, 70000L, balanced)
    val h5 = mkRun(4, 40, 70000L, straggler) // plateau + planted skew
    val steps = Seq(
      ("cold_start", Seq.empty[List[StageRunInfo]]),
      ("single_run", Seq(h1)),
      ("improving", Seq(h1, h2)),
      ("regressing", Seq(h1, h2, h3)),
      ("plateau", Seq(h1, h2, h3, h4, h5)))
    val cp = new ComputePartitions(canonConf)
    val rows = steps.zipWithIndex.map { case ((branch, hist), i) =>
      val target = StageRunInfo.stagesWithMostExpensiveShuffle(hist)
      val rec = cp.fromStageMetricSharedCluster(target)
      val scans = StageRunInfo.scanStagesWithMostInput(hist)
      val splitMb = math.round(
        cp.maxPartitionBytes(scans.lastOption.map(_.inputSizeMb)
          .getOrElse(0.0)) / (1024.0 * 1024.0)).toInt
      val skew = hist.lastOption.flatMap(SkewAdvisor.analyze(_))
      (i, branch, rec, splitMb,
        skew.map(r => math.round(r.ratio * 100.0) / 100.0).getOrElse(-1.0),
        skew.exists(_.skewed), liveOk)
    }
    rows.toDF("step", "branch", "recommended_partitions",
        "recommended_split_mb", "skew_ratio", "skew_flag", "live_loop_ok")
      .orderBy("step")
  }

  /** Static oracle: the canonical walk is a pure function of the decision
    * table (fixture- and runner-independent), so its five rows are
    * spelled out; `live_loop_ok=true` asserts the LIVE loop's health from
    * DuckDB's side. Derivation of each value is in the Scaladoc math:
    * slots = 4×8 = 32; task memory = 8192×0.6×0.5/4 = 614.4 MB (split
    * bound 307 MB cold, 2048/32 = 64 MB warm); single-run 32+8 = 40;
    * improving max(32,32,40)+8 = 48; regressing → best CPU run = 40;
    * plateau keeps 40; planted straggler 512 MB/64 MB = ratio 8. */
  val oracle: String = """
    SELECT CAST(step AS INT) AS step, branch,
           CAST(rp AS INT) AS recommended_partitions,
           CAST(sm AS INT) AS recommended_split_mb,
           CAST(sr AS DOUBLE) AS skew_ratio, sf AS skew_flag,
           lok AS live_loop_ok
    FROM (VALUES (0, 'cold_start', 32, 307, -1.0, false, true),
                 (1, 'single_run', 40, 64, 1.0, false, true),
                 (2, 'improving', 48, 64, 1.0, false, true),
                 (3, 'regressing', 40, 64, 1.0, false, true),
                 (4, 'plateau', 40, 64, 8.0, true, true)
    ) AS t(step, branch, rp, sm, sr, sf, lok) ORDER BY step"""
}
