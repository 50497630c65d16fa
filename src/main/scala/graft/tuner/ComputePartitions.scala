package graft.tuner

/** Partition-count recommendation — a re-derivation of the reference's
  * hill-climb decision table (/root/reference/src/main/scala/com/
  * highperformancespark/robinsparkles/ComputePartitions.scala:100-197)
  * with its quirks fixed:
  *   - Q1: executor count read from the real `spark.executor.instances`
  *     key (the reference reads the nonexistent `spark.num.executors`).
  *   - Q2: empty history handled (cold-start branch) instead of MatchError.
  *
  * The tuner targets `spark.sql.shuffle.partitions` (DataFrame shuffles
  * ignore `spark.default.parallelism` — SURVEY.md §7) and treats AQE's
  * post-shuffle coalescing as a downstream refinement: it recommends the
  * *initial* partition count that AQE then coalesces, never fights it.
  */
class ComputePartitions(conf: Map[String, String]) {

  private def confInt(key: String, default: Int): Int =
    conf.get(key).flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(default)

  /** Cluster slots = cores × executors (reference :145-147, quirk Q1 fixed). */
  def possibleConcurrentTasks(): Int =
    confInt("spark.executor.cores", 1) * confInt("spark.executor.instances", 1)

  /** Task working memory in MB: execMem × memory.fraction × (1 −
    * storageFraction) / cores (reference :154-173; Spark 3/4 defaults
    * fraction=0.6, storageFraction=0.5 carry over). */
  def taskMemoryMb(): Double = {
    val execMemMb = conf.get("spark.executor.memory")
      .map(parseMemoryMb).getOrElse(1024.0)
    val fraction = conf.get("spark.memory.fraction").map(_.toDouble).getOrElse(0.6)
    val storage = conf.get("spark.memory.storageFraction").map(_.toDouble).getOrElse(0.5)
    val cores = confInt("spark.executor.cores", 1)
    execMemMb * fraction * (1 - storage) / cores
  }

  private[graft] def parseMemoryMb(s: String): Double = {
    val t = s.trim.toLowerCase
    val (num, mult) =
      if (t.endsWith("g")) (t.dropRight(1), 1024.0)
      else if (t.endsWith("m")) (t.dropRight(1), 1.0)
      else if (t.endsWith("k")) (t.dropRight(1), 1.0 / 1024)
      else (t, 1.0 / (1024 * 1024)) // bare bytes
    num.toDouble * mult
  }

  /** Minimum partitions so a partition's input fits task memory
    * (reference :140-142), never below the slot count. */
  def partitionsFloor(inputSizeMb: Double): Int =
    math.max(math.round(inputSizeMb / taskMemoryMb()).toInt,
      possibleConcurrentTasks())

  /** Higher-partition run had lower executor CPU time (reference :181-184 —
    * doc says "stage time" but the code compares CPU time; code wins). */
  def morePartitionsIsBetter(a: StageRunInfo, b: StageRunInfo): Boolean = {
    val Seq(lo, hi) = Seq(a, b).sortBy(_.numPartitionsUsed)
    hi.executorCpuTimeMs < lo.executorCpuTimeMs
  }

  /** Hill-climb over the target stage's history (reference :100-138).
    *   no history    → configured default parallelism, else slots
    *   one run       → max(used + max(execs,1), memory floor)
    *   improving     → max(floor, p1, p2) + numExecutors
    *   plateau       → converged: keep
    *   regressing    → best historical run by min CPU time
    */
  def fromStageMetricSharedCluster(history: List[StageRunInfo]): Int = history match {
    case Nil =>
      confInt("spark.default.parallelism", possibleConcurrentTasks())
    case only :: Nil =>
      math.max(
        only.numPartitionsUsed + math.max(only.numExecutors, 1),
        partitionsFloor(only.inputSizeMb))
    case h =>
      val last2 = h.takeRight(2)
      val Seq(first, second) = last2.sortBy(_.numPartitionsUsed)
      val floor = partitionsFloor(second.inputSizeMb)
      if (first.numPartitionsUsed == second.numPartitionsUsed) {
        second.numPartitionsUsed // plateau → converged
      } else if (morePartitionsIsBetter(first, second)) {
        math.max(math.max(floor, first.numPartitionsUsed),
          second.numPartitionsUsed) + second.numExecutors.max(1)
      } else {
        h.minBy(_.executorCpuTimeMs).numPartitionsUsed // best so far
      }
  }

  /** The reference's dead-code single-run policy (:76-98), kept as a
    * documented alternative: full utilization ⇒ keep; otherwise grow
    * toward the floor. */
  def fromStageMetricFullUtilization(stage: StageRunInfo): Int =
    if (stage.executorIdleTimeMs <= 0) stage.numPartitionsUsed
    else math.max(partitionsFloor(stage.inputSizeMb), stage.numPartitionsUsed + 1)
}
