package graft.tuner

/** Reducer-skew advisor — the third tuner tier next to the shuffle
  * partition count (reference decision table, `ComputePartitions`) and
  * the scan input split (`recommendMaxPartitionBytes`): per-TASK
  * shuffle-read volumes of the most shuffle-read-expensive stage expose
  * the straggler that per-STAGE totals average away. A 1000-executor
  * stage whose median task reads 64 MB but whose max reads 6 GB is a
  * one-hot-key job — wall-clock pinned to one task — and no partition-
  * count change fixes it; the fix is AQE skew-join splitting (or
  * salting, which `operators.SaltedJoin` demonstrates plan-side).
  *
  * The advisor turns the observed max/median ratio into the two AQE
  * knobs that govern splitting: a partition is split when its size
  * exceeds BOTH `skewedPartitionFactor` × median AND
  * `skewedPartitionThresholdInBytes`. Recommending factor =
  * max(2, ⌈ratio/2⌉ capped at the default 5) and threshold = factor ×
  * observed median guarantees the observed straggler qualifies on both
  * conditions at the next run, while balanced stages leave the
  * defaults untouched.
  */
object SkewAdvisor {

  /** Analysis of one run's worst shuffle-read stage. `ratio` is
    * max/median per-task shuffle-read bytes; `skewed` applies the
    * classic 4× straggler rule. */
  case class SkewReport(maxBytes: Long, medianBytes: Long, ratio: Double,
      skewed: Boolean, recommendedFactor: Int,
      recommendedThresholdBytes: Long)

  /** Inspect the latest run: pick the stage with the largest total
    * shuffle read, rank its tasks by shuffle-read bytes, and compare the
    * straggler to the median. None when the run has no shuffle-reading
    * stage with per-task volumes (e.g. history persisted by a build
    * without `TaskMetric.shuffleReadBytes` — back-filled as 0). */
  def analyze(run: List[StageRunInfo], skewRatio: Double = 4.0): Option[SkewReport] = {
    val reducer = run.filter(_.shuffle.bytesRead > 0)
      .sortBy(-_.shuffle.bytesRead).headOption
    reducer.flatMap { st =>
      val bytes = st.tasks.map(_.shuffleReadBytes).filter(_ > 0).sorted
      if (bytes.isEmpty) None
      else {
        val median = bytes(bytes.length / 2) // upper median, exact
        val mx = bytes.last
        val ratio = mx.toDouble / math.max(1L, median)
        val factor = math.min(5, math.max(2, math.ceil(ratio / 2.0).toInt))
        Some(SkewReport(mx, median, ratio, ratio >= skewRatio, factor,
          factor.toLong * median))
      }
    }
  }

  /** Conf deltas for the next run. Balanced runs return empty — the
    * advisor never narrows AQE's defaults, it only makes a PROVEN
    * straggler eligible for splitting. */
  def recommendedConf(report: SkewReport): Map[String, String] =
    if (!report.skewed) Map.empty
    else Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        report.recommendedFactor.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        report.recommendedThresholdBytes.toString)
}
