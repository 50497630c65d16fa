package graft.tuner

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet metrics store, one layout for both kinds (fixes reference quirk
  * Q3 — the reference wrote stage metrics outside its own subdir):
  *
  *   <root>/<appName>/kind=stage/run=N/  (parquet files)
  *   <root>/<appName>/kind=task/run=N/   (parquet files)
  *
  * Replaces the reference's Java-serialized sparkMeasure files
  * (Listener.scala:25-42). Partition discovery over `run=N` gives the
  * history scan and next-run-id allocation for free.
  */
class MetricsStore(root: String, appName: String) {
  private def base = s"$root/$appName"

  /** True iff the store path exists on whatever FS `root` points at.
    * Checked BEFORE reading so a first-ever run takes the empty-history
    * path without an AnalysisException ever being thrown (the thrown/
    * caught variant left stack traces in app stderr and hid real
    * corruption behind the same catch). */
  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  def persist(spark: SparkSession, listener: MetricsListener, runId: Int): Unit = {
    import spark.implicits._
    listener.stageRows.toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$base/kind=stage/run=$runId")
    listener.taskRows.toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$base/kind=task/run=$runId")
  }

  /** All runs in id order, each assembled into per-stage infos. Missing or
    * unreadable store ⇒ empty history (reference quirk Q2 fixed; R22
    * error-tolerant read). */
  def history(spark: SparkSession): List[List[StageRunInfo]] = {
    import spark.implicits._
    if (!pathExists(spark, s"$base/kind=stage") ||
        !pathExists(spark, s"$base/kind=task")) return Nil
    try {
      // The embedded runId column is authoritative; the discovered `run`
      // partition column is dropped by the Dataset projection.
      val stages = spark.read.parquet(s"$base/kind=stage")
        .select("runId", "stageId", "attempt", "executorCpuTimeMs",
          "stageDurationMs", "bytesRead", "shuffleBytesWritten",
          "shuffleBytesRead", "submittedAtMs")
        .as[StageMetric].collect()
      val tasks = spark.read.parquet(s"$base/kind=task")
        .select("runId", "stageId", "taskId", "executorId", "durationMs",
          "peakMemory")
        .as[TaskMetric].collect()
      val tasksByRun = tasks.groupBy(_.runId)
      stages.groupBy(_.runId).toList.sortBy(_._1).map { case (rid, st) =>
        StageRunInfo.assemble(st.toSeq, tasksByRun.getOrElse(rid, Array.empty).toSeq)
      }
    } catch {
      // R22 error-tolerance is ONLY for an unreadable/empty layout (e.g. a
      // crashed writer left a dir with no parquet footer): warn + empty
      // history. Runtime corruption (SparkException etc.) propagates.
      case e: org.apache.spark.sql.AnalysisException =>
        System.err.println(s"[graft.tuner] unreadable metrics store at $base: ${e.getMessage}")
        Nil
    }
  }

  /** Next run id = number of recorded runs (reference R27). */
  def nextRunId(spark: SparkSession): Int = history(spark).length
}
