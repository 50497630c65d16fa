package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

/** Task-retry transparency — the failure model a 1000-executor job
  * lives in: a task's first attempt dies AFTER doing real work, the
  * scheduler reruns it, and neither the answer nor the committed output
  * may change. Failures are injected via `TaskContext.attemptNumber`
  * (attempt 0 of one partition throws; the retry succeeds), so the test
  * exercises Spark's actual retry path, not a mock.
  *
  * The write-path case is the sharper one: the retried task produces a
  * SECOND output file attempt, and only the task-commit protocol keeps
  * the duplicate out of the final directory.
  */
object RetryIdempotenceSpec {
  // Standalone (not a spec method): the closure must serialize without
  // dragging the scalatest suite instance into the task.
  def failOnce[T](it: Iterator[T]): Iterator[T] = {
    val ctx = TaskContext.get()
    if (ctx.partitionId() == 0 && ctx.attemptNumber() == 0) {
      // Consume some input first: the failure must land mid-work, after
      // partial computation, not before the task touched anything.
      if (it.hasNext) it.next()
      throw new RuntimeException("injected first-attempt failure")
    }
    it
  }
}

class RetryIdempotenceSpec extends SparkSpec {
  import RetryIdempotenceSpec.failOnce

  test("an aggregation over a retried task equals the clean result") {
    import spark.implicits._
    val n = 10000L
    val got = spark.range(1, n + 1).as[Long].repartition(4)
      .mapPartitions(failOnce[Long] _)
      .toDF("v").agg(sum("v")).head().getLong(0)
    assert(got == n * (n + 1) / 2)
  }

  test("a parquet write with a retried task commits each row exactly once") {
    import spark.implicits._
    val tmp = graft.core.TempDirs.create("graft-retry-write")
    spark.range(1, 5001).as[Long].repartition(4)
      .mapPartitions(failOnce[Long] _)
      .toDF("v").write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.count() == 5000, "row lost or duplicated across the retry")
    assert(back.distinct().count() == 5000,
      "the failed attempt's partial file leaked into the committed output")
  }
}
