package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.WholeStageCodegenExec
import graft.GraftExtensions

/** Native CosineSimilarity expression: value parity with the HOF-fold
  * spelling, null handling, and codegen participation. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("matches the fold-based cosine to the last ulp") {
    GraftExtensions.ensureRegistered(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.25, 0.125, 8.0), Array(1.0, 1.0, 1.0, 1.0)),
      (Array(1e-8, 1e8), Array(1e8, 1e-8))).toDF("a", "b")
    val fold = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), _ + _) /
        (sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0), _ + _)) *
         sqrt(aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0), _ + _))))
        .as("c")).collect().map(_.getDouble(0))
    val native = df.select(call_function("graft_cosine", col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    fold.zip(native).foreach { case (f, n) => assert(f == n, s"$f != $n") }
  }

  test("null input yields null") {
    GraftExtensions.ensureRegistered(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val r = df.select(call_function("graft_cosine", col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    GraftExtensions.ensureRegistered(spark)
    // A parquet scan keeps the projection in the physical plan (a local
    // relation is constant-folded before codegen ever runs).
    val emb = graft.core.Tables.t(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("a"))
    val df = emb.select(call_function("graft_cosine", col("a"), col("a")).as("c"))
    val hasWsc = df.queryExecution.executedPlan.exists {
      case _: WholeStageCodegenExec => true
      case _ => false
    }
    assert(hasWsc, s"no WholeStageCodegen in:\n${df.queryExecution.executedPlan}")
  }

  test("sql-registered via extensions class works through spark.sql") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
  }
}
