package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named registry queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * format (judge checks plan claims against these files):
  *
  *   sbt "runMain graft.tools.PlanSnap r16 before q_ann_lsh q_bfs_hops"
  *
  * Bench parity conf (local[32], 32 shuffle partitions) but sf0.01 data
  * like PLANS.md/PlanCheck — plan SHAPES are what the snapshot records,
  * and they do not change between the small fixtures. Queries whose
  * construction is eager (Materialize barriers, ANN index fits) execute
  * those jobs here; the snapshot is the plan of the RETURNED frame.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query>...")
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("graft-plan-snap").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        (s"// $n @ $dir — explain(formatted), $suffix\n" + txt)
          .getBytes(StandardCharsets.UTF_8))
      println(s"wrote plans/$tag/${n}_$suffix.txt (${txt.length} chars)")
    }
    graft.core.TempDirs.cleanupAll()
    spark.stop()
  }
}
