package graft.tools

import org.apache.spark.sql.SparkSession
import graft.PlantedEmbeddings
import graft.similarity.AnnIvfPq

/** Second-measured-decade evidence for the similarity tier (VERDICT r8
  * item 9): IVF-PQ fit + search latency AND recall at the 10× and 100×
  * planted-cluster corpus sizes (5k → 50k vectors — the same decade the
  * relational scale suite measures as sf1 → sf10).
  *
  * The PLANTED fixture is used instead of the chained-rotation
  * `localdata/sf10` embeddings because the 64-dim rotation family runs
  * out of distinct transforms at a 100-replica chain and plants exact
  * duplicates (documented fixture limit, BENCH_NOTES r7) — recall
  * against duplicated ground truth would be ill-defined. Planted
  * clusters keep recall a REQUIREMENT at every scale: each query's true
  * neighbors are its cluster siblings by construction.
  *
  * The probe ratio is held at the production 1/8 across the decade
  * (coarseK 64→256 ~ √N scaling, nprobe 8→32), so the measurement
  * answers "does the SAME configuration policy hold recall while cost
  * scales sub-linearly", not "can a retuned index".
  *
  * Usage: runMain graft.tools.AnnScale [numClusters coarseK nprobe]
  * Prints one JSON line per configured point.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.ensureRegistered(spark)

    val points: Seq[(Int, Int, Int)] = args.toSeq match {
      case Seq(n, k, p) => Seq((n.toInt, k.toInt, p.toInt))
      case _ => Seq((500, 64, 8), (5000, 256, 32))
    }
    points.foreach { case (numClusters, coarseK, nprobe) =>
      val e = PlantedEmbeddings.df(spark, numClusters)
        .repartition(cpus.toInt).cache()
      val n = e.count() // materialize before timing
      val idx = graft.core.TempDirs.create(s"graft-annscale-$numClusters")
      val t0 = System.nanoTime()
      AnnIvfPq.fit(e, idx, coarseK = coarseK, iters = 2)
      val fitS = (System.nanoTime() - t0) / 1e9
      val q = PlantedEmbeddings.queries(e, maxQid = 1000)
      val nq = q.count()
      // Warm pass (plan compile), then timed search.
      AnnIvfPq.search(spark, idx, q, nprobe = nprobe).count()
      val t1 = System.nanoTime()
      val approx = AnnIvfPq.search(spark, idx, q, nprobe = nprobe)
        .select("qid", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val searchS = (System.nanoTime() - t1) / 1e9
      val exact = PlantedEmbeddings.exactTopK(e, AnnIvfPq.TOP_K, q)
      val recall = PlantedEmbeddings.recall(exact, approx)
      e.unpersist()
      println(f"""{"n":$n,"num_clusters":$numClusters,"coarse_k":$coarseK,"nprobe":$nprobe,"queries":$nq,"fit_sec":$fitS%.2f,"search_sec":$searchS%.3f,"recall":$recall%.4f}""")
    }
    graft.core.TempDirs.cleanupAll()
    spark.stop()
  }
}
