package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables.t
import graft.dedup.{DedupClusters, MinHashDedup}

/** Scale diagnostics the timing exponents can't show: the INTERNAL
  * cardinalities that must scale the right way. For each given data dir,
  * prints the q43 LSH candidate-pair count (must grow ~linearly when the
  * corpus is expanded as disjoint replicas — quadratic growth means
  * buckets fused) and the connected-components round count (tracks
  * component diameter — must stay FLAT under disjoint-copy expansion).
  *
  *   runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /root/repo/localdata/sf1
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <dataDir> [dataDir ...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = t(spark, dir, "documents")
      val sigs = MinHashDedup.signatures(docs)
      val cands = MinHashDedup.candidatePairs(MinHashDedup.bandSignatures(sigs))
      val nCands = cands.count()
      val pairs = graft.queries.TextOps.queries("q31_jaccard_pairs")(spark, dir)
        .select("id1", "id2")
      val (labels, rounds) = DedupClusters.connectedComponentsWithRounds(pairs)
      val nDocs = docs.count()
      val nComp = labels.select("comp").distinct().count()
      println(s"SCALEPROBE dir=$dir docs=$nDocs lsh_candidates=$nCands " +
        s"cc_rounds=$rounds components=$nComp")
    }
    graft.core.TempDirs.cleanupAll()
    spark.stop()
  }
}
