package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* category objects; this object only
  * assembles the registry.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Laziness contract (ADVICE r9): most entries return an unexecuted
    * plan, but entries built on an explicit multi-consumer barrier
    * (`core.Materialize` — q_funnel, the stream-join family's shared
    * fixture, …), an eager guard (`TextOps.exactPairTok`'s block-size
    * pre-scan), or a streaming drain execute Spark jobs at CONSTRUCTION
    * time. Plan-only tooling (EXPLAIN dumps, schema checks) therefore
    * pays real execution for those entries; scratch dirs they allocate
    * are owned by `core.TempDirs` (swept by `cleanupAll()` and the JVM
    * shutdown hook). See Materialize's scaladoc for the full contract. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalA.queries ++ RelationalB.queries ++ RelationalC.queries ++
      AsOfOps.queries ++ Winnowing.queries ++ TextOps.queries ++
      SimilarityOps.queries ++ EventOps.queries ++ UdfOps.queries ++
      LayoutOps.queries ++ GraphOps.queries ++ MlOps.queries ++ Map(
        "q43_minhash_lsh" -> (graft.dedup.MinHashDedup.query _),
        "q_dedup_clusters" -> (graft.dedup.DedupClusters.query _),
        "q_dedup_keep_best" -> (graft.dedup.DedupClusters.keepBestQuery _),
        "q_cluster_size_stats" -> (graft.dedup.DedupClusters.statsQuery _),
        "q_ann_ivf" -> ((s: SparkSession, dir: String) =>
          graft.similarity.AnnIvf.query(s, dir)),
        "q_ann_lsh" -> ((s: SparkSession, dir: String) =>
          graft.similarity.AnnLsh.query(s, dir)),
        "q_ann_pq" -> ((s: SparkSession, dir: String) =>
          graft.similarity.AnnPq.query(s, dir)),
        "q_ann_ivfpq" -> ((s: SparkSession, dir: String) =>
          graft.similarity.AnnIvfPq.query(s, dir)),
        "q_bpe_encode" -> (graft.functions.Bpe.query _),
        "q_spacesaving_topk" -> (graft.functions.SpaceSaving.query _),
        "q_group_topk_sketch" -> (graft.functions.SpaceSaving.groupQuery _),
        "q_multimodal_features" -> (graft.multimodal.MediaPipeline.query _),
        "q_binaryfile_meta" -> (graft.multimodal.MediaPipeline.metaQuery _),
        "q_tuner_loop" -> (graft.tuner.TunerDemo.query _),
        "q_salted_join" -> (graft.operators.SaltedJoin.query _),
        "q_bucketed_join" -> (graft.operators.BucketedJoin.query _)) ++
      graft.streaming.StreamingOps.queries ++ graft.sources.Formats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalA.oracle ++ RelationalB.oracle ++ RelationalC.oracle ++
      AsOfOps.oracle ++ Winnowing.oracle ++ TextOps.oracle ++
      SimilarityOps.oracle ++ EventOps.oracle ++ UdfOps.oracle ++
      LayoutOps.oracle ++ GraphOps.oracle ++ MlOps.oracle ++
      graft.streaming.StreamingOps.oracle ++ graft.sources.Formats.oracle ++
      GoldenOracles.oracle ++
      Map("q_tuner_loop" -> graft.tuner.TunerDemo.oracle,
        "q_binaryfile_meta" -> graft.multimodal.MediaPipeline.metaOracle,
        "q_spacesaving_topk" -> graft.functions.SpaceSaving.oracle,
        "q_group_topk_sketch" -> graft.functions.SpaceSaving.groupOracle,
        "q_salted_join" -> graft.operators.SaltedJoin.oracle,
        "q_bucketed_join" -> graft.operators.BucketedJoin.oracle,
        "q_dedup_clusters" -> graft.dedup.DedupClusters.oracle,
        "q_dedup_keep_best" -> graft.dedup.DedupClusters.keepBestOracle,
        "q_cluster_size_stats" -> graft.dedup.DedupClusters.statsOracle)
}
