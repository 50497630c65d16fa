package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Runtime exchange-reuse audit: static EXPLAIN (PLANS.md) shows the
  * UN-finalized adaptive plan, where a frame consumed by two branches
  * prints its subtree twice even when AQE will reuse one exchange at
  * runtime. This probe EXECUTES each query and walks the final adaptive
  * plan, counting FileScans vs ReusedExchange/ReusedSubquery nodes — the
  * ground truth for "does this corpus actually get scanned twice".
  * (Found r9: q_threshold_sweep / q_dedup_rate / q_temperature_mix were
  * NOT reused — their shared subtrees ended in broadcast joins or
  * differing partial aggs, which AQE cannot dedupe — and were rewritten;
  * the distinct/agg-shared shapes below reuse fine.)
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // --all: sweep the whole batch registry (streaming queries excluded —
    // their cost is the drain harness, not a batch plan shape).
    val names: Seq[String] = if (args.sameElements(Array("--all")))
      graft.SparkEntry.queries.keys.toSeq.sorted
        .filterNot(n => n.startsWith("q_stream") ||
          Seq("q38", "q39", "q40", "q41", "q42").exists(n.startsWith))
    else if (args.nonEmpty) args.toSeq else Seq(
      "q31_jaccard_pairs", "q_cms_topk", "q_rolling_dau", "q_bm25_rank",
      "q_hll_union", "q_pmi_pairs", "q_rare_token_ratio", "q_user_overlap",
      "q_bigram_lm", "q_tfidf_keywords", "q_containment_pairs",
      "q_source_kl", "q_vocab_cdf", "q_zipf_slope", "q_dedup_rate",
      "q_threshold_sweep", "q_temperature_mix", "q_cumulative_users")
    val spark = SparkSession.builder()
      .appName("graft-reuse-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-24s corpus scratch reusedStages reusedNodes")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // Execute df's OWN QueryExecution (round-12 review): a
      // df.write...save() builds and runs a SEPARATE QueryExecution for
      // the write command, leaving df.queryExecution un-executed — its
      // AdaptiveSparkPlanExec then reports the INITIAL plan (no query
      // stages, no reuse markers), so reusedStages read 0 structurally
      // and scan counts came from the pre-AQE tree. toRdd is the same
      // instance's executedPlan.execute(); count() drives it to
      // completion distributed-side with zero driver-side row
      // materialization, and AQE finalizes in doExecute.
      df.queryExecution.toRdd.count()
      // The executed tree string includes finalized AQE subtrees plus
      // reuse markers; count node labels on it.
      val plan = df.queryExecution.executedPlan
      val txt = plan.toString
      val finalTxt = plan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.getOrElse(txt)
      def c(s: String, k: String) = k.r.findAllIn(s).length
      // AQE reuse = the SAME query stage id appearing under more than one
      // parent: count total stage references vs distinct stage ids.
      val stageIds = "(?:Shuffle|Broadcast)QueryStage (\\d+)".r
        .findAllMatchIn(finalTxt).map(_.group(1)).toSeq
      val reused = stageIds.length - stageIds.distinct.length
      // What matters is CORPUS scans (testdata paths) — scratch-parquet
      // reads of a materialized intermediate are the cheap byproduct of
      // the barrier, not redundant work.
      val scans = "InMemoryFileIndex\\(\\d+ paths\\)\\[([^\\]]*)".r
        .findAllMatchIn(finalTxt).map(_.group(1)).toSeq
      val corpus = scans.count(_.contains("/testdata/"))
      val scratch = scans.length - corpus
      println(f"$n%-24s corpus=$corpus%2d scratch=$scratch%2d " +
        f"reusedStages=$reused%2d ${c(finalTxt, "ReusedExchange|ReusedSubquery")}%2d")
    }
    spark.stop()
  }
}
