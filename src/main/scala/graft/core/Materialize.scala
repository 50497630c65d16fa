package graft.core

import org.apache.spark.sql.DataFrame

/** Explicit multi-consumer barrier: write a frame to scratch parquet once
  * and hand every consumer the read-back.
  *
  * Why not rely on exchange reuse: Spark's ReuseExchange (and AQE stage
  * reuse) only dedupes BYTE-IDENTICAL plan subtrees, and two consumers of
  * the same `val` almost never produce identical subtrees — each parent
  * pushes its own column pruning and null filters into the shared scan,
  * so the "shared" frame recomputes per consumer. Measured r9
  * (`tools/ReuseProbe`, executed final adaptive plans): q_rolling_dau
  * scanned events 3x, q_user_overlap 4x, q_temperature_mix 9x, with ZERO
  * ReusedExchange nodes across the whole audited registry.
  *
  * When to use: the frame is consumed >= 2 times AND is materially
  * smaller than the work that produces it (a distinct projection, a
  * vocabulary-sized count table, a pair list). Then one write + k cheap
  * reads beats k replays of scan+shuffle at every scale. When NOT to:
  * corpus-sized frames consumed twice by cheap readers — the write can
  * cost more than the replay (measured for MinHash token hashes,
  * MinHashDedup.nearDuplicates doc).
  *
  * EAGER-EXECUTION CONTRACT (ADVICE r9): `apply` runs the write job at
  * DataFrame-CONSTRUCTION time, so any registry entry that uses a
  * Materialize barrier (directly or via a helper) is not lazy —
  * EXPLAIN-only tooling, schema checks, and PlanDump pay the execution
  * and allocate one scratch dir per construction. The dirs are owned by
  * TempDirs: swept by `TempDirs.cleanupAll()` (Verify/Bench call it) and
  * by the JVM shutdown hook, so they are bounded per process, not leaked
  * — but a long interactive session that constructs Materialize-backed
  * plans in a loop should call `TempDirs.cleanupAll()` between sweeps.
  * The same contract note applies to the other deliberately-eager
  * construction step, `TextOps.exactPairTok`'s block-size guard (which
  * is memoized and allocates nothing). Plan-only tooling that must stay
  * cheap should target queries without barriers, or accept the cost —
  * the registry's `SparkEntry.queries` doc lists the contract.
  */
object Materialize {
  def apply(df: DataFrame, label: String): DataFrame = {
    val dir = TempDirs.create(s"graft-mat-$label")
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }
}
