package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tuner.Tuner

/** Tuned-vs-untuned A/B for the auto-tuner (the reference's reason to
  * exist: robin-sparkles' ComputePartitions recommends the shuffle
  * partition count that makes the NEXT run faster). This main measures
  * the benefit instead of assuming it — BENCH_NOTES.md "Round 7 — tuner
  * A/B" records a run at sf1.
  *
  * Protocol: for each query (q01, q04) and each AQE setting (on, off),
  * run ITERS iterations per arm, arms interleaved per iteration so
  * machine-load drift hits both arms equally.
  *   untuned arm — Spark's out-of-box `spark.sql.shuffle.partitions=200`
  *     every iteration (what a user who never tunes gets);
  *   tuned arm — `Tuner.tuneAndRunTracked` per iteration: recommend from
  *     the accumulated history of THIS arm's prior iterations, apply,
  *     record. Iteration 1 is the cold-start recommendation.
  * Only the query body (noop-sink write, same force as Bench) is timed;
  * recording/recommendation overhead is the tuner's own cost and is
  * reported separately so the steady-state query benefit stays visible.
  *
  * Usage: runMain graft.tools.TunerAb [sfDir] (default localdata/sf1;
  * SPARK_GRAFT_CPUS and SPARK_GRAFT_AB_ITERS override topology/reps).
  * Output: one human-readable table per (query, aqe) block on stdout —
  * this is evidence tooling, not a driver contract; no JSON line.
  */
object TunerAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = math.max(1,
      scala.util.Try(sys.env("SPARK_GRAFT_AB_ITERS").trim.toInt).getOrElse(3))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.LogQuiet.boundedWindowWarnings()

    // q43 joined the A/B in round 14 (VERDICT r13 item 4): the LSH dedup
    // pipeline is the engine's flagship multi-shuffle shape, so the
    // tuner's value claim should be demonstrated on it, not only on the
    // two relational headliners. SPARK_GRAFT_AB_QUERIES (csv) scopes.
    val queries = sys.env.get("SPARK_GRAFT_AB_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q01_pricing_summary", "q04_multiway_join",
        "q43_minhash_lsh"))

    def body(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(s"TunerAb: sfDir=$sfDir local[$cpus] iters=$iters " +
      "(untuned=200 out-of-box; tuned=history-driven recommendation)")
    // The committed A/B evidence carries its own IO-health probes
    // (round 14) — same criterion as Bench's recording gate.
    val probePath = graft.core.IoProbe.path(spark.conf.getOption("spark.local.dir"))
    def probe(when: String): Unit = println(
      f"io_probe_mb_s $when ${graft.core.IoProbe.mbPerSec(probePath)}%.1f ($probePath)")
    probe("pre")
    for (aqe <- Seq(true, false); name <- queries) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      body(name) // untimed warmup: JIT/codegen charged to neither arm
      val tmp = graft.core.TempDirs.create("graft-tuner-ab")
      val tuner = new Tuner(tmp, s"ab-$name-aqe-$aqe")
      val rows = (1 to iters).map { i =>
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        val untuned = timed(body(name))
        // tuneAndRunTracked sets the recommended partition count itself;
        // the overhead delta (recording + history read) is total - body.
        var bodySec = 0.0
        val totalSec = timed {
          val r = tuner.tuneAndRunTracked(spark) { bodySec = timed(body(name)) }
          ()
        }
        val rec = spark.conf.get("spark.sql.shuffle.partitions").toInt
        (i, untuned, bodySec, totalSec - bodySec, rec)
      }
      val aqeTag = if (aqe) "on" else "off"
      println(f"%n== $name  (aqe $aqeTag) ==")
      println("iter  untuned_s  tuned_s  tuner_overhead_s  recommended")
      rows.foreach { case (i, u, t, oh, rec) =>
        println(f"$i%4d  $u%9.2f  $t%7.2f  $oh%16.2f  $rec%11d")
      }
      val uMin = rows.map(_._2).min; val tMin = rows.map(_._3).min
      println(f"min   $uMin%9.2f  $tMin%7.2f   (tuned/untuned = ${tMin / uMin}%.3f)")
    }
    probe("post")
    graft.core.TempDirs.cleanupAll()
    spark.stop()
  }
}
