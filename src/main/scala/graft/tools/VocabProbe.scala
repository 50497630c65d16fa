package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables.t

/** Decade-normalizer diagnostics for the exponent tail (round 12).
  *
  * The sf1→sf10 chained expansion (ScaleData, salt tag "b") is NOT a
  * pure 10× of every cost driver: level-2 salting appends "~bJ" on top
  * of level-1's "~I", so corpus BYTES grow faster than docs, and the
  * disjoint-replica construction multiplies token/pair VOCABULARY ~10×
  * per decade where a natural corpus follows Heaps' law (sub-linear).
  * Operators whose cost is per-byte (q_bpe_merges: one explode per
  * character) or whose shuffle is vocabulary-keyed (q_cooccur_window:
  * groupBy (w1, w2)) therefore read raw time-exponents ABOVE their true
  * per-unit scaling. This probe prints, per dir, the normalizers needed
  * to separate operator scaling from fixture salt-tax:
  *
  *   docs, chars (q_bpe cost driver), tokens (q_cooccur generation
  *   driver), distinct tokens / distinct adjacent char-pairs /
  *   distinct window≤2 co-occurrence pairs (the three vocab loads).
  *
  * It then times q_cooccur_window and q_bpe_merges at the given dirs
  * under shuffle.partitions ∈ {32, 128} — if the sf10 knee is per-task
  * hash-aggregation pressure (vocab per task exceeding the in-memory
  * map → sort/spill fallback), more partitions flatten it, which is
  * precisely the knob graft's tuner (ComputePartitions) exists to turn
  * as data grows.
  *
  *   runMain graft.tools.VocabProbe /root/repo/localdata/sf1 /root/repo/localdata/sf10
  */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VocabProbe <dataDir> [dataDir ...]")
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
      val stats = docs.select(
        count(lit(1)).as("docs"),
        sum(length(col("text"))).as("chars"),
        sum(size(expr("filter(split(text, ' '), t -> t <> '')"))).as("tokens"))
        .head()
      val toks = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val nVocab = toks.distinct().count()
      val nCharPairs = toks.filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .distinct().count()
      val ts = docs
        .select(expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
        .filter(size(col("ts")) >= 2)
      val d1 = expr("transform(sequence(1, size(ts) - 1)," +
        " i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))")
      val d2 = expr("IF(size(ts) >= 3, transform(sequence(1, size(ts) - 2)," +
        " i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 2) AS w2))," +
        " array())")
      val nCooccur = ts.select(explode(concat(d1, d2)).as("pr"))
        .select(col("pr.w1"), col("pr.w2")).distinct().count()
      println(s"VOCABPROBE dir=$dir docs=${stats.getLong(0)} " +
        s"chars=${stats.getLong(1)} tokens=${stats.getLong(2)} " +
        s"vocab=$nVocab char_pairs=$nCharPairs cooccur_pairs=$nCooccur")
    }

    // Shuffle-partition A/B on the two over-linear readings: min of two
    // timed passes per config after one warm pass (the Bench discipline).
    val abQueries = Seq("q_cooccur_window", "q_bpe_merges")
    for (parts <- Seq("32", "128"); dir <- args; q <- abQueries) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      def pass(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm
      val sec = Seq.fill(2)(pass()).min
      println(f"VOCABPROBE_AB query=$q dir=$dir shuffle_partitions=$parts min_sec=$sec%.3f")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    graft.core.TempDirs.cleanupAll()
    spark.stop()
  }
}
