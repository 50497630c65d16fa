package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding apply step: given a ranked merge table, encode a
  * word by repeatedly fusing its lowest-ranked adjacent symbol pair —
  * the tokenizer-inference inner loop (Sennrich et al., ACL 2016;
  * q_bpe_merges covers the pair-counting training step).
  *
  * Engine shape: the merge table is tiny (top-N pairs) and rides into
  * the encode closure as a broadcast-style Map; the per-word loop is
  * genuinely imperative (data-dependent fixpoint over a ~dozen-symbol
  * sequence), which is the documented UDF-is-legitimate case — there is
  * no relational decomposition whose shuffle count doesn't scale with
  * merge steps. The UDF is a narrow map over the token stream; nothing
  * shuffles until the output aggregation.
  */
object Bpe {

  /** Greedy BPE encode of one word: start from characters, repeatedly
    * merge the adjacent pair with the lowest rank until none applies.
    * Leftmost occurrence merges first at equal rank (standard). */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** One left-to-right non-overlapping pass fusing every adjacent
    * occurrence of `p` — the training-side merge application (Sennrich
    * et al., ACL 2016, Algorithm 1). */
  private def applyMerge(syms: Vector[String], p: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        b += syms(j) + syms(j + 1); j += 2
      } else { b += syms(j); j += 1 }
    }
    b.result()
  }

  /** Learn a ranked merge list with the ITERATIVE Sennrich procedure:
    * aggregate the corpus once into a bounded word-frequency vocabulary
    * (count desc, word asc, capped at `vocabCap` — BPE statistics are
    * vocabulary-shaped, so the corpus-sized scan happens exactly once
    * and the merge loop runs over ≤ vocabCap tiny symbol sequences
    * driver-side, the shape every public BPE trainer uses), then
    * repeatedly: count adjacent symbol pairs weighted by word frequency,
    * record the most frequent pair (count desc, pair asc), and fuse it
    * in every word before re-counting. Because later rounds count pairs
    * over the MERGED sequences, higher-level ranks like ("ab","c")
    * exist, and [[encode]]'s fixpoint can compose merges — the round-7
    * single-pass learner could only ever rank character-level pairs,
    * capping encode at one merge round (ADVICE r7). */
  def learnMerges(docs: DataFrame, n: Int,
      vocabCap: Int = 50000): Vector[(String, String)] = {
    var words: Array[(Vector[String], Long)] = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    val out = Vector.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < n && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .map { case ((a, b), c) => (-c, a, b) }.min match {
            case (_, a, b) => (a, b)
          }
        out += best
        // Fully-merged single-symbol words stop contributing pairs;
        // dropping them keeps later rounds proportional to live vocab.
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
          .filter(_._1.length >= 2)
      }
      i += 1
    }
    out.result()
  }

  /** Registry query: learn 50 merges, encode every word, report per-lang
    * compression (symbols/word vs chars/word) and total symbol count.
    * The ranks map is captured by the UDF closure (≤ 50 entries,
    * task-serialized once — the broadcast-small-table pattern). */
  def query(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.t(s, dir, "documents")
    val ranks = learnMerges(docs, 50).zipWithIndex.toMap
    val nSyms = udf((w: String) => encode(w, ranks).length)
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("lang"), length(col("w")).cast("long").as("n_chars"),
        nSyms(col("w")).cast("long").as("n_syms"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_chars").as("chars"),
        sum("n_syms").as("syms"),
        round(sum("n_syms").cast("double") / sum("n_chars"), 6)
          .as("compression"))
      .orderBy("lang")
  }
}
