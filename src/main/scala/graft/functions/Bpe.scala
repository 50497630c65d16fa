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

  /** Learn a ranked merge list: the top-N adjacent character pairs by
    * corpus frequency (count desc, pair asc — the q_bpe_merges ordering).
    * One aggregation job; the result is bounded at N rows (driver-held
    * by design, like the tuner's bounded metrics summary). */
  def learnMerges(docs: DataFrame, n: Int): Vector[(String, String)] =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair"))
      .limit(n)
      .collect()
      .map(r => (r.getString(0).substring(0, 1), r.getString(0).substring(1, 2)))
      .toVector

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
