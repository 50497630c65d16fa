package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.Tables.t

/** SpaceSaving heavy-hitter sketch (Metwally, Agrawal, El Abbadi 2005,
  * "Efficient computation of frequent and top-k elements in data
  * streams") as a typed `Aggregator` — the mergeable, fixed-memory
  * top-k counter that complements `q_cms_topk`'s count-min sketch: CMS
  * answers point queries over the whole vocabulary, SpaceSaving stores
  * the candidate heavy hitters themselves, so no second pass over the
  * corpus is needed to NAME the top-k.
  *
  * Scale contract (the reason this is an Aggregator and not a groupBy):
  * each task holds at most `m` (token, count, err) cells regardless of
  * input size, partial buffers combine pairwise up the usual partial/
  * final aggregation tree, and the merge keeps the overestimate
  * invariant est ≥ true ≥ est − err (Agarwal et al. 2012, "Mergeable
  * summaries": an item absent from a full sketch has true count ≤ that
  * sketch's minimum counter, which is added as both count and error).
  * A groupBy-count top-k shuffles the full vocabulary; this shuffles
  * m·partitions cells — at 100 TB of web text that is the difference
  * between a vocabulary-sized exchange and a constant one.
  *
  * Exactness window: eviction only happens once a buffer holds m
  * distinct tokens, so while the corpus vocabulary fits in m every
  * count is exact and every err is 0 — `q_spacesaving_topk` is H-class
  * against the exact group-by oracle on the fixture vocabularies
  * (31 tokens at sf0.01, ~310 at sf1 under ScaleData's disjoint replica
  * vocabularies; m = 1024 covers both and sf10). Past m the classic
  * ε = 1/m guarantee takes over, proven in `SpaceSavingSpec` on a
  * synthetic over-vocabulary stream.
  */
object SpaceSaving {

  final case class SSEntry(token: String, est: Long, err: Long)

  /** One sketch cell: count (overestimate) + max overestimation error. */
  final case class Cell(c: Long, e: Long)

  final class Agg(m: Int)
      extends Aggregator[String, Map[String, Cell], Seq[SSEntry]] {

    override def zero: Map[String, Cell] = Map.empty

    override def reduce(b: Map[String, Cell], tok: String): Map[String, Cell] =
      b.get(tok) match {
        case Some(Cell(c, e)) => b.updated(tok, Cell(c + 1, e))
        case None if b.size < m => b.updated(tok, Cell(1L, 0L))
        case None =>
          // Replace the minimum cell; the newcomer inherits its count as
          // the overestimate (the SpaceSaving step). Lexicographic
          // tie-break keeps eviction deterministic across runs.
          val (mk, Cell(mc, _)) = b.minBy { case (k, Cell(c, _)) => (c, k) }
          (b - mk).updated(tok, Cell(mc + 1, mc))
      }

    override def merge(a: Map[String, Cell], b: Map[String, Cell]): Map[String, Cell] = {
      // A sketch that never filled holds the exact counts of every token
      // it saw, so absentees get 0; a full sketch bounds an absentee's
      // true count by its minimum counter.
      val minA = if (a.size < m) 0L else a.values.map(_.c).min
      val minB = if (b.size < m) 0L else b.values.map(_.c).min
      val merged = (a.keySet ++ b.keySet).iterator.map { k =>
        (a.get(k), b.get(k)) match {
          case (Some(Cell(c1, e1)), Some(Cell(c2, e2))) => k -> Cell(c1 + c2, e1 + e2)
          case (Some(Cell(c1, e1)), None) => k -> Cell(c1 + minB, e1 + minB)
          case (None, Some(Cell(c2, e2))) => k -> Cell(c2 + minA, e2 + minA)
          case (None, None) => throw new IllegalStateException("unreachable")
        }
      }.toMap
      if (merged.size <= m) merged
      else merged.toSeq
        .sortBy { case (k, Cell(c, _)) => (-c, k) }
        .take(m).toMap
    }

    override def finish(b: Map[String, Cell]): Seq[SSEntry] =
      b.iterator.map { case (k, Cell(c, e)) => SSEntry(k, c, e) }.toSeq
        .sortBy(t => (-t.est, t.token))

    override def bufferEncoder: Encoder[Map[String, Cell]] =
      ExpressionEncoder[Map[String, Cell]]()
    override def outputEncoder: Encoder[Seq[SSEntry]] =
      ExpressionEncoder[Seq[SSEntry]]()
  }

  /** Registry query: sketch the token stream of `documents.text` with
    * m = 1024 and report the top 20 (est desc, token tie-break). Exact —
    * and therefore H-class — while the vocabulary fits in m (see class
    * doc); the general-case error bound is spec-proven. */
  def query(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .as[String]
    toks.select(new Agg(1024).toColumn.name("sketch"))
      .select(explode(col("sketch")).as("e"))
      .select(col("e.token").as("token"), col("e.est").as("est"),
        col("e.err").as("err"))
      .orderBy(desc("est"), col("token"))
      .limit(20)
  }

  val oracle: String = """
    SELECT token, count(*) AS est, CAST(0 AS BIGINT) AS err
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE length(token) > 0
    GROUP BY token ORDER BY est DESC, token LIMIT 20"""

  /** The sketch under groupBy (via `functions.udaf`): per-language top-5
    * tokens with m cells per (group, task) — constant-memory grouped
    * top-k, the shape a per-domain/per-language vocabulary monitor runs
    * at 100 TB where per-group exact counts would shuffle each group's
    * whole vocabulary. finish() orders by (est desc, token), so slicing
    * the first 5 is the deterministic per-group top-5. */
  def groupQuery(s: SparkSession, dir: String): DataFrame = {
    val ss = udaf(new Agg(1024), org.apache.spark.sql.Encoders.STRING)
    t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("lang")
      .agg(ss(col("tok")).as("sketch"))
      .select(col("lang"), explode(slice(col("sketch"), 1, 5)).as("e"))
      .select(col("lang"), col("e.token").as("token"), col("e.est").as("est"))
      .orderBy(col("lang"), desc("est"), col("token"))
  }

  val groupOracle: String = """
    WITH tf AS (
      SELECT lang, tok, count(*) AS est FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) > 0 GROUP BY lang, tok),
    r AS (
      SELECT lang, tok AS token, est,
             row_number() OVER (PARTITION BY lang ORDER BY est DESC, tok) AS rk
      FROM tf)
    SELECT lang, token, est FROM r WHERE rk <= 5
    ORDER BY lang, est DESC, token"""
}
