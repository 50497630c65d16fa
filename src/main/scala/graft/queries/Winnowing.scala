package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  * hash every character k-gram, slide a window of w consecutive k-gram
  * hashes, keep the minimum of each window — the selected minima are the
  * document's fingerprints. Guarantees any shared substring of length
  * ≥ w + k − 1 yields a shared fingerprint, at ~2/(w+1) sampling density.
  *
  * Portability: the k-gram hash is the base-16 value of the first 8 md5
  * hex chars, computed with the same instr-arithmetic in both dialects
  * (md5 is identical everywhere; no engine-native hash leaks into the
  * result). Window minima are plain SQL window functions.
  *
  * Scale shape: grams explode O(chars) rows per doc, the hash join/group
  * stays keyed by (doc_id, pos), and the window min partitions by doc_id —
  * one shuffle, no cross-doc interaction until the final distinct.
  */
object Winnowing {
  type Q = (SparkSession, String) => DataFrame

  val K = 5 // k-gram length (chars)
  val W = 4 // winnow window (k-grams)

  private def sql(dialect: String): String = {
    // Positions are 0-based; substring() is 1-based in both engines. The
    // length filter sits INSIDE the lateral's source so sequence()/range()
    // never sees a negative span (Spark's sequence counts downward on one).
    val mkGrams = dialect match {
      case "spark" =>
        s"""SELECT doc_id, p, substring(text, p + 1, $K) AS gram
            FROM (SELECT * FROM documents WHERE length(text) >= $K)
            LATERAL VIEW explode(sequence(0, length(text) - $K)) AS p"""
      case "duck" =>
        s"""SELECT doc_id, p, substring(text, p + 1, $K) AS gram
            FROM (SELECT * FROM documents WHERE length(text) >= $K) d,
                 LATERAL (SELECT unnest(range(0, length(text) - $K + 1)) AS p) u"""
    }
    // First 8 md5 hex chars as a base-16 integer via instr arithmetic;
    // CAST keeps the per-digit product in 64-bit in both engines. The
    // digest is materialized once per gram row in its own CTE — the sum
    // must not depend on either engine CSE-ing eight md5() calls.
    val hexVal = (j: Int) =>
      s"CAST(instr('0123456789abcdef', substring(mh, ${j + 1}, 1)) - 1 AS BIGINT) * ${math.pow(16, 7 - j).toLong}"
    val hexSum = (0 until 8).map(hexVal).mkString(" + ")
    s"""
    WITH grams AS ($mkGrams),
    digests AS (
      SELECT doc_id, p, md5(gram) AS mh FROM grams),
    hashed AS (
      SELECT doc_id, p, $hexSum AS h FROM digests),
    winnowed AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp,
             p
      FROM hashed),
    -- only full windows select fingerprints
    bounded AS (
      SELECT w.doc_id, w.fp
      FROM winnowed w
      JOIN (SELECT doc_id, max(p) AS maxp FROM hashed GROUP BY doc_id) m
        ON w.doc_id = m.doc_id
      WHERE w.p <= m.maxp - ${W - 1})
    SELECT doc_id,
           count(DISTINCT fp) AS n_fingerprints,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM bounded GROUP BY doc_id ORDER BY doc_id"""
  }

  val queries: Map[String, Q] = Map(
    "q_winnow_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(sql("spark"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_winnow_fingerprint" -> sql("duck")
  )
}
