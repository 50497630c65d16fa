package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.functions.Udfs

/** Q36 UDF/UDAF/UDTF surface + Q37 approximate distinct.
  *
  * UDFs are a last resort in this engine (they block codegen); they exist
  * here because the declared surface requires demonstrating them. The
  * Jaccard UDF is the same function the MinHash rerank uses.
  */
object UdfOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q36a — scalar UDF: Jaccard of consecutive documents' token sets.
    "q36_udf_jaccard" -> { (s, dir) =>
      val jac = udf(Udfs.jaccard _)
      val docs = t(s, dir, "documents")
      val a = docs.select(col("doc_id").as("id1"), split(col("text"), " ").as("toks1"))
      val b = docs.select(col("doc_id").as("id2"), split(col("text"), " ").as("toks2"))
      a.join(b, col("id2") === col("id1") + 1)
        .select(col("id1"), col("id2"),
          round(jac(col("toks1"), col("toks2")), 6).as("jaccard"))
        .orderBy("id1")
    },

    // Q36b — typed Aggregator (UDAF): priority-weighted mean order price
    // per status. Weight = 6 - priority digit (URGENT=5 … LOW=1).
    "q36_udaf_weighted_mean" -> { (s, dir) =>
      import s.implicits._
      val wm = udaf(Udfs.WeightedMean)
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"),
          (lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int")).as("w"))
        .groupBy("o_orderstatus")
        .agg(round(wm(col("o_totalprice"), col("w")), 6).as("wmean"))
        .orderBy("o_orderstatus")
    },

    // Q36c — generator (UDTF-style): posexplode of tokens.
    "q36_posexplode" -> { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .filter(col("tok") =!= "")
        .orderBy("doc_id", "pos")
    },

    // Q37 — approx_count_distinct (HLL++). No DuckDB oracle (tolerance
    // class); driver records a rows-only check. A scalatest spec asserts
    // the ±5% bound against the exact count.
    "q37_approx_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_nd_part"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // Approximate percentile (quantile sketch). Tolerance class like Q37:
    // rows-only driver check, accuracy bound in ApproxDistinctSpec.
    "q_approx_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_approx"))
        .orderBy("l_returnflag")
    },

    // HLL sketch build + MERGE — the sketch op a 100 TB pipeline actually
    // needs: per-shard sketches are tiny, mergeable, and reusable, so
    // "distinct users per segment AND overall" costs one pass over the
    // data plus a sketch-sized shuffle (vs a full re-shuffle per rollup
    // for exact distinct). Per-status estimates ride the sketch column;
    // the union row re-merges the SAME sketches. Tolerance class like
    // Q37: rows-only driver check, error bound in ApproxDistinctSpec.
    "q_hll_union" -> { (s, dir) =>
      // Materialize the (tiny: one row per status) sketch table to scratch
      // parquet so BOTH consumers — per-status estimates and the merged ALL
      // row — reuse one scan+sketch pass; without it each branch re-plans
      // the full aggregation and the corpus is sketched twice. Scratch
      // beats persist() here: repeated registry invocations in one JVM
      // (Verify + Bench reps) were accumulating never-unpersisted cache
      // entries for the process lifetime; TempDirs sweeps the files.
      val tmp = graft.core.TempDirs.create("graft-hll-sk")
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
        .write.mode("overwrite").parquet(s"$tmp/sk")
      val sk = s.read.parquet(s"$tmp/sk")
      val per = sk.select(col("o_orderstatus"),
        hll_sketch_estimate(col("sk")).as("approx_custs"))
      val union = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_custs"))
        .select(lit("ALL").as("o_orderstatus"), col("approx_custs"))
      per.union(union).orderBy("o_orderstatus")
    }
  )

  val oracle: Map[String, String] = Map(
    "q36_udf_jaccard" -> """
      WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
      FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
      ORDER BY id1""",

    "q36_udaf_weighted_mean" -> """
      SELECT o_orderstatus,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))
                            * (6 - CAST(substring(o_orderpriority, 1, 1) AS INT))) AS DOUBLE)
                   / sum(6 - CAST(substring(o_orderpriority, 1, 1) AS INT)), 6) AS wmean
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q36_posexplode" -> """
      SELECT doc_id, CAST(i - 1 AS INT) AS pos, string_split(text, ' ')[i] AS tok
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' ')))) AS i) u
      WHERE doc_id < 20 AND string_split(text, ' ')[i] <> ''
      ORDER BY doc_id, pos"""
  )
}
