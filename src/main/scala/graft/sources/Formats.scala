package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Source/sink format coverage (SURVEY.md §2A R1-R3): text, CSV, JSON
  * sources and sinks as roundtrip queries whose results are H-checked
  * against the original parquet — proving the write path and the read
  * path agree byte-for-value. Overwrite semantics use SaveMode.Overwrite
  * (replacing the reference's manual fs.delete, R3).
  *
  * The partitioned-write query additionally proves partition pruning:
  * reading back with a partition-column filter scans only the matching
  * `o_orderstatus=O` directory.
  */
object Formats {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // CSV sink → CSV source roundtrip (schema-explicit read).
    "q_csv_roundtrip" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-csv")
      val cust = t(s, dir, "customer")
      cust.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(cust.schema).option("header", "true").csv(tmp)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    // JSON sink → JSON source roundtrip.
    "q_json_roundtrip" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-json")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      orders.write.mode("overwrite").json(tmp)
      s.read.schema(orders.schema).json(tmp)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("o_orderstatus")
    },

    // Text sink → text source roundtrip (reference R1/R2: line-oriented IO).
    "q_text_roundtrip" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-text")
      t(s, dir, "documents")
        .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
        .write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .select(split(col("value"), "\t").getItem(1).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    },

    // ORC sink → ORC source roundtrip (the second columnar format Spark
    // ships natively; schema travels in the file).
    "q_orc_roundtrip" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-orc")
      t(s, dir, "supplier").write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("s_acctbal")))).as("sum_bal"))
        .orderBy("s_nationkey")
    },

    // Partitioned parquet write + partition-pruned read.
    "q_partitioned_scan" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-part")
      t(s, dir, "orders").write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_orderstatus") === "O") // prunes to one partition dir
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("o_orderpriority")
    },

    // Dynamic partition pruning: the partition filter is NOT in the query
    // text — it arrives at runtime from the dim side of the join, so the
    // fact scan shows dynamicpruningexpression(...) in PartitionFilters
    // and reads only the 'fast' priority directories (asserted in
    // FormatsDppSpec). At 100 TB this is the difference between scanning
    // two partitions and scanning the whole fact table.
    "q_dpp_prune" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-dpp")
      t(s, dir, "orders").write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(s"$tmp/orders")
      // The dim must be a file relation: a local in-memory dim gets its
      // filter constant-folded away, and the DPP rule only fires when the
      // dim side retains a selective predicate.
      s.createDataFrame(Seq(
        ("1-URGENT", "fast"), ("2-HIGH", "fast"), ("3-MEDIUM", "slow"),
        ("4-NOT SPECIFIED", "slow"), ("5-LOW", "slow"))).toDF("prio", "speed")
        .write.mode("overwrite").parquet(s"$tmp/dim")
      val fact = s.read.parquet(s"$tmp/orders")
      val dim = s.read.parquet(s"$tmp/dim")
      fact.join(dim.filter(col("speed") === "fast"),
          fact("o_orderpriority") === dim("prio"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("o_orderpriority")
    },

    // Schema evolution: generation 1 of a table lands without
    // o_orderstatus (even keys), generation 2 adds the column (odd
    // keys); `mergeSchema` reconciles the footers into the union schema
    // and back-fills gen-1 rows with NULL — how a 100 TB lake absorbs a
    // producer-side column add without rewriting history. mergeSchema is
    // a read-option (footer-merge cost, metadata-sized), NOT a data
    // rewrite; the oracle reconstructs the same union from the base
    // table by nulling the late column on gen-1 parity.
    "q_schema_evolution" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-evo")
      val base = t(s, dir, "orders")
      base.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$tmp/gen=1")
      base.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$tmp/gen=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(coalesce(col("o_orderstatus"), lit("<pre-evolution>"))
          .as("status"))
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("status")
    },

    // Malformed-record robustness: PERMISSIVE CSV routes unparseable
    // lines into _corrupt_record instead of failing the job — the
    // contract that lets a 100 TB ingest quarantine garbage and keep
    // going. Every 7th orderkey is planted with a non-numeric price;
    // corrupt rows are counted, clean rows aggregate, and nothing
    // throws. The oracle reconstructs both populations from the base
    // table by the same parity, so the quarantine split is hash-checked.
    "q_csv_corrupt" -> { (s, dir) =>
      val tmp = graft.core.TempDirs.create("graft-badcsv")
      t(s, dir, "orders").select(
          when(col("o_orderkey") % 7 === 0,
            concat_ws(",", col("o_orderkey"), lit("NOT_A_PRICE"),
              col("o_orderstatus")))
          .otherwise(concat_ws(",", col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))).as("value"))
        .write.mode("overwrite").text(tmp)
      val corrupt = col("_corrupt_record").isNotNull
      s.read
        .schema("k BIGINT, price DOUBLE, st STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(tmp)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(corrupt, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(!corrupt, 1L).otherwise(0L)).as("n_good"),
          money(sum(when(!corrupt, dec(col("price"))))).as("good_price_sum"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_csv_roundtrip" -> """
      SELECT c_mktsegment, count(*) AS cnt,
        CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_json_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS cnt,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_text_roundtrip" -> """
      SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY lang""",

    "q_orc_roundtrip" -> """
      SELECT s_nationkey, count(*) AS cnt,
        CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_bal
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "q_partitioned_scan" -> """
      SELECT o_orderpriority, count(*) AS cnt,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_dpp_prune" -> """
      WITH dim(prio, speed) AS (VALUES
        ('1-URGENT','fast'), ('2-HIGH','fast'), ('3-MEDIUM','slow'),
        ('4-NOT SPECIFIED','slow'), ('5-LOW','slow'))
      SELECT o_orderpriority, count(*) AS cnt,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM orders JOIN dim ON o_orderpriority = prio
      WHERE speed = 'fast'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_schema_evolution" -> """
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
                  ELSE o_orderstatus END AS status,
             count(*) AS cnt,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total
      FROM orders GROUP BY 1 ORDER BY status""",

    "q_csv_corrupt" -> """
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_corrupt,
             CAST(sum(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_good,
             CAST(round(sum(CASE WHEN o_orderkey % 7 <> 0
                 THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE)
               AS good_price_sum
      FROM orders"""
  )
}
