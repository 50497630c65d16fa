package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Relational queries Q01–Q14 of SURVEY.md §2B: scans, filters, hash
  * aggregation, every join flavor, distinct aggregation, rollup/cube/
  * grouping sets. Each entry has a DuckDB oracle twin in [[oracle]].
  *
  * Scale notes (100 TB design rule): all aggregations are partial+final
  * hash aggregates (map-side combine); dimension joins (region, nation,
  * customer at TPC-H ratios) are broadcast; only fact-fact joins shuffle,
  * and they shuffle on their natural equi-keys. The Q10 self-join is
  * blocked on `p_brand` so the quadratic pair expansion is bounded per
  * block, never a global cross join.
  */
object RelationalA {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q01 — TPC-H Q1-style pricing summary (scan+filter+agg+sort).
    "q01_pricing_summary" -> { (s, dir) =>
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      val discPrice = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
      val charge = discPrice * dec(lit(1.0) + col("l_tax"))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          money(sum(discPrice)).as("sum_disc_price"),
          money(sum(charge)).as("sum_charge"),
          avg6(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
          avg6(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
          avg6(sum(dec(col("l_discount"))), count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q02 — projection + filter + limit (TakeOrderedAndProject).
    "q02_filter_topn" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          tsStr(col("o_orderdate")).as("o_orderdate"))
        .orderBy("o_orderkey").limit(100)
    },

    // Q03 — inner equi-join + aggregation (shuffle join on o_custkey at
    // scale; Catalyst broadcasts customer when it fits).
    "q03_join_agg" -> { (s, dir) =>
      t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(money(sum(dec(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("order_cnt"))
        .orderBy("c_mktsegment")
    },

    // Q04 — multi-way join; dims broadcast, Catalyst reorders.
    "q04_multiway_join" -> { (s, dir) =>
      val rev = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(money(sum(rev)).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    // Q05 — left outer join + per-customer order count.
    "q05_left_outer" -> { (s, dir) =>
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy(desc("order_cnt"), asc("c_custkey"))
        .limit(50)
    },

    // Right outer join (completes the join matrix with q05/q_full_outer):
    // orders restricted to a third of the customers RIGHT JOIN customer —
    // every customer survives, two thirds with a null order side.
    "q_right_outer" -> { (s, dir) =>
      t(s, dir, "orders").filter(col("o_custkey") % 3 === 0)
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")
    },

    // Full outer join: order counts (even custkeys) ⊔ event counts
    // (user_id % 3 = 0) — both sides contribute unmatched keys, so both
    // null-extension paths are exercised and hash-compared.
    "q_full_outer" -> { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_custkey") % 2 === 0)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("order_cnt"))
      val e = t(s, dir, "events").filter(col("user_id") % 3 === 0)
        .groupBy(col("user_id").as("k2")).agg(count(lit(1)).as("event_cnt"))
      o.join(e, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("custkey"),
          col("order_cnt"), col("event_cnt"))
        .orderBy("custkey")
    },

    // Q06 — left semi join (EXISTS).
    "q06_semi_join" -> { (s, dir) =>
      t(s, dir, "customer").join(
          t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // Q07 — left anti join (NOT EXISTS).
    "q07_anti_join" -> { (s, dir) =>
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // Q08 — cross join (both sides tiny; bounded by construction).
    "q08_cross_join" -> { (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "supplier"))
        .select("r_regionkey", "r_name", "s_suppkey", "s_name")
        .orderBy("r_regionkey", "s_suppkey")
    },

    // Q09 — broadcast-hint join; result must equal Q03.
    "q09_broadcast_join" -> { (s, dir) =>
      t(s, dir, "orders").join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(money(sum(dec(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("order_cnt"))
        .orderBy("c_mktsegment")
    },

    // Q10 — theta/range self-join blocked on p_brand (equi-key bounds the
    // pair blow-up — the 100 TB rule for non-equi joins).
    "q10_range_join" -> { (s, dir) =>
      val p1 = t(s, dir, "part").select(col("p_brand"), col("p_size").as("size1"))
      val p2 = t(s, dir, "part").select(col("p_brand").as("brand2"), col("p_size").as("size2"))
      p1.join(p2, col("p_brand") === col("brand2") && col("size1") < col("size2"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("pair_cnt"))
        .orderBy("p_brand")
    },

    // Q11 — multiple distinct aggregates (Expand + two-phase agg).
    "q11_distinct_agg" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // Q12 — rollup with grouping_id.
    "q12_rollup" -> { (s, dir) =>
      t(s, dir, "orders").rollup("o_orderstatus", "o_orderpriority")
        .agg(money(sum(dec(col("o_totalprice")))).as("total"),
          count(lit(1)).as("cnt"), grouping_id().as("gid"))
        .orderBy(asc("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    },

    // Q13 — cube.
    "q13_cube" -> { (s, dir) =>
      t(s, dir, "lineitem").cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("l_quantity")))).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    },

    // Q14 — grouping sets (SQL form; declarative → same Expand plan).
    "q14_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_q14")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
               count(*) AS cnt, grouping_id() AS gid
        FROM orders_q14
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) * CAST(1.0 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_charge,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_price,
        round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_topn" -> """
      SELECT o_orderkey, o_custkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
      FROM orders
      WHERE o_orderstatus = 'O' AND o_totalprice > 100000
      ORDER BY o_orderkey LIMIT 100""",

    "q03_join_agg" -> """
      SELECT c_mktsegment,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        count(*) AS order_cnt
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q04_multiway_join" -> """
      SELECT n_name,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY n_name ORDER BY revenue DESC, n_name ASC""",

    "q05_left_outer" -> """
      SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY order_cnt DESC, c_custkey ASC LIMIT 50""",

    "q_right_outer" -> """
      SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt
      FROM (SELECT * FROM orders WHERE o_custkey % 3 = 0) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey""",

    "q_full_outer" -> """
      WITH o AS (SELECT o_custkey AS k, count(*) AS order_cnt
                 FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1),
           e AS (SELECT user_id AS k2, count(*) AS event_cnt
                 FROM events WHERE user_id % 3 = 0 GROUP BY 1)
      SELECT coalesce(k, k2) AS custkey, order_cnt, event_cnt
      FROM o FULL JOIN e ON k = k2 ORDER BY custkey""",

    "q06_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "q07_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
      ORDER BY c_custkey""",

    "q08_cross_join" -> """
      SELECT r_regionkey, r_name, s_suppkey, s_name
      FROM region CROSS JOIN supplier
      ORDER BY r_regionkey, s_suppkey""",

    "q09_broadcast_join" -> """
      SELECT c_mktsegment,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        count(*) AS order_cnt
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q10_range_join" -> """
      SELECT p1.p_brand, count(*) AS pair_cnt
      FROM part p1 JOIN part p2
        ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
      GROUP BY p1.p_brand ORDER BY p1.p_brand""",

    "q11_distinct_agg" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp,
             count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q12_rollup" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
        count(*) AS cnt, grouping_id(o_orderstatus, o_orderpriority) AS gid
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q13_cube" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        grouping_id(l_returnflag, l_linestatus) AS gid
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q14_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
        count(*) AS cnt, grouping_id(o_orderstatus, o_orderpriority) AS gid
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""
  )
}
