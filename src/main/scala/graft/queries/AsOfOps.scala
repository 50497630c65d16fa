package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.plans.AsOfJoin

/** As-of join over the testdata: each event pairs with the user's latest
  * order at event time. The right side is de-duplicated to one order per
  * (custkey, orderdate) — max orderkey wins — so the as-of winner is
  * unique and both engines agree. Oracle: DuckDB's native ASOF JOIN.
  */
object AsOfOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(desc("o_orderkey"))
      val ordersDedup = t(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      val events = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asof(events, ordersDedup,
          "user_id", "o_custkey", "ts", "o_orderdate")
        .select(col("event_id"), col("user_id"),
          tsStr(col("ts")).as("ts"),
          col("o_orderkey"),
          tsStr(col("o_orderdate")).as("o_orderdate"))
        .orderBy("event_id")
    },

    // LEFT outer as-of: the right side is restricted to a fifth of the
    // customers, so most events have NO prior order and must survive with
    // a null-extended right side (the exact rows DuckDB's ASOF LEFT JOIN
    // produces — nulls included in the hash compare). The operator
    // requires non-null key/time (documented contract), so the null-key
    // filter on events is mirrored in the oracle's WHERE — otherwise a
    // fixture with null user_id rows would diverge (DuckDB would keep
    // them null-extended).
    "q_asof_left" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(desc("o_orderkey"))
      val ordersDedup = t(s, dir, "orders")
        .filter(col("o_custkey") % 5 === 0)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      val events = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.asofLeft(events, ordersDedup,
          "user_id", "o_custkey", "ts", "o_orderdate")
        .select(col("event_id"), col("user_id"),
          tsStr(col("ts")).as("ts"),
          col("o_orderkey"),
          tsStr(col("o_orderdate")).as("o_orderdate"))
        .orderBy("event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" -> """
      WITH od AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             od.o_orderkey,
             strftime(od.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
      FROM events e ASOF JOIN od
        ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
      ORDER BY e.event_id""",

    "q_asof_left" -> """
      WITH od AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders WHERE o_custkey % 5 = 0 GROUP BY 1, 2)
      SELECT e.event_id, e.user_id,
             strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             od.o_orderkey,
             strftime(od.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
      FROM events e ASOF LEFT JOIN od
        ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
      WHERE e.user_id IS NOT NULL AND e.ts IS NOT NULL
      ORDER BY e.event_id"""
  )
}
