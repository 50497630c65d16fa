package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Analytics breadth beyond the core §2B list: pivot, distribution window
  * functions, statistical aggregates, percentiles, and a typed Dataset
  * pipeline. Determinism notes: stddev/variance are engine-native (both
  * engines agree to ~1e-10 relative; outputs rounded to 2 dp at 1e4-1e5
  * magnitudes); correlation is in [-1,1] so 6 dp rounding is safe;
  * percentile_cont uses the standard linear-interpolation definition in
  * both engines, rounded to 4 dp.
  */
object RelationalC {
  type Q = (SparkSession, String) => DataFrame

  /** Typed row for the Dataset-API demonstration query. */
  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)

  val queries: Map[String, Q] = Map(
    // Pivot: wide per-returnflag quantities by linestatus.
    "q_pivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(money(sum(dec(col("l_quantity")))))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    },

    // Unpivot (melt) — the inverse of q_pivot: three measure columns fold
    // into (metric, val) rows, then aggregate per metric. Map-side
    // row-expansion (no shuffle until the final agg).
    "q_unpivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "metric", "val")
        .groupBy("metric")
        .agg(count(lit(1)).as("cnt"), money(sum(dec(col("val")))).as("total"))
        .orderBy("metric")
    },

    // Correlated LATERAL join: per-customer top-2 orders via a
    // correlated, ordered, limited subquery — the declarative form of
    // "for each row, run this parameterized query". Catalyst rewrites it
    // to a ranked window join; no driver-side iteration.
    "q_lateral_topn" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS price
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_orderkey""")
    },

    // Value-based RANGE window frame (q17 covers ROWS frames): for each
    // order, how many of the same customer's orders fall within ±1000 of
    // its total price. Range frames are tie-stable by construction (the
    // frame is defined by VALUE distance, not row position), so no
    // tie-break column is needed for determinism.
    "q_window_range" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 1000L)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_near"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Distribution window functions: ntile, percent_rank, cume_dist.
    "q_window_dist" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    },

    // Value window functions: first/last/nth over explicit frames.
    "q_window_value" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("first_order"),
          last("o_orderkey").over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Statistical aggregates: stddev, variance, correlation.
    "q_stats_agg" -> { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
          round(var_samp(col("o_totalprice")), 2).as("var_price"),
          round(corr(col("o_totalprice"), col("o_custkey").cast("double")), 6)
            .as("corr_price_cust"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // Percentiles: continuous (interpolated) per group.
    "q_percentiles" -> { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 4)
            .as("p50"),
          round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"), 4)
            .as("p90"),
          round(expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice)"), 4)
            .as("p99"))
        .orderBy("l_returnflag")
    },

    // Map higher-order functions: transform_keys/values, map_filter,
    // map_zip_with — outputs reduced to scalars for the oracle.
    "q_map_hof" -> { (s, dir) =>
      val m = map(lit("base"), col("value"), lit("double"), col("value") * 2)
      t(s, dir, "events").filter(col("event_id") <= 300)
        .select(col("event_id"),
          round(element_at(transform_values(m, (_, v) => v + 1), "base"), 6).as("base_plus1"),
          size(map_filter(m, (_, v) => v > 50)).cast("long").as("n_over_50"),
          round(element_at(transform_keys(m, (k, _) => concat(k, lit("_x"))), "double_x"), 6)
            .as("double_val"))
        .orderBy("event_id")
    },

    // from_json into a typed struct (schema-on-read over the props column).
    "q_from_json" -> { (s, dir) =>
      val parsed = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
      t(s, dir, "events")
        .select(col("event_type"), parsed.getField("k").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_cnt"))
        .orderBy("event_type")
    },

    // Typed Dataset pipeline: case-class Encoder, typed filter/map, then
    // back to relational aggregation. (Typed lambdas are opaque to
    // Catalyst — no pushdown through them — which is why the engine uses
    // them only where type safety pays; documented tradeoff.)
    "q_typed_dataset" -> { (s, dir) =>
      import s.implicits._
      val ds = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .as[OrderRow]
      ds.filter(o => o.o_orderstatus != "P" && o.o_totalprice > 50000.0)
        .map(o => (o.o_orderstatus, o.o_totalprice))
        .toDF("status", "price")
        .groupBy("status")
        .agg(count(lit(1)).as("cnt"), money(sum(dec(col("price")))).as("total"))
        .orderBy("status")
    },

    // Pareto skyline (maximize quantity AND price within each return
    // flag): pre-collapse to max-price-per-quantity, then one
    // descending-quantity window — a row survives iff its price beats
    // the running max over strictly-greater quantities. O(n log n) via
    // sort, never the O(n²) dominance self-join; the window input is
    // bounded by distinct quantity values per flag, and the pre-collapse
    // partial-aggregates map-side. The same shape answers any 2-D
    // skyline at 100 TB (3-D+ needs the block-nested-loop variant).
    "q_skyline" -> { (s, dir) =>
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("q"))
        .agg(max("l_extendedprice").as("p"))
      val w = Window.partitionBy("rf").orderBy(desc("q"))
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("pm", max("p").over(w))
        .filter(col("pm").isNull || col("p") > col("pm"))
        .select(col("rf"), col("q").cast("double").as("q"),
          round(col("p"), 2).cast("double").as("p"))
        .orderBy("rf", "q")
    },

    // Cohort LTV matrix: customers cohorted by first-order month, order
    // count + revenue per (cohort, age-in-years) — the lifetime-value
    // table. The first-order month is an agg + equi-join-back (never a
    // global window); both aggregations partial-combine map-side and
    // everything shuffles on custkey then the small (cohort, age) key.
    "q_cohort_ltv" -> { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_custkey"),
        col("o_totalprice"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("m"))
      val first = o.groupBy("o_custkey").agg(min("m").as("cm"))
      o.join(first, "o_custkey")
        .groupBy(col("cm").as("cohort_month"),
          ((col("m") - col("cm")) / 12).cast("long").as("age_years"))
        .agg(count(lit(1)).as("n_orders"),
          money(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy("cohort_month", "age_years")
    },

    // RFM segmentation: recency/frequency/monetary quintiles per
    // customer, segment sizes. The per-customer aggregate is the only
    // corpus-sized pass; the three ntile windows run over one row per
    // customer (dimension-bounded — the same contract as q_vocab_cdf's
    // vocabulary window; two-level bucketing is the refinement if the
    // customer dimension ever outgrows one task's sort).
    "q_rfm" -> { (s, dir) =>
      val a = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max(unix_micros(col("o_orderdate"))).as("last_us"),
          count(lit(1)).as("freq"),
          sum(dec(col("o_totalprice"))).as("money"))
      val seg = a
        .withColumn("r", ntile(5).over(
          Window.orderBy(desc("last_us"), asc("o_custkey"))))
        .withColumn("f", ntile(5).over(
          Window.orderBy(desc("freq"), asc("o_custkey"))))
        .withColumn("m", ntile(5).over(
          Window.orderBy(desc("money"), asc("o_custkey"))))
      seg.groupBy("r", "f", "m").agg(count(lit(1)).as("n"))
        .orderBy("r", "f", "m")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" -> """
      SELECT l_returnflag,
        CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_f,
        CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_unpivot" -> """
      WITH u AS (
        SELECT 'quantity' AS metric, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        UNION ALL
        SELECT 'extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'discount', CAST(l_discount AS DOUBLE) FROM lineitem)
      SELECT metric, count(*) AS cnt,
        CAST(round(sum(CAST(val AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM u GROUP BY metric ORDER BY metric""",

    "q_lateral_topn" -> """
      SELECT c.c_custkey, o.o_orderkey,
             CAST(o.o_totalprice AS DOUBLE) AS price
      FROM customer c JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
      ORDER BY c.c_custkey, o.o_orderkey""",

    "q_window_range" -> """
      SELECT o_custkey, o_orderkey,
        count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
      FROM orders ORDER BY o_custkey, o_orderkey""",

    "q_window_dist" -> """
      SELECT o_orderkey, o_orderstatus,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",

    "q_window_value" -> """
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order,
             nth_value(o_orderkey, 2) OVER w AS second_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",

    "q_stats_agg" -> """
      SELECT o_orderstatus,
             round(stddev_samp(o_totalprice), 2) AS sd_price,
             round(var_samp(o_totalprice), 2) AS var_price,
             round(corr(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS corr_price_cust,
             count(*) AS cnt
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_percentiles" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_map_hof" -> """
      SELECT event_id,
             round(value + 1, 6) AS base_plus1,
             CAST((CASE WHEN value > 50 THEN 1 ELSE 0 END)
                + (CASE WHEN value * 2 > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50,
             round(value * 2, 6) AS double_val
      FROM events WHERE event_id <= 300
      ORDER BY event_id""",

    "q_from_json" -> """
      SELECT event_type,
             CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
             count(CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1) <> '' THEN 1 END) AS k_cnt
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_typed_dataset" -> """
      SELECT o_orderstatus AS status, count(*) AS cnt,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderstatus <> 'P' AND o_totalprice > 50000.0
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_skyline" -> """
      WITH m AS (
        SELECT l_returnflag AS rf, l_quantity AS q, max(l_extendedprice) AS p
        FROM lineitem GROUP BY rf, q),
      s AS (
        SELECT rf, q, p,
               max(p) OVER (PARTITION BY rf ORDER BY q DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM m)
      SELECT rf, CAST(q AS DOUBLE) AS q, CAST(round(p, 2) AS DOUBLE) AS p
      FROM s WHERE pm IS NULL OR p > pm ORDER BY rf, q""",

    "q_cohort_ltv" -> """
      WITH o AS (
        SELECT o_custkey, o_totalprice,
               CAST(strftime(o_orderdate, '%Y') AS INT) * 12 +
               CAST(strftime(o_orderdate, '%m') AS INT) - 1 AS m
        FROM orders),
      first AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY o_custkey),
      j AS (SELECT o.o_totalprice, f.cm, o.m - f.cm AS age
            FROM o JOIN first f USING (o_custkey))
      SELECT cm AS cohort_month, CAST(age // 12 AS BIGINT) AS age_years,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue
      FROM j GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_rfm" -> """
      WITH a AS (
        SELECT o_custkey,
               max(epoch_us(o_orderdate)) AS last_us,
               count(*) AS freq,
               sum(CAST(o_totalprice AS DECIMAL(18,4))) AS money
        FROM orders GROUP BY o_custkey),
      s AS (
        SELECT o_custkey,
               CAST(ntile(5) OVER (ORDER BY last_us DESC, o_custkey) AS INT) AS r,
               CAST(ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS INT) AS f,
               CAST(ntile(5) OVER (ORDER BY money DESC, o_custkey) AS INT) AS m
        FROM a)
      SELECT r, f, m, CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY r, f, m ORDER BY r, f, m"""
  )
}
