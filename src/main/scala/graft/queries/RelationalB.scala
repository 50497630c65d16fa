package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Relational queries Q15–Q29 of SURVEY.md §2B: window functions (ranking,
  * analytic, frames), top-k, null ordering, set ops, scalar function
  * batteries (string/date/math/array/map/json/conditional), subqueries.
  *
  * Determinism notes: elementwise double arithmetic (lag deltas, sqrt) is
  * IEEE-exact and left unrounded; transcendentals (ln/exp) are libm calls
  * that can differ in the last ulp between engines, so they are rounded to
  * 4 dp; windowed sums go through decimal like all aggregates.
  */
object RelationalB {
  type Q = (SparkSession, String) => DataFrame

  private def custWindow = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  val queries: Map[String, Q] = Map(
    // Q15 — ranking window functions, keep top-3 per customer.
    "q15_window_rank" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          tsStr(col("o_orderdate")).as("o_orderdate"),
          row_number().over(custWindow).as("rn"),
          rank().over(custWindow).as("rnk"),
          dense_rank().over(custWindow).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn", "o_orderkey")
    },

    // Q16 — lag/lead analytics (elementwise double math stays exact).
    "q16_window_lag" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag("o_totalprice", 1).over(custWindow).as("prev_price"),
          lead("o_totalprice", 1).over(custWindow).as("next_price"),
          (col("o_totalprice") - lag("o_totalprice", 1).over(custWindow)).as("delta"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Q17 — window frames: running sum + moving 3-row average.
    "q17_window_frames" -> { (s, dir) =>
      val running = custWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val moving = custWindow.rowsBetween(-2, 0)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          money(sum(dec(col("o_totalprice"))).over(running)).as("running_total"),
          avg6(sum(dec(col("o_totalprice"))).over(moving),
            count(lit(1)).over(moving)).as("moving_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Q18 — top-k with tie-break.
    "q18_topk" -> { (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(money(sum(dec(col("o_totalprice")))).as("revenue"))
        .orderBy(desc("revenue"), asc("o_custkey"))
        .limit(10)
    },

    // Q19 — explicit NULLS LAST multi-key sort over a nullable aggregate.
    "q19_null_order" -> { (s, dir) =>
      t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy(desc_nulls_last("total"), asc("c_name"), asc("c_custkey"))
    },

    // Q20 — union distinct of ids from two tables.
    "q20_union" -> { (s, dir) =>
      t(s, dir, "events").select(col("user_id").as("id"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .distinct().orderBy("id")
    },

    // Q20b — union all, count only.
    "q20b_union_all" -> { (s, dir) =>
      t(s, dir, "events").select(col("user_id").as("id"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .agg(count(lit(1)).as("cnt"))
    },

    // Q21 — intersect.
    "q21_intersect" -> { (s, dir) =>
      t(s, dir, "lineitem").select(col("l_partkey").as("pk"))
        .intersect(t(s, dir, "part").select(col("p_partkey").as("pk")))
        .orderBy("pk")
    },

    // Q21b — except.
    "q21b_except" -> { (s, dir) =>
      t(s, dir, "part").select(col("p_partkey").as("pk"))
        .except(t(s, dir, "lineitem").select(col("l_partkey").as("pk")))
        .orderBy("pk")
    },

    // Q22 — string function battery over part.
    "q22_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          substring(col("p_type"), 1, 5).as("type5"),
          trim(col("p_name")).as("trimmed"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("name_u"),
          length(col("p_name")).as("name_len"),
          col("p_type").like("%BRASS%").as("is_brass"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
          split(col("p_name"), " ").getItem(0).as("first_tok"))
        .orderBy("p_partkey")
    },

    // Q23 — date/time projection battery.
    "q23_date_funcs" -> { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 100)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          tsStr(date_trunc("month", col("o_orderdate"))).as("month_start"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).as("days_to_98"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
        .orderBy("o_orderkey")
    },

    // Q23b — per-month order counts (date_trunc aggregation).
    "q23b_month_counts" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("yr", "mo")
    },

    // Q24 — math function battery (transcendentals rounded to 4 dp).
    "q24_math_funcs" -> { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_quantity") - 25), 4).as("r_abs"),
          floor(col("l_quantity")).cast("long").as("r_floor"),
          ceil(col("l_quantity")).cast("long").as("r_ceil"),
          round(sqrt(col("l_quantity")), 4).as("r_sqrt"),
          round(log(col("l_extendedprice")), 4).as("r_ln"),
          round(exp(col("l_discount")), 4).as("r_exp"),
          round(pow(col("l_quantity"), 2), 4).as("r_pow"),
          round(col("l_quantity") % 7, 4).as("r_mod"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Q25 — array/higher-order functions over embeddings (decimal fold for
    // the order-sensitive sum; oracle keeps outputs scalar).
    "q25_array_funcs" -> { (s, dir) =>
      val emb = col("embedding").cast("array<double>")
      t(s, dir, "embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"),
          size(emb).cast("long").as("dim"),
          round(element_at(emb, 1), 6).as("first_dim"),
          round(aggregate(slice(emb, 1, 8), lit(0).cast("decimal(28,10)"),
            (acc, x) => (acc + x.cast("decimal(28,10)")).cast("decimal(28,10)"))
            .cast("double"), 6).as("sum8"),
          round(element_at(transform(emb, x => x * 2), 2), 6).as("twice_2nd"))
        .orderBy("vec_id")
    },

    // Q26 — map construction + access (oracle side reduces to scalars).
    "q26_map_funcs" -> { (s, dir) =>
      val m = map(lit("type"), col("event_type"), lit("uid"), col("user_id").cast("string"))
      t(s, dir, "events").filter(col("event_id") <= 200)
        .select(col("event_id"),
          element_at(m, "type").as("type_val"),
          element_at(m, "uid").as("uid_val"),
          sort_array(map_keys(m)).getItem(0).as("first_key"),
          size(map_keys(m)).cast("long").as("n_keys"))
        .orderBy("event_id")
    },

    // Q27 — JSON extraction + aggregation (oracle uses regexp so the check
    // does not depend on DuckDB's json extension being loadable offline).
    "q27_json_funcs" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy("event_type")
        .agg(sum(col("k_val")).as("k_sum"), count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // VARIANT semi-structured path (Spark 4): props parses ONCE into the
    // binary variant encoding, then every extraction is a typed binary
    // traversal — at 100 TB this replaces per-expression string
    // re-parsing (q27's get_json_object re-parses the JSON text for each
    // call). Same oracle family as q27: DuckDB extracts from the text.
    "q_variant_json" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), parse_json(col("props")).as("pv"))
        .select(col("event_type"),
          expr("variant_get(pv, '$.k', 'bigint')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("k").as("k_sum"),
          min("k").as("k_min"), max("k").as("k_max"))
        .orderBy("event_type")
    },

    // Q28 — conditional / null-handling functions.
    "q28_conditional" -> { (s, dir) =>
      val joined = t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(money(sum(dec(col("o_totalprice")))).as("total"))
      joined.select(col("c_custkey"),
          when(col("total").isNull, "none")
            .when(col("total") > 200000, "big")
            .otherwise("small").as("bucket"),
          coalesce(col("total"), lit(0.0)).as("total0"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          col("total").isNull.as("no_orders"))
        .orderBy("c_custkey")
    },

    // Q29 — scalar + IN subqueries (Catalyst decorrelation).
    "q29_subqueries" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_q29")
      t(s, dir, "customer").createOrReplaceTempView("customer_q29")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_q29
        WHERE o_totalprice > (SELECT round(avg(o_totalprice), 2) FROM orders_q29)
          AND o_custkey IN (SELECT c_custkey FROM customer_q29 WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey
      """)
    }
  )

  val oracle: Map[String, String] = Map(
    "q15_window_rank" -> """
      SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
               CAST(row_number() OVER w AS INT) AS rn,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      WHERE rn <= 3 ORDER BY o_custkey, rn, o_orderkey""",

    "q16_window_lag" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price,
             o_totalprice - lag(o_totalprice, 1) OVER w AS delta
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "q17_window_frames" -> """
      SELECT o_custkey, o_orderkey,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    "q18_topk" -> """
      SELECT o_custkey,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey
      ORDER BY revenue DESC, o_custkey ASC LIMIT 10""",

    "q19_null_order" -> """
      SELECT c_custkey, c_name,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY total DESC NULLS LAST, c_name ASC, c_custkey ASC""",

    "q20_union" -> """
      SELECT DISTINCT id FROM (
        SELECT user_id AS id FROM events
        UNION ALL SELECT c_custkey AS id FROM customer)
      ORDER BY id""",

    "q20b_union_all" -> """
      SELECT count(*) AS cnt FROM (
        SELECT user_id AS id FROM events
        UNION ALL SELECT c_custkey AS id FROM customer)""",

    "q21_intersect" -> """
      SELECT l_partkey AS pk FROM lineitem
      INTERSECT SELECT p_partkey AS pk FROM part
      ORDER BY pk""",

    "q21b_except" -> """
      SELECT p_partkey AS pk FROM part
      EXCEPT SELECT l_partkey AS pk FROM lineitem
      ORDER BY pk""",

    "q22_string_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS up_name,
             lower(p_brand) AS lo_brand,
             substring(p_type, 1, 5) AS type5,
             trim(p_name) AS trimmed,
             concat_ws('-', p_brand, p_type) AS brand_type,
             replace(p_name, ' ', '_') AS name_u,
             CAST(length(p_name) AS INT) AS name_len,
             p_type LIKE '%BRASS%' AS is_brass,
             coalesce(regexp_extract(p_type, '^(\w+)', 1), '') AS first_word,
             string_split(p_name, ' ')[1] AS first_tok
      FROM part ORDER BY p_partkey""",

    "q23_date_funcs" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(day(o_orderdate) AS INT) AS dy,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
             strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      FROM orders WHERE o_orderkey <= 100
      ORDER BY o_orderkey""",

    "q23b_month_counts" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             count(*) AS cnt,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "q24_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
             round(abs(l_quantity - 25), 4) AS r_abs,
             CAST(floor(l_quantity) AS BIGINT) AS r_floor,
             CAST(ceil(l_quantity) AS BIGINT) AS r_ceil,
             round(sqrt(l_quantity), 4) AS r_sqrt,
             round(ln(l_extendedprice), 4) AS r_ln,
             round(exp(l_discount), 4) AS r_exp,
             round(pow(l_quantity, 2), 4) AS r_pow,
             round(mod(l_quantity, 7), 4) AS r_mod
      FROM lineitem WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber""",

    "q25_array_funcs" -> """
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
             round(CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[])[1:8],
                   x -> CAST(x AS DECIMAL(28,10)))) AS DOUBLE), 6) AS sum8,
             round(CAST(embedding[2] AS DOUBLE) * 2, 6) AS twice_2nd
      FROM embeddings WHERE vec_id < 50
      ORDER BY vec_id""",

    "q26_map_funcs" -> """
      SELECT event_id,
             event_type AS type_val,
             CAST(user_id AS VARCHAR) AS uid_val,
             'type' AS first_key,
             CAST(2 AS BIGINT) AS n_keys
      FROM events WHERE event_id <= 200
      ORDER BY event_id""",

    "q27_json_funcs" -> """
      SELECT event_type,
             CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
             count(*) AS cnt
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_variant_json" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
             CAST(min(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS k_min,
             CAST(max(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS k_max
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q28_conditional" -> """
      WITH agg AS (
        SELECT c_custkey, c_mktsegment,
          CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment)
      SELECT c_custkey,
             CASE WHEN total IS NULL THEN 'none'
                  WHEN total > 200000 THEN 'big'
                  ELSE 'small' END AS bucket,
             coalesce(total, 0.0) AS total0,
             nullif(c_mktsegment, 'BUILDING') AS seg_nb,
             total IS NULL AS no_orders
      FROM agg ORDER BY c_custkey""",

    "q29_subqueries" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (SELECT round(avg(o_totalprice), 2) FROM orders)
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey"""
  )
}
