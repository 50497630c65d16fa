package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Event-stream batch analytics (SURVEY.md §2B Q34/Q35): sessionization
  * via lag + running break-flag sum, and the tumbling-window batch twin
  * that the streaming queries (graft.streaming) are equivalence-checked
  * against. Gap arithmetic is done in integer micros on both engines
  * (`unix_micros` / `epoch_us`) so no timestamp-precision drift exists.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q34 — sessionization: 30-min gap breaks; session count + avg
    // events/session per user.
    "q34_sessionization" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag("ts", 1).over(w)
      val brk = when(prev.isNull ||
        unix_micros(col("ts")) - unix_micros(prev) > 1800L * 1000000L, 1).otherwise(0)
      t(s, dir, "events")
        .withColumn("sess", sum(brk).over(running))
        .groupBy("user_id")
        .agg(countDistinct(col("sess")).as("n_sessions"),
          round(count(lit(1)).cast("double") / countDistinct(col("sess")), 6)
            .as("avg_sess_events"))
        .orderBy("user_id")
    },

    // Q35 — hourly tumbling bucket × event_type (batch twin of Q38).
    "q35_hourly_buckets" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(tsStr(date_trunc("hour", col("ts"))).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("value")))).as("sum_value"))
        .orderBy("hour_start", "event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "q34_sessionization" -> """
      WITH o AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev IS NULL
                      OR epoch_us(ts) - epoch_us(prev) > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM o),
      sx AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM f)
      SELECT user_id,
             count(DISTINCT sess) AS n_sessions,
             round(CAST(count(*) AS DOUBLE) / count(DISTINCT sess), 6) AS avg_sess_events
      FROM sx GROUP BY user_id ORDER BY user_id""",

    "q35_hourly_buckets" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type, count(*) AS cnt,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
