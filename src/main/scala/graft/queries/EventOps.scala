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
      // n_sessions = max(sess), not countDistinct(sess) (optimization
      // r16): sess is a running sum of 0/1 breaks whose first row is
      // always 1 (prev.isNull), so per user it takes exactly the values
      // 1..K — the distinct count IS the max. max() keeps the aggregate
      // a plain partial-aggregable HashAggregate where the distinct
      // spelling paid the two-phase distinct expansion on (user, sess).
      t(s, dir, "events")
        .withColumn("sess", sum(brk).over(running))
        .groupBy("user_id")
        .agg(max(col("sess")).as("n_sessions"),
          round(count(lit(1)).cast("double") / max(col("sess")), 6)
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
    },

    // Funnel analysis: view → click → purchase, each step strictly after
    // the user's first qualifying previous step. Three conditional-min
    // aggregations chained by broadcastable per-user join — never a
    // per-event self-join. Gap math in integer micros (precision canon).
    "q_funnel" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      // step1/step2 materialized: each step feeds the next step AND its
      // own count, and the unbarriered cascade replayed every upstream
      // step per consumer — 6 corpus scans (ReuseProbe r9); with the two
      // barriers it is one pushed-filter scan per funnel stage. Step
      // times cross the parquet barrier as unix_micros LONGS, not
      // timestamps (ADVICE r9): a timestamp round-trip would make result
      // parity depend on session timezone / inferTimestampNTZ settings,
      // while a long is config-independent (min over unix_micros equals
      // unix_micros of the min ts — monotonic).
      val step1 = graft.core.Materialize(
        ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1")), "funnel-s1")
      val step2 = graft.core.Materialize(
        ev.filter(col("event_type") === "click")
          .join(step1, "user_id")
          .filter(unix_micros(col("ts")) > col("t1"))
          .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t2")), "funnel-s2")
      val step3 = ev.filter(col("event_type") === "purchase")
        .join(step2, "user_id")
        .filter(unix_micros(col("ts")) > col("t2"))
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t3"))
      step1.agg(count(lit(1)).as("users")).select(lit("1_view").as("step"), col("users"))
        .union(step2.agg(count(lit(1)).as("users")).select(lit("2_click").as("step"), col("users")))
        .union(step3.agg(count(lit(1)).as("users")).select(lit("3_purchase").as("step"), col("users")))
        .orderBy("step")
    },

    // Cohort retention: users bucketed by first-seen day, counted on each
    // later active day as a day offset (0..7). Two aggregations (first-day
    // per user, then per-(cohort, offset) distinct users) — the standard
    // retention-matrix shape.
    "q_retention" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort"))
      ev.distinct().join(first, "user_id")
        .withColumn("day_offset",
          ((unix_micros(col("day")) - unix_micros(col("cohort"))) / (86400L * 1000000L))
            .cast("long"))
        .filter(col("day_offset") <= 7)
        .groupBy(tsStr(col("cohort")).as("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Markov transition matrix over per-user event streams: bigram
    // (prev_type → next_type) counts via lag over the (ts, event_id)
    // total order, plus the row-normalized transition probability. One
    // window shuffle on user_id + one ≤|types|²-row aggregation.
    "q_event_transitions" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, dir, "events")
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"))
      val totals = Window.partitionBy("prev_type")
      pairs
        .withColumn("p", round(col("cnt").cast("double")
          / sum("cnt").over(totals), 6))
        .orderBy("prev_type", "next_type")
    },

    // Half-life decayed engagement score per user, fully deterministic:
    // weight for an event k days before the corpus's last day is 2^-k
    // (floored at k = 20), applied as an INTEGER product — value enters
    // as the proven DECIMAL(18,4) canon scaled to int units, the decay
    // as a left-shift of the complement (iv · 2^(20-k)) — so the
    // per-user sum is exact 64-bit arithmetic in both engines and no
    // libm exp()/pow() ulp ever reaches a rounding boundary. The anchor
    // day rides along as a 1-row cross-joined scalar (never collected).
    "q_decay_sum" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          (dec(col("value")) * 10000).cast("long").as("iv"),
          unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      val anchor = ev.agg(max("day_us").as("anchor_us"))
      ev.crossJoin(anchor)
        .withColumn("k", least(
          ((col("anchor_us") - col("day_us")) / (86400L * 1000000L)).cast("int"),
          lit(20)))
        .withColumn("term", col("iv") * expr("shiftleft(CAST(1 AS BIGINT), 20 - k)"))
        .groupBy("user_id")
        .agg(round(sum("term").cast("double") / (1048576.0 * 10000.0), 6)
          .as("decay_score"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // Session-path mining: the q34 sessionization logic (30-min gap
    // break) reduced to per-session event-type paths, then the top-20
    // most common journeys. The path string is built by an ordered
    // in-session aggregation; distinct journeys are few, so the final
    // count shuffle is tiny. Paths are capped at the first 8 events
    // (bounded row width — an unbounded concat would grow with the
    // longest session at 100 TB).
    "q_session_paths" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag("ts", 1).over(w)
      val brk = when(prev.isNull ||
        unix_micros(col("ts")) - unix_micros(prev) > 1800L * 1000000L, 1).otherwise(0)
      t(s, dir, "events")
        .withColumn("sess", sum(brk).over(running))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")))
        .filter(col("rn") <= 8)
        .groupBy("user_id", "sess")
        .agg(array_join(transform(array_sort(collect_list(
          struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(desc("n_sessions"), asc("path"))
        .limit(20)
    },

    // Winsorized robust stats: clip value at the per-type p01/p99
    // (interpolated percentiles, the q_percentiles canon) and aggregate
    // the clipped column with the decimal-sum canon. The percentile
    // table is |types| rows — broadcast back, so the corpus is scanned
    // twice but never shuffled beyond the two tiny aggs.
    "q_winsorize" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val pcts = ev.groupBy("event_type").agg(
        expr("percentile_cont(0.01) WITHIN GROUP (ORDER BY value)").as("p01"),
        expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY value)").as("p99"))
      ev.join(broadcast(pcts), "event_type")
        .select(col("event_type"),
          greatest(col("p01"), least(col("p99"), col("value"))).as("cv"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("cv")))).as("wins_sum"),
          avg6(sum(dec(col("cv"))), count(lit(1))).as("wins_mean"),
          round(min("cv"), 4).as("wins_min"),
          round(max("cv"), 4).as("wins_max"))
        .orderBy("event_type")
    },

    // Daily-count anomaly flags: z-score of each day's per-type event
    // count against the type's own daily series (mean + sample std), the
    // monitoring pass that catches ingest spikes/outages. The daily table
    // is days×types rows, so the stats agg and the join back are tiny and
    // broadcast; the corpus is scanned once. Days beyond 2σ are emitted
    // (σ = 0 series yield null z in both engines and drop out).
    "q_anomaly_zscore" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val stats = daily.groupBy("event_type")
        .agg(avg("cnt").as("mu"), stddev_samp("cnt").as("sigma"))
      daily.join(broadcast(stats), "event_type")
        .filter(abs(col("cnt") - col("mu")) > lit(2.0) * col("sigma"))
        .select(col("event_type"), tsStr(col("day")).as("day"), col("cnt"),
          round((col("cnt") - col("mu")) / col("sigma"), 6).as("z"))
        .orderBy("event_type", "day")
    },

    // Debounce dedup: an event is dropped when the SAME user fired the
    // SAME type within the 5 preceding minutes — the log-dedup pass that
    // kills double-clicks and retry storms before sessionization. One
    // lag window on (user_id, event_type); gap math in integer micros
    // (the precision canon), counts partial-aggregable.
    "q_debounce_dedup" -> { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val dropped = col("gap_us").isNotNull &&
        col("gap_us") <= lit(300L * 1000000L)
      t(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(dropped, 1L).otherwise(0L)).as("n_dropped"),
          (count(lit(1)) - sum(when(dropped, 1L).otherwise(0L))).as("n_kept"))
        .orderBy("event_type")
    },

    // Robust outlier profile: per-type median and MAD (median absolute
    // deviation), flagging values past the 3σ-equivalent robust z
    // (3·1.4826·MAD) — the outlier detector that, unlike q_anomaly_zscore,
    // a few huge values cannot drag. Exact MAD is inherently two-pass
    // (group medians, then deviation medians); both join-backs broadcast
    // a |types|-row table, so the corpus is scanned twice and never
    // shuffled. The flag compares on a 9-dp rounded margin so both
    // engines decide from the same grain.
    "q_mad_outliers" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      // med materialized (4 rows): dev is consumed by the MAD percentile
      // AND the final flag pass, and each unbarriered replay recomputed
      // the exact-median percentile over the corpus (ReuseProbe r9).
      // dev itself stays unbarriered — corpus-sized, and its replay is a
      // projection + broadcast join riding a scan that must happen anyway.
      val med = graft.core.Materialize(
        ev.groupBy("event_type")
          .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").as("med")),
        "mad-med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(max("med"), 6).as("med"),
          round(max("mad"), 6).as("mad"),
          sum(when(round(col("adev") - lit(4.4478) * col("mad"), 9) > 0,
            1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },

    // Equi-depth (decile) discretization per event type — the feature
    // binning a training pipeline runs before bucketized embeddings or
    // monotonic-binning models: ntile(10) over value (event_id
    // tie-break, both engines' ntile splits remainder to the leading
    // buckets) then per-bucket bounds + mass. One window exchange on
    // event_type; at 100 TB the T-class variant swaps the exact sort for
    // approx_percentile cut points.
    "q_equidepth_bins" -> { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("cnt"),
          round(min("value"), 4).as("lo"),
          round(max("value"), 4).as("hi"),
          money(sum(dec(col("value")))).as("sum_value"))
        .orderBy("event_type", "decile")
    },

    // Fixed-width value histogram per event type (bin = 50 units): the
    // distribution profiler. Map-side projection + one small agg.
    "q_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 50).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"),
          money(sum(dec(col("value")))).as("sum_value"))
        .orderBy("event_type", "bin")
    },

    // Day-spine gap filling: a generated calendar spine (sequence over
    // the corpus min..max day) cross-joined with the type dimension,
    // left-joined to actual per-day counts — gap days surface as
    // explicit zero rows (the shape every monitoring rollup needs; the
    // spine is generated, never scanned).
    "q_day_spine" -> { (s, dir) =>
      // One corpus pass: the day bounds and the type dimension are both
      // derivable from the materialized (day, type) aggregate — the
      // unbarriered spelling scanned events three times (ReuseProbe r9).
      val actual = graft.core.Materialize(
        t(s, dir, "events")
          .select(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("n")),
        "dayspine-actual")
      val spine = actual.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
      val types = actual.select("event_type").distinct()
      spine.crossJoin(types)
        .join(actual, Seq("day", "event_type"), "left")
        .select(tsStr(col("day")).as("day"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("cnt"))
        .orderBy("day", "event_type")
    },

    // SCD Type-2 dimension build: each user's event_type is the
    // slowly-changing attribute; consecutive same-type runs collapse to
    // one version row [valid_from, valid_to) with the latest version
    // open (valid_to NULL) — the warehouse dimension-history operator
    // (q_merge_upsert's read-side twin). Change detection is one lag
    // window, run collapse a groupBy over the running change count,
    // interval close one lead window — every exchange hashes on user_id,
    // so at 100 TB the key partitioning is established once and reused
    // by AQE across all three steps. Output is the per-state version
    // profile; dwell math in integer micros (precision canon).
    "q_scd2_dim" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val prev = lag("event_type", 1).over(w)
      val chg = when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L)
      val closed = col("valid_to").isNotNull
      val scd = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("ver",
          sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "ver")
        .agg(min("event_type").as("state"), min("ts").as("valid_from"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to",
          lead("valid_from", 1).over(Window.partitionBy("user_id").orderBy("ver")))
      scd.groupBy("state")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
          sum("n_events").as("n_events"),
          round(sum(when(closed,
              unix_micros(col("valid_to")) - unix_micros(col("valid_from"))))
              .cast("double")
            / sum(when(closed, 1L).otherwise(0L)) / 1000000d, 6)
            .as("avg_closed_s"))
        .orderBy("state")
    },

    // Interval→bucket expansion: 30-min-gap sessions become hour-bucket
    // rows via sequence+explode, so "how many sessions were live in hour
    // h" is an equi-key aggregation instead of an interval join — the
    // scale path for interval overlap against a time grid (a range join
    // spine×sessions would BNLJ; here fan-out is bounded by session
    // duration in hours, and the count never shuffles session payloads).
    "q_session_concurrency" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val prev = lag("ts", 1).over(w)
      val brk = when(prev.isNull ||
        unix_micros(col("ts")) - unix_micros(prev) > 1800L * 1000000L, 1).otherwise(0)
      t(s, dir, "events")
        .withColumn("sess",
          sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess")
        .agg(min("ts").as("t0"), max("ts").as("t1"))
        .select(explode(sequence(date_trunc("hour", col("t0")),
          date_trunc("hour", col("t1")), expr("interval 1 hour"))).as("hour"))
        .groupBy("hour")
        .agg(count(lit(1)).as("live_sessions"))
        .select(tsStr(col("hour")).as("hour"), col("live_sessions"))
        .orderBy("hour")
    },

    // Day-key canon (applies to every `div 86400000000` below): the
    // session timezone is pinned UTC, so unix_micros(date_trunc('DAY',
    // ts)) is an EXACT multiple of 86400000000 — truncating `div` and
    // the oracle's floor `//` agree even for pre-epoch timestamps.
    //
    // OHLC resampling (financial bar aggregation): per (event_type, day),
    // open/close = first/last value in (ts, event_id) order, high/low =
    // max/min, in exact DECIMAL(18,4). One hash exchange on the
    // (event_type, day) key serves both the order windows and the final
    // aggregate — the same single-exchange shape as q_scd2_dim.
    "q_ohlc_resample" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"),
        col("ts"), col("event_id"), col("value").cast("decimal(18,4)").as("v"))
      val wo = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
      val wc = wo.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      ev.withColumn("op", first("v").over(wo))
        .withColumn("cl", last("v").over(wc))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"),
          max("op").cast("double").as("open"),
          max("v").cast("double").as("high"),
          min("v").cast("double").as("low"),
          max("cl").cast("double").as("close"))
        .orderBy("event_type", "day")
    },

    // Linear gap-fill: each user's daily mean value on the user's own
    // [first, last] day spine, missing days linearly interpolated between
    // the neighboring present days. EVERYTHING stays exact int64 — the
    // interpolated value is the rational A/B with
    //   A = sp·nn·(dn−day) + sn·np·(day−dp),  B = np·nn·(dn−dp)
    // (sp/np, sn/nn the neighboring µ-unit daily sums/counts), and the
    // 4-decimal half-up rounding is integer arithmetic, (2A+B) div (2B),
    // so no cross-engine double-rounding boundary exists (values are
    // non-negative by domain). One backward + one forward ignore-nulls
    // window on the user_id exchange the spine join already established.
    // Spine fan-out is bounded by each user's observed span — never a
    // global date range — so sparse users stay cheap at any corpus size.
    "q_gap_fill" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"),
        (col("value").cast("decimal(18,4)") * 10000).cast("long").as("iv"))
      val daily = ev.groupBy("user_id", "day")
        .agg(sum("iv").as("siv"), count(lit(1)).as("n"))
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val j = spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pday",
          when(col("siv").isNull, lit(null)).otherwise(col("day")))
      val wb = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      j.withColumn("sp", last("siv", ignoreNulls = true).over(wb))
        .withColumn("np", last("n", ignoreNulls = true).over(wb))
        .withColumn("dp", last("pday", ignoreNulls = true).over(wb))
        .withColumn("sn", first("siv", ignoreNulls = true).over(wf))
        .withColumn("nn", first("n", ignoreNulls = true).over(wf))
        .withColumn("dn", first("pday", ignoreNulls = true).over(wf))
        .withColumn("a", when(col("siv").isNotNull, col("siv"))
          .otherwise(col("sp") * col("nn") * (col("dn") - col("day"))
            + col("sn") * col("np") * (col("day") - col("dp"))))
        .withColumn("b", when(col("siv").isNotNull, col("n"))
          .otherwise(col("np") * col("nn") * (col("dn") - col("dp"))))
        .select(col("user_id"), col("day"),
          (expr("(2 * a + b) div (2 * b)").cast("double") / 10000.0)
            .as("filled"),
          when(col("siv").isNull, 1).otherwise(0).as("interpolated"))
        .orderBy("user_id", "day")
    },

    // Interval union (gaps-and-islands merge): each event opens a 10-min
    // activity interval; overlapping/touching intervals per user merge
    // into blocks, reporting block count and total covered seconds. The
    // island break is `start > running-max(end) over preceding rows` —
    // the running max (not lag) is what makes nested intervals correct.
    // One hash exchange on user_id serves both windows and the two
    // aggregations; interval payloads are 3 longs, never event rows. At
    // 100 TB this is the coverage/SLA primitive: work scales with events
    // per user, and no interval ever meets another except through the
    // per-user sort the window already needs.
    "q_interval_merge" -> { (s, dir) =>
      val holdUs = 600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("s0", "event_id")
      val prevMax = max("s1").over(w.rowsBetween(Window.unboundedPreceding, -1))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) + holdUs).as("s1"))
        .withColumn("brk",
          when(prevMax.isNull || col("s0") > prevMax, 1L).otherwise(0L))
        .withColumn("blk", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "blk")
        .agg(min("s0").as("b0"), max("s1").as("b1"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_blocks"),
          round(sum(col("b1") - col("b0")).cast("double") / 1000000d, 6)
            .as("covered_s"))
        .orderBy("user_id")
    },

    // Time-weighted average value per user: each reading holds until the
    // next one (step interpolation); weights are exact integer µs gaps
    // and values exact 10⁻⁴ units, so the whole TWA is one integer
    // num/den pair up to a single rounded division — the
    // sensor/billing-meter aggregation. Lead window and final agg share
    // one user_id exchange. Single-event users have no observed span and
    // are excluded (documented; the oracle's WHERE mirrors it).
    "q_time_weighted_avg" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast("decimal(18,4)") * 10000).cast("long").as("v"))
        .withColumn("nxt", lead("us", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("user_id")
        .agg(sum(col("v") * (col("nxt") - col("us"))).as("num"),
          sum(col("nxt") - col("us")).as("den"))
        .select(col("user_id"),
          round(col("num").cast("double") / col("den") / 10000d, 6)
            .as("twa"),
          round(col("den").cast("double") / 1000000d, 6).as("obs_s"))
        .orderBy("user_id")
    },

    // Last-touch attribution: each purchase attributes to the user's
    // latest click at-or-before it, IF within a 7-day window — the
    // canonical marketing-attribution shape, and a second consumer of
    // the custom AsOfJoin plan (one merge pass per user, never the
    // purchases×clicks pair blowup a naive range join materializes;
    // the out-of-window check is a post-filter on the unique as-of
    // winner, which is exactly the windowed-max since older clicks are
    // farther out of window). Lag stats in exact integer µs to one
    // rounded division.
    "q_first_touch" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          unix_micros(col("ts")).as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cts"))
        .distinct()
      val winUs = 7L * 86400L * 1000000L
      graft.plans.AsOfJoin.asofLeft(p, c, "user_id", "cu", "pts", "cts")
        .withColumn("att",
          col("cts").isNotNull && col("cts") > col("pts") - winUs)
        .agg(sum(when(col("att"), 1L).otherwise(0L)).as("attributed"),
          sum(when(col("att"), 0L).otherwise(1L)).as("unattributed"),
          round(sum(when(col("att"), col("pts") - col("cts"))).cast("double")
            / sum(when(col("att"), 1L)) / 1000000d, 6).as("avg_lag_s"))
    },

    // Audience overlap: Jaccard similarity of user sets between every
    // event-type pair. The distinct (type, user) projection is the only
    // corpus-sized pass (map-side partial); the self-join fans out by
    // types-per-user (≤ |types|, a constant), and pair/size tables are
    // type-domain-bounded — the cohort-overlap matrix at any scale.
    "q_user_overlap" -> { (s, dir) =>
      // Materialized: ut feeds both self-join sides plus the size table —
      // four corpus scans in the executed plan without it (ReuseProbe).
      val ut = graft.core.Materialize(
        t(s, dir, "events")
          .select(col("event_type").as("t"), col("user_id").as("u")).distinct(),
        "useroverlap-ut")
      val pairs = ut.as("a")
        .join(ut.select(col("t").as("t2"), col("u").as("u2")).as("b"),
          col("u") === col("u2") && col("t") < col("t2"))
        .groupBy(col("t").as("t1"), col("t2"))
        .agg(count(lit(1)).as("inter"))
      val sizes = ut.groupBy(col("t")).agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("n1"))), "t1")
        .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("n2"))), "t2")
        .select(col("t1"), col("t2"), col("inter"), col("n1"), col("n2"),
          round(col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")), 6).as("jaccard"))
        .orderBy("t1", "t2")
    },

    // Level-shift changepoint (one round of binary segmentation): per
    // event type, the day split maximizing |mean(before) − mean(after)|
    // of the daily value series. Prefix sums ride ONE window over the
    // per-(type, day) pre-aggregation (series length = days, not
    // events), means stay exact integer rationals until the single
    // rounded gap per candidate split — the monitoring primitive for
    // "when did this metric change"; recursing on the two halves is the
    // full segmentation at scale.
    "q_changepoint" -> { (s, dir) =>
      val d = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day"))
        .agg(sum((col("value").cast("decimal(18,4)") * 10000).cast("long"))
          .as("sv"), count(lit(1)).as("c"))
      val ord = Window.partitionBy("event_type").orderBy("day")
      val all = Window.partitionBy("event_type")
      val w = d
        .withColumn("csv", sum("sv").over(ord))
        .withColumn("cc", sum("c").over(ord))
        .withColumn("tsv", sum("sv").over(all))
        .withColumn("tc", sum("c").over(all))
        .withColumn("rn", row_number().over(ord))
        .withColumn("nd", count(lit(1)).over(all))
        .filter(col("rn") < col("nd"))
        .select(col("event_type"), col("day"),
          round(abs(col("csv").cast("double") / col("cc") -
            (col("tsv") - col("csv")).cast("double") / (col("tc") - col("cc")))
            / 10000d, 6).as("gap"))
      val best = Window.partitionBy("event_type")
        .orderBy(desc("gap"), asc("day"))
      w.withColumn("rk", row_number().over(best)).filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("split_day"), col("gap"))
        .orderBy("event_type")
    },

    // Cumulative unique users (the growth curve): first-seen day per
    // user → new-user counts → running total over the active-day spine.
    // Two partial-aggregable shuffles; the cumulative window runs over
    // the DAY domain (calendar-bounded), never user rows.
    "q_cumulative_users" -> { (s, dir) =>
      val dayCol = expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
      // Materialized distinct (user, day): its two consumers (first-seen
      // agg, day spine) would otherwise each replay the corpus scan —
      // ReuseProbe proved the shared subtree is NOT exchange-reused.
      val ud = graft.core.Materialize(
        t(s, dir, "events").select(col("user_id"), dayCol.as("day")).distinct(),
        "cumusers-ud")
      val nd = ud.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val days = ud.select("day").distinct()
      days.join(nd, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_users", sum("new_users").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },

    // DAU / rolling-7-day WAU / stickiness: the rolling DISTINCT count
    // is the classic engagement metric a naive range join (u.day
    // BETWEEN d-6 AND d) turns into a BNLJ at scale. Instead each
    // (user, active day) row is EXPLODED into the ≤ 7 observation days
    // it contributes to (the q_session_concurrency interval→bucket
    // trick) — fixed fan-out, everything equi-keyed, distinct
    // partial-aggregates map-side. The oracle keeps the BETWEEN join:
    // provably the same set.
    "q_rolling_dau" -> { (s, dir) =>
      val dayCol = expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
      // Materialized: ud feeds three consumers (dau, the wau explode,
      // the day spine) and the corpus scan+distinct was replaying per
      // consumer (ReuseProbe: 3 events scans, zero reuse).
      val ud = graft.core.Materialize(
        t(s, dir, "events")
          .select(col("user_id"), dayCol.as("day")).distinct(),
        "rollingdau-ud")
      val days = ud.select("day").distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .distinct()
        .join(days, "day") // only emit real observation days
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("day")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_ohlc_resample" -> """
      WITH ev AS (
        SELECT event_type,
               epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
               ts, event_id, CAST(value AS DECIMAL(18,4)) AS v
        FROM events),
      w AS (
        SELECT event_type, day, v,
               first_value(v) OVER (PARTITION BY event_type, day
                 ORDER BY ts, event_id) AS op,
               last_value(v) OVER (PARTITION BY event_type, day
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS cl
        FROM ev)
      SELECT event_type, day, count(*) AS n,
             CAST(max(op) AS DOUBLE) AS open, CAST(max(v) AS DOUBLE) AS high,
             CAST(min(v) AS DOUBLE) AS low, CAST(max(cl) AS DOUBLE) AS close
      FROM w GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_gap_fill" -> """
      WITH ev AS (
        SELECT user_id,
               epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
               CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS iv
        FROM events),
      daily AS (
        SELECT user_id, day, CAST(sum(iv) AS BIGINT) AS siv, count(*) AS n
        FROM ev GROUP BY 1, 2),
      spans AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      spine AS (
        SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans),
      joined AS (
        SELECT s.user_id, s.day, d.siv, d.n,
          CASE WHEN d.siv IS NULL THEN NULL ELSE s.day END AS pday
        FROM spine s LEFT JOIN daily d USING (user_id, day)),
      ctx AS (
        SELECT user_id, day, siv, n,
          last_value(siv IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp,
          last_value(n IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS np,
          last_value(pday IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dp,
          first_value(siv IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sn,
          first_value(n IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn,
          first_value(pday IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
        FROM joined),
      ab AS (
        SELECT user_id, day, siv,
          CASE WHEN siv IS NOT NULL THEN siv
               ELSE sp * nn * (dn - day) + sn * np * (day - dp) END AS a,
          CASE WHEN siv IS NOT NULL THEN n
               ELSE np * nn * (dn - dp) END AS b
        FROM ctx)
      SELECT user_id, day,
        CAST((2 * a + b) // (2 * b) AS DOUBLE) / 10000.0 AS filled,
        CASE WHEN siv IS NULL THEN 1 ELSE 0 END AS interpolated
      FROM ab ORDER BY user_id, day
    """,
    "q_funnel" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(t1)
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(t2)
             GROUP BY e.user_id)
      SELECT '1_view' AS step, count(*) AS users FROM s1
      UNION ALL SELECT '2_click', count(*) FROM s2
      UNION ALL SELECT '3_purchase', count(*) FROM s3
      ORDER BY step""",

    "q_retention" -> """
      WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      first AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
      SELECT strftime(cohort, '%Y-%m-%d %H:%M:%S') AS cohort_day,
             CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
             count(DISTINCT user_id) AS active_users
      FROM d JOIN first USING (user_id)
      WHERE date_diff('day', cohort, day) <= 7
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset""",

    "q_event_transitions" -> """
      WITH pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type,
               event_type AS next_type
        FROM events),
      cnts AS (
        SELECT prev_type, next_type, count(*) AS cnt FROM pairs
        WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, cnt,
             round(CAST(cnt AS DOUBLE)
                     / sum(cnt) OVER (PARTITION BY prev_type), 6) AS p
      FROM cnts ORDER BY prev_type, next_type""",

    "q_decay_sum" -> """
      WITH ev AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS iv,
               epoch_us(date_trunc('day', ts)) AS day_us
        FROM events),
      anchor AS (SELECT max(day_us) AS anchor_us FROM ev),
      terms AS (
        SELECT user_id,
               iv * (CAST(1 AS BIGINT)
                 << (20 - least(CAST((anchor_us - day_us) / 86400000000 AS INT), 20)))
                 AS term
        FROM ev, anchor)
      SELECT user_id,
             round(CAST(sum(term) AS DOUBLE) / (1048576.0 * 10000.0), 6)
               AS decay_score,
             count(*) AS n_events
      FROM terms GROUP BY user_id ORDER BY user_id""",

    "q_session_paths" -> """
      WITH s AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_type, ts, event_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM s),
      numbered AS (
        SELECT user_id, sess, event_type,
               row_number() OVER (PARTITION BY user_id, sess
                                  ORDER BY ts, event_id) AS rn
        FROM sess),
      paths AS (
        SELECT user_id, sess,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM numbered WHERE rn <= 8 GROUP BY user_id, sess)
      SELECT path, count(*) AS n_sessions FROM paths
      GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""",

    "q_equidepth_bins" -> """
      WITH d AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                 ORDER BY value, event_id) AS decile
        FROM events)
      SELECT event_type, decile, count(*) AS cnt,
             round(min(value), 4) AS lo, round(max(value), 4) AS hi,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
      FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_anomaly_zscore" -> """
      WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT event_type, avg(cnt) AS mu, stddev_samp(cnt) AS sigma
        FROM daily GROUP BY 1)
      SELECT d.event_type, strftime(d.day, '%Y-%m-%d %H:%M:%S') AS day,
             d.cnt, round((d.cnt - s.mu) / s.sigma, 6) AS z
      FROM daily d JOIN stats s ON d.event_type = s.event_type
      WHERE abs(d.cnt - s.mu) > 2.0 * s.sigma
      ORDER BY d.event_type, day""",

    "q_debounce_dedup" -> """
      WITH g AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)) AS gap_us
        FROM events)
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CASE WHEN gap_us IS NOT NULL
                            AND gap_us <= 300000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dropped,
             count(*) - CAST(sum(CASE WHEN gap_us IS NOT NULL
                            AND gap_us <= 300000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept
      FROM g GROUP BY 1 ORDER BY 1""",

    "q_mad_outliers" -> """
      WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY 1),
      d AS (
        SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m ON e.event_type = m.event_type),
      mad AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        FROM d GROUP BY 1)
      SELECT d.event_type, count(*) AS n,
             round(max(d.med), 6) AS med,
             round(max(mad.mad), 6) AS mad,
             CAST(sum(CASE WHEN round(adev - 4.4478 * mad.mad, 9) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM d JOIN mad ON d.event_type = mad.event_type
      GROUP BY 1 ORDER BY 1""",

    "q_winsorize" -> """
      WITH pcts AS (
        SELECT event_type,
               percentile_cont(0.01) WITHIN GROUP (ORDER BY value) AS p01,
               percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM events GROUP BY event_type),
      clipped AS (
        SELECT e.event_type,
               greatest(p.p01, least(p.p99, e.value)) AS cv
        FROM events e JOIN pcts p ON e.event_type = p.event_type)
      SELECT event_type, count(*) AS cnt,
             CAST(round(sum(CAST(cv AS DECIMAL(18,4))), 2) AS DOUBLE) AS wins_sum,
             round(CAST(sum(CAST(cv AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6)
               AS wins_mean,
             round(min(cv), 4) AS wins_min, round(max(cv), 4) AS wins_max
      FROM clipped GROUP BY event_type ORDER BY event_type""",

    "q_histogram" -> """
      SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin,
             count(*) AS cnt,
             CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_day_spine" -> """
      WITH ev AS (
        SELECT date_trunc('day', ts) AS day, event_type FROM events),
      spine AS (
        SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))
          AS day FROM ev),
      types AS (SELECT DISTINCT event_type FROM ev),
      actual AS (SELECT day, event_type, count(*) AS n FROM ev GROUP BY 1, 2)
      SELECT strftime(s.day, '%Y-%m-%d %H:%M:%S') AS day, t.event_type,
             coalesce(a.n, 0) AS cnt
      FROM spine s CROSS JOIN types t
      LEFT JOIN actual a ON s.day = a.day AND t.event_type = a.event_type
      ORDER BY day, t.event_type""",

    "q_scd2_dim" -> """
      WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN prev IS NULL OR prev <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM o),
      runs AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS ver
        FROM f),
      scd AS (
        SELECT user_id, ver, min(event_type) AS state,
               min(ts) AS valid_from, count(*) AS n_events
        FROM runs GROUP BY user_id, ver),
      iv AS (
        SELECT state, n_events, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
                 AS valid_to
        FROM scd)
      SELECT state, count(*) AS n_versions,
             CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_current,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             round(CAST(sum(CASE WHEN valid_to IS NOT NULL
                     THEN epoch_us(valid_to) - epoch_us(valid_from) END)
                   AS DOUBLE)
               / sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
               / 1000000, 6) AS avg_closed_s
      FROM iv GROUP BY state ORDER BY state""",

    "q_session_concurrency" -> """
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
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM f),
      iv AS (
        SELECT user_id, sess, min(ts) AS t0, max(ts) AS t1
        FROM sx GROUP BY user_id, sess),
      hours AS (
        SELECT unnest(generate_series(date_trunc('hour', t0),
                 date_trunc('hour', t1), INTERVAL 1 HOUR)) AS hour
        FROM iv)
      SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
             count(*) AS live_sessions
      FROM hours GROUP BY hour ORDER BY hour""",

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
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_interval_merge" -> """
      WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s0,
               epoch_us(ts) + 600000000 AS s1
        FROM events),
      m AS (
        SELECT user_id, event_id, s0, s1,
               max(s1) OVER (PARTITION BY user_id ORDER BY s0, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM iv),
      bl AS (
        SELECT user_id, s0, s1,
               sum(CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s0, event_id
                       ROWS UNBOUNDED PRECEDING) AS blk
        FROM m),
      g AS (SELECT user_id, blk, min(s0) AS b0, max(s1) AS b1
            FROM bl GROUP BY user_id, blk)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_blocks,
             round(CAST(sum(b1 - b0) AS DOUBLE) / 1000000, 6) AS covered_s
      FROM g GROUP BY user_id ORDER BY user_id""",

    "q_time_weighted_avg" -> """
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
        FROM events),
      w AS (
        SELECT user_id, v, us,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        FROM e),
      a AS (
        SELECT user_id, sum(v * (nxt - us)) AS num, sum(nxt - us) AS den
        FROM w WHERE nxt IS NOT NULL GROUP BY user_id)
      SELECT user_id,
             round(CAST(num AS DOUBLE) / den / 10000, 6) AS twa,
             round(CAST(den AS DOUBLE) / 1000000, 6) AS obs_s
      FROM a ORDER BY user_id""",

    "q_first_touch" -> """
      WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS pts
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT DISTINCT user_id AS cu, epoch_us(ts) AS cts
        FROM events WHERE event_type = 'click'),
      j AS (
        SELECT p.pid, p.pts, max(c.cts) AS lc
        FROM p LEFT JOIN c ON p.user_id = c.cu AND c.cts <= p.pts
        GROUP BY p.pid, p.pts),
      f AS (
        SELECT pid, pts,
               CASE WHEN lc IS NOT NULL AND lc > pts - 604800000000
                    THEN lc END AS alc
        FROM j)
      SELECT CAST(count(alc) AS BIGINT) AS attributed,
             CAST(count(*) - count(alc) AS BIGINT) AS unattributed,
             round(CAST(sum(pts - alc) AS DOUBLE) / count(alc) / 1000000, 6)
               AS avg_lag_s
      FROM f""",

    "q_user_overlap" -> """
      WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
      pairs AS (
        SELECT a.t AS t1, b.t AS t2, count(*) AS inter
        FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        GROUP BY a.t, b.t),
      sizes AS (SELECT t, count(*) AS n FROM ut GROUP BY t)
      SELECT t1, t2, inter, s1.n AS n1, s2.n AS n2,
             round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
      FROM pairs JOIN sizes s1 ON t1 = s1.t JOIN sizes s2 ON t2 = s2.t
      ORDER BY t1, t2""",

    "q_changepoint" -> """
      WITH d AS (
        SELECT event_type,
               epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
               sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS sv,
               count(*) AS c
        FROM events GROUP BY 1, 2),
      w AS (
        SELECT event_type, day, sv, c,
               sum(sv) OVER (PARTITION BY event_type ORDER BY day) AS csv,
               sum(c)  OVER (PARTITION BY event_type ORDER BY day) AS cc,
               sum(sv) OVER (PARTITION BY event_type) AS tsv,
               sum(c)  OVER (PARTITION BY event_type) AS tc,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM d),
      s AS (
        SELECT event_type, day,
               round(abs(CAST(csv AS DOUBLE) / cc -
                 CAST(tsv - csv AS DOUBLE) / (tc - cc)) / 10000, 6) AS gap
        FROM w WHERE rn < nd),
      b AS (
        SELECT event_type, day, gap,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY gap DESC, day) AS rk
        FROM s)
      SELECT event_type, day AS split_day, gap FROM b WHERE rk = 1
      ORDER BY event_type""",

    "q_cumulative_users" -> """
      WITH ud AS (
        SELECT user_id,
               min(epoch_us(date_trunc('day', ts)) // 86400000000) AS fd
        FROM events GROUP BY user_id),
      nd AS (SELECT fd AS day, count(*) AS new_users FROM ud GROUP BY fd),
      days AS (SELECT DISTINCT epoch_us(date_trunc('day', ts)) // 86400000000
                      AS day FROM events)
      SELECT d.day, CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
             CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM days d LEFT JOIN nd n USING (day) ORDER BY d.day""",

    "q_rolling_dau" -> """
      WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(date_trunc('day', ts)) // 86400000000 AS day
        FROM events),
      days AS (SELECT DISTINCT day FROM ud),
      roll AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
      SELECT d.day, dau.dau, roll.wau,
             round(CAST(dau.dau AS DOUBLE) / roll.wau, 6) AS stickiness
      FROM days d JOIN dau USING (day) JOIN roll USING (day)
      ORDER BY d.day"""
  )
}
