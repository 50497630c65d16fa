package graft

import org.apache.spark.sql.functions._
import graft.queries.LayoutOps

/** The z-order LAYOUT application, not just the key: range-partitioning
  * lineitem by the Morton key and sorting within partitions must yield
  * files whose z-ranges are pairwise disjoint and whose per-partition
  * (part, supp) min/max rectangles are bounded — exactly the property
  * file-statistics pruning consumes after an OPTIMIZE ZORDER rewrite.
  *
  * Also the incremental-rollup merge identity: aggregating two disjoint
  * day-halves of the events table and merging the partials (sum-of-sums,
  * sum-of-counts) must equal the direct full aggregation — the algebraic
  * property every incremental materialized view at 100 TB depends on
  * (partial aggregation is exactly this identity applied per-partition).
  */
class LayoutWriteSpec extends SparkSpec {

  test("range-partitioned z-order write yields disjoint per-partition z-ranges") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("z", LayoutOps.zorder(col("l_partkey"), col("l_suppkey")))
    val parts = li.repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .select(spark_partition_id().as("pid"), col("z"))
      .groupBy("pid").agg(min("z").as("zmin"), max("z").as("zmax"),
        count(lit(1)).as("n"))
      .orderBy("pid").collect()
    assert(parts.length > 1, "expected multiple range partitions")
    // Ranges are disjoint and ordered: partition i's max < partition
    // i+1's min (range partitioner guarantees it; this pins the layout
    // contract the pruning argument depends on).
    parts.sliding(2).foreach { w =>
      assert(w(0).getLong(2) < w(1).getLong(1),
        s"overlapping z-ranges: ${w(0)} vs ${w(1)}")
    }
    // No partition is empty and no partition holds >2x the fair share
    // (range partitioning on the key stays balanced on this data).
    val total = parts.map(_.getLong(3)).sum
    parts.foreach { p =>
      assert(p.getLong(3) > 0)
      assert(p.getLong(3) < 2L * total / parts.length.toLong + 1,
        s"partition ${p.getInt(0)} skewed: $p")
    }
  }

  test("incremental rollup merge equals direct aggregation") {
    val ev = graft.core.Tables.t(spark, sf, "events")
      .selectExpr("event_type", "value", "date_trunc('day', ts) AS day")
    val mid = new java.sql.Timestamp(ev
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY unix_micros(day))"))
      .head().getDouble(0).toLong / 1000)
    // Two disjoint increments (day <= mid / day > mid), each rolled up
    // to (event_type) partials with the decimal-sum canon.
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(sum(col("value").cast("decimal(18,4)")).as("s"),
          count(lit(1)).as("c"))
    val merged = partial(ev.filter(col("day") <= mid))
      .unionByName(partial(ev.filter(col("day") > mid)))
      .groupBy("event_type")
      .agg(sum("s").as("s"), sum("c").as("c"))
      .select(col("event_type"), round(col("s").cast("double"), 2).as("total"),
        col("c"))
      .orderBy("event_type").collect()
    val direct = partial(ev)
      .select(col("event_type"), round(col("s").cast("double"), 2).as("total"),
        col("c"))
      .orderBy("event_type").collect()
    assert(merged.map(_.toString).toSeq == direct.map(_.toString).toSeq,
      "incremental merge must equal direct aggregation")
  }
}
