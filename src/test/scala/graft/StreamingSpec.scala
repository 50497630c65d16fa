package graft

import org.apache.spark.sql.functions._
import graft.queries.EventOps
import graft.streaming.StreamingOps

/** Streaming batch-equivalence inside Spark (SURVEY.md §5 item 4): the
  * replayed streaming results must equal their H-verified batch twins. */
class StreamingSpec extends SparkSpec {

  test("q38 tumbling windows equal the batch hourly buckets") {
    val streamRows = StreamingOps.q38(spark, sf).collect().toSeq
    val batchRows = EventOps.queries("q35_hourly_buckets")(spark, sf).collect().toSeq
    assert(streamRows == batchRows)
  }

  test("q40 session windows equal the batch sessionization counts") {
    val streamRows = StreamingOps.q40(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batchRows = EventOps.queries("q34_sessionization")(spark, sf)
      .select("user_id", "n_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamRows == batchRows)
  }

  test("foreachBatch sink equals the batch per-type counts") {
    val streamRows = StreamingOps.qForeachBatch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batchRows = graft.core.Tables.t(spark, sf, "events")
      .groupBy("event_type").count().orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamRows == batchRows)
  }

  test("stream-stream interval join equals the batch self-join") {
    val streamRows = StreamingOps.qStreamStreamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.core.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val batchRows = ev.toDF("lid", "luser", "lts")
      .join(ev.toDF("rid", "ruser", "rts"),
        col("luser") === col("ruser") && col("rts") >= col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 5 MINUTES") &&
        col("lid") < col("rid"))
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamRows == batchRows)
  }

  test("q41 dedup collapses replayed duplicates to the distinct count") {
    val row = StreamingOps.q41(spark, sf).collect().head
    assert(row.getLong(0) == row.getLong(1),
      "emitted rows must equal distinct event ids (duplicates dropped)")
  }
}
