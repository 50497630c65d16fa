package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Bucketed co-located join: both fact tables are written bucketed and
  * sorted on the join key, so the sort-merge join reads bucket-aligned
  * files and needs NO shuffle exchange and NO sort on either side — the
  * pattern that amortizes one write-time shuffle across every subsequent
  * join at 100 TB. BucketedJoinSpec asserts the exchange-free plan;
  * the registry query H-checks result parity with the plain join oracle.
  *
  * Bucketing requires catalog tables (path-based writes cannot record
  * bucket metadata); tables land in the session's warehouse and are
  * overwritten per call.
  */
object BucketedJoin {
  val BUCKETS = 8

  /** Write both sides bucketed on the join key, return the bucket-aligned
    * join frame. */
  /** Drop the table and its warehouse location. A fresh session's
    * in-memory catalog forgets tables from prior runs but their managed
    * locations persist, and CREATE then fails with
    * LOCATION_ALREADY_EXISTS — so remove the directory explicitly. */
  private def reset(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
    val path = new org.apache.hadoop.fs.Path(warehouse.getPath, table)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  def bucketedJoin(s: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTable: String, rightTable: String): DataFrame = {
    reset(s, leftTable)
    reset(s, rightTable)
    left.write.mode(SaveMode.Overwrite)
      .bucketBy(BUCKETS, leftKey).sortBy(leftKey).saveAsTable(leftTable)
    right.write.mode(SaveMode.Overwrite)
      .bucketBy(BUCKETS, rightKey).sortBy(rightKey).saveAsTable(rightTable)
    s.table(leftTable).join(s.table(rightTable), col(leftKey) === col(rightKey))
  }

  def query(s: SparkSession, dir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
    bucketedJoin(s,
        t(s, dir, "lineitem"), t(s, dir, "orders"),
        "l_orderkey", "o_orderkey", "graft_lineitem_b", "graft_orders_b")
      .groupBy("o_orderstatus")
      .agg(money(sum(rev)).as("revenue"), count(lit(1)).as("line_cnt"))
      .orderBy("o_orderstatus")
  }

  /** Same result as the unsalted/unbucketed join. */
  val oracle: String = SaltedJoin.oracle
}
