package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + result-canonicalization helpers shared by every query.
  *
  * Canonicalization rules (SURVEY.md §2B determinism canon): monetary /
  * double aggregates are computed over exact DECIMAL(18,4) casts so the sum
  * is order-independent (a plain double sum differs between Spark's partial
  * aggregation tree and DuckDB's sequential sum); the final value is rounded
  * and cast back to double. Every query ends in a total ORDER BY with a
  * unique tie-break key. Timestamps leave the engine as UTC-formatted
  * strings.
  */
object Tables {

  /** Load one driver testdata table (TESTDATA.md layout).
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects outright; read it as a long (nanos since epoch) and floor-divide
    * to micros — the same truncation DuckDB applies when it loads the file
    * into its microsecond TIMESTAMP, so both engines see identical values.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // Two layouts exist: the driver fixture's TIMESTAMP(NANOS), which the
      // conf above surfaces as a nanos long, and ScaleData's sf1+ tables,
      // already TIMESTAMP micros on disk (so DuckDB can oracle the events
      // family at scale). Branch on the read dtype; both end as identical
      // µs-truncated timestamps.
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a double column — makes aggregation
    * order-independent and engine-portable. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Canonical money output: round(2) then back to double. Apply AFTER the
    * decimal aggregate. */
  def money(c: Column): Column = round(c, 2).cast("double")

  /** Canonical mean: exact decimal sum cast to double, divided by count,
    * rounded to 6 dp. IEEE double division is deterministic across engines;
    * the decimal sum removes aggregation-order dependence. */
  def avg6(sumDec: Column, cnt: Column): Column =
    round(sumDec.cast("double") / cnt, 6)

  /** Canonical UTC timestamp rendering for result sets. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
