package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every query receives `sfDir` (e.g. /root/testdata/sf0.01) and reads the
  * tables it needs; Catalyst prunes columns/filters down to the parquet scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")

  /** events.ts has shipped under THREE physical encodings across driver data
    * generations: TIMESTAMP(NANOS) (readable only as int64 under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), timestamp[us] without a
    * zone (loads as TIMESTAMP_NTZ), and zone-adjusted timestamp[us] (loads
    * as TIMESTAMP). Branch on the LOADED dtype and normalize every encoding
    * to the engine's canonical representation — epoch micros as BIGINT,
    * matching the oracles' `epoch_us(ts)` — so a future encoding drift fails
    * loudly in the default branch instead of silently mis-scaling every
    * timestamp (the round-7 regression: a pinned nanos assumption turned
    * fresh micros data into 1000x-shrunk event times). */
  def normalizeTsMicros(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", expr("ts div 1000")) // int64 nanos
    case TimestampType => df.withColumn("ts", unix_micros(col("ts")))
    case TimestampNTZType =>
      // the NTZ→TZ cast reads wall-clock time in the session zone; graft
      // session builders pin UTC, which is also how DuckDB's epoch_us(ts)
      // interprets a naive timestamp — same integer on both sides
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)))
    case other =>
      throw new IllegalStateException(
        s"events.ts: unhandled physical encoding $other — extend Tables.normalizeTsMicros")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == TimestampNTZType)
      require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
        "events.ts is TIMESTAMP_NTZ: set spark.sql.session.timeZone=UTC at session " +
          "build so the epoch-micros normalization matches the oracle's epoch_us")
    normalizeTsMicros(df)
  }

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
