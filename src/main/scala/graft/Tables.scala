package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read nanos as long and normalize to epoch micros (the data has
    * no sub-microsecond component, so this matches DuckDB's TIMESTAMP view
    * value- and order-wise). Requires `spark.sql.legacy.parquet.nanosAsLong`
    * =true, set once at session construction (Bench/Verify/Smoke/SparkSpec
    * builders) — a loader must not mutate session-global conf as a side
    * effect of building a query. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.parquet")
    table(s, d, "events").withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
