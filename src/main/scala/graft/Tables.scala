package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, max, min, unix_micros}
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
      // int64 carries no unit: the div-1000 above ASSUMES nanos, and an
      // int64-MICROS generation would silently shrink every timestamp 1000x
      // — the exact regression class this loader exists to prevent. Callers
      // that know the source path run checkInt64Nanos first (events below);
      // the magnitude window there turns unit ambiguity into a loud failure.
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

  /** One bounded min/max probe per (process, path): the int64 branch of
    * [[normalizeTsMicros]] assumes NANOS, and a fourth plausible encoding —
    * int64 MICROS — would pass the dtype branch and silently shrink every
    * timestamp 1000x. Epoch-nanos for any post-1973 / pre-2096 instant lies
    * in [1e17, 4e18); epoch-MICROS data (~1.7e15) falls three decades below
    * the window and epoch-millis further still, so either mis-encoding fails
    * loudly here instead of corrupting every event-time operator. Cached per
    * path: one tiny agg job per process, not one per query construction. */
  private val int64TsChecked =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private def checkInt64Nanos(df: DataFrame, path: String): Unit =
    int64TsChecked.getOrElseUpdate(path, {
      val r = df.agg(min(col("ts")), max(col("ts"))).head()
      if (!r.isNullAt(0)) {
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        require(lo >= 100000000000000000L && hi < 4000000000000000000L,
          s"events.ts is int64 with range [$lo, $hi] — not plausible " +
            "epoch-NANOS (expected [1e17, 4e18) ~ years 1973-2096). A micros/" +
            "millis int64 encoding needs its own Tables.normalizeTsMicros branch.")
      }
      true
    })

  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => checkInt64Nanos(df, s"$d/events.parquet")
      case TimestampNTZType =>
        require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events.ts is TIMESTAMP_NTZ: set spark.sql.session.timeZone=UTC at session " +
            "build so the epoch-micros normalization matches the oracle's epoch_us")
      case _ => ()
    }
    normalizeTsMicros(df)
  }

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Parallelism floor for per-row-EXPENSIVE consumers of a small scan.
    *
    * The driver's testdata ships each table as ONE single-row-group parquet
    * file, so every scan is one unsplittable partition and everything fused
    * into the scan stage — codec round-trips, brute-force scoring,
    * tokenize passes, partial aggregation — runs on one core of the 32
    * (r16 stage profile: `sim_rrf_topk`'s scoring stage = 1.5 s on 1 task,
    * 31 cores idle; the whole bench showed near-flat core scaling). This is
    * the unsplittable-input case of the optimization guide (§2.5): fix by
    * repartitioning immediately after the read. Round-robin, so no skew by
    * construction, and `sortBeforeRepartition` (on by default) keeps the
    * row-to-partition assignment deterministic under task retry.
    *
    * SCALE SHAPE: the floor is `defaultParallelism` (the session's core
    * count — the driver benches at several core counts and a cluster run
    * inherits its own), and a scan that already has at least that many
    * splits — any realistically-sized input — passes through UNTOUCHED, so
    * at 100 TB this is a no-op gate, never an added shuffle. Apply ONLY
    * where the downstream per-row work dominates the one small exchange;
    * a cheap scan→filter→project query keeps its shuffle-free plan. */
  def widened(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // PRECONDITION: pass a scan (or filtered/projected scan), nothing with
    // an exchange below — `df.rdd` on a multi-stage AQE plan eagerly runs
    // the upstream shuffle stages at construction time (real jobs, even
    // though construction is untimed). For a bare scan the probe is
    // plan-time only (no job). Every current caller passes a Tables.*
    // scan; keep it that way.
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
