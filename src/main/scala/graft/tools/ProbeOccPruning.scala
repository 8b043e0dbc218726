package graft.tools

import org.apache.spark.sql.SparkSession

/** Bucket-layout pruning probe for the canonical-substring occurrence
  * index (round-16 measurement; r14 item 5's second half): prints, per
  * candidate bucket count, the partition directories an ingest's probe
  * lists and the fraction of stored base occurrences behind them — the
  * reading that says what the corpus-derived occBucketCount actually buys
  * over the old fixed 64 at the 400k fixture.
  *
  * Usage: ProbeOccPruning <dir> [ingestEvery,...] [nBkt,...]
  *   ingestEvery defaults to "5,5000": 5 replays the registered entries'
  *   20% delta slice (saturates any layout), 5000 models a production
  *   daily ingest whose span count does not grow with the corpus.
  *   nBkt defaults to "64,<derived>" (the r14 constant vs the tier
  *   occBucketCount derives for this corpus).
  */
object ProbeOccPruning {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val ingests = if (args.length > 1) args(1).split(',').toSeq.map(_.toLong)
      else Seq(5L, 5000L)
    val derived = graft.queries.LlmText.occBucketCount(d)
    val nBkts = if (args.length > 2) args(2).split(',').toSeq.map(_.toInt)
      else Seq(64, derived).distinct
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"# occBucketCount($d) derives $derived")
    for (ev <- ingests) {
      graft.queries.LlmText.occPruningReport(spark, d, nBkts, ev)
        .collect().foreach { r =>
          println(s"OCC_PRUNE dir=$d ingest_every=${r.getLong(1)} " +
            s"n_bkt=${r.getInt(0)} ingest_spans=${r.getLong(2)} " +
            s"touched_bkts=${r.getInt(3)} rows_touched=${r.getLong(4)} " +
            s"rows_total=${r.getLong(5)} " +
            f"scan_fraction=${r.getDouble(6)}%.4f")
        }
    }
    spark.stop()
  }
}
