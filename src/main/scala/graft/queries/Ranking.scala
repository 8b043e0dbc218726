package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels the whole
  * table through ONE task — the textbook global-sort bottleneck at 100 TB.
  * The scale-safe shape is the same two-phase trick a distributed sort uses:
  *
  *  1. `repartitionByRange` on the sort key (range exchange, sampled
  *     boundaries) + `sortWithinPartitions` — a full distributed sort where
  *     partition i holds keys strictly before partition i+1's;
  *  2. `zipWithIndex` — a per-partition count job, then each task offsets
  *     its local index by the preceding partitions' total.
  *
  * Cost note: `zipWithIndex` needs the sorted data TWICE (once to count
  * partition sizes, once to emit), and the count pass would otherwise
  * re-execute the sort pipeline (the range exchange is reused but each
  * partition re-sorts). `localCheckpoint()` pins the sorted partitions at
  * the count job so the emit pass reads materialized blocks instead of
  * re-sorting; the blocks are freed by the ContextCleaner when the RDD is
  * garbage-collected. At 100 TB this trades one extra materialization
  * (disk-backed storage level) for not sorting twice — the right side of
  * the trade whenever the sort is more than a memory-resident scan.
  *
  * The rank values are deterministic as long as the ordering is total (the
  * caller must include a tiebreak column): partition boundaries move with
  * sampling, but a row's global position cannot.
  *
  * This is the one place the engine drops to the RDD API on purpose:
  * per-partition index assignment is genuinely imperative, and Spark ships
  * it only as `RDD.zipWithIndex`.
  */
object Ranking {
  def globalRank(df: DataFrame, order: Seq[Column], partitions: Int,
      rankCol: String = "rank"): DataFrame = {
    val sorted = df.repartitionByRange(partitions, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    // localCheckpoint BEFORE zipWithIndex: zipWithIndex eagerly runs the
    // partition-size count job at construction, which doubles as the
    // checkpoint's materialization pass.
    val pinned = sorted.rdd.localCheckpoint()
    val ranked = pinned.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }
}
