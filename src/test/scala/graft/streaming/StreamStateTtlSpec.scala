package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded-state PROOF for the two corpus-global stream drains' TTL
  * variants — closing the one streaming claim that was documented
  * (SCALE.md production-TTL notes) rather than demonstrated. Each test
  * drives a 12-day synthetic stream, one micro-batch per day, with a
  * fixed number of fresh keys per day, and asserts from the query's own
  * progress metrics that the state-row count PLATEAUS at the TTL-horizon
  * size instead of growing with corpus length — plus the semantic half
  * of the trade: a duplicate recurring beyond the horizon is treated as
  * new (not paired / kept again), while in-horizon behavior matches the
  * exact drains. */
class StreamStateTtlSpec extends SparkSpec {

  private val DayMs = 86400L * 1000L
  // keep the synthetic timeline clear of epoch 0: the initial watermark is
  // 0, and day-0 rows stamped exactly 0 land on the late-row boundary
  private val T0 = 30L * DayMs

  /** numRowsTotal of the single state operator, one reading per batch. */
  private def stateSeries(q: StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal)

  test("minhash TTL buckets plateau at the horizon and drop cross-horizon pairs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keysPerDay = 20
    val days = 12
    val in = MemoryStream[(Long, Int, Long, Timestamp)]
    val out = EventStreams.minhashCandidatesTtl(
      in.toDF().toDF("doc_id", "band_id", "sig", "ts"),
      watermark = "1 hour", ttlMs = DayMs)
    val q = out.toDF("id_a", "id_b")
      .writeStream.format("memory").queryName("ttl_minhash")
      .outputMode("append").start()
    try {
      (0 until days).foreach { day =>
        val ts = new Timestamp(T0 + day * DayMs)
        // keysPerDay fresh buckets; bucket 0 of each day holds TWO docs
        // (an in-horizon near-dup pair), the rest one
        val rows = (0 until keysPerDay).flatMap { k =>
          val sig = day * 1000L + k
          val id = day * 100L + k
          if (k == 0) Seq((id, 0, sig, ts), (id + 50, 0, sig, ts))
          else Seq((id, 0, sig, ts))
        } ++ (if (day == 8)
          // day 8 re-presents DAY 1's bucket sig 1*1000+5: seven days past
          // the 1-day TTL, so its day-1 occupant has aged out and NO pair
          // may be emitted for it
          Seq((9999L, 0, 1005L, ts))
        else Seq.empty)
        in.addData(rows: _*)
        q.processAllAvailable()
      }
      val series = stateSeries(q)
      assert(series.nonEmpty, "no state-operator progress recorded")
      val totalKeys = days.toLong * keysPerDay + 1
      // PLATEAU: state never approaches corpus-size key count, and the
      // tail of the series has stopped growing (late max <= early max)
      // +1: the day-8 cross-horizon probe key lives in state for one TTL
      assert(series.max <= 3L * keysPerDay + 1,
        s"state grew with the corpus instead of the horizon: $series")
      assert(series.max < totalKeys / 2, s"no aging visible: $series")
      val (early, late) = series.splitAt(series.length / 2)
      assert(late.max <= early.max + 1,
        s"state still growing in the second half: $series")
      val pairs = spark.table("ttl_minhash")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // in-horizon pairs: bucket 0 of every day pairs its two docs
      (0 until days).foreach { day =>
        assert(pairs.contains((day * 100L, day * 100L + 50)),
          s"in-horizon pair of day $day missing")
      }
      // cross-horizon duplicate: day-1 sig 1005 vs day-8 re-arrival —
      // the day-1 occupant (id 105) aged out, so no pair with 9999
      assert(!pairs.exists(p => p._1 == 105L && p._2 == 9999L),
        "bucket survived 7 days past its TTL")
    } finally q.stop()
  }

  test("digest TTL state plateaus and re-keeps a duplicate beyond the horizon") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keysPerDay = 20
    val days = 12
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = EventStreams.digestFirstSeenTtl(
      in.toDF().toDF("doc_id", "digest", "ts"),
      watermark = "1 hour", ttlMs = DayMs)
    val q = out.toDF("doc_id", "kept")
      .writeStream.format("memory").queryName("ttl_digest")
      .outputMode("append").start()
    try {
      (0 until days).foreach { day =>
        val ts = new Timestamp(T0 + day * DayMs)
        val rows = (0 until keysPerDay).flatMap { k =>
          val dg = s"d${day}_k$k"
          val id = day * 100L + k
          // digest 0 of each day arrives twice: the second copy is an
          // IN-horizon duplicate and must be dropped
          if (k == 0) Seq((id, dg, ts), (id + 50, dg, ts))
          else Seq((id, dg, ts))
        } ++ (if (day == 8)
          // day 1's digest d1_k5 recurs seven days later: beyond the
          // horizon the digest was forgotten, so this copy is KEPT again
          Seq((8888L, "d1_k5", ts))
        else Seq.empty)
        in.addData(rows: _*)
        q.processAllAvailable()
      }
      val series = stateSeries(q)
      assert(series.nonEmpty, "no state-operator progress recorded")
      // +1: the day-8 cross-horizon probe digest lives in state for one TTL
      assert(series.max <= 3L * keysPerDay + 1,
        s"digest state grew with the corpus: $series")
      val (early, late) = series.splitAt(series.length / 2)
      assert(late.max <= early.max + 1,
        s"digest state still growing in the second half: $series")
      val kept = spark.table("ttl_digest")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // in-horizon duplicate dropped; its first copy kept
      assert(kept(100L) && !kept(150L),
        "in-horizon duplicate handling diverged from the exact drain")
      // beyond the horizon, the recurring digest is kept AGAIN
      assert(kept(8888L),
        "cross-horizon re-arrival was deduplicated by state that should have aged out")
    } finally q.stop()
  }
}
