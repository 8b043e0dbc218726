package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BandedRangeJoinRule must (1) fire on a naive band inequality join and
  * eliminate the nested-loop plan, (2) preserve the exact join multiset —
  * including on negative domains, where truncating division would bucket
  * wrong — and (3) leave joins it can't prove banded untouched. */
class BandedRangeJoinSpec extends SparkSpec {

  test("rewrites a band join to a bucket equi-join with identical results") {
    import spark.implicits._
    // Negative values on purpose: floorDiv(-7, 5) = -2, but a truncating
    // division gives -1 — wrong bucket, silently dropped pairs.
    val xs = Seq(-13L, -10L, -7L, -1L, 0L, 3L, 4L, 9L, 14L, 22L).toDF("x")
    val ys = Seq(-12L, -8L, -5L, 0L, 1L, 5L, 9L, 20L).toDF("y")
    val joined = xs.join(ys, col("x") >= col("y") && col("x") < col("y") + lit(5L))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"band join not rewritten:\n$plan")

    val got = joined.as[(Long, Long)].collect().sorted.toSeq
    val xsV = Seq(-13L, -10L, -7L, -1L, 0L, 3L, 4L, 9L, 14L, 22L)
    val ysV = Seq(-12L, -8L, -5L, 0L, 1L, 5L, 9L, 20L)
    val want = (for { x <- xsV; y <- ysV; if x >= y && x < y + 5 } yield (x, y))
      .sorted
    assert(got == want, s"got $got\nwant $want")
  }

  test("does not fire when an equi-conjunct already exists") {
    import spark.implicits._
    val xs = Seq((1L, 10L), (1L, 12L), (2L, 30L)).toDF("k", "x")
    val ys = Seq((1L, 9L), (2L, 29L)).toDF("k2", "y")
    val joined = xs.join(ys, col("k") === col("k2") &&
      col("x") >= col("y") && col("x") < col("y") + lit(5L))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"), s"rule fired needlessly:\n$plan")
    // (1,10)-(1,9), (1,12)-(1,9), (2,30)-(2,29) all satisfy the band
    assert(joined.count() == 3)
  }

  test("leaves non-band inequality joins untouched (still nested-loop)") {
    import spark.implicits._
    val xs = Seq(1L, 2L).toDF("x")
    val ys = Seq(1L, 3L).toDF("y")
    // only a lower bound — not a band, must not be rewritten
    val joined = xs.join(ys, col("x") >= col("y"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"), s"rule fired on a half-open range:\n$plan")
    // x>=y pairs: (1,1), (2,1)
    assert(joined.count() == 2)
  }
}
