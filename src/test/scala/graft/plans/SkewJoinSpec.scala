package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.PartialReducerPartitionSpec

/** Pinned evidence for the x9_skew_join_aqe claim: with production-shaped
  * thresholds, AQE actually SPLITS the hot partition of the Zipf-skewed
  * sort-merge join (isSkewJoin=true + PartialReducerPartitionSpec slices in
  * the shuffle read), and the split run returns exactly the plain join's
  * rows. Run in its own child session so the lowered thresholds (test data
  * is KB-scale where production partitions are 100s of MB) cannot leak
  * into other suites.
  */
class SkewJoinSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.01"

  test("AQE splits the hot partition of the skewed join and preserves results") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // force the shuffle-join path: at test scale everything broadcasts
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production defaults are 256MB/5x-median; scale them to the KB-sized
    // test shuffle so the hot partition (90% of sf0.01's events) trips them
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

    val df = graft.SparkEntry.queries("x9_skew_join_aqe")(s, Sf)
    val rows = df.collect() // AQE finalizes the plan during execution
    assert(rows.nonEmpty)

    val adaptive = df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("skewed join did not plan adaptively"))
    val fin = adaptive.executedPlan

    // TreeNode.collect does not descend into materialized query stages
    // (QueryStageExec keeps its subtree in `plan`, not `children`)
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        all(q.plan)
      case other => other.children.flatMap(all)
    })
    val nodes = all(fin)

    val skewJoins = nodes.collect {
      case j: SortMergeJoinExec if j.isSkewJoin => j
    }
    assert(skewJoins.nonEmpty,
      s"no SortMergeJoin with isSkewJoin=true in the final adaptive plan:\n$fin")

    val splitSlices = nodes.collect {
      case r: AQEShuffleReadExec => r.partitionSpecs.collect {
        case p: PartialReducerPartitionSpec => p
      }
    }.flatten
    assert(splitSlices.size > 1,
      s"hot partition was not split into multiple reducer slices:\n$fin")

    // the split must be invisible in the results: compare against the
    // same query in the parent session (broadcast/no-skew path)
    val plain = graft.SparkEntry.queries("x9_skew_join_aqe")(spark, Sf)
      .collect().map(_.toString).sorted
    assert(rows.map(_.toString).sorted.sameElements(plain),
      "AQE skew split changed the join result")
  }
}
