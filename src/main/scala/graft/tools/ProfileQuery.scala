package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runMain graft.tools.ProfileQuery <name> <sfDir>. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names run sequentially in ONE session (twice each),
    // exposing warm-cache / shared-materialization behavior Bench sees
    name.split(',').foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (!name.contains(',')) df.explain("formatted")
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"ELAPSED $n run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // post-execution plan shows what AQE actually ran (exchange reuse etc.)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FINAL"))
        println(df.queryExecution.executedPlan)
    }
    spark.stop()
  }
}
