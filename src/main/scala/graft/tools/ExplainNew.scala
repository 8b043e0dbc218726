package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for a comma-separated list of registered queries
  * (args: sfDir, names) — the .explain audit loop the build brief asks
  * for, runnable without sbt test overhead. */
object ExplainNew {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (a.length > 1) a(1).split(',').toSeq
      else Seq("dedup_substring", "curation_e2e", "dedup_canonical")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(s, sfDir)
        .queryExecution.executedPlan.toString)
    }
  }
}
