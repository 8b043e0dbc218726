package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the embedding near-dup REBUILD dataflow —
  * the r14 adjudication tool for the staged-out 400k embed measurement
  * ("base-artifact prep alone exceeded 35 min at 120k vectors" — which
  * phase?). One fresh JVM, each phase materialized once over lazily
  * checkpointed predecessors ([[graft.queries.VectorOps.embedDedupPhases]]),
  * so the wall reading decomposes into named phases instead of a guess.
  * `stat_*` phases are 1-row closed-form diagnostics and print their value.
  * Analysis-only tool; no registry entry consumes it.
  *
  * Usage: ProbeEmbedPhases <fixtureDir> [base|full] [kBits]
  *   base (default): the base slice (vec_id % 5 != 4) — the warm-store
  *   prep shape; full: the whole corpus — the rebuild-side shape.
  *   kBits (default: the entry's own lshBitsFor derivation) probes a
  *   specific signature width.
  */
object ProbeEmbedPhases {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val slice = if (args.length > 1) args(1) else "base"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val sliced =
      if (slice == "full") emb else emb.filter(col("vec_id") % 5 =!= 4)
    val kBits = if (args.length > 2) args(2).toInt
      else graft.queries.VectorOps.lshBitsFor(d)
    println(s"KBITS $kBits")
    for ((name, df) <- graft.queries.VectorOps
        .embedDedupPhases(spark, sliced, threshold = 0.9, kBits = kBits)) {
      val plan = df()
      val t0 = System.nanoTime()
      plan.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name $sec%.3f")
      if (name.startsWith("stat_"))
        println(s"STAT $name ${plan.head().toSeq.mkString(",")}")
    }
    spark.stop()
  }
}
