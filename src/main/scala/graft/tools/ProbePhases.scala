package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the canonical-substring append path — the
  * adjudication tool behind the r13 `weak` ("the dominant cost is the one
  * un-pruned scan of the stored occurrence index"). One fresh JVM, one
  * warmed store, and a handful of separately-materialized sub-plans of
  * [[graft.queries.LlmText]]'s append dataflow, so the 5.6 s append reading
  * decomposes into named phases instead of a guess. Analysis-only tool; no
  * registry entry consumes it.
  *
  * Usage: ProbePhases <fixtureDir>   (store must be pre-warmed via
  * SPARK_GRAFT_INDEX_DIR + one untimed dedup_substring_canonical_append run)
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    def time(name: String)(df: => DataFrame): Unit = {
      val plan = df
      val t0 = System.nanoTime()
      plan.write.format("noop").mode("overwrite").save()
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    val store = sys.env("SPARK_GRAFT_INDEX_DIR")
    // locate the warmed artifacts by name prefix
    def art(prefix: String): String = {
      val dir = new java.io.File(s"$store/v1")
      dir.listFiles().filter(_.getName.startsWith(prefix)).head.getPath
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val isDelta = col("doc_id") % 5 === 4
    val l = 10

    def tokenizedDocs(dd: DataFrame): DataFrame = dd
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n", size(col("tk")))
    def spanRows(base: DataFrame): DataFrame = base.filter(col("n") >= l)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, n - $l), i -> array_join(slice(tk, i + 1, $l), ' '))"))
        .as(Seq("pos", "span")))

    // phase 1: bare read of the slim stored occurrence index
    time("occ_read")(spark.read.parquet(art("substr_canon_occh_base")))
    // phase 2: delta spans alone (slim shape)
    def slim(occ: DataFrame): DataFrame = occ
      .select(xxhash64(col("span")).as("span_h"), col("doc_id"), col("pos"))
    time("delta_occ")(slim(spanRows(tokenizedDocs(docs.filter(isDelta)))))
    // phase 3: the probe — stored occ semi-joined with touched span hashes
    val deltaOcc = slim(spanRows(tokenizedDocs(docs.filter(isDelta))))
    val touched = deltaOcc.select("span_h").distinct()
    def probe = spark.read.parquet(art("substr_canon_occh_base"))
      .drop("span_bkt").join(touched, Seq("span_h"), "left_semi")
    time("probe_semijoin")(probe)
    // phase 4: probe + union (the occTouched node, un-checkpointed)
    val occT = probe.unionByName(deltaOcc)
    time("occ_touched")(occT)
    // phase 5: the group recompute over touched occurrences
    val occTC = occT.localCheckpoint(false)
    def canonIvs(occ: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val t = tokenizedDocs(docs
          .join(occ.select("doc_id").distinct(), Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), col("tk"))
      val withTail = occ.join(t, "doc_id")
        .select(col("span_h"),
          expr(s"array_join(slice(tk, pos + 1, $l), ' ')").as("span"),
          col("doc_id"), col("pos"),
          expr(s"slice(tk, pos + 1 + $l, 10)").as("tail"))
      val rnW = Window.partitionBy("span").orderBy("doc_id", "pos")
      withTail.withColumn("rn", row_number().over(rnW)).filter(col("rn") > 1)
        .select(col("span_h"), col("doc_id"), col("pos"))
    }
    time("new_ivs_approx")(canonIvs(occTC))
    // phase 6: stored intervals anti-join (keptIvs)
    time("kept_ivs")(
      spark.read.parquet(art("substr_canon_ivh_base"))
        .join(touched, Seq("span_h"), "left_anti"))
    // phase 7: stored base output read
    time("base_out_read")(spark.read.parquet(art("substr_canon_out_base")))
    // phase 8: affected-doc tokenize (the output assembly's input scan)
    val affected = occTC.select("doc_id")
      .unionByName(docs.filter(isDelta).select("doc_id")).distinct()
    time("affected_tokenize")(
      tokenizedDocs(docs.join(affected, Seq("doc_id"), "left_semi")))
    // phase 9/10: the full registered entries (store-warm)
    time("full_append")(
      graft.SparkEntry.queries("dedup_substring_canonical_append")(spark, d))
    time("full_append_delta")(
      graft.SparkEntry.queries("dedup_substring_canonical_append_delta")(spark, d))
    spark.stop()
  }
}
