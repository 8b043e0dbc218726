package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the C4-style line-level dedup that the driver hash-compare
  * can't state directly: the global keep-first invariant (each distinct
  * span survives exactly once, corpus-wide) and the reassembly behavior on
  * a planted cross-document duplicate.
  */
class DedupLinesSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every distinct span survives exactly once corpus-wide") {
    val out = graft.SparkEntry.queries("dedup_lines")(spark, Sf)
    val spans = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 1)
      .select(posexplode(expr(
        "transform(sequence(0, (n - 1) div 10)," +
          " i -> array_join(slice(tk, i * 10 + 1, 10), ' '))"))
        .as(Seq("p", "line")))
    val distinctSpans = spans.select("line").distinct().count()
    val agg = out.agg(sum("n_kept"), sum("n_lines")).first()
    assert(agg.getLong(0) == distinctSpans,
      s"kept ${agg.getLong(0)} != distinct spans $distinctSpans")
    assert(agg.getLong(1) == spans.count(),
      "n_lines must total the exploded span count")
  }

  test("a planted cross-doc duplicate span drops from the later doc only") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_lines_spec").toString
    import spark.implicits._
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 10).map(i => s"b$i").mkString(" ")
    Seq(
      (0L, s"$shared $a", "en", "web", 0L), // keeps both spans
      (1L, s"$shared $b", "en", "web", 0L), // first span already seen
      (2L, shared, "en", "web", 0L))        // fully duplicated doc
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_lines")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) == ((2L, 2L, md5hex(s"$shared $a"))), s"doc 0: ${out(0L)}")
    assert(out(1L) == ((2L, 1L, md5hex(b))), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((1L, 0L, md5hex(""))), s"doc 2: ${out(2L)}")
  }
}
