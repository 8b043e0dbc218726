package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-checked semantics for the warehouse operators whose driver oracle
  * is a non-trivial SQL reimplementation: the SCD-2 interval build, the
  * bucketed interval-overlap join (vs brute force), linear interpolation
  * (vs closed-form values), and keep-first dedup.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("scd2: change rows open intervals, last version stays open") {
    // user 1: A@10 A@20 B@30 A@50 -> versions A[10,30) B[30,50) A[50,null)
    val ev = Seq(
      (1L, 10L, "A", 100L), (1L, 20L, "A", 101L),
      (1L, 30L, "B", 102L), (1L, 50L, "A", 103L),
      (2L, 5L, "X", 200L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changed = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val out = changed.select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      (1L, "A", 10L, Some(30L)),
      (1L, "B", 30L, Some(50L)),
      (1L, "A", 50L, None),
      (2L, "X", 5L, None)))
  }

  test("interval overlap: bucketed join equals brute force on random data") {
    val span = 100L
    val a = spark.range(200).select(
      col("id").as("a_id"), pmod(xxhash64(col("id")), lit(10)).as("user_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(5000)).as("a_s"))
      .withColumn("a_e", col("a_s") + span)
    val b = spark.range(200, 400).select(
      col("id").as("b_id"), pmod(xxhash64(col("id")), lit(10)).as("user_id"),
      pmod(xxhash64(col("id"), lit(2)), lit(5000)).as("b_s"))
      .withColumn("b_e", col("b_s") + span)
    val brute = a.join(b, Seq("user_id"))
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bucketed(df: org.apache.spark.sql.DataFrame, sc: String, ec: String) =
      df.withColumn("bucket", explode(array_distinct(array(
        floor(col(sc) / span), floor(col(ec) / span)))))
    val fast = bucketed(a, "a_s", "a_e").join(bucketed(b, "b_s", "b_e"),
        Seq("user_id", "bucket"))
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === brute)
    assert(brute.nonEmpty, "degenerate test: no overlapping pairs generated")
  }

  test("linear interpolation: interior gap is linear in ts, edges ffill/null") {
    // key 1: v(0)=10, null@2, null@6, v(8)=50 -> interp 20 at 2, 40 at 6
    // leading null (key 2) stays null; trailing null (key 3) forward-fills
    val ev = Seq(
      (1L, 0L, Some(10.0), 1L), (1L, 2L, None, 2L),
      (1L, 6L, None, 3L), (1L, 8L, Some(50.0), 4L),
      (2L, 0L, None, 5L), (2L, 1L, Some(7.0), 6L),
      (3L, 0L, Some(3.0), 7L), (3L, 9L, None, 8L)
    ).toDF("user_id", "ts", "value", "event_id")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = w.rowsBetween(1, Window.unboundedFollowing)
    val pv = last(col("value"), ignoreNulls = true).over(wPrev)
    val pt = last(when(col("value").isNotNull, col("ts")), ignoreNulls = true).over(wPrev)
    val nv = first(col("value"), ignoreNulls = true).over(wNext)
    val nt = first(when(col("value").isNotNull, col("ts")), ignoreNulls = true).over(wNext)
    val interp = when(col("value").isNotNull, col("value"))
      .when(pv.isNotNull && nv.isNotNull,
        pv + (nv - pv) * ((col("ts") - pt).cast("double") / (nt - pt).cast("double")))
      .when(pv.isNotNull, pv)
      .otherwise(lit(null).cast("double"))
    val out = ev.select(col("event_id"), interp.as("v")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) === Some(10.0))
    assert(out(2L) === Some(20.0)) // 10 + 40 * 2/8
    assert(out(3L) === Some(40.0)) // 10 + 40 * 6/8
    assert(out(4L) === Some(50.0))
    assert(out(5L) === None)       // leading gap: no previous anchor
    assert(out(6L) === Some(7.0))
    assert(out(8L) === Some(3.0))  // trailing gap forward-fills
  }

  test("keep-first dedup keeps exactly the lowest id per digest") {
    val docs = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "bbb"), (6L, "aaa")
    ).toDF("doc_id", "text")
    val wd = Window.partitionBy("digest").orderBy("doc_id")
    val kept = docs.withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(wd)).filter(col("rn") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 4L))
  }
}
