package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pq_adc must agree with the interpreted HOF fold it replaced, including
  * null/out-of-range semantics (null input → null; short or null-element
  * codes → null; code outside the table row → null where the HOF would
  * error/null). */
class PqAdcSpec extends SparkSpec {

  private def hof(m: Int) = expr(
    s"aggregate(sequence(0, $m - 1), cast(0.0 as double)," +
      " (acc, j) -> acc + element_at(element_at(tab, j + 1)," +
      " element_at(codes, j + 1) + 1))")

  test("pq_adc equals the HOF fold on random tables and codes") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val m = 16
    val k = 16
    val rows = (1 to 200).map { i =>
      val tab = Array.fill(m, k)(rng.nextDouble() * 2 - 1)
      val codes = Array.fill(m)(rng.nextInt(k))
      (i, tab, codes)
    }
    val df = rows.toDF("id", "tab", "codes")
      .select(col("id"), col("tab"), col("codes"),
        call_function("pq_adc", col("tab"), col("codes")).as("native"),
        hof(m).as("fold"))
    val bad = df.filter(col("native") =!= col("fold") ||
      col("native").isNull =!= col("fold").isNull).count()
    assert(bad == 0, s"$bad rows disagree between pq_adc and the HOF fold")
  }

  test("pq_adc nulls on out-of-range codes and null inputs") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val tab = Array.fill(2, 4)(1.0)
    val cases = Seq(
      (1, tab, Array(0, 9)),  // code out of range
      (2, tab, Array(0, -1)), // negative code
      (3, tab, Array(0, 1, 2)) // codes longer than table
    ).toDF("id", "tab", "codes")
      .select(col("id"), call_function("pq_adc", col("tab"), col("codes")).as("v"))
    assert(cases.filter(col("v").isNotNull).count() == 0,
      "out-of-range/short inputs must yield null")
    val ok = Seq((4, tab, Array(3, 2))).toDF("id", "tab", "codes")
      .select(call_function("pq_adc", col("tab"), col("codes")).as("v"))
      .collect().head.getDouble(0)
    assert(ok == 2.0)
  }
}
