package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the load-bearing claim of [[VecDot]]: bit-identical to the
  * higher-order-function fold it replaced, including null semantics —
  * the oracle hashes of every cosine query depend on this equivalence. */
class VecDotSpec extends SparkSpec {

  test("vec_dot == aggregate(zip_with(...)) bit-for-bit on random vectors") {
    GraftFunctions.register(spark)
    // deterministic pseudo-random doubles of varying magnitude, dim 64
    val vecs = spark.range(2000).select(
      col("id"),
      expr("""transform(sequence(1, 64),
             |  i -> cast(xxhash64(id * 64 + i) as double) / 9.0e18)""".stripMargin)
        .as("a"),
      expr("""transform(sequence(1, 64),
             |  i -> cast(xxhash64(id * 64 + i + 7) as double) / 9.0e18)""".stripMargin)
        .as("b"))
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val diffs = vecs
      .select(expr("vec_dot(a, b)").as("native"), hof.as("hofv"))
      .filter(col("native") =!= col("hofv")) // exact compare, no tolerance
      .count()
    assert(diffs == 0L, s"$diffs rows differ between native and HOF dot")
  }

  test("vec_dot null semantics match the HOF form") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0d, 2.0d), array(3.0d, 4.0d)),   -- plain: 11.0
        |  (array(1.0d, 2.0d), array(3.0d)),          -- length mismatch
        |  (array(1.0d, cast(null as double)), array(3.0d, 4.0d)), -- null elem
        |  (cast(null as array<double>), array(1.0d)),              -- null array
        |  (array(), array())                          -- empty: 0.0
        |AS t(a, b)""".stripMargin)
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(expr("vec_dot(a, b)").as("n"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"row $i null disagreement: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), s"row $i value disagreement: $r")
    }
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0) && rows(3).isNullAt(0))
    assert(rows(4).getDouble(0) == 0.0)
  }
}
