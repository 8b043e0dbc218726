package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** globalRank must agree with row_number() OVER (ORDER BY ...) — the
  * single-task shape it exists to replace — including on duplicate sort
  * keys where only the tiebreak column makes the order total. */
class RankingSpec extends SparkSpec {

  test("globalRank equals row_number over a total order, with duplicate keys") {
    import spark.implicits._
    // Duplicate `score` values on purpose: (score, id) is the total order.
    val df = Seq((1L, 10.0), (2L, 30.0), (3L, 10.0), (4L, 50.0), (5L, 30.0),
      (6L, 30.0), (7L, 0.5), (8L, 50.0), (9L, 10.0), (10L, 42.0))
      .toDF("id", "score")
    val got = Ranking.globalRank(df,
        Seq(col("score").desc, col("id")), partitions = 4)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        expr("row_number() OVER (ORDER BY score DESC, id)").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRank is a permutation of 1..n across many partitions") {
    import spark.implicits._
    val n = 10000L
    val df = spark.range(n).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(1000L))).as("score"))
    val ranks = Ranking.globalRank(df,
        Seq(col("score"), col("id")), partitions = 16)
      .select("rank").as[Long].collect()
    assert(ranks.length == n)
    assert(ranks.toSet == (1L to n).toSet)
  }
}
