package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaxScore-pruned BM25 must be EXACTLY the full-join ranking — same rows,
  * same scores, same rank order — at both registered cutoffs (topN=3 for
  * sim_bm25_topk, topN=20 for the RRF fusions). The pruning is a sound
  * bound, not an approximation: any divergence here is a bug in the θ /
  * essential-term logic, not an accepted trade-off. */
class Bm25MaxScoreSpec extends SparkSpec {

  private def tfOf(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  private def assertEqualRankings(d: String, topN: Int): Unit = {
    val s = spark
    val tf = tfOf(s, d)
    // bm25MaxScore directly, NOT the bm25RankedOf dispatcher: the
    // vocabulary statistic routes testdata (31-word synthetic vocab) to
    // the brute plan, and this spec exists to pin the PRUNED plan equal
    // on both vocabulary shapes
    val pruned = LlmText.bm25MaxScore(s, d, tf, topN, wgtKey = None)
      .collect().map(_.toSeq).toSet
    val brute = LlmText.bm25RankedBrute(s, d, tf, topN)
      .collect().map(_.toSeq).toSet
    assert(pruned.nonEmpty, s"empty BM25 ranking at $d topN=$topN")
    val onlyP = pruned -- brute
    val onlyB = brute -- pruned
    assert(onlyP.isEmpty && onlyB.isEmpty,
      s"MaxScore diverged from brute at $d topN=$topN: " +
        s"pruned-only=${onlyP.take(5)} brute-only=${onlyB.take(5)}")
  }

  test("MaxScore == brute at sf0.001, topN=3 and topN=20") {
    assertEqualRankings("/root/testdata/sf0.001", 3)
    assertEqualRankings("/root/testdata/sf0.001", 20)
  }

  test("MaxScore == brute at sf0.01, topN=3 and topN=20") {
    assertEqualRankings("/root/testdata/sf0.01", 3)
    assertEqualRankings("/root/testdata/sf0.01", 20)
  }

  // The adversarial vocabulary: testdata's synthetic ~31-word vocab makes
  // every query match every doc (worst case for candidate COUNT, trivial
  // for term skew); the Zipf fixture's 50k-term vocabulary is the realistic
  // shape where essential-term classification does real work. Gitignored
  // fixture — regenerate with graft.tools.ZipfFixture; cancels if absent.
  test("MaxScore == brute on the 40k-doc Zipf fixture, topN=3") {
    assume(new java.io.File("fixtures/zipf1big/documents.parquet").exists(),
      "fixtures/zipf1big not generated")
    assertEqualRankings("fixtures/zipf1big", 3)
  }
}
