package graft.queries

import graft.SparkSpec

/** Pins the non-SQL-expressible similarity operators (no DuckDB oracle):
  * sign-LSH ANN recall vs the exact brute-force baseline, and SimHash
  * candidate quality. */
class VectorOpsSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("sign-LSH top-k finds the brute-force top-1 for most queries") {
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf)
      .collect().filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val approx = VectorOps.queries("ann_lsh_topk")(spark, Sf)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val hits = exact.count { case (q, n1) => approx.getOrElse(q, Set.empty).contains(n1) }
    // k=4 bits x L=16 tables at the data's top-1 cosine ~0.4 (theta~66deg):
    // per-table collision p=(1-66/180)^4~0.16, recall 1-(1-p)^16 ~ 94%.
    // Demand >= 60% to keep the test seed-robust.
    assert(hits.toDouble / exact.size >= 0.6,
      s"LSH top-1 recall ${hits.toDouble / exact.size} of ${exact.size} queries")
  }

  test("simhash near-dup pairs are hamming<=3 and include exact duplicates") {
    val pairs = VectorOps.queries("dedup_simhash")(spark, Sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Number]("hamming").longValue() <= 3))
    // exact text duplicates (dedup_exact dup_count>1) must appear (hamming 0)
    val exactDups = LlmText.queries("dedup_exact")(spark, Sf)
      .collect().count(_.getAs[Long]("dup_count") > 1)
    val zeroHam = pairs.count(_.getAs[Number]("hamming").longValue() == 0)
    assert(exactDups == 0 || zeroHam > 0)
  }

  test("minhash-LSH candidates reproduce exact jaccard>=0.9 pairs (vs blocked scan)") {
    val lsh = VectorOps.queries("dedup_minhash_lsh")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the blocked-jaccard query at threshold 0.8 is a superset scan; filter 0.9
    val exact = LlmText.queries("dedup_blocked_jaccard")(spark, Sf)
      .collect().filter(_.getAs[Double]("jac") >= 0.9)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // blocked scan only compares same length-bucket, so it can miss pairs LSH
    // finds; every blocked pair must be found by LSH (miss prob ~1.5e-15).
    assert(exact.subsetOf(lsh), s"LSH missed ${(exact -- lsh).take(5)}")
  }
}
