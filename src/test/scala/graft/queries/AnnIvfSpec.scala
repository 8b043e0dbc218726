package graft.queries

import graft.SparkSpec

/** IVF ANN recall vs the exact brute-force baseline (no SQL oracle — the
  * codebook is trained). */
class AnnIvfSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("IVF top-k contains the brute-force top-1 for most queries") {
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf)
      .collect().filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val ivf = VectorOps.queries("ann_ivf_topk")(spark, Sf)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val hits = exact.count { case (q, n1) => ivf.getOrElse(q, Set.empty).contains(n1) }
    // nProbe=4 of k=16 cells: scans ~25% of the corpus; on clustered data
    // the true neighbor shares the query's cell with high probability, on
    // this random corpus it lands in a probed cell often enough that >= 50%
    // top-1 recall holds with margin (observed higher).
    assert(hits.toDouble / exact.size >= 0.5,
      s"IVF top-1 recall ${hits.toDouble / exact.size} of ${exact.size}")
  }
}
