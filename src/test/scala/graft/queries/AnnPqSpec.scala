package graft.queries

import graft.SparkSpec

/** PQ-ADC ANN recall vs the exact brute-force baseline (no SQL oracle — the
  * codebooks are trained; the driver-green certificate is
  * ann_pq_recall_gate, this spec pins the same floor in sbt test). */
class AnnPqSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("PQ top-3 contains the exact top-1 for most queries") {
    val pq = VectorOps.queries("ann_pq_topk")(spark, Sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf)
      .filter("rnk = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.nonEmpty, "query sample is empty")
    val hits = exact.count { case (q, top1) => pq.getOrElse(q, Set.empty)(top1) }
    // m=16 nibble codes + exact re-rank of a 30-wide (topK*10) shortlist:
    // top-1 recall observed well above the 50% gate floor; demand the floor.
    assert(hits.toDouble / exact.size >= 0.5,
      s"PQ top-1 recall ${hits.toDouble / exact.size} of ${exact.size} queries")
  }

  test("PQ result carries TRUE cosines (re-ranked), matching exact scores") {
    val pq = VectorOps.queries("ann_pq_topk")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = pq.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty, "no overlapping (query, neighbor) pairs to check")
    shared.foreach { k =>
      assert(math.abs(pq(k) - exact(k)) < 1e-9,
        s"cosine mismatch for $k: pq=${pq(k)} exact=${exact(k)}")
    }
  }
}
