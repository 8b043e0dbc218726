package graft.queries

import graft.SparkSpec

/** Composed IVF+PQ ANN recall vs the exact brute-force baseline (no SQL
  * oracle — two trained codebook layers; the driver-green certificate is
  * ann_ivfpq_recall_gate, this spec pins the same floor in sbt test). */
class AnnIvfPqSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("IVF+PQ top-3 contains the exact top-1 for most queries") {
    val approx = VectorOps.queries("ann_ivfpq_topk")(spark, Sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf)
      .filter("rnk = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.nonEmpty, "query sample is empty")
    val hits = exact.count { case (q, top1) => approx.getOrElse(q, Set.empty)(top1) }
    // nProbe=4 of kc=16 cells + m=16 residual nibble codes + exact re-rank
    // of a 30-wide shortlist: recall observed well above the 50% gate
    // floor; demand the floor.
    assert(hits.toDouble / exact.size >= 0.5,
      s"IVF+PQ top-1 recall ${hits.toDouble / exact.size} of ${exact.size} queries")
  }

  test("IVF+PQ result carries TRUE cosines (re-ranked), matching exact scores") {
    val approx = VectorOps.queries("ann_ivfpq_topk")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = approx.keySet.intersect(exact.keySet)
    assert(shared.nonEmpty, "no overlapping (query, neighbor) pairs to check")
    shared.foreach { k =>
      assert(math.abs(approx(k) - exact(k)) < 1e-9,
        s"cosine mismatch for $k: ivfpq=${approx(k)} exact=${exact(k)}")
    }
  }
}
