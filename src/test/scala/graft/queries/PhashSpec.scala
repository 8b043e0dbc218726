package graft.queries

import graft.SparkSpec
import graft.multimodal.Multimodal

/** DataFrame-level properties of the real-codec perceptual hash: the
  * constructed even/odd sibling images must land within the hamming-3
  * near-dup threshold, and distinct bases must spread far apart (a
  * degenerate hash space would make segment blocking quadratic). */
class PhashSpec extends SparkSpec {

  test("sibling images are near-duplicates; distinct bases spread apart") {
    import spark.implicits._
    val docs = (0L until 40L).map(id => (id, s"doc$id")).toDF("doc_id", "text")
    val ph = Multimodal.perceptualHash(docs).collect()
      .map(r => r.getLong(0) ->
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(ph.size == 40)
    def ham(a: Array[Long], b: Array[Long]): Int =
      (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum
    (0L until 40L by 2).foreach { e =>
      assert(ham(ph(e), ph(e + 1)) <= 3,
        s"sibling pair ($e, ${e + 1}) exceeds the near-dup threshold")
    }
    val bases = (0L until 40L by 2).map(ph).toIndexedSeq
    val far = (for {
      i <- bases.indices
      j <- (i + 1) until bases.size
    } yield ham(bases(i), bases(j))).count(_ > 3)
    assert(far > 120, s"pHash space too degenerate: only $far/190 far pairs")
  }
}
