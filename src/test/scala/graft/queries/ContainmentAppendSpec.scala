package graft.queries

import graft.SparkSpec

/** Pins dedup_containment_append's coverage by planting a directed
  * containment pair in each candidate class: base-in-delta (the stored
  * base prefixes probing delta postings), delta-in-base and
  * delta-in-delta (delta prefixes probing base ∪ delta postings), and
  * base-in-base (the stored verified pairs) — then asserts the append
  * path equals the full rebuild row-for-row. Documents use per-doc-unique
  * vocabularies so the ONLY shingle overlaps are the planted ones, and
  * containers append 3 extra tokens so containment is 1.0 one way and
  * n/(n+3) < 0.9 the other (the directed case). */
class ContainmentAppendSpec extends SparkSpec {

  test("random low-entropy corpora: prefix-filtered scan == all-pairs brute force") {
    import spark.implicits._
    // Template-mutation corpora create rich partial overlaps (including
    // borderline containments around the 0.9 line) — the adversarial
    // input for the prefix-length arithmetic (n - ceil(0.9n) + 1).
    (0 until 3).foreach { trial =>
      val rng = new scala.util.Random(100 + trial)
      val templates = Array.fill(5)(
        Array.fill(30)(s"t${rng.nextInt(40)}"))
      val docs = (0L until 40L).map { i =>
        val t = templates(rng.nextInt(5)).clone()
        // a few point mutations, then a random-length prefix slice
        (0 until rng.nextInt(3)).foreach { _ =>
          t(rng.nextInt(t.length)) = s"m${rng.nextInt(1000)}"
        }
        val len = 10 + rng.nextInt(21)
        (i, t.take(len).mkString(" "))
      }.toDF("doc_id", "text")
      val got = VectorOps.containmentOf(spark, docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // brute force from the same shingle semantics
      val sets = docs.collect().map { r =>
        r.getLong(0) -> VectorOps.shingles3(r.getString(1)).toSet
      }.toMap
      val want = (for {
        (a, wa) <- sets; (b, wb) <- sets if a != b
        inter = (wa & wb).size if inter * 10 >= wa.size * 9
      } yield (a, b) -> inter.toDouble / wa.size).toMap
      assert(got.keySet == want.keySet,
        s"trial $trial pair sets differ: extra=${got.keySet.diff(want.keySet)} " +
          s"missing=${want.keySet.diff(got.keySet)}")
      want.foreach { case (k, c) =>
        assert(math.abs(got(k) - c) < 1e-6, s"trial $trial $k: ${got(k)} vs $c")
      }
    }
  }

  test("append == full rebuild; every candidate class covered") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"w${tag}_$i").mkString(" ")
    // ids: %5==4 → delta slice (9, 14, 19, 24 delta; others base)
    val a1 = words("a1", 20) // base 1, contained in delta 9
    val a2 = words("a2", 20) // delta 14, contained in base 2
    val a3 = words("a3", 20) // delta 19, contained in delta 24
    val a4 = words("a4", 20) // base 3, contained in base 6
    val docs = (Seq(
      1L -> a1, 9L -> (a1 + " x1 x2 x3"),
      14L -> a2, 2L -> (a2 + " y1 y2 y3"),
      19L -> a3, 24L -> (a3 + " z1 z2 z3"),
      3L -> a4, 6L -> (a4 + " v1 v2 v3")) ++
      // background: unique-vocabulary docs on both sides of the split
      (30L until 60L).map(i => i -> words(s"bg$i", 15))).toDF("doc_id", "text")
    val full = VectorOps.containmentOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val append = VectorOps.containmentAppendOf(spark, docs, storeKey = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(append == full, s"append ${append.diff(full)} vs full ${full.diff(append)}")
    // exactly the four planted directed pairs, each fully contained
    assert(full == Set((1L, 9L, 1.0), (14L, 2L, 1.0), (19L, 24L, 1.0),
      (3L, 6L, 1.0)), s"unexpected pair set: $full")
  }
}
