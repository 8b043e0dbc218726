package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins dedup_semdedup's semantics (SemDeDup, Abbas et al. 2023) beyond the
  * oracle hash: the keep rule must be the greedy per-cluster scan — drop a
  * vector iff a same-cell predecessor in (sim-to-centroid ASC, id ASC)
  * order sits within cosine tau — and duplicate groups must resolve to
  * exactly their least-prototypical member. */
class SemDedupSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("planted duplicate cliques keep exactly the farthest-from-centroid member") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 200 spread vectors (pairwise cosine ~ N(0, 1/8), far below 0.9) plus
    // two planted cliques of 3 near-identical vectors at cosine ~0.999 —
    // near-identical vectors share a nearest centroid by construction.
    val base = (0L until 200L).map(i => (i, unit()))
    val cliques = (0 until 2).flatMap { g =>
      val (_, v) = base(g * 20)
      (0 until 2).map { j =>
        val noisy = v.map(x => x + 0.02 * rng.nextGaussian())
        val n = math.sqrt(noisy.map(x => x * x).sum)
        (1000L + g * 10 + j, noisy.map(_ / n))
      }
    }
    val emb = (base ++ cliques).toDF("vec_id", "e")
    val out = VectorOps.semDedupOf(spark, emb, k = 8, tau = 0.9,
      storeKey = None).collect()
    val verdict = out.map(r =>
      r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cell"), r.getAs[Double]("sim_centroid"),
          r.getAs[Boolean]("keep"))).toMap
    (0 until 2).foreach { g =>
      val ids = Seq(g * 20L, 1000L + g * 10, 1000L + g * 10 + 1)
      val members = ids.map(id => id -> verdict(id))
      assert(members.map(_._2._1).distinct.size == 1,
        s"clique $g not co-located in one cell: $members")
      val kept = members.filter(_._2._3)
      assert(kept.size == 1, s"clique $g kept ${kept.size} members: $members")
      // the survivor is the greedy head: minimal (sim-to-centroid, id)
      val head = members.minBy { case (id, (_, simc, _)) => (simc, id) }._1
      assert(kept.head._1 == head,
        s"clique $g kept ${kept.head._1}, expected farthest-from-centroid $head")
    }
    // everything outside the cliques survives (nothing else is within tau)
    assert(out.count(!_.getAs[Boolean]("keep")) == 4)
  }

  test("append path: cross-split cliques resolve greedily, incl. a delta head") {
    import spark.implicits._
    // which clique member lands least prototypical (the greedy head) is
    // decided by the trained centroids, so scan a FIXED candidate seed
    // list for one that heads a clique with a DELTA member — the case
    // where the ingest must flip a stored base verdict. Deterministic:
    // the same seed wins every run; drift in the greedy rule or the
    // assignment makes every candidate fail loudly.
    val found = Seq(7L, 11L, 13L, 17L, 23L).view.map { seed =>
      val rng = new scala.util.Random(seed)
      def unit(): Array[Double] = {
        val v = Array.fill(64)(rng.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
      // spread corpus; ids with %5==4 land in the delta slice
      val base = (0L until 200L).map(i => (i, unit()))
      // 3 cliques of 4 near-identical members (2 base + 2 delta ids) each
      // seeded off a spread anchor (itself a 5th, base member)
      val cliques = (0 until 3).flatMap { g =>
        val (_, v) = base(g * 30)
        Seq(1000L + g * 10, 1001L + g * 10, 1004L + g * 10, 1009L + g * 10)
          .map { id =>
            val noisy = v.map(x => x + 0.02 * rng.nextGaussian())
            val n = math.sqrt(noisy.map(x => x * x).sum)
            (id, noisy.map(_ / n))
          }
      }
      val emb = (base ++ cliques).toDF("vec_id", "e")
      val out = VectorOps.semDedupAppendOf(spark, emb, k = 8, tau = 0.9,
        storeKey = None).collect()
      val verdict = out.map(r =>
        r.getAs[Long]("vec_id") ->
          (r.getAs[Long]("cell"), r.getAs[Double]("sim_centroid"),
            r.getAs[Boolean]("keep"))).toMap
      val heads = (0 until 3).map { g =>
        val ids = Seq(1000L + g * 10, 1001L + g * 10, 1004L + g * 10,
          1009L + g * 10, g * 30L)
        val members = ids.map(id => id -> verdict(id))
        assert(members.map(_._2._1).distinct.size == 1,
          s"seed $seed clique $g not co-located: $members")
        val kept = members.filter(_._2._3)
        assert(kept.size == 1, s"seed $seed clique $g kept ${kept.size}: $members")
        val head = members.minBy { case (id, (_, simc, _)) => (simc, id) }._1
        assert(kept.head._1 == head,
          s"seed $seed clique $g kept ${kept.head._1}, expected greedy head $head")
        head
      }
      assert(out.count(!_.getAs[Boolean]("keep")) == 12)
      heads.exists(_ % 5 == 4)
    }.exists(identity)
    assert(found,
      "no candidate seed produced a delta-headed clique — the flip case is unexercised")
  }

  test("sf0.001 verdict equals the brute-force greedy rule") {
    val out = VectorOps.queries("dedup_semdedup")(spark, Sf).collect()
    // rounded sim_centroid values are unique per cell on this data (checked
    // below), so ordering by the rounded value is the exact greedy order
    val rows = out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
      r.getAs[Double]("sim_centroid"), r.getAs[Boolean]("keep")))
    assert(rows.groupBy(t => (t._2, t._3)).forall(_._2.length == 1),
      "rounded sim_centroid collides within a cell; brute force inexact")
    val emb = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.groupBy(_._2).foreach { case (_, cellRows) =>
      val order = cellRows.sortBy(t => (t._3, t._1))
      order.zipWithIndex.foreach { case ((id, _, _, keep), i) =>
        val dropped = order.take(i).exists { case (pid, _, _, _) =>
          cos(emb(pid), emb(id)) >= 0.45
        }
        assert(keep == !dropped, s"vec $id: keep=$keep, brute-force=${!dropped}")
      }
    }
  }
}
