package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The claim dedup_resolve_star exists to make true at 100 TB: star
  * contraction converges in O(log n) rounds INDEPENDENT of graph
  * diameter. A 20 000-node path graph (diameter 20 000) is the
  * adversarial case — min-label propagation moves the component minimum
  * one hop per round, so dedup_resolve's 8 rounds would label ~8 of
  * 20 000 nodes correctly; the star loop (backstop 24 rounds;
  * ~log2(n)+1 used) must solve it completely — and since round 10 it
  * PROVES convergence (exact set-equality certificate) rather than
  * silently returning at the cap. */
class StarCcScaleSpec extends SparkSpec {

  test("star contraction solves a 20k-node path graph within its round cap") {
    import spark.implicits._
    val n = 20000L
    // path 0-1-2-...-n plus a few disjoint small cliques as controls
    val path = spark.range(n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cliques = Seq(
      (n + 10, n + 11), (n + 11, n + 12), (n + 10, n + 12), // triangle
      (n + 20, n + 21)) // pair
      .toDF("id_a", "id_b")
    val labels = VectorOps.starComponents(path.unionByName(cliques))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n + 5, s"expected ${n + 5} labeled nodes, got ${labels.size}")
    // every path node must resolve to the global minimum 0
    assert((0L until n).forall(labels(_) == 0L),
      "path component not fully contracted to its minimum")
    assert(Seq(n + 10, n + 11, n + 12).forall(labels(_) == n + 10))
    assert(labels(n + 20) == n + 20 && labels(n + 21) == n + 20)
  }
}
