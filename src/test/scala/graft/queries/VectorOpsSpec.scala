package graft.queries

import graft.SparkSpec

/** Pins the non-SQL-expressible similarity operators (no DuckDB oracle):
  * sign-LSH ANN recall vs the exact brute-force baseline, and SimHash
  * candidate quality. */
class VectorOpsSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  test("sign-LSH top-k finds the brute-force top-1 for most queries") {
    val exact = VectorOps.queries("sim_cosine_topk")(spark, Sf)
      .collect().filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val approx = VectorOps.queries("ann_lsh_topk")(spark, Sf)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val hits = exact.count { case (q, n1) => approx.getOrElse(q, Set.empty).contains(n1) }
    // k=5 bits x L=24 tables at the data's top-1 cosine ~0.33-0.43
    // (theta 65-71deg): per-table collision p=(1-theta/180)^5 ~ 0.08-0.11,
    // recall 1-(1-p)^24 ~ 87-94%. Demand >= 60% to keep the test seed-robust.
    assert(hits.toDouble / exact.size >= 0.6,
      s"LSH top-1 recall ${hits.toDouble / exact.size} of ${exact.size} queries")
  }

  test("embed-cosine dedup finds planted near-dup vectors and nothing else") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 200 random unit vectors (pairwise cosine ~ N(0, 1/8): far below 0.9)
    // plus 5 planted near-dup pairs at cosine ~0.99.
    val base = (0L until 200L).map(i => (i, unit()))
    val planted = (0 until 5).map { k =>
      val (_, v) = base(k * 10)
      val noisy = v.map(x => x + 0.05 * rng.nextGaussian())
      val n = math.sqrt(noisy.map(x => x * x).sum)
      (1000L + k, noisy.map(_ / n))
    }
    val all = base ++ planted
    val emb = all.toDF("vec_id", "e")
    val pairs = VectorOps.embedCosineDedup(spark, emb, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // exact ground truth in-driver (all unit vectors: cosine = dot)
    val want = (for {
      (ia, va) <- all
      (ib, vb) <- all
      if ia < ib
      if va.zip(vb).map { case (x, y) => x * y }.sum >= 0.9
    } yield (ia, ib)).toSet
    assert(want.nonEmpty, "test setup: no planted pair reached cosine 0.9")
    assert(pairs == want, s"missed ${want -- pairs}, extra ${pairs -- want}")
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

  test("minhash-LSH reproduces the exact all-pairs shingle jaccard>=0.9 set") {
    val lsh = VectorOps.queries("dedup_minhash_lsh")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // Exact ground truth: all-pairs shingle jaccard in-driver (500 docs).
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        VectorOps.shingles3(r.getAs[String]("text")).toSet)
    val exact = (for {
      (ia, wa) <- docs
      (ib, wb) <- docs
      if ia < ib
      jac = wa.intersect(wb).size.toDouble / wa.union(wb).size
      if jac >= 0.9
    } yield (ia, ib)).toSet
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).take(5)}, extra ${(lsh -- exact).take(5)}")
  }

  test("anchored filtered ANN: neighbors share the query's label, ranks are sane") {
    val labels = graft.Tables.embeddings(spark, Sf)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Number]("label").longValue()).toMap
    val rows = VectorOps.queries("ann_anchor_filtered_topk")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // the label predicate composed with cell pruning must never leak a
    // cross-label candidate into the results
    assert(rows.forall(r =>
      labels(r.getAs[Long]("qid")) == labels(r.getAs[Long]("nid"))),
      "a neighbor escaped the label filter")
    // per query: ranks start at 1, are contiguous, and cosines non-increasing
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length).toSeq,
        s"query $q ranks not contiguous")
      val cs = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"query $q cosines not non-increasing")
    }
    // the anchored index must beat blind hashing: exact filtered top-1
    // found in the approximate top-3 for at least a third of the queries
    // (measured 60% at sf0.01; sign-LSH cells managed 20-30%)
    val exact = VectorOps.queries("sim_filtered_topk")(spark, Sf)
      .collect().filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    val approx = rows.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("nid")).toSet).toMap
    val hits = exact.count { case (q, n1) => approx.getOrElse(q, Set.empty).contains(n1) }
    assert(hits.toDouble / exact.size >= 1.0 / 3,
      s"anchored recall ${hits.toDouble / exact.size} of ${exact.size} queries")
  }
}
