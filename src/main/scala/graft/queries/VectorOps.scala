package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search + near-dedup over embeddings and documents.
  *
  * Scale shapes:
  *  - brute-force cosine top-k: broadcast the (small) query set, scan the big
  *    side once — the exact baseline, linear in corpus size;
  *  - LSH (random hyperplane) top-k: shuffle on bucket id, compare within
  *    buckets only — the approximate scale path;
  *  - MinHash-LSH near-dup: banded signature group-join (never all-pairs),
  *    then exact jaccard verification on the candidates.
  */
object VectorOps {

  /** Sequential-fold dot product of two array<double> columns (codegen'd;
    * same left-to-right summation order as the DuckDB oracle's list_sum). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic random hyperplanes for sign-LSH (seeded, code not data). */
  private[queries] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact ANN baseline: brute-force cosine top-3 for sampled queries ----
    "sim_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val q = broadcast(emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("e").as("qe")))
      val scored = emb.join(q, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"), cosine(col("qe"), col("e")).as("c"))
      val w = Window.partitionBy("qid").orderBy(col("c").desc, col("nid"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("nid"), round(col("c"), 6).as("cos"))
        .orderBy("qid", "rnk")
    }),

    // ---- approximate ANN: multi-table sign-LSH, compare within buckets ----
    // Standard OR-amplification: L tables of k hyperplane sign bits each; a
    // pair is a candidate if it collides in ANY table (recall ~1-(1-p^k)^L).
    // The signature table carries only (id, table, bucket) — candidate
    // generation shuffles ids, never embeddings. No SQL oracle (hyperplanes
    // live in code); recall vs brute force is pinned in VectorOpsSpec.
    "ann_lsh_topk" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val kBits = 4
      val nTables = 16
      val planes = hyperplanes(kBits * nTables, dim = 64, seed = 42L)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val sigs = emb.as[(Long, Array[Double])].flatMap { case (id, e) =>
        (0 until nTables).map { tbl =>
          var b = 0
          var p = 0
          while (p < kBits) {
            var acc = 0.0
            val pl = planes(tbl * kBits + p)
            var i = 0
            while (i < e.length && i < pl.length) { acc += e(i) * pl(i); i += 1 }
            if (acc > 0) b |= (1 << p)
            p += 1
          }
          (id, tbl, b)
        }
      }.toDF("vec_id", "tbl", "bucket")
      val cand = sigs.as("x").join(sigs.as("y"), Seq("tbl", "bucket"))
        .filter(col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("qid"), col("y.vec_id").as("nid"))
        .distinct()
      val q = emb.select(col("vec_id").as("qid"), col("e").as("qe"))
      val n = emb.select(col("vec_id").as("nid"), col("e"))
      val w = Window.partitionBy("qid").orderBy(col("c").desc, col("nid"))
      cand.join(q, "qid").join(n, "nid")
        .select(col("qid"), col("nid"), cosine(col("qe"), col("e")).as("c"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("nid"), round(col("c"), 6).as("cos"))
        .orderBy("qid", "rnk")
    }),

    // ---- MinHash-LSH near-dup: 128 hashes, 32 bands x 4 rows ----
    // Miss probability at jaccard 0.9 is (1 - 0.9^4)^32 ~ 1.5e-15, so the
    // banded candidates + exact-jaccard verify reproduce the oracle's
    // all-pairs scan without ever materializing all pairs.
    "dedup_minhash_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("w"))
      val sigs = docs
        .withColumn("mh", expr(
          "transform(sequence(0, 127), s -> array_min(transform(w, x -> xxhash64(s, x))))"))
        .withColumn("band", explode(expr(
          """transform(sequence(0, 31), b -> struct(b AS band_id,
            |  xxhash64(b, element_at(mh, b*4+1), element_at(mh, b*4+2),
            |           element_at(mh, b*4+3), element_at(mh, b*4+4)) AS sig))""".stripMargin)))
        .select(col("doc_id"), col("band.band_id"), col("band.sig"))
      val cand = sigs.as("x").join(sigs.as("y"),
          col("x.band_id") === col("y.band_id") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      val wa = docs.select(col("doc_id").as("id_a"), col("w").as("wa"))
      val wb = docs.select(col("doc_id").as("id_b"), col("w").as("wb"))
      cand.join(wa, "id_a").join(wb, "id_b")
        .withColumn("jac",
          size(array_intersect(col("wa"), col("wb"))).cast("double") /
            size(array_union(col("wa"), col("wb"))))
        .filter(col("jac") >= 0.9)
        .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
        .orderBy("id_a", "id_b")
    }),

    // ---- SimHash near-dup: 64-bit signature, 4x16-bit segment blocking ----
    // Hamming <= 3 guarantees at least one of the 4 segments is equal, so
    // segment-equality grouping finds every qualifying pair without an
    // all-pairs scan. No SQL oracle (xxhash64 not in DuckDB); pinned in spec.
    "dedup_simhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("hs", expr("transform(w, x -> xxhash64(x))"))
        .withColumn("simhash", expr(
          """aggregate(sequence(0, 63), 0L, (acc, b) ->
            |  acc + IF(aggregate(hs, 0L,
            |    (a, h) -> a + IF((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0L,
            |    shiftleft(1L, b), 0L))""".stripMargin))
        .select("doc_id", "simhash")
      val segs = docs.withColumn("seg", explode(expr(
          "transform(sequence(0, 3), k -> struct(k AS seg_id, shiftright(simhash, k*16) & 65535 AS seg_val))")))
        .select(col("doc_id"), col("simhash"), col("seg.seg_id"), col("seg.seg_val"))
      segs.as("x").join(segs.as("y"),
          col("x.seg_id") === col("y.seg_id") && col("x.seg_val") === col("y.seg_val") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id % 50 = 0),
        |p AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |    list_sum(list_transform(list_zip(q.qe, e.emb), s -> s[1]*s[2])) /
        |      (sqrt(list_sum(list_transform(q.qe, x -> x*x))) *
        |       sqrt(list_sum(list_transform(e.emb, x -> x*x)))) AS c
        |  FROM q JOIN e ON e.vec_id != q.qid)
        |SELECT qid, rnk, nid, round(c, 6) AS cos
        |FROM (SELECT qid, nid, c,
        |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rnk
        |      FROM p)
        |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.w, b.w))::DOUBLE / len(list_distinct(a.w || b.w)), 6) AS jac
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.w, b.w))::DOUBLE / len(list_distinct(a.w || b.w)) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
  )
}
