package graft.queries

/** DuckDB-SQL reconstruction of the TRAINED ANN indexes, so the driver can
  * hash-check the k-means IVF / PQ / IVFPQ pipelines end-to-end instead of
  * settling for a recall-floor certificate.
  *
  * This is possible because the whole index build is deterministic and every
  * floating-point operation has a defined order on both engines:
  *
  *  - the codebook sample is `ORDER BY vec_id LIMIT 4096`
  *    ([[VectorOps.indexSample]]) — reproducible as a SQL window;
  *  - [[VectorOps.lloyd]] seeds centers by the pure id rule
  *    `sample((i*step) % n)` and runs a FIXED number of iterations; its
  *    per-cell sums accumulate in sample (= vec_id) order, so the SQL mirror
  *    sums with `list_sum(list(v ORDER BY sid))` — bit-identical IEEE adds;
  *  - [[VectorOps.nearestCells]] accumulates squared distance left-to-right
  *    and breaks ties on the lower cell index (stable sort), which SQL
  *    mirrors as `row_number() OVER (ORDER BY l2, cid)`;
  *  - every dot product / norm on the Spark side is the codegen
  *    [[graft.functions.VecDot]] (strict left-to-right fold), already proven
  *    bit-identical to DuckDB's `list_sum(list_transform(list_zip(..)))`
  *    by the anchor-quantizer oracle (`ann_anchor_filtered_topk`).
  *
  * Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference, and a
  * 10-iteration chain where each step references the previous 2-3 times
  * would otherwise expand exponentially (measured: the un-materialized form
  * does not finish; the materialized form runs in seconds).
  */
private[queries] object AnnOracleSql {
  private val Dim = 64
  private val SampleLimit = 4096
  private val Iters = 10 // VectorOps.lloyd call sites all use iters = 10

  private def l2(v: String, c: String): String =
    s"list_sum(list_transform(list_zip($v, $c), p -> (p[1]-p[2])*(p[1]-p[2])))"
  private def dot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), s -> s[1]*s[2]))"
  private def nrm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> x*x)))"

  /** (vec_id, emb, label) + the ordered bounded sample (sid, v).
    * `sampleWhere` restricts the training sample (e.g. to the base slice
    * of an append-maintained index) without restricting the corpus. */
  private def baseCtes(sampleWhere: String = ""): Seq[String] = Seq(
    """e AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
      |  FROM embeddings)""".stripMargin,
    s"""sm AS MATERIALIZED (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sid, emb AS v
      |  FROM (SELECT vec_id, emb FROM e${
        if (sampleWhere.nonEmpty) s" WHERE $sampleWhere" else ""}
      |        ORDER BY vec_id LIMIT $SampleLimit))""".stripMargin)

  /** The Lloyd chain for all `m` subspaces at once over source CTE `src`
    * (must provide (sid, v: DOUBLE[])). Emits s$tag exploded by subspace and
    * c$tag0..c$tag$Iters; the final codebook CTE c$tag$Iters has
    * (sub, cid, c: DOUBLE[]). sub*subDim slicing is 1-based inclusive. */
  private def kmeansCtes(tag: String, src: String, k: Int, m: Int,
      subDim: Int): Seq[String] = {
    val s = scala.collection.mutable.ArrayBuffer[String]()
    s += s"""s$tag AS MATERIALIZED (
      |  SELECT sid, r.sub, v[(r.sub*$subDim+1):((r.sub+1)*$subDim)] AS v
      |  FROM $src, range($m) r(sub))""".stripMargin
    s += s"""c${tag}0 AS MATERIALIZED (
      |  SELECT s.sub, i.cid, s.v AS c
      |  FROM (SELECT cid,
      |          (cid * GREATEST(1, (SELECT count(*) FROM $src) // $k))
      |            % (SELECT count(*) FROM $src) AS sid
      |        FROM range($k) t(cid)) i
      |  JOIN s$tag s USING (sid))""".stripMargin
    for (it <- 0 until Iters) {
      s += s"""a$tag$it AS MATERIALIZED (
        |  SELECT sid, sub, cid FROM (
        |    SELECT s.sid, s.sub, c.cid,
        |      row_number() OVER (PARTITION BY s.sid, s.sub
        |        ORDER BY ${l2("s.v", "c.c")}, c.cid) AS rn
        |    FROM s$tag s JOIN c$tag$it c USING (sub)) WHERE rn = 1)"""
        .stripMargin
      s += s"""u$tag$it AS MATERIALIZED (
        |  SELECT a.sub, a.cid, x.pos,
        |    list_sum(list(x.ev ORDER BY a.sid)) / count(*) AS cv
        |  FROM a$tag$it a JOIN
        |    (SELECT sid, sub, generate_subscripts(v, 1) AS pos, unnest(v) AS ev
        |     FROM s$tag) x USING (sid, sub)
        |  GROUP BY a.sub, a.cid, x.pos)""".stripMargin
      s += s"""c$tag${it + 1} AS MATERIALIZED (
        |  SELECT p.sub, p.cid, coalesce(nw.c, p.c) AS c
        |  FROM c$tag$it p LEFT JOIN
        |    (SELECT sub, cid, list(cv ORDER BY pos) AS c
        |     FROM u$tag$it GROUP BY sub, cid) nw USING (sub, cid))"""
        .stripMargin
    }
    s.toSeq
  }

  /** Cell ranking of `srcRows` (must provide (vec_id, emb)) against the
    * m=1 codebook `book`: row_number (l2, cid) — rn=1 is the vector's cell,
    * rn<=nProbe a query's probe set. */
  private def cellRank(name: String, srcRows: String, book: String): String =
    s"""$name AS MATERIALIZED (
      |  SELECT vec_id, cid, rn FROM (
      |    SELECT s.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY s.vec_id
      |        ORDER BY ${l2("s.emb", "c.c")}, c.cid) AS rn
      |    FROM $srcRows s, $book c))""".stripMargin

  private def withClause(ctes: Seq[String], select: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + select

  private def topKSelect(topK: Int): String =
    s"""SELECT qid, rnk, nid, round(c, 6) AS cos
      |FROM (SELECT qid, nid, c,
      |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rnk
      |      FROM p)
      |WHERE rnk <= $topK ORDER BY qid, rnk""".stripMargin

  /** Oracle for [[VectorOps.annIvfTopK]] / [[VectorOps.annIvfFilteredTopK]]
    * / [[VectorOps.annIvfDeleteTopK]]: trained coarse quantizer, corpus
    * cell assignment, nProbe probing, exact cosine inside probed cells
    * (optionally label-composed). `liveWhere` restricts the QUERYABLE
    * index rows (and hence the query sample drawn from them) without
    * touching the training sample — the delete path's contract: the
    * codebook was trained before the deletions, tombstoned vectors are
    * neither candidates nor queries. */
  def ivfTopK(k: Int, nProbe: Int, topK: Int, filtered: Boolean,
      sampleWhere: String = "", liveWhere: String = ""): String = {
    val labelJoin = if (filtered) " AND en.label = q.ql" else ""
    val qLabel = if (filtered) ", eq.label AS ql" else ""
    val ctes = baseCtes(sampleWhere) ++
      kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++ Seq(
      cellRank("cr", "e", s"cv$Iters"),
      s"""en AS MATERIALIZED (
        |  SELECT e.vec_id, e.emb, e.label, ${nrm("e.emb")} AS nrm,
        |    cr.cid AS cell
        |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1${
          if (liveWhere.nonEmpty) s"\n        |  WHERE $liveWhere" else ""})"""
        .stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT eq.vec_id AS qid, eq.emb AS qe, eq.nrm AS qn$qLabel,
        |    cr.cid AS cell
        |  FROM en eq JOIN cr ON cr.vec_id = eq.vec_id AND cr.rn <= $nProbe
        |  WHERE eq.vec_id % 50 = 0)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT q.qid, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM q JOIN en ON en.cell = q.cell$labelJoin
        |    AND en.vec_id != q.qid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }

  /** Oracle for `ann_ivf_nprobe_sweep`: the recall-vs-nProbe tradeoff
    * curve replayed exactly. One trained codebook + cell assignment (the
    * same CTE chain as ivfTopK), then for EVERY swept nProbe value the
    * probe set is the cells with rank <= n_probe (nested by construction),
    * candidates are ranked per (n_probe, query), and recall@topK of the
    * exact brute-force top-1 is emitted as integer hit counts plus their
    * IEEE-exact ratio — every curve point hash-checked. */
  def ivfRecallCurve(k: Int, nProbes: Seq[Int], topK: Int): String = {
    val maxNp = nProbes.max
    val npList = nProbes.sorted.mkString("[", ", ", "]")
    val ctes = baseCtes() ++ kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++ Seq(
      cellRank("cr", "e", s"cv$Iters"),
      s"""en AS MATERIALIZED (
        |  SELECT e.vec_id, e.emb, ${nrm("e.emb")} AS nrm, cr.cid AS cell
        |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, nrm AS qn FROM en
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""pc AS MATERIALIZED (
        |  SELECT q.qid, cr.cid AS cell, cr.rn AS crk
        |  FROM q JOIN cr ON cr.vec_id = q.qid AND cr.rn <= $maxNp)"""
        .stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT pc.qid, pc.crk, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM pc JOIN q ON q.qid = pc.qid
        |  JOIN en ON en.cell = pc.cell AND en.vec_id != pc.qid)"""
        .stripMargin,
      s"""np AS MATERIALIZED (SELECT unnest($npList) AS n_probe)""",
      s"""a AS MATERIALIZED (
        |  SELECT n_probe, qid, nid FROM (
        |    SELECT np.n_probe, p.qid, p.nid,
        |      row_number() OVER (PARTITION BY np.n_probe, p.qid
        |        ORDER BY p.c DESC, p.nid) AS rnk
        |    FROM np JOIN p ON p.crk <= np.n_probe)
        |  WHERE rnk <= $topK)""".stripMargin,
      s"""xq AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, ${nrm("emb")} AS qn FROM e
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""t1 AS MATERIALIZED (
        |  SELECT qid, nid AS top1 FROM (
        |    SELECT xq.qid, e.vec_id AS nid,
        |      row_number() OVER (PARTITION BY xq.qid ORDER BY
        |        ${dot("xq.qe", "e.emb")} / (xq.qn * ${nrm("e.emb")}) DESC,
        |        e.vec_id) AS rnk
        |    FROM xq JOIN e ON e.vec_id != xq.qid)
        |  WHERE rnk = 1)""".stripMargin,
      """qx AS MATERIALIZED (
        |  SELECT np.n_probe, t1.qid, t1.top1 FROM np, t1)""".stripMargin,
      """h AS MATERIALIZED (
        |  SELECT qx.n_probe, qx.qid,
        |    max(CASE WHEN a.nid = qx.top1 THEN 1 ELSE 0 END) AS hit
        |  FROM qx LEFT JOIN a ON a.n_probe = qx.n_probe AND a.qid = qx.qid
        |  GROUP BY qx.n_probe, qx.qid)""".stripMargin)
    withClause(ctes,
      """SELECT CAST(n_probe AS BIGINT) AS n_probe,
        |  CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(hit) AS BIGINT) AS n_hits,
        |  CAST(sum(hit) AS DOUBLE) / count(*) AS recall
        |FROM h GROUP BY n_probe ORDER BY n_probe""".stripMargin)
  }

  /** Oracle for `sim_eval_rank_metrics`: the trained-IVF top-10 (same CTE
    * chain as ivfTopK) scored against the exact-cosine top-3 graded
    * truth — MRR and nDCG@10 per query, with the 6dp-quantized discount
    * table shared VERBATIM with the Spark expression
    * ([[VectorOps.NdcgWeightCase]]) so no libm log enters the hash. */
  def evalRankMetrics(k: Int, nProbe: Int): String = {
    val ctes = baseCtes() ++ kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++ Seq(
      cellRank("cr", "e", s"cv$Iters"),
      s"""en AS MATERIALIZED (
        |  SELECT e.vec_id, e.emb, ${nrm("e.emb")} AS nrm, cr.cid AS cell
        |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT eq.vec_id AS qid, eq.emb AS qe, eq.nrm AS qn, cr.cid AS cell
        |  FROM en eq JOIN cr ON cr.vec_id = eq.vec_id AND cr.rn <= $nProbe
        |  WHERE eq.vec_id % 50 = 0)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT q.qid, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM q JOIN en ON en.cell = q.cell AND en.vec_id != q.qid)"""
        .stripMargin,
      """ann AS MATERIALIZED (
        |  SELECT qid, rnk, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |        ORDER BY c DESC, nid) AS rnk FROM p)
        |  WHERE rnk <= 10)""".stripMargin,
      s"""xq AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, ${nrm("emb")} AS qn FROM e
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""xp AS MATERIALIZED (
        |  SELECT xq.qid, e.vec_id AS nid,
        |    ${dot("xq.qe", "e.emb")} / (xq.qn * ${nrm("e.emb")}) AS c
        |  FROM xq JOIN e ON e.vec_id != xq.qid)""".stripMargin,
      """truth AS MATERIALIZED (
        |  SELECT qid, nid, CAST(4 - rnk AS INT) AS grade FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |        ORDER BY c DESC, nid) AS rnk FROM xp)
        |  WHERE rnk <= 3)""".stripMargin,
      s"""pq AS MATERIALIZED (
        |  SELECT a.qid,
        |    min(CASE WHEN t.grade IS NOT NULL THEN a.rnk END) AS first_rel,
        |    sum(CASE WHEN t.grade IS NOT NULL
        |          THEN CAST(t.grade * (${VectorOps.NdcgWeightCase})
        |               AS DECIMAL(13,6))
        |          ELSE CAST(0.000000 AS DECIMAL(13,6)) END) AS dcg_d
        |  FROM ann a LEFT JOIN truth t ON t.qid = a.qid AND t.nid = a.nid
        |  GROUP BY a.qid)""".stripMargin)
    withClause(ctes,
      s"""SELECT qid,
        |  coalesce(round(1.0 / first_rel, 6), 0.0) AS mrr,
        |  CAST(dcg_d AS DOUBLE) AS dcg,
        |  round(CAST(dcg_d AS DOUBLE) / ${VectorOps.NdcgIdeal}, 6) AS ndcg
        |FROM pq ORDER BY qid""".stripMargin)
  }

  /** Oracle for `sim_rrf_ann_topk` — RRF with the IVF index as the dense
    * side: the trained IVF top-20 (same CTE chain as ivfTopK) fused with
    * the BM25 top-20 under union semantics. The proof of the fusion's
    * index-swap claim: the dense ranking changed engines, the fusion text
    * did not, and the whole composition still hash-matches. */
  def rrfAnnTopK(k: Int, nProbe: Int): String = {
    val ctes = Seq(graft.queries.LlmText.bm25OracleCtes(topN = 20)) ++
      baseCtes() ++ kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++ Seq(
      cellRank("cr", "e", s"cv$Iters"),
      s"""en AS MATERIALIZED (
        |  SELECT e.vec_id, e.emb, ${nrm("e.emb")} AS nrm, cr.cid AS cell
        |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT eq.vec_id AS qid, eq.emb AS qe, eq.nrm AS qn, cr.cid AS cell
        |  FROM en eq JOIN cr ON cr.vec_id = eq.vec_id AND cr.rn <= $nProbe
        |  WHERE eq.vec_id % 50 = 0)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT q.qid, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM q JOIN en ON en.cell = q.cell AND en.vec_id != q.qid)"""
        .stripMargin,
      """annr AS MATERIALIZED (
        |  SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid
        |  FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |          ORDER BY c DESC, nid) AS rnk FROM p)
        |  WHERE rnk <= 20)""".stripMargin,
      """fused AS MATERIALIZED (
        |  SELECT coalesce(a.qid, b.qid) AS qid, coalesce(a.nid, b.nid) AS nid,
        |    coalesce(1.0 / (60.0 + CAST(a.rnk AS DOUBLE)), 0.0) +
        |    coalesce(1.0 / (60.0 + CAST(b.rnk AS DOUBLE)), 0.0) AS rrf
        |  FROM annr a FULL JOIN bmr b ON a.qid = b.qid AND a.nid = b.nid)"""
        .stripMargin)
    withClause(ctes,
      """SELECT qid, CAST(rk AS BIGINT) AS rnk, nid, round(rrf, 6) AS rrf
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY rrf DESC, nid) AS rk FROM fused)
        |WHERE rk <= 3 ORDER BY qid, rnk""".stripMargin)
  }

  /** Oracle for `sim_rrf_swap_overlap`: BOTH fusion pipelines — exact
    * dense and trained-IVF dense, each fused with the same BM25 top-20 —
    * composed in one query, then the per-query top-3 overlap. An exact,
    * hash-checked end-metric of the index swap (not a floor gate). */
  def rrfSwapOverlap(k: Int, nProbe: Int): String =
    withClause(rrfSwapCtes(k, nProbe),
      s"""SELECT qid, n_common FROM ($RrfSwapPerQuery) ORDER BY qid""")

  /** Oracle for `sim_rrf_swap_gate`: the overlap measurement promoted to a
    * pinned FLOOR — mean per-query top-3 overlap >= 5/3, checked in pure
    * integer arithmetic (3·sum >= 5·count, no FP boundary), so an
    * index-quality regression fails the driver hash instead of drifting
    * silently through the report entry. The floor sits BELOW the weakest
    * measured mean (2.0 exactly, at sf0.01) by a one-overlap-per-three-
    * queries margin — a floor of 2 had zero slack against benign IVF
    * tie-shuffle. */
  def rrfSwapGate(k: Int, nProbe: Int): String =
    withClause(rrfSwapCtes(k, nProbe),
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(n_common) AS BIGINT) AS n_common_total,
        |  (3 * sum(n_common) >= 5 * count(*)) AS overlap_ok
        |FROM ($RrfSwapPerQuery)""".stripMargin)

  /** Oracle for `sim_rrf_swap_sampled_gate`: [[rrfSwapGate]] restricted to
    * the deterministic 1-in-`every` query subsample — the scale form whose
    * exact-dense side stays linear in the corpus. Same integer-arithmetic
    * floor. */
  def rrfSwapGateSampled(k: Int, nProbe: Int, every: Long): String =
    withClause(rrfSwapCtes(k, nProbe),
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(n_common) AS BIGINT) AS n_common_total,
        |  (3 * sum(n_common) >= 5 * count(*)) AS overlap_ok
        |FROM ($RrfSwapPerQuery) WHERE qid % $every = 0""".stripMargin)

  /** Per-query top-3 overlap of the two fusions (x3 = exact-dense, a3 =
    * IVF-dense), shared by the report and gate selects above. */
  private val RrfSwapPerQuery =
    """SELECT qq.qid, CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_common
      |FROM (SELECT DISTINCT qid FROM x3) qq LEFT JOIN
      |  (SELECT x3.qid, count(*) AS cnt
      |   FROM x3 JOIN a3 ON a3.qid = x3.qid AND a3.nid = x3.nid
      |   GROUP BY x3.qid) c ON c.qid = qq.qid""".stripMargin

  private def rrfSwapCtes(k: Int, nProbe: Int): Seq[String] = {
    def fuse(dense: String, out: String): Seq[String] = Seq(
      s"""$out AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |        ORDER BY rrf DESC, nid) AS rk
        |    FROM (SELECT coalesce(a.qid, b.qid) AS qid,
        |            coalesce(a.nid, b.nid) AS nid,
        |            coalesce(1.0 / (60.0 + CAST(a.rnk AS DOUBLE)), 0.0) +
        |            coalesce(1.0 / (60.0 + CAST(b.rnk AS DOUBLE)), 0.0)
        |              AS rrf
        |          FROM $dense a FULL JOIN bmr b
        |            ON a.qid = b.qid AND a.nid = b.nid))
        |  WHERE rk <= 3)""".stripMargin)
    val ctes = Seq(graft.queries.LlmText.bm25OracleCtes(topN = 20)) ++
      baseCtes() ++ kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++ Seq(
      cellRank("cr", "e", s"cv$Iters"),
      s"""en AS MATERIALIZED (
        |  SELECT e.vec_id, e.emb, ${nrm("e.emb")} AS nrm, cr.cid AS cell
        |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT eq.vec_id AS qid, eq.emb AS qe, eq.nrm AS qn, cr.cid AS cell
        |  FROM en eq JOIN cr ON cr.vec_id = eq.vec_id AND cr.rn <= $nProbe
        |  WHERE eq.vec_id % 50 = 0)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT q.qid, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM q JOIN en ON en.cell = q.cell AND en.vec_id != q.qid)"""
        .stripMargin,
      """annr AS MATERIALIZED (
        |  SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid
        |  FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |          ORDER BY c DESC, nid) AS rnk FROM p)
        |  WHERE rnk <= 20)""".stripMargin,
      s"""xq AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, ${nrm("emb")} AS qn FROM e
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""xp AS MATERIALIZED (
        |  SELECT xq.qid, e.vec_id AS nid,
        |    ${dot("xq.qe", "e.emb")} / (xq.qn * ${nrm("e.emb")}) AS c
        |  FROM xq JOIN e ON e.vec_id != xq.qid)""".stripMargin,
      """xr AS MATERIALIZED (
        |  SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid
        |  FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |          ORDER BY c DESC, nid) AS rnk FROM xp)
        |  WHERE rnk <= 20)""".stripMargin) ++
      fuse("annr", "a3") ++ fuse("xr", "x3")
    ctes
  }

  /** Oracle for [[VectorOps.annSqTopK]] — scalar quantization: per-dim
    * corpus [min, max] (order-free aggregates), op-for-op encode
    * (floor((v-mn)/(mx-mn)·255) clamped) and mid-bin decode
    * (mn + (code+0.5)·(mx-mn)/255), the ADC fold in dimension order, the
    * same shortlist rank and exact re-rank. */
  def sqTopK(topK: Int): String = {
    val ctes = baseCtes() ++ Seq(
      """mm AS MATERIALIZED (
        |  SELECT pos, min(v) AS mn, max(v) AS mx
        |  FROM (SELECT generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
        |        FROM e) GROUP BY pos)""".stripMargin,
      """dc AS MATERIALIZED (
        |  SELECT vec_id, list(mn +
        |      (CASE WHEN mx = mn THEN 0
        |            ELSE LEAST(GREATEST(CAST(floor((v - mn) / (mx - mn)
        |              * 255.0) AS BIGINT), 0), 255) END
        |       + 0.5) * (mx - mn) / 255.0
        |    ORDER BY pos) AS de
        |  FROM (SELECT vec_id, generate_subscripts(emb, 1) AS pos,
        |          unnest(emb) AS v FROM e) x JOIN mm USING (pos)
        |  GROUP BY vec_id)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, ${nrm("emb")} AS qn FROM e
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""sl AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT q.qid, d.vec_id AS nid,
        |      row_number() OVER (PARTITION BY q.qid ORDER BY
        |        (${dot("q.qe", "d.de")} /
        |         sqrt(list_sum(list_transform(d.de, x -> x*x)))) / q.qn
        |          DESC, d.vec_id) AS prnk
        |    FROM q JOIN dc d ON d.vec_id != q.qid)
        |  WHERE prnk <= ${topK * 10})""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT sl.qid, sl.nid,
        |    ${dot("a.emb", "b.emb")} / (${nrm("a.emb")} * ${nrm("b.emb")}) AS c
        |  FROM sl JOIN e a ON a.vec_id = sl.qid
        |    JOIN e b ON b.vec_id = sl.nid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }

  /** Oracle for [[VectorOps.semDedup]] — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540): the SAME trained coarse quantizer as ivfTopK, then
    * within each cell the greedy duplicate scan the released implementation
    * runs on the per-cluster similarity matrix. A vector is DROPPED iff some
    * other vector of its cell precedes it in (sim-to-centroid ASC, vec_id
    * ASC) order and has cosine >= tau with it — so the survivor of each
    * duplicate group is the one FARTHEST from the centroid, the paper's
    * keep rule. Every float the verdict compares is an ordered fold both
    * engines share (dot/nrm as elsewhere; simc reuses the trained center
    * lists verbatim), so keep flags hash-match bit-exactly. `sampleWhere`
    * restricts the Lloyd training sample (the append path's stale
    * base-trained codebook) without restricting the verdicted corpus. */
  def semDedup(k: Int, tau: String, sampleWhere: String = ""): String = {
    val ctes = baseCtes(sampleWhere) ++
      kmeansCtes("v", "sm", k, m = 1, subDim = Dim) ++
      Seq(
        cellRank("cr", "e", s"cv$Iters"),
        s"""cn AS MATERIALIZED (
          |  SELECT cid, c, ${nrm("c")} AS cnrm FROM cv$Iters)""".stripMargin,
        s"""en AS MATERIALIZED (
          |  SELECT e.vec_id, e.emb, ${nrm("e.emb")} AS nrm, cn.cid AS cell,
          |    ${dot("e.emb", "cn.c")} / (${nrm("e.emb")} * cn.cnrm) AS simc
          |  FROM e JOIN cr ON cr.vec_id = e.vec_id AND cr.rn = 1
          |  JOIN cn ON cn.cid = cr.cid)""".stripMargin,
        s"""dr AS MATERIALIZED (
          |  SELECT DISTINCT a.vec_id
          |  FROM en a JOIN en b ON a.cell = b.cell AND a.vec_id != b.vec_id
          |    AND (b.simc < a.simc OR (b.simc = a.simc AND b.vec_id < a.vec_id))
          |  WHERE ${dot("a.emb", "b.emb")} / (a.nrm * b.nrm) >= $tau)"""
          .stripMargin)
    withClause(ctes,
      s"""SELECT en.vec_id, CAST(en.cell AS BIGINT) AS cell,
        |  round(en.simc, 6) AS sim_centroid, dr.vec_id IS NULL AS keep
        |FROM en LEFT JOIN dr ON dr.vec_id = en.vec_id
        |ORDER BY en.vec_id""".stripMargin)
  }

  /** Oracle for [[VectorOps.annLshTopK]]: even the seeded RNG is replayed
    * in SQL. [[VectorOps.hyperplanes]] draws +-1 plane coefficients from
    * `java.util.Random(seed).nextBoolean()` — a 48-bit LCG (seed' =
    * (seed * 0x5DEECE66D + 0xB) mod 2^48, boolean = bit 47 of the updated
    * seed) whose sequence a recursive CTE regenerates exactly (HUGEINT
    * intermediate for the 82-bit product). Coefficients fill row-major
    * (plane-major, then dimension), planes group kBits-per-table; a
    * vector's bucket in a table sets bit p iff its dot with plane p is
    * strictly positive (the same left-to-right summation both engines
    * share); candidates are bucket collisions in any table, scored with
    * exact cosine and ranked. */
  /** The seeded ±1 random-projection CTE chain shared by the projection
    * entry and the projected-space ranking: the LCG replay of
    * `java.util.Random(seed).nextBoolean()` (same as lshTopK), grouped
    * row-major into kOut plane lists, then y = (R·e)·(1/√kOut) with the
    * shared left-to-right dot fold. kOut must be 16 so the scale 0.25 is
    * exactly representable (and exactly transcribed) on both engines. */
  /** Just the seeded ±1 matrix replay (lcg + pm CTEs) — shared by the
    * embedding-projection chain below and the clustered recall gate,
    * which projects a DERIVED corpus instead of the stored embeddings. */
  private def matrixCtes(kOut: Int, seed: Long): Seq[String] = {
    require(kOut == 16, "projection oracle transcribes the exact scale 1/sqrt(16)")
    val steps = kOut * Dim
    val s0 = (seed ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    Seq(
      s"""RECURSIVE lcg(i, s) AS (
        |  SELECT 0, CAST($s0 AS BIGINT)
        |  UNION ALL
        |  SELECT i + 1, CAST((CAST(s AS HUGEINT) * 25214903917 + 11)
        |                     % 281474976710656 AS BIGINT)
        |  FROM lcg WHERE i < $steps)""".stripMargin,
      s"""pm AS MATERIALIZED (
        |  SELECT (i - 1) // $Dim AS jd,
        |    list(CASE WHEN (s >> 47) & 1 = 1 THEN 1.0 ELSE -1.0 END
        |         ORDER BY i) AS p
        |  FROM lcg WHERE i >= 1 GROUP BY (i - 1) // $Dim)""".stripMargin)
  }

  private def projectionCtes(kOut: Int, seed: Long): Seq[String] =
    matrixCtes(kOut, seed) ++ Seq(
      """e AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings)""".stripMargin,
      s"""yv AS MATERIALIZED (
        |  SELECT e.vec_id, pm.jd,
        |    ${dot("e.emb", "pm.p")} * 0.25 AS y
        |  FROM e, pm)""".stripMargin)

  /** Oracle for `emb_random_projection`: the JL transform itself, one thin
    * (vec_id, dim_idx, y) row per projected coordinate — raw doubles,
    * identical IEEE bits by shared fold order. */
  def randomProjection(kOut: Int, seed: Long): String =
    withClause(projectionCtes(kOut, seed),
      """SELECT vec_id, CAST(jd AS BIGINT) AS dim_idx, y
        |FROM yv ORDER BY vec_id, dim_idx""".stripMargin)

  /** Oracle for `sim_projected_topk`: brute-force cosine top-k computed in
    * the PROJECTED space — the whole reduce-then-rank pipeline replayed. */
  def projectedTopK(kOut: Int, seed: Long, topK: Int): String = {
    val ctes = projectionCtes(kOut, seed) ++ Seq(
      """pe AS MATERIALIZED (
        |  SELECT vec_id, list(y ORDER BY jd) AS emb FROM yv GROUP BY vec_id)"""
        .stripMargin,
      s"""en AS MATERIALIZED (
        |  SELECT vec_id, emb, ${nrm("emb")} AS nrm FROM pe)""".stripMargin,
      s"""q AS MATERIALIZED (
        |  SELECT vec_id AS qid, emb AS qe, nrm AS qn FROM en
        |  WHERE vec_id % 50 = 0)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT q.qid, en.vec_id AS nid,
        |    ${dot("q.qe", "en.emb")} / (q.qn * en.nrm) AS c
        |  FROM q JOIN en ON en.vec_id != q.qid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }

  /** Oracle for `proj_cluster_recall_gate`: the derived clustered corpus
    * (integer-exact anchor + 0.5·basis (+ 0.0625·self for planted ids)
    * mixing — element-wise, single add/mul per slot, bit-identical to
    * Spark's nested zip_with), the same ±1 matrix replay, and partner
    * top-1 recall counted in both the full and projected spaces. Every
    * ranked cosine is the shared left-to-right fold, so the counts are
    * deterministic across engines; the emitted row is counts + booleans. */
  def projClusterRecallGate(kOut: Int, seed: Long): String = {
    val ctes = matrixCtes(kOut, seed) ++ Seq(
      """e AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings)""".stripMargin,
      """anch AS MATERIALIZED (
        |  SELECT a.c, e.emb AS ae FROM (
        |    SELECT vec_id % 16 AS c, min(vec_id) AS aid
        |    FROM e GROUP BY vec_id % 16) a
        |  JOIN e ON e.vec_id = a.aid)""".stripMargin,
      """wb AS MATERIALIZED (
        |  SELECT x.vec_id, x.basis_id, b.emb AS be FROM (
        |    SELECT vec_id,
        |      CASE WHEN vec_id % 19 = 1 THEN vec_id - 1 ELSE vec_id END
        |        AS basis_id
        |    FROM e) x
        |  JOIN e b ON b.vec_id = x.basis_id)""".stripMargin,
      // derived vector: (anchor + 0.5*basis) then (+ 0.0625*self) — the
      // same two-step left-associated element adds as Spark's zip_withs
      """dv AS MATERIALIZED (
        |  SELECT wb.vec_id,
        |    CASE WHEN wb.vec_id % 19 = 1 THEN
        |      list_transform(list_zip(
        |        list_transform(list_zip(anch.ae, wb.be),
        |                       p -> p[1] + 0.5 * p[2]), o.emb),
        |        q -> q[1] + 0.0625 * q[2])
        |    ELSE list_transform(list_zip(anch.ae, wb.be),
        |                        p -> p[1] + 0.5 * p[2]) END AS v
        |  FROM wb JOIN anch ON anch.c = wb.basis_id % 16
        |  JOIN e o ON o.vec_id = wb.vec_id)""".stripMargin,
      s"""yd AS MATERIALIZED (
        |  SELECT dv.vec_id, pm.jd, ${dot("dv.v", "pm.p")} * 0.25 AS y
        |  FROM dv, pm)""".stripMargin,
      """pv AS MATERIALIZED (
        |  SELECT vec_id, list(y ORDER BY jd) AS v FROM yd GROUP BY vec_id)"""
        .stripMargin,
      s"""enf AS MATERIALIZED (
        |  SELECT vec_id, v, ${nrm("v")} AS nr FROM dv)""".stripMargin,
      s"""enp AS MATERIALIZED (
        |  SELECT vec_id, v, ${nrm("v")} AS nr FROM pv)""".stripMargin,
      s"""ff AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT q.vec_id AS qid, en.vec_id AS nid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${dot("q.v", "en.v")} / (q.nr * en.nr) DESC,
        |                 en.vec_id) AS rn
        |    FROM enf q JOIN enf en ON en.vec_id != q.vec_id
        |    WHERE q.vec_id % 19 = 1) WHERE rn = 1)""".stripMargin,
      s"""fp AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT q.vec_id AS qid, en.vec_id AS nid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${dot("q.v", "en.v")} / (q.nr * en.nr) DESC,
        |                 en.vec_id) AS rn
        |    FROM enp q JOIN enp en ON en.vec_id != q.vec_id
        |    WHERE q.vec_id % 19 = 1) WHERE rn = 1)""".stripMargin)
    withClause(ctes,
      """SELECT
        |  CAST((SELECT count(*) FROM dv WHERE vec_id % 19 = 1) AS BIGINT)
        |    AS n_pairs,
        |  CAST((SELECT count(*) FROM ff WHERE nid = qid - 1) AS BIGINT)
        |    AS full_top1_recall,
        |  CAST((SELECT count(*) FROM fp WHERE nid = qid - 1) AS BIGINT)
        |    AS proj_top1_recall,
        |  (SELECT count(*) FROM ff WHERE nid = qid - 1) =
        |    (SELECT count(*) FROM dv WHERE vec_id % 19 = 1)
        |    AS full_all_recalled,
        |  (SELECT count(*) FROM fp WHERE nid = qid - 1) * 20 >=
        |    (SELECT count(*) FROM dv WHERE vec_id % 19 = 1) * 19
        |    AS proj_recall_ge_95""".stripMargin)
  }

  def lshTopK(kBits: Int, nTables: Int, seed: Long, topK: Int): String = {
    val steps = nTables * kBits * Dim
    val s0 = (seed ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    val ctes = Seq(
      s"""RECURSIVE lcg(i, s) AS (
        |  SELECT 0, CAST($s0 AS BIGINT)
        |  UNION ALL
        |  SELECT i + 1, CAST((CAST(s AS HUGEINT) * 25214903917 + 11)
        |                     % 281474976710656 AS BIGINT)
        |  FROM lcg WHERE i < $steps)""".stripMargin,
      s"""pv AS MATERIALIZED (
        |  SELECT tbl, bit, list(coef ORDER BY j) AS p FROM (
        |    SELECT ((i - 1) // $Dim) // $kBits AS tbl,
        |           ((i - 1) // $Dim) % $kBits AS bit,
        |           (i - 1) % $Dim AS j,
        |           CASE WHEN (s >> 47) & 1 = 1 THEN 1.0 ELSE -1.0 END AS coef
        |    FROM lcg WHERE i >= 1)
        |  GROUP BY tbl, bit)""".stripMargin,
      """e AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings)""".stripMargin,
      s"""sg AS MATERIALIZED (
        |  SELECT e.vec_id, pv.tbl,
        |    CAST(sum(CASE WHEN ${dot("e.emb", "pv.p")} > 0
        |             THEN (1 << pv.bit) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM e, pv GROUP BY e.vec_id, pv.tbl)""".stripMargin,
      """cand AS MATERIALIZED (
        |  SELECT DISTINCT q.vec_id AS qid, y.vec_id AS nid
        |  FROM sg q JOIN sg y ON y.tbl = q.tbl AND y.bucket = q.bucket
        |    AND y.vec_id != q.vec_id
        |  WHERE q.vec_id % 50 = 0)""".stripMargin,
      s"""en AS MATERIALIZED (
        |  SELECT vec_id, emb, ${nrm("emb")} AS nrm FROM e)""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT cand.qid, cand.nid,
        |    ${dot("qe.emb", "ne.emb")} / (qe.nrm * ne.nrm) AS c
        |  FROM cand JOIN en qe ON qe.vec_id = cand.qid
        |    JOIN en ne ON ne.vec_id = cand.nid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }

  /** Oracle for [[VectorOps.annPqTopK]]: per-subspace trained codebooks,
    * corpus nibble codes, per-query ADC table, full ADC scan (sum of table
    * lookups in subspace order — the order pq_adc folds in), shortlist
    * topK*10, exact cosine re-rank. */
  def pqTopK(m: Int, k: Int, topK: Int): String = {
    val sub = Dim / m
    val ctes = baseCtes() ++ kmeansCtes("p", "sm", k, m, sub) ++ Seq(
      s"""esub AS MATERIALIZED (
        |  SELECT vec_id, r.sub, emb[(r.sub*$sub+1):((r.sub+1)*$sub)] AS v
        |  FROM e, range($m) r(sub))""".stripMargin,
      s"""codes AS MATERIALIZED (
        |  SELECT vec_id AS nid, sub, cid FROM (
        |    SELECT s.vec_id, s.sub, c.cid,
        |      row_number() OVER (PARTITION BY s.vec_id, s.sub
        |        ORDER BY ${l2("s.v", "c.c")}, c.cid) AS rn
        |    FROM esub s JOIN cp$Iters c USING (sub)) WHERE rn = 1)"""
        .stripMargin,
      s"""qtab AS MATERIALIZED (
        |  SELECT s.vec_id AS qid, s.sub, c.cid, ${dot("s.v", "c.c")} AS t
        |  FROM esub s JOIN cp$Iters c USING (sub)
        |  WHERE s.vec_id % 50 = 0)""".stripMargin,
      s"""en AS MATERIALIZED (
        |  SELECT vec_id, emb, ${nrm("emb")} AS nrm FROM e)""".stripMargin,
      s"""adc AS MATERIALIZED (
        |  SELECT qt.qid, cd.nid, list_sum(list(qt.t ORDER BY qt.sub)) AS s
        |  FROM codes cd JOIN qtab qt
        |    ON qt.sub = cd.sub AND qt.cid = cd.cid AND qt.qid != cd.nid
        |  GROUP BY qt.qid, cd.nid)""".stripMargin,
      s"""short AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT adc.qid, adc.nid,
        |      row_number() OVER (PARTITION BY adc.qid
        |        ORDER BY (adc.s / (qn.nrm * nn.nrm)) DESC, adc.nid) AS prnk
        |    FROM adc JOIN en qn ON qn.vec_id = adc.qid
        |      JOIN en nn ON nn.vec_id = adc.nid)
        |  WHERE prnk <= ${topK * 10})""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT short.qid, short.nid,
        |    ${dot("qe.emb", "ne.emb")} / (qe.nrm * ne.nrm) AS c
        |  FROM short JOIN en qe ON qe.vec_id = short.qid
        |    JOIN en ne ON ne.vec_id = short.nid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }

  /** Oracle for [[VectorOps.annIvfPqTopK]]: coarse quantizer, RESIDUAL
    * subspace codebooks (trained on sample residuals vs final coarse
    * centers), cell+code corpus encoding, probe with per-cell <q, c_cell>,
    * ADC = qc + sum of residual-table lookups, shortlist, exact re-rank. */
  def ivfPqTopK(kc: Int, nProbe: Int, m: Int, k: Int, topK: Int): String = {
    val sub = Dim / m
    val ctes = baseCtes() ++
      kmeansCtes("c", "sm", kc, m = 1, subDim = Dim) ++ Seq(
      // residual sample: sample vector minus its (final) coarse center
      s"""rs AS MATERIALIZED (
        |  SELECT sm.sid, list_transform(list_zip(sm.v, cb.c), p -> p[1] - p[2]) AS v
        |  FROM sm
        |  JOIN (SELECT sid, cid FROM (
        |          SELECT s.sid, c.cid,
        |            row_number() OVER (PARTITION BY s.sid
        |              ORDER BY ${l2("s.v", "c.c")}, c.cid) AS rn
        |          FROM sm s, cc$Iters c) WHERE rn = 1) asn USING (sid)
        |  JOIN cc$Iters cb ON cb.cid = asn.cid)""".stripMargin) ++
      kmeansCtes("r", "rs", k, m, sub) ++ Seq(
      // corpus: coarse cell + full-dim residual
      cellRank("crk", "e", s"cc$Iters"),
      s"""rese AS MATERIALIZED (
        |  SELECT e.vec_id, crk.cid AS cell,
        |    list_transform(list_zip(e.emb, cb.c), p -> p[1] - p[2]) AS remb
        |  FROM e JOIN crk ON crk.vec_id = e.vec_id AND crk.rn = 1
        |  JOIN cc$Iters cb ON cb.cid = crk.cid)""".stripMargin,
      s"""rcodes AS MATERIALIZED (
        |  SELECT vec_id AS nid, sub, cid FROM (
        |    SELECT s.vec_id, s.sub, c.cid,
        |      row_number() OVER (PARTITION BY s.vec_id, s.sub
        |        ORDER BY ${l2("s.v", "c.c")}, c.cid) AS rn
        |    FROM (SELECT vec_id,
        |            r.sub, remb[(r.sub*$sub+1):((r.sub+1)*$sub)] AS v
        |          FROM rese, range($m) r(sub)) s
        |    JOIN cr$Iters c ON c.sub = s.sub) WHERE rn = 1)""".stripMargin,
      s"""en AS MATERIALIZED (
        |  SELECT vec_id, emb, ${nrm("emb")} AS nrm FROM e)""".stripMargin,
      // query probes: nProbe nearest coarse cells each with <q, c_cell>
      s"""qprobe AS MATERIALIZED (
        |  SELECT qid, cid AS cell, qc FROM (
        |    SELECT e.vec_id AS qid, c.cid, ${dot("e.emb", "c.c")} AS qc,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${l2("e.emb", "c.c")}, c.cid) AS rn
        |    FROM e, cc$Iters c WHERE e.vec_id % 50 = 0)
        |  WHERE rn <= $nProbe)""".stripMargin,
      // per-query ADC table over the RESIDUAL books, raw query subvectors
      s"""qtab AS MATERIALIZED (
        |  SELECT qs.qid, qs.sub, c.cid, ${dot("qs.v", "c.c")} AS t
        |  FROM (SELECT vec_id AS qid, r.sub,
        |          emb[(r.sub*$sub+1):((r.sub+1)*$sub)] AS v
        |        FROM e, range($m) r(sub) WHERE vec_id % 50 = 0) qs
        |  JOIN cr$Iters c USING (sub))""".stripMargin,
      s"""cand AS MATERIALIZED (
        |  SELECT qp.qid, re.vec_id AS nid, qp.qc
        |  FROM qprobe qp JOIN rese re ON re.cell = qp.cell
        |    AND re.vec_id != qp.qid)""".stripMargin,
      s"""adc AS MATERIALIZED (
        |  SELECT cand.qid, cand.nid,
        |    cand.qc + list_sum(list(qt.t ORDER BY qt.sub)) AS s
        |  FROM cand JOIN rcodes rc ON rc.nid = cand.nid
        |    JOIN qtab qt ON qt.qid = cand.qid AND qt.sub = rc.sub
        |      AND qt.cid = rc.cid
        |  GROUP BY cand.qid, cand.nid, cand.qc)""".stripMargin,
      s"""short AS MATERIALIZED (
        |  SELECT qid, nid FROM (
        |    SELECT adc.qid, adc.nid,
        |      row_number() OVER (PARTITION BY adc.qid
        |        ORDER BY (adc.s / (qn.nrm * nn.nrm)) DESC, adc.nid) AS prnk
        |    FROM adc JOIN en qn ON qn.vec_id = adc.qid
        |      JOIN en nn ON nn.vec_id = adc.nid)
        |  WHERE prnk <= ${topK * 10})""".stripMargin,
      s"""p AS MATERIALIZED (
        |  SELECT short.qid, short.nid,
        |    ${dot("qe.emb", "ne.emb")} / (qe.nrm * ne.nrm) AS c
        |  FROM short JOIN en qe ON qe.vec_id = short.qid
        |    JOIN en ne ON ne.vec_id = short.nid)""".stripMargin)
    withClause(ctes, topKSelect(topK))
  }
}

/** DuckDB-SQL replay of [[Hashing.hash64]] (two Scala
  * `MurmurHash3.stringHash` passes) and the Charikar SimHash built on it,
  * so `dedup_simhash` gets an exact hash-checked oracle instead of only the
  * blocked≡all-pairs certificate gate.
  *
  * The murmur mix is 32-bit modular arithmetic (wrap-around multiply,
  * rotate-left, xor, logical shifts) over UTF-16 code units consumed in
  * PAIRS — all expressible on non-negative BIGINTs with a HUGEINT
  * intermediate for the 64-bit products, and `unicode(substring(w, i, 1))`
  * for the code units (the corpus is single-code-unit text). The per-word
  * state machine runs as a recursive CTE over the DISTINCT token set (the
  * same values Scala computes per occurrence), stepping two characters per
  * iteration exactly like the Scala while-loop; the odd tail and the
  * length-finalize apply on the terminal state. Validated against JVM
  * ground truth before wiring (see git history). The sign-extension split
  * `(h1.toLong << 32) | (h2 & 0xffffffff)` never needs materializing:
  * SimHash only reads bits, and bit b of the 64-bit hash is bit b of h2
  * for b<32, else bit b-32 of h1. */
private[queries] object HashOracleSql {
  private def mul32(a: String, b: Long): String =
    s"CAST((CAST($a AS HUGEINT) * $b) % 4294967296 AS BIGINT)"
  private def rotl(k: String, r: Int): String =
    s"((($k << $r) & 4294967295) | ($k >> ${32 - r}))"
  private def mixLast(h: String, d: String): String =
    s"xor($h, ${mul32(rotl(mul32(d, 0xcc9e2d51L & 0xffffffffL), 15), 0x1b873593L)})"
  private def mix(h: String, d: String): String =
    s"CAST((CAST(${rotl(mixLast(h, d), 13)} AS HUGEINT) * 5 + ${0xe6546b64L & 0xffffffffL}) % 4294967296 AS BIGINT)"
  private def avalanche(h: String): String = {
    val a1 = s"xor($h, $h >> 16)"
    // bind each stage in SQL via nested replace-free composition: the
    // expression tree just repeats the prior stage where referenced
    val a2 = mul32(a1, 0x85ebca6bL)
    val a3 = s"xor($a2, $a2 >> 13)"
    val a4 = mul32(a3, 0xc2b2ae35L)
    s"xor($a4, $a4 >> 16)"
  }
  private def finalize(h: String, len: String): String =
    avalanche(s"xor($h, $len)")

  /** Exact all-pairs hamming<=3 oracle for `dedup_simhash` (the blocked
    * Spark path provably equals all-pairs by pigeonhole — the separate
    * exactness gate pins that — so the oracle compares against the direct
    * quadratic form, fine at oracle SF).
    *
    * DATA CONTRACT (round-9 advice — silent tokenizer-parity dependencies
    * made explicit; see also FIXTURES.md "documents text contract"):
    *  - no leading/trailing/double spaces in `text`: DuckDB's
    *    string_split keeps the resulting EMPTY tokens while the Spark
    *    side's `text.split(' ')` drops trailing ones, and an empty token
    *    still votes with hash64("") — a mismatch would surface as a
    *    confusing bit-vote hash diff, not a tokenizer error;
    *  - BMP-only text (every char one UTF-16 code unit): the murmur3
    *    replay walks `unicode(substring(w, i, 1))` per code POINT, while
    *    Scala's MurmurHash3.stringHash walks UTF-16 code UNITS — a
    *    surrogate pair would desync the two walks.
    * Both hold for the driver-generated corpus (space-joined ASCII
    * words); a generator change breaking either must update BOTH sides'
    * tokenizers together. */
  def simhashPairs(maxHamming: Int): String = {
    val seed1 = 0x9747b28cL & 0xffffffffL
    val seed2 = 0x85ebca6bL & 0xffffffffL
    val data = "(unicode(substring(w, i + 1, 1)) * 65536 + unicode(substring(w, i + 2, 1)))"
    val tail = "unicode(substring(w, length(w), 1))"
    s"""WITH RECURSIVE
      |tok AS MATERIALIZED (
      |  SELECT DISTINCT w FROM
      |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
      |hs AS (
      |  SELECT w, 0 AS i, CAST($seed1 AS BIGINT) AS h1,
      |    CAST($seed2 AS BIGINT) AS h2
      |  FROM tok
      |  UNION ALL
      |  SELECT w, i + 2, ${mix("h1", data)}, ${mix("h2", data)}
      |  FROM hs WHERE i + 1 < length(w)),
      |hf AS MATERIALIZED (
      |  SELECT w, ${finalize("h1t", "length(w)")} AS h1,
      |    ${finalize("h2t", "length(w)")} AS h2
      |  FROM (
      |    SELECT w,
      |      CASE WHEN length(w) % 2 = 1 THEN ${mixLast("h1", tail)}
      |           ELSE h1 END AS h1t,
      |      CASE WHEN length(w) % 2 = 1 THEN ${mixLast("h2", tail)}
      |           ELSE h2 END AS h2t
      |    FROM hs WHERE i >= length(w) - 1)),
      |bits AS MATERIALIZED (
      |  SELECT d.doc_id, r.b,
      |    CASE WHEN sum(CASE WHEN
      |        (CASE WHEN r.b < 32 THEN h.h2 >> r.b
      |              ELSE h.h1 >> (r.b - 32) END) & 1 = 1
      |      THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents) d
      |  JOIN hf h USING (w), range(64) r(b)
      |  GROUP BY d.doc_id, r.b),
      |sig AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << b)
      |             ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (b - 32))
      |             ELSE 0 END) AS BIGINT) AS hi
      |  FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |       AS INTEGER) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      |      <= $maxHamming
      |ORDER BY id_a, id_b""".stripMargin
  }
}
