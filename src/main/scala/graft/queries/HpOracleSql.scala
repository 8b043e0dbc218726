package graft.queries

/** Exact DuckDB oracle for the Hodrick–Prescott filter (`k2_hp_filter`).
  *
  * The engine side (graft.ts.Kernels.hpTrend) solves (I + λ·DᵀD)·τ = x per
  * user series with a bandwidth-2 Cholesky A = L·Lᵀ (bands d/e/f), forward
  * and back substitution, plus ONE iterative-refinement step through the
  * exact pentadiagonal stencil. Every one of those loops is a first-order
  * (two-lag) recurrence, so each is expressible as a recursive CTE whose
  * per-round state carries exactly the two trailing values the Scala loop
  * keeps in registers. The SQL below transcribes the kernel OPERATION FOR
  * OPERATION — same association order (`(diag - e²) - f²`, `((x - e·y₁) -
  * f·y₂)/d`, the stencil's five adds left-to-right), same literal λ, same
  * guards-as-skipped-terms (a skipped Scala term becomes `+ 0.0` /
  * `- 0.0`, FP-identity for the finite values here) — so every double is
  * produced by the identical IEEE-754 op sequence on both sides and the
  * driver's value hash matches bit-for-bit (sqrt and ÷ are correctly
  * rounded in both runtimes). Same playbook as AnnOracleSql's Lloyd
  * replay: the oracle re-runs the numeric algorithm, not an approximation.
  *
  * Series shorter than minObs emit NaN (the kernel's all-NaN path); both
  * sides stringify NaN identically through the driver's pandas compare.
  */
object HpOracleSql {

  /** Full oracle SQL for `k2_hp_filter` over the `events` view:
    * (event_id, hp_cycle = round(x - τ_refined, 6)). */
  def hpCycle(lambda: String, minObs: Int): String =
    s"""WITH RECURSIVE
      |src AS MATERIALIZED (
      |  SELECT event_id, user_id, value AS x,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS j0,
      |    count(*) OVER (PARTITION BY user_id) AS m
      |  FROM events WHERE value IS NOT NULL),
      |coef AS MATERIALIZED (
      |  SELECT user_id, j0, x, m,
      |    1.0 + $lambda * (CASE WHEN j0 = 0 OR j0 = m - 1 THEN 1.0
      |                        WHEN j0 = 1 OR j0 = m - 2 THEN 5.0
      |                        ELSE 6.0 END) AS diag,
      |    CASE WHEN j0 < m - 1 THEN
      |      $lambda * (CASE WHEN j0 = 0 OR j0 = m - 2 THEN -2.0 ELSE -4.0 END) END AS sub1,
      |    CASE WHEN j0 < m - 2 THEN $lambda * 1.0 END AS sub2
      |  FROM src WHERE m >= $minObs),
      |fwd AS (
      |  SELECT user_id, j0, m,
      |    sqrt(diag) AS d,
      |    sub1 / sqrt(diag) AS e,
      |    sub2 / sqrt(diag) AS f,
      |    CAST(NULL AS DOUBLE) AS f1,
      |    x / sqrt(diag) AS y,
      |    CAST(NULL AS DOUBLE) AS y1
      |  FROM coef WHERE j0 = 0
      |  UNION ALL
      |  SELECT user_id, j0, m,
      |    sqrt(s) AS d,
      |    CASE WHEN j0 + 1 < m THEN (sub1 - fe) / sqrt(s) END AS e,
      |    CASE WHEN j0 + 2 < m THEN sub2 / sqrt(s) END AS f,
      |    f_prev AS f1,
      |    ((x - ey) - fy) / sqrt(s) AS y,
      |    y_prev AS y1
      |  FROM (
      |    SELECT c.user_id, c.j0, c.m, c.x, c.sub1, c.sub2,
      |      (c.diag - r.e * r.e)
      |        - (CASE WHEN c.j0 >= 2 THEN r.f1 * r.f1 ELSE 0.0 END) AS s,
      |      r.f * r.e AS fe,
      |      r.e * r.y AS ey,
      |      CASE WHEN c.j0 >= 2 THEN r.f1 * r.y1 ELSE 0.0 END AS fy,
      |      r.f AS f_prev, r.y AS y_prev
      |    FROM fwd r JOIN coef c
      |      ON c.user_id = r.user_id AND c.j0 = r.j0 + 1)),
      |fwdm AS MATERIALIZED (SELECT * FROM fwd),
      |bwd AS (
      |  SELECT user_id, j0, y / d AS tau, CAST(NULL AS DOUBLE) AS tau1
      |  FROM fwdm WHERE j0 = m - 1
      |  UNION ALL
      |  SELECT w.user_id, w.j0,
      |    ((w.y - w.e * r.tau)
      |      - (CASE WHEN w.j0 + 2 < w.m THEN w.f * r.tau1 ELSE 0.0 END)) / w.d AS tau,
      |    r.tau AS tau1
      |  FROM bwd r JOIN fwdm w
      |    ON w.user_id = r.user_id AND w.j0 = r.j0 - 1),
      |bwdm AS MATERIALIZED (SELECT * FROM bwd),
      |resid AS MATERIALIZED (
      |  SELECT user_id, j0, x - st AS r FROM (
      |    SELECT c.user_id, c.j0, c.x,
      |      ((((c.diag * t.tau
      |        + coalesce(lag(c.sub1) OVER w * lag(t.tau) OVER w, 0.0))
      |        + coalesce(c.sub1 * lead(t.tau) OVER w, 0.0))
      |        + coalesce(lag(c.sub2, 2) OVER w * lag(t.tau, 2) OVER w, 0.0))
      |        + coalesce(c.sub2 * lead(t.tau, 2) OVER w, 0.0)) AS st
      |    FROM coef c JOIN bwdm t USING (user_id, j0)
      |    WINDOW w AS (PARTITION BY c.user_id ORDER BY c.j0))),
      |fwd2 AS (
      |  SELECT rr.user_id, rr.j0, rr.r / w.d AS y,
      |    CAST(NULL AS DOUBLE) AS y1
      |  FROM resid rr JOIN fwdm w USING (user_id, j0) WHERE rr.j0 = 0
      |  UNION ALL
      |  SELECT rr.user_id, rr.j0,
      |    ((rr.r - p.e * r.y)
      |      - (CASE WHEN rr.j0 >= 2 THEN p.f1 * r.y1 ELSE 0.0 END)) / w.d AS y,
      |    r.y AS y1
      |  FROM fwd2 r
      |  JOIN resid rr ON rr.user_id = r.user_id AND rr.j0 = r.j0 + 1
      |  JOIN fwdm p ON p.user_id = r.user_id AND p.j0 = r.j0
      |  JOIN fwdm w ON w.user_id = r.user_id AND w.j0 = rr.j0),
      |fwd2m AS MATERIALIZED (SELECT * FROM fwd2),
      |bwd2 AS (
      |  SELECT f2.user_id, f2.j0, f2.y / w.d AS corr,
      |    CAST(NULL AS DOUBLE) AS corr1
      |  FROM fwd2m f2 JOIN fwdm w USING (user_id, j0) WHERE f2.j0 = w.m - 1
      |  UNION ALL
      |  SELECT w.user_id, w.j0,
      |    ((f2.y - w.e * r.corr)
      |      - (CASE WHEN w.j0 + 2 < w.m THEN w.f * r.corr1 ELSE 0.0 END)) / w.d AS corr,
      |    r.corr AS corr1
      |  FROM bwd2 r
      |  JOIN fwdm w ON w.user_id = r.user_id AND w.j0 = r.j0 - 1
      |  JOIN fwd2m f2 ON f2.user_id = r.user_id AND f2.j0 = w.j0),
      |bwd2m AS MATERIALIZED (SELECT * FROM bwd2)
      |SELECT event_id, hp_cycle FROM (
      |  SELECT s.event_id, round(s.x - (t.tau + c2.corr), 6) AS hp_cycle
      |  FROM src s
      |  JOIN bwdm t ON t.user_id = s.user_id AND t.j0 = s.j0
      |  JOIN bwd2m c2 ON c2.user_id = s.user_id AND c2.j0 = s.j0
      |  WHERE s.m >= $minObs
      |  UNION ALL
      |  SELECT event_id, CAST('NaN' AS DOUBLE) AS hp_cycle
      |  FROM src WHERE m < $minObs
      |) ORDER BY event_id""".stripMargin
}
