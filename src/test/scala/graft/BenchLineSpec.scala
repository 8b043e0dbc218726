package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must survive the driver's bounded log-tail capture:
  * an overflowing line silently loses a whole round's bench (rounds 1-4 were
  * recorded "parsed": null for exactly this). Pure-function tests over the
  * extracted folding logic — no Spark session needed. */
class BenchLineSpec extends AnyFunSuite {

  private def parseable(line: String): Boolean = {
    // minimal structural check: balanced braces, starts/ends as one object,
    // and the driver's required fields are present
    line.startsWith("{\"metric\":") && line.endsWith("}") &&
      line.contains("\"queries\":{") && line.contains("\"errors\":{") &&
      line.count(_ == '{') == line.count(_ == '}')
  }

  test("a 300-query registry folds under the budget") {
    val results = (1 to 60).flatMap { i =>
      Seq(s"wdi_stat_long_name_$i" -> 0.1, s"text_op_long_name_$i" -> 0.2,
        s"dedup_variant_name_$i" -> 0.3, s"tpch_q$i" -> 0.4,
        s"events_analysis_$i" -> 0.5)
    }
    val line = Bench.foldedLine(results, Map.empty, 42.0, "/tmp/sf")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(parseable(line), s"line not structurally parseable: $line")
    assert(line.contains("\"nq\":300"))
  }

  test("failed queries are never folded away") {
    val results = (1 to 200).map(i => s"text_op_number_$i" -> 0.1) :+
      ("text_broken_query" -> -0.5)
    val line = Bench.foldedLine(results,
      Map("text_broken_query" -> "boom"), 20.0, "/tmp/sf")
    assert(line.length <= Bench.LineBudget)
    assert(line.contains("\"text_broken_query\":-0.5"),
      s"failed query's negative time folded away: $line")
    assert(line.contains("\"boom\":[\"text_broken_query\"]"))
  }

  test("50 same-message failures stay compact and timings survive") {
    // round 7: one root cause -> 48 identical errors -> flat errors map blew
    // the budget and evicted EVERY timing. Grouped by message, the healthy
    // queries' numbers must survive alongside the failures.
    val msg = "[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] Cannot resolve " +
      "\"(ts div 1000)\" due to data type mismatch: the left and right " +
      "operands of the binary operator have incompatible types " +
      "(\"TIMESTAMP_NTZ\" and \"BIGINT\")."
    val failed = (1 to 50).map(i => s"events_failing_query_$i")
    val results = (1 to 60).map(i => s"tpch_q$i" -> 0.4) ++
      (1 to 60).map(i => s"text_op_number_$i" -> 0.1) ++
      failed.map(_ -> -0.5)
    val line = Bench.foldedLine(results, failed.map(_ -> msg).toMap,
      36.0, "/tmp/sf")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(parseable(line))
    // the shared message appears ONCE, and per-query timing data survived
    assert(line.indexOf("BINARY_OP_DIFF_TYPES") ==
      line.lastIndexOf("BINARY_OP_DIFF_TYPES"))
    assert(line.contains("_total\":") || line.contains("\"tpch_q1\":0.400"),
      s"healthy timings evicted: $line")
  }

  test("a small registry stays flat (no folding)") {
    val results = Seq("q1" -> 1.0, "q2" -> 2.0)
    val line = Bench.foldedLine(results, Map.empty, 3.0, "/tmp/sf")
    assert(line.contains("\"q1\":1.000") && line.contains("\"q2\":2.000"))
    assert(!line.contains("_total\""))
  }

  test("pathological names still fit via the totals-only fallback") {
    val results = (1 to 50).map(i => ("zz_unfoldable_very_long_query_name_" +
      ("x" * 60) + i) -> 1.0)
    val line = Bench.foldedLine(results, Map.empty, 50.0, "/tmp/sf")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(parseable(line))
  }

  test("two-digit micro names fold with their single-digit siblings") {
    val results = (1 to 9).map(i => s"f${i}_fn_family_name_long" -> 0.1) ++
      Seq("f10_try_fns" -> 0.2, "w10_more_windows" -> 0.3) ++
      (1 to 220).map(i => s"text_op_number_$i" -> 0.1)
    val line = Bench.foldedLine(results, Map.empty, 30.0, "/tmp/sf", budget = 400)
    assert(!line.contains("f10_try_fns"),
      s"two-digit micro name escaped the relational_micro fold: $line")
    assert(!line.contains("w10_more_windows"))
    assert(line.contains("relational_micro_total"))
  }

  test("non-family entries fold into other_total instead of evicting all timings") {
    // r15's driver bench: 323 healthy entries + a fat meta (contended_q
    // etc.) -> the ~40 entries outside every named family still blew the
    // budget after family folding, and the failed-only fallback rendered
    // "queries":{} — the round lost every per-query number. The catch-all
    // other_total fold must keep the family totals on the line.
    val meta = ""","runs":3,"load":[3.52,17.9],"contended":true,""" +
      """"contended_q":["a","b","c","d","e","f","g","h","i","j","k","l"]""" +
      ""","contended_n":52,"gc_q":["m","n"],"gc_n":2"""
    val results = (1 to 60).map(i => s"text_op_number_$i" -> 0.1) ++
      (1 to 60).map(i => s"wdi_stat_long_name_$i" -> 0.1) ++
      (1 to 22).map(i => s"tpch_q$i" -> 0.4) ++
      (1 to 45).map(i => s"standalone_entry_long_name_$i" -> 0.2) ++
      (1 to 60).map(i => s"dedup_variant_name_$i" -> 0.3) ++
      (1 to 60).map(i => s"stream_drain_name_$i" -> 0.2)
    val line = Bench.foldedLine(results, Map.empty, 60.0, "/tmp/sf",
      meta = meta)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(parseable(line))
    assert(!line.contains("\"queries\":{}"),
      s"all per-query data evicted despite zero failures: $line")
    assert(line.contains("\"other_total\":"),
      s"non-family entries not folded into other_total: $line")
    assert(line.contains("\"tpch_total\":"),
      s"family totals lost from the line: $line")
  }

  test("folds report their absorbed query counts in fold_n") {
    val results = (1 to 200).map(i => s"text_op_number_$i" -> 0.1) ++
      (1 to 30).map(i => s"tpch_q$i" -> 0.4)
    val line = Bench.foldedLine(results, Map.empty, 32.0, "/tmp/sf")
    assert(line.contains("\"fold_n\":{"), s"fold_n missing: $line")
    assert(line.contains("\"text_total\":200"),
      s"text fold count missing from fold_n: $line")
    assert(parseable(line))
  }

  test("the contended flag survives folding and the line stays parseable") {
    // r8-r10 each needed a manual exclusive rerun to adjudicate a loaded
    // driver bench; the line now self-flags. The meta string rides through
    // every folding stage untouched, even when families fold.
    val meta = s""","runs":3,"load":[7.19,3.08],"contended":true"""
    val results = (1 to 200).map(i => s"text_op_number_$i" -> 0.1) ++
      (1 to 30).map(i => s"tpch_q$i" -> 0.4)
    val line = Bench.foldedLine(results, Map.empty, 32.0, "/tmp/sf", meta = meta)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains("\"contended\":true"), s"contended flag lost: $line")
    assert(parseable(line))
  }

  test("a quiet run carries no contended flag") {
    val meta = s""","runs":3,"load":[0.41,1.2]"""
    val line = Bench.foldedLine(Seq("q1" -> 1.0), Map.empty, 1.0, "/tmp/sf",
      meta = meta)
    assert(!line.contains("contended"))
    assert(parseable(line))
  }

  test("externalCores isolates foreign CPU and never false-flags") {
    // 10 s window, 32 cores fully busy, self burned 30 of them -> 2 foreign
    assert(Bench.externalCores(0, 0, 32000, 30000, 10.0) == 2.0)
    // all busy CPU was self: zero foreign, even with jiffy jitter negative
    assert(Bench.externalCores(0, 0, 30000, 30050, 10.0) == 0.0)
    // unreadable /proc at either end disables the flag, never trips it
    assert(Bench.externalCores(-1, -1, 32000, 100, 10.0) == 0.0)
    assert(Bench.externalCores(0, 0, -1, -1, 10.0) == 0.0)
    // sub-50ms windows are single-jiffy noise: no reading
    assert(Bench.externalCores(0, 0, 300, 0, 0.01) == 0.0)
    // the r11 shape: a co-scheduled job burning ~6 cores over a 3 s query
    assert(math.abs(Bench.externalCores(0, 0, 2700, 900, 3.0) - 6.0) < 1e-9)
  }

  test("contendedEntries names the worst offenders, capped at 12") {
    val quiet = (1 to 20).map(i => s"q$i" -> 0.3)
    val loud = (1 to 15).map(i => s"hot$i" -> (2.0 + i))
    val flagged = Bench.contendedEntries(scala.util.Random.shuffle(quiet ++ loud))
    assert(flagged.size == 12, s"cap violated: ${flagged.size}")
    assert(flagged.head._1 == "hot15", "not sorted by foreign-core count")
    assert(flagged.forall(_._2 > Bench.ExternalCoresLine))
    assert(!flagged.exists(_._1.startsWith("q")), "quiet entry flagged")
    // exactly at the line is NOT contended (ambient noise tolerance)
    assert(Bench.contendedEntries(Seq("edge" -> Bench.ExternalCoresLine)).isEmpty)
  }

  test("the contended_q list rides through folding like the rest of meta") {
    val meta = s""","runs":3,"load":[0.5,3.1],"contended_q":["dedup_a","sim_b"],"contended_n":2"""
    val results = (1 to 200).map(i => s"text_op_number_$i" -> 0.1) ++
      (1 to 30).map(i => s"tpch_q$i" -> 0.4)
    val line = Bench.foldedLine(results, Map.empty, 32.0, "/tmp/sf", meta = meta)
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains("\"contended_q\":[\"dedup_a\",\"sim_b\"]"),
      s"contended_q lost in folding: $line")
    assert(line.contains("\"contended_n\":2"))
    assert(parseable(line))
  }

  test("gcShare measures collector share, immune to short windows and resets") {
    // 3 s of GC inside a 10 s window = 0.3 share
    assert(math.abs(Bench.gcShare(1000, 4000, 10.0) - 0.3) < 1e-9)
    // sub-quarter-second window: ms-granular GC time is noise there
    assert(Bench.gcShare(0, 60, 0.2) == 0.0)
    // collector bean reset (negative delta) never flags
    assert(Bench.gcShare(5000, 100, 10.0) == 0.0)
    assert(Bench.gcShare(100, 100, 10.0) == 0.0)
  }

  test("gcFlaggedEntries names GC-bound entries above the line, capped at 12") {
    val quiet = (1 to 30).map(i => s"q$i" -> 0.05)
    val loud = (1 to 15).map(i => s"gcheavy$i" -> (0.3 + i * 0.04))
    val flagged = Bench.gcFlaggedEntries(scala.util.Random.shuffle(quiet ++ loud))
    assert(flagged.length == 12)
    assert(flagged.head._1 == "gcheavy15", "must sort worst-first")
    assert(flagged.forall(_._2 > Bench.GcShareLine))
    // exactly AT the line is not a flag
    assert(Bench.gcFlaggedEntries(Seq("edge" -> Bench.GcShareLine)).isEmpty)
  }

  test("the totals-only fallback still keeps failed queries' negative times") {
    val results = (1 to 50).map(i => ("zz_unfoldable_very_long_query_name_" +
      ("x" * 60) + i) -> 1.0) :+ ("zz_broken_" + ("y" * 80) -> -0.5)
    val line = Bench.foldedLine(results,
      Map(("zz_broken_" + ("y" * 80)) -> "boom"), 50.0, "/tmp/sf")
    assert(line.length <= Bench.LineBudget, s"line is ${line.length} chars")
    assert(line.contains(":-0.5"),
      s"failed query's negative time dropped by the fallback: $line")
    assert(parseable(line))
  }
}
