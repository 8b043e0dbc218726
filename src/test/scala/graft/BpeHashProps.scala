package graft

import org.scalacheck.{Gen, Prop, Properties}

/** The anchored-string-replace merge application (text_bpe_train /
  * text_bpe_tokenize5) must equal the direct greedy left-to-right BPE
  * merge scan — the equivalence both DuckDB oracles lean on. */
object BpeMergeProps extends Properties("BpeMerge") {
  private val Sep = "\u001f"

  /** The engine/oracle form: wrap every symbol, one non-overlapping
    * left-to-right replace, unwrap. */
  private def viaReplace(syms: List[String], l: String, r: String): List[String] = {
    val s = syms.map(x => Sep + x + Sep).mkString
    val merged = s.replace(Sep + l + Sep + Sep + r + Sep, Sep + l + r + Sep)
    merged.stripPrefix(Sep).stripSuffix(Sep).split(Sep + Sep, -1).toList
  }

  /** The definitional form: i = 0; while i < n: if (s[i],s[i+1]) == (l,r)
    * emit merged, i += 2 else emit s[i], i += 1. */
  private def viaScan(syms: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    val a = syms.toArray
    while (i < a.length) {
      if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += a(i); i += 1 }
    }
    out.result()
  }

  // small alphabet of multi-char symbols so collisions/overlaps are common,
  // including symbols that are concatenations of others (ab vs a,b)
  private val sym: Gen[String] = Gen.oneOf("a", "b", "ab", "ba", "aa", "c")
  private val seqs: Gen[List[String]] = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, sym))

  property("anchored replace equals the greedy merge scan") =
    Prop.forAll(seqs, sym, sym) { (syms, l, r) =>
      viaReplace(syms, l, r) == viaScan(syms, l, r)
    }
}

/** Golden pins for the JVM token hash the dedup_simhash oracle replays in
  * SQL: if Hashing.hash64 ever changes, the SQL mirror silently diverges —
  * these constants (verified against the SQL state machine) make that loud. */
object Hash64Props extends Properties("Hash64Golden") {
  private val golden = Map(
    "the" -> 1258506265753333044L,
    "a" -> 9196524878408001504L,
    "er" -> -6343517546313709342L,
    "x" -> -5549151677315728525L,
    "quantum" -> 1287028936834908322L,
    "networks" -> 3657771606430823977L)

  property("hash64 matches the SQL-replayed golden values") =
    Prop.all(golden.toSeq.map { case (s, h) =>
      Prop(graft.queries.Hashing.hash64(s) == h) :| s"hash64($s)"
    }: _*)
}
