package graft.queries

import graft.SparkSpec

/** Substring-granularity dedup (Lee et al.): the defining case is a
  * passage repeated at a ±k token offset — invisible to ALIGNED stride-w
  * spans (dedup_lines), found by OVERLAPPING stride-1 spans. */
class DedupSubstringSpec extends SparkSpec {

  test("offset duplicate passage: aligned spans miss it, overlapping spans flag it") {
    val s = spark
    import s.implicits._
    // docA: 20 distinct tokens; docB: 3 junk tokens, then docA's first 10
    // tokens verbatim (offset +3), then 2 junk tokens
    val aToks = (0 until 20).map(i => s"a$i")
    val passage = aToks.take(10)
    val bToks = Seq("x0", "x1", "x2") ++ passage ++ Seq("x3", "x4")
    val docs = Seq(
      (1L, aToks.mkString(" ")),
      (2L, bToks.mkString(" "))).toDF("doc_id", "text")

    // aligned stride-10 slices of docB never reproduce the passage
    val alignedB = bToks.grouped(10).map(_.mkString(" ")).toSet
    val alignedA = aToks.grouped(10).map(_.mkString(" ")).toSet
    assert(alignedA.intersect(alignedB).isEmpty,
      "aligned spans would have caught this case — pick a different offset")

    val out = LlmText.substringDedup(docs, w = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap

    // docA is fully first-occurrence: nothing covered, full text kept
    val (na, sa, da, ca, ma) = out(1L)
    assert((na, sa, da, ca) == (20L, 11L, 0L, 0L))
    assert(ma == org.apache.commons.codec.digest.DigestUtils
      .md5Hex(aToks.mkString(" ")))

    // docB: exactly one duplicated span (the passage at pos 3) covering
    // its 10 tokens; reassembly keeps the junk frame only
    val (nb, sb, db, cb, mb) = out(2L)
    assert((nb, sb, db, cb) == (15L, 6L, 1L, 10L))
    assert(mb == org.apache.commons.codec.digest.DigestUtils
      .md5Hex("x0 x1 x2 x3 x4"))
  }

  test("internal repetition: the second copy of a phrase is covered exactly once") {
    val s = spark
    import s.implicits._
    // 10-token phrase repeated back-to-back + a tail: only the span at pos
    // 10 reproduces pos 0's span (pos 1..9 are distinct rotations), so the
    // second copy's 10 tokens are removed and the first copy + tail remain
    val phrase = (0 until 10).map(i => s"p$i")
    val docs = Seq((7L, (phrase ++ phrase ++ Seq("tail")).mkString(" ")))
      .toDF("doc_id", "text")
    val r = LlmText.substringDedup(docs, w = 10).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (21L, 12L, 1L, 10L))
    assert(r.getString(5) == org.apache.commons.codec.digest.DigestUtils
      .md5Hex((phrase :+ "tail").mkString(" ")))
  }

  test("matches a brute-force reference on random low-entropy corpora") {
    // 3-symbol vocabulary + w=3 forces heavy span collisions (within-doc
    // repeats, multi-way cross-doc overlaps) — the regime where the
    // interval-union fold and first-occurrence ordering can actually go
    // wrong. Seeded, 10 corpora, each checked doc-by-doc against an O(n²)
    // in-memory reference.
    val s = spark
    import s.implicits._
    val w = 3
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val docs: Seq[(Long, Seq[String])] = (0 until (3 + rnd.nextInt(5))).map {
        // length >= 1: Spark's split("") yields [""] where the reference
        // would model zero tokens — the corpus contract has no empty text
        i => (i.toLong, Seq.fill(1 + rnd.nextInt(23))("abc" (rnd.nextInt(3)).toString))
      }
      // brute force: global first occurrence per span string in
      // (doc_id, pos) order; coverage = union of [p, p+w-1] per doc
      val spans = for {
        (id, tk) <- docs; if tk.length >= w
        p <- 0 to tk.length - w
      } yield (tk.slice(p, p + w).mkString(" "), id, p)
      val firstOf = spans.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(v => (v._2, v._3)).min }
      val dupsByDoc = spans
        .filter { case (k, id, p) => firstOf(k) != ((id, p)) }
        .groupBy(_._2)
      val expected = docs.map { case (id, tk) =>
        val ps = dupsByDoc.getOrElse(id, Nil).map(_._3).sorted
        val covered = ps.flatMap(p => p until p + w).toSet
        val kept = tk.indices.filterNot(covered).map(tk)
        id -> (tk.length.toLong,
          math.max(tk.length - (w - 1), 0).toLong,
          ps.size.toLong, covered.size.toLong,
          org.apache.commons.codec.digest.DigestUtils
            .md5Hex(kept.mkString(" ")))
      }.toMap
      val got = LlmText
        .substringDedup(docs.map { case (id, tk) => (id, tk.mkString(" ")) }
          .toDF("doc_id", "text"), w)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getString(5))).toMap
      assert(got == expected, s"trial $trial diverged: docs=$docs")
    }
  }

  test("append path: cross-slice offset duplicates in both directions match the rebuild") {
    val s = spark
    import s.implicits._
    // The two orders the incremental path must get right, both at a +-k
    // offset so only overlapping spans can see them:
    //  - base doc 1 -> delta doc 9 (doc_id % 5 == 4) carries doc 1's
    //    passage at offset +2: a plain delta dup against the stored index;
    //  - delta doc 4 precedes base doc 5 in (doc_id, pos) order and
    //    carries doc 5's passage at offset +3: the PROMOTION case, where
    //    the base slice's own first occurrence is outranked by an
    //    interleaved delta doc and must flip to duplicate.
    val pa = (0 until 10).map(i => s"pa$i")
    val pb = (0 until 10).map(i => s"pb$i")
    val docs = Seq(
      (1L, (pa ++ Seq("t0", "t1")).mkString(" ")),
      (4L, (Seq("j0", "j1", "j2") ++ pb ++ Seq("j3")).mkString(" ")),
      (5L, (pb ++ Seq("u0", "u1")).mkString(" ")),
      (9L, (Seq("k0", "k1") ++ pa ++ Seq("k2")).mkString(" "))
    ).toDF("doc_id", "text")
    val rebuild = LlmText.substringDedup(docs, w = 10)
      .collect().map(_.toSeq).toSeq
    val append = LlmText.substringDedupAppend(s, docs, w = 10, storeKey = None)
      .collect().map(_.toSeq).toSeq
    assert(append == rebuild)
    // and the semantics are what the setup promises: doc 9 lost pa (plain
    // delta dup), doc 5 lost pb (promoted by delta doc 4), doc 4 kept pb
    // (it IS the global first occurrence)
    val byId = append.map(r => r.head -> r).toMap
    assert(byId(9L)(4) == 10L, s"doc 9 should lose the passage: ${byId(9L)}")
    assert(byId(5L)(4) == 10L, s"doc 5's first occurrence must be " +
      s"promoted to dup by delta doc 4: ${byId(5L)}")
    assert(byId(4L)(4) == 0L, s"doc 4 is the global first: ${byId(4L)}")
  }

  test("append path matches the rebuild on random low-entropy corpora") {
    // same collision-heavy regime as the rebuild's brute-force test, with
    // doc ids spanning both slices (every 5th doc is delta) so within-base,
    // within-delta, base->delta and delta->base(promotion) dups all occur
    val s = spark
    import s.implicits._
    val w = 3
    val rnd = new scala.util.Random(271)
    for (trial <- 1 to 8) {
      val docs = (0 until (6 + rnd.nextInt(5))).map {
        i => (i.toLong, Seq.fill(1 + rnd.nextInt(23))("abc" (rnd.nextInt(3)).toString).mkString(" "))
      }.toDF("doc_id", "text")
      val rebuild = LlmText.substringDedup(docs, w).collect().map(_.toSeq).toSeq
      val append = LlmText.substringDedupAppend(s, docs, w, storeKey = None)
        .collect().map(_.toSeq).toSeq
      assert(append == rebuild, s"trial $trial diverged")
    }
  }

  test("canonical excision removes the full variable-length repeat fixed-w fragments") {
    val s = spark
    import s.implicits._
    // The case fixed-w removal structurally under-reaches: doc 2 carries a
    // 13-token repeat Q++z whose partner (doc 3) comes LATER in corpus
    // order. Only Q's own 10-window occurred earlier (doc 1), so fixed-10
    // has a single dup start at the repeat head and covers just Q's 10
    // tokens — the z tail's windows are first occurrences from doc 2's
    // side. The canonical pass extends that one start by its SA repeat
    // length (13) and excises the whole repeat.
    val q = (0 until 10).map(i => s"q$i")
    val z = Seq("z0", "z1", "z2")
    val docs = Seq(
      (1L, (q ++ Seq("c0", "c1", "c2")).mkString(" ")),
      (2L, (Seq("d0", "d1") ++ q ++ z).mkString(" ")),
      (3L, (Seq("f0") ++ q ++ z ++ Seq("f1")).mkString(" "))
    ).toDF("doc_id", "text")
    val fixed = LlmText.substringDedup(docs, w = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val canon = LlmText.substringDedupCanonical(docs, l = 10, cap = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(fixed(2L) == 10L, "fixed-w should cover only Q's 10 tokens")
    val (n2, x2, d2, m2) = canon(2L)
    assert((n2, x2, d2) == (15L, 1L, 13L),
      s"canonical must excise the full 13-token repeat as ONE interval: ${canon(2L)}")
    assert(m2 == org.apache.commons.codec.digest.DigestUtils.md5Hex("d0 d1"))
    // doc 1 is all first-occurrence; doc 3 loses the full repeat too
    assert(canon(1L)._3 == 0L)
    assert(canon(3L)._3 == 13L)
  }

  test("canonical excision matches a brute-force reference on random corpora") {
    // composed semantics, brute-forced: a start p is excised iff its
    // l-window occurred earlier in (doc_id, pos) order, and its interval
    // extends by the SA repeat length (max capped LCP against any other
    // suffix); coverage = interval union, kept = the gaps
    val s = spark
    import s.implicits._
    val l = 3
    val cap = 6
    val rnd = new scala.util.Random(1213)
    def lcpOf(a: Seq[String], b: Seq[String]): Int = {
      val m = math.min(a.length, b.length)
      var i = 0; while (i < m && a(i) == b(i)) i += 1; i
    }
    for (trial <- 1 to 8) {
      val docs: Seq[(Long, Seq[String])] = (0 until (3 + rnd.nextInt(5))).map {
        i => (i.toLong, Seq.fill(1 + rnd.nextInt(23))("abc" (rnd.nextInt(3)).toString))
      }
      val sufs = for ((id, tk) <- docs; p <- tk.indices)
        yield (id, p, tk.slice(p, p + cap))
      val windows = for {
        (id, tk) <- docs; if tk.length >= l
        p <- 0 to tk.length - l
      } yield (tk.slice(p, p + l).mkString(" "), id, p)
      val firstOf = windows.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(v => (v._2, v._3)).min }
      val expected = docs.map { case (id, tk) =>
        val starts = (if (tk.length >= l) (0 to tk.length - l) else Seq.empty)
          .filter { p =>
            firstOf(tk.slice(p, p + l).mkString(" ")) != ((id, p))
          }
        val ivs = starts.map { p =>
          val mine = tk.slice(p, p + cap)
          val ext = sufs.collect { case (oid, op, os) if (oid, op) != ((id, p)) =>
            lcpOf(mine, os) }.max
          (p, p + ext - 1)
        }
        val covered = ivs.flatMap { case (a, b) => a to b }.toSet
        val kept = tk.indices.filterNot(covered).map(tk)
        id -> (tk.length.toLong, starts.size.toLong, covered.size.toLong,
          org.apache.commons.codec.digest.DigestUtils.md5Hex(kept.mkString(" ")))
      }.toMap
      val got = LlmText.substringDedupCanonical(
        docs.map { case (id, tk) => (id, tk.mkString(" ")) }
          .toDF("doc_id", "text"), l = l, cap = cap)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
      assert(got == expected, s"trial $trial diverged: docs=$docs")
    }
  }

  test("canonical append matches the rebuild, including a grown base interval") {
    val s = spark
    import s.implicits._
    // The case that makes incremental canonical hard: base docs 1 and 2
    // share passage Q (so doc 2 already holds a base interval of length
    // 10), and DELTA doc 4 carries Q extended by three more tokens that
    // doc 2 ALSO continues with — the delta arrival must GROW doc 2's
    // stored interval from 10 to 13. Plus a plain delta dup (doc 9
    // repeats doc 1's passage at an offset).
    val q = (0 until 10).map(i => s"q$i")
    val ext = Seq("x0", "x1", "x2")
    val docs = Seq(
      (1L, (q ++ Seq("a0", "a1")).mkString(" ")),
      (2L, (Seq("b0") ++ q ++ ext ++ Seq("b1")).mkString(" ")),
      (4L, (Seq("j0", "j1") ++ q ++ ext).mkString(" ")),
      (9L, (Seq("k0", "k1", "k2") ++ q).mkString(" "))
    ).toDF("doc_id", "text")
    val rebuild = LlmText.substringDedupCanonical(docs, l = 10, cap = 20)
      .collect().map(_.toSeq).toSeq
    val append = LlmText.substringDedupCanonicalAppend(s, docs, l = 10,
      cap = 20, storeKey = None).collect().map(_.toSeq).toSeq
    assert(append == rebuild)
    val byId = append.map(r => r.head -> r).toMap
    // doc 2's excision grew to the full 13-token repeat (Q++ext recurs in
    // delta doc 4, which precedes nothing in doc 2 — doc 2 is a NON-first
    // occurrence of Q via doc 1, and its repeat length is set by doc 4)
    assert(byId(2L)(3) == 13L,
      s"doc 2's interval must grow to 13 via the delta: ${byId(2L)}")
    assert(byId(9L)(3) == 10L, s"plain delta dup: ${byId(9L)}")
  }

  test("canonical append matches the rebuild on random low-entropy corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val docs = (0 until (6 + rnd.nextInt(5))).map {
        i => (i.toLong, Seq.fill(1 + rnd.nextInt(23))("abc" (rnd.nextInt(3)).toString).mkString(" "))
      }.toDF("doc_id", "text")
      val rebuild = LlmText.substringDedupCanonical(docs, l = 3, cap = 6)
        .collect().map(_.toSeq).toSeq
      val append = LlmText.substringDedupCanonicalAppend(s, docs, l = 3,
        cap = 6, storeKey = None).collect().map(_.toSeq).toSeq
      assert(append == rebuild, s"trial $trial diverged")
    }
  }

  test("suffix-sort LCP reports exact variable-length repeats (capped)") {
    val s = spark
    import s.implicits._
    // a 17-token passage shared at different offsets: the fixed-w span
    // family can only say "has a >=10 repeat"; the SA/LCP profile must
    // report the exact maximal length 17
    val passage = (0 until 17).map(i => s"p$i")
    val docA = (Seq("a0", "a1") ++ passage ++ Seq("a2")).mkString(" ")
    val docB = (Seq("b0") ++ passage ++ Seq("b1", "b2")).mkString(" ")
    val docC = (0 until 12).map(i => s"c$i").mkString(" ") // no repeats
    val out = LlmText.substringSaLcp(
      Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text"),
      cap = 20, dupLen = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // positions whose >=10-token prefix recurs: passage starts 0..7 on
    // each side (suffix starting at passage token i has 17-i shared
    // tokens; >=10 for i <= 7)
    assert(out(1L) == (20L, 8L, 17L), s"docA profile: ${out(1L)}")
    assert(out(2L) == (20L, 8L, 17L), s"docB profile: ${out(2L)}")
    assert(out(3L)._2 == 0L && out(3L)._3 < 10L, s"docC profile: ${out(3L)}")
  }

  test("suffix-sort LCP matches brute force on random low-entropy corpora") {
    val s = spark
    import s.implicits._
    val cap = 6
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val docs = (0 until (3 + rnd.nextInt(4))).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(18))("ab" (rnd.nextInt(2)).toString))
      }
      def lcpOf(a: Seq[String], b: Seq[String]): Int = {
        val m = math.min(a.length, b.length)
        var i = 0; while (i < m && a(i) == b(i)) i += 1; i
      }
      val sufs = for ((id, tk) <- docs; p <- tk.indices)
        yield (id, p, tk.slice(p, p + cap))
      val expected = docs.map { case (id, tk) =>
        val best = tk.indices.map { p =>
          val mine = tk.slice(p, p + cap)
          sufs.collect { case (oid, op, os) if (oid, op) != ((id, p)) =>
            lcpOf(mine, os) }.max
        }
        id -> (tk.length.toLong, best.count(_ >= 3).toLong, best.max.toLong)
      }.toMap
      val got = LlmText.substringSaLcp(
        docs.map { case (id, tk) => (id, tk.mkString(" ")) }
          .toDF("doc_id", "text"), cap = cap, dupLen = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == expected, s"trial $trial diverged: docs=$docs")
    }
  }

  test("overlapping duplicate starts union their coverage (no double count)") {
    val s = spark
    import s.implicits._
    // docB embeds docA's first 12 tokens: dup spans at pos 1, 2, 3 whose
    // [p, p+9] intervals overlap — union is 12 tokens, the gap fold must
    // yield min(10,1) + min(10,1) + 10, not 30
    val aToks = (0 until 20).map(i => s"a$i")
    val bToks = Seq("y0") ++ aToks.take(12) ++ Seq("y1")
    val docs = Seq(
      (1L, aToks.mkString(" ")),
      (2L, bToks.mkString(" "))).toDF("doc_id", "text")
    val b = LlmText.substringDedup(docs, w = 10)
      .filter("doc_id = 2").head()
    assert((b.getLong(1), b.getLong(3), b.getLong(4)) == (14L, 3L, 12L))
    assert(b.getString(5) == org.apache.commons.codec.digest.DigestUtils
      .md5Hex("y0 y1"))
  }
}
