package graft.queries

import graft.SparkSpec

/** The Gopher repetition gate battery: scores are occurrence-weighted
  * char fractions per n, the keep flag integer-exact threshold tests.
  * Brute-forced against an in-memory reference on collision-heavy random
  * corpora (the packed-code grouping must count exactly like string
  * grouping), plus pinned pass/fail documents. */
class GopherGatesSpec extends SparkSpec {

  private def brute(docs: Seq[(Long, Seq[String])])
      : Map[Long, (Double, Double, Double, Double, Double, Boolean)] =
    docs.map { case (id, tk) =>
      val nChars = tk.map(_.length).sum + (tk.length - 1)
      def grams(n: Int): Seq[String] =
        if (tk.length < n) Seq.empty
        else (0 to tk.length - n).map(p => tk.slice(p, p + n).mkString(" "))
      def topChars(n: Int): Long = {
        val g = grams(n)
        if (g.isEmpty) 0L
        else g.groupBy(identity).map { case (k, vs) =>
          vs.size.toLong * k.length }.max
      }
      def dupChars(n: Int): Long = {
        val g = grams(n)
        g.groupBy(identity).collect {
          case (k, vs) if vs.size >= 2 => vs.size.toLong * k.length
        }.sum
      }
      val (t2, t3, t4) = (topChars(2), topChars(3), topChars(4))
      val (d5, d6) = (dupChars(5), dupChars(6))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val keep = t2 * 5 <= nChars && t3 * 50 <= nChars * 9 &&
        t4 * 25 <= nChars * 4 && d5 * 20 <= nChars * 3 &&
        d6 * 50 <= nChars * 7
      id -> (r6(t2.toDouble / nChars), r6(t3.toDouble / nChars),
        r6(t4.toDouble / nChars), r6(d5.toDouble / nChars),
        r6(d6.toDouble / nChars), keep)
    }.toMap

  test("matches a brute-force reference on random low-entropy corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 6) {
      val docs: Seq[(Long, Seq[String])] = (0 until (4 + rnd.nextInt(4))).map {
        i => (i.toLong,
          Seq.fill(2 + rnd.nextInt(25))("abc" (rnd.nextInt(3)).toString))
      }
      val df = docs
        .map { case (id, tk) =>
          val text = tk.mkString(" ")
          (id, text, text.length.toLong)
        }
        .toDF("doc_id", "text", "n_chars")
      val tmp = java.nio.file.Files.createTempDirectory("graft_gopher_spec")
      try {
        df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        val got = LlmText.queries("text_gopher_gates")(s, tmp.toString)
          .collect().map(r => r.getLong(0) ->
            (r.getDouble(1), r.getDouble(2), r.getDouble(3),
              r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
        assert(got == brute(docs), s"trial $trial diverged: docs=$docs")
      } finally {
        new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
      }
    }
  }

  test("a looping document fails the gate, a diverse one passes") {
    val s = spark
    import s.implicits._
    val loop = Seq.fill(20)(Seq("spam", "ham")).flatten // "spam ham" x20
    val diverse = (0 until 40).map(i => s"w$i")
    val docs = Seq((1L, loop), (2L, diverse))
    val df = docs.map { case (id, tk) =>
      val text = tk.mkString(" "); (id, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_gopher_spec2")
    try {
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = LlmText.queries("text_gopher_gates")(s, tmp.toString)
        .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      assert(!got(1L), "the looping doc must fail the repetition gate")
      assert(got(2L), "the all-distinct doc must pass")
    } finally {
      new scala.reflect.io.Directory(tmp.toFile).deleteRecursively()
    }
  }
}
