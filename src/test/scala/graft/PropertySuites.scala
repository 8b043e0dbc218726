package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ts.Kernels
import graft.wdi.RCsv

/** ScalaCheck property suites (sbt's scalacheck framework runs these). */
object KernelProps extends Properties("Kernels") {

  private val series: Gen[Array[Double]] = for {
    n <- Gen.choose(30, 60)
    xs <- Gen.listOfN(n, Gen.choose(-1e3, 1e3))
  } yield xs.toArray

  property("hp trend + cycle reconstructs input") = Prop.forAll(series) { x =>
    val trend = Kernels.hpTrend(x, 100.0)
    val cyc = Kernels.hpCycle(x, 100.0, 30)
    x.indices.forall { i =>
      math.abs(trend(i) + cyc(i) - x(i)) <=
        1e-9 * math.max(1.0, math.abs(x(i)))
    }
  }

  property("quad residuals orthogonal to constant basis") = Prop.forAll(series) { x =>
    val t = Array.tabulate(x.length)(i => (i + 1).toDouble)
    val r = Kernels.quadResiduals(t, x, 30)
    math.abs(r.sum) <= 1e-6 * math.max(1.0, x.map(math.abs).max)
  }

  property("dlog of exponential series is constant") = Prop.forAll(
    Gen.choose(-0.2, 0.2), Gen.choose(30, 60)) { (g, n) =>
    val x = Array.tabulate(n)(i => 100.0 * math.exp(g * i))
    val dl = (1 until n).map(i => math.log(x(i)) - math.log(x(i - 1)))
    dl.forall(v => math.abs(v - g) < 1e-9)
  }

  property("ewma satisfies its recurrence bit-exactly") = Prop.forAll(series) { x =>
    val y = Kernels.ewma(x, alpha = 0.2, beta = 0.8)
    y(0) == x(0) &&
      (1 until x.length).forall(i => y(i) == 0.2 * x(i) + 0.8 * y(i - 1))
  }

  property("ewma of a constant series is that constant") = Prop.forAll(
    Gen.choose(-1e3, 1e3), Gen.choose(2, 50)) { (c, n) =>
    // alpha + beta chosen to sum to exactly 1.0 in binary would be needed
    // for bit equality; 0.2 + 0.8 rounds to 1.0 exactly, so a constant
    // input stays within one ulp per step
    val y = Kernels.ewma(Array.fill(n)(c), alpha = 0.2, beta = 0.8)
    y.forall(v => math.abs(v - c) <= 1e-12 * math.max(1.0, math.abs(c)) * n)
  }
}

object RCsvProps extends Properties("RCsv") {

  /** Doubles across the full range, including subnormals and extremes. */
  private val anyFinite: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e6, 1e6),
    Gen.choose(-1.0, 1.0),
    Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(bits => java.lang.Double.longBitsToDouble(bits))
      .suchThat(d => !d.isNaN && !d.isInfinite))

  property("formatDouble round-trips every finite double") =
    Prop.forAll(anyFinite) { d =>
      val s = RCsv.formatDouble(d)
      val back = java.lang.Double.parseDouble(
        if (s == "NA") "NaN" else s)
      back == d || (d == 0.0 && back == 0.0)
    }

  property("formatDouble emits no padded exponents or trailing .0") =
    Prop.forAll(anyFinite) { d =>
      val s = RCsv.formatDouble(d)
      !s.contains("e-0") && !s.contains("e+0") && !s.endsWith(".0") &&
        !s.contains("E")
    }
}

object BpeProps extends Properties("Bpe") {
  import graft.functions.{Bpe, BpeVocab}

  /** The oracle's semantics, executed by Java's regex engine: same pattern,
    * leftmost-first alternation, longest-first ordering => maximal munch.
    * If Bpe.count agrees with this on arbitrary text, it agrees with the
    * DuckDB regexp_extract_all oracle. */
  private lazy val pattern = java.util.regex.Pattern.compile(
    BpeVocab.oracleRegex.replace("(?s)", ""), java.util.regex.Pattern.DOTALL)

  private def regexCount(s: String): Long = {
    val m = pattern.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private val text: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const(' '))).map(_.mkString),
    Gen.listOf(Gen.oneOf(
      "the", "scan", "der", "merge", "para", "dans", "zz", " ", "7", "\n"))
      .map(_.mkString),
    Gen.listOf(Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString))

  property("greedy longest-match count equals the oracle regex segmentation") =
    Prop.forAll(text) { s => Bpe.count(s) == regexCount(s) }

  property("count bounds: 1..codepoints for nonempty text") =
    Prop.forAll(text) { s =>
      val c = Bpe.count(s)
      if (s.isEmpty) c == 0
      else c >= 1 && c <= s.codePointCount(0, s.length)
    }

  property("training learned whole common words") =
    Prop(Seq("the", "scan", "merge", "der", "les").forall(BpeVocab.vocab.contains))
}

object MinRollingHashProps extends Properties("MinRollingHash") {
  import graft.functions.RollingHash.{B, M, W, eval}

  /** Naive O(n*w) reference: polynomial hash of every window, then min. */
  private def naive(s: String): Long = {
    val cps = s.codePoints().toArray
    def poly(from: Int, len: Int): Long =
      (from until from + len).foldLeft(0L)((h, i) => (h * B + cps(i)) % M)
    if (cps.length <= W) poly(0, cps.length)
    else (0 to cps.length - W).map(poly(_, W)).min
  }

  private val text: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.alphaNumChar).map(_.mkString),
    Gen.listOf(Gen.oneOf('a', 'b', ' ')).map(_.mkString), // low-entropy
    Gen.listOf(Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString))

  property("rolling eval equals naive windowed polynomial") =
    Prop.forAll(text) { s => eval(s) == naive(s) }

  property("values lie in [0, M)") =
    Prop.forAll(text) { s => val h = eval(s); h >= 0 && h < M }
}
