package graft.wdi

/** Grisu3 floating-point digit generation (Loitsch, PLDI 2010: "Printing
  * Floating-Point Numbers Quickly and Accurately with Integers") with the
  * classic `%.17g` fallback — the combination behind R readr/vroom's CSV
  * number output. When grisu3 can prove its digits are the shortest
  * round-trip it emits them; for the ~0.5% of doubles where the proof fails
  * it falls back to 17 correctly-rounded significant digits with trailing
  * zeros stripped. The reference goldens contain exactly those fallback
  * forms (e.g. `4.1165030739846324` in sd_by_country_logquad.csv — one
  * digit longer than the shortest round-trip), so byte parity requires
  * reproducing both paths.
  *
  * Returns (digits, exp10): value = d1.d2d3... x 10^exp10.
  */
object Grisu2 {

  private val HiddenBit = 1L << 52

  /** (significand f, binary exponent e): value = f * 2^e, f unsigned. */
  private final case class DiyFp(f: Long, e: Int)

  private def fromDouble(d: Double): DiyFp = {
    val u = java.lang.Double.doubleToLongBits(d)
    val be = ((u >>> 52) & 0x7ff).toInt
    val sig = u & (HiddenBit - 1)
    if (be != 0) DiyFp(sig | HiddenBit, be - 1075) else DiyFp(sig, -1074)
  }

  private def normalize(v: DiyFp): DiyFp = {
    var f = v.f
    var e = v.e
    while ((f & (1L << 63)) == 0) { f <<= 1; e -= 1 }
    DiyFp(f, e)
  }

  /** (m-, m+) normalized boundaries of d. */
  private def boundaries(v: DiyFp): (DiyFp, DiyFp) = {
    var pf = (v.f << 1) + 1
    var pe = v.e - 1
    while ((pf & (HiddenBit << 1)) == 0) { pf <<= 1; pe -= 1 }
    val plus = DiyFp(pf << 10, pe - 10) // 64 - 52 - 2
    val miRaw =
      if (v.f == HiddenBit) DiyFp((v.f << 2) - 1, v.e - 2)
      else DiyFp((v.f << 1) - 1, v.e - 1)
    val minus = DiyFp(miRaw.f << (miRaw.e - plus.e), plus.e)
    (minus, plus)
  }

  /** Round-to-nearest 128-bit product, like the reference implementation. */
  private def mul(x: DiyFp, y: DiyFp): DiyFp = {
    val M32 = 0xffffffffL
    val a = x.f >>> 32; val b = x.f & M32
    val c = y.f >>> 32; val d = y.f & M32
    val ac = a * c; val bc = b * c; val ad = a * d; val bd = b * d
    val tmp = (bd >>> 32) + (ad & M32) + (bc & M32) + (1L << 31)
    DiyFp(ac + (ad >>> 32) + (bc >>> 32) + (tmp >>> 32), x.e + y.e + 64)
  }

  /** Cached powers 10^(-348 + 8i), i = 0..86, normalized to 64-bit
    * significands — generated exactly with BigInt round-half-even, matching
    * the table the published implementations embed. */
  private val (cachedF, cachedE): (Array[Long], Array[Int]) = {
    val fs = new Array[Long](87)
    val es = new Array[Int](87)
    var i = 0
    while (i < 87) {
      val k = -348 + 8 * i
      var e = math.floor(k * math.log(10) / math.log(2)).toInt - 63
      var f: BigInt =
        if (k >= 0) {
          val num = BigInt(5).pow(k) // 10^k * 2^-e = 5^k * 2^(k-e)
          val shift = k - e
          if (shift >= 0) num << shift
          else (num + (BigInt(1) << (-shift - 1))) >> -shift
        } else {
          val den = BigInt(5).pow(-k)
          val num = BigInt(1) << (k - e) // k - e > 0 for k < 0
          val q = num / den
          val r = num - q * den
          if (r * 2 > den || (r * 2 == den && q.testBit(0))) q + 1 else q
        }
      if (f >= (BigInt(1) << 64)) { f >>= 1; e += 1 }
      fs(i) = f.bigInteger.longValue() // low 64 bits: f in [2^63, 2^64)
      es(i) = e
      i += 1
    }
    (fs, es)
  }

  private val MinTargetExp = -60

  /** Cached power selection as in double-conversion's
    * GetCachedPowerForBinaryExponentRange. Returns (power, decimalExponent)
    * with power ~ 10^decimalExponent. */
  private def cachedPower(binExpW: Int): (DiyFp, Int) = {
    val minExp = MinTargetExp - (binExpW + 64)
    val k = math.ceil((minExp + 63) * 0.30102999566398114).toInt
    val index = (348 + k - 1) / 8 + 1
    (DiyFp(cachedF(index), cachedE(index)), -348 + (index << 3))
  }

  private val Pow10 = Array(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L,
    10000000L, 100000000L, 1000000000L, 10000000000L, 100000000000L,
    1000000000000L, 10000000000000L, 100000000000000L, 1000000000000000L,
    10000000000000000L, 100000000000000000L, 1000000000000000000L)

  @inline private def uLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0
  @inline private def uGe(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) >= 0

  /** double-conversion RoundWeed: weed digits toward w; false = ambiguous. */
  private def roundWeed(buf: Array[Char], len: Int, distTooHighW: Long,
      unsafeInterval: Long, rest0: Long, tenKappa: Long, unit: Long): Boolean = {
    val smallDist = distTooHighW - unit
    val bigDist = distTooHighW + unit
    var rest = rest0
    while (uLt(rest, smallDist) && uGe(unsafeInterval - rest, tenKappa) &&
        (uLt(rest + tenKappa, smallDist) ||
          uGe(smallDist - rest, rest + tenKappa - smallDist))) {
      buf(len - 1) = (buf(len - 1) - 1).toChar
      rest += tenKappa
    }
    if (uLt(rest, bigDist) && uGe(unsafeInterval - rest, tenKappa) &&
        (uLt(rest + tenKappa, bigDist) ||
          java.lang.Long.compareUnsigned(bigDist - rest, rest + tenKappa - bigDist) > 0))
      return false
    uGe(rest, 2 * unit) && uGe(unsafeInterval - 4 * unit, rest)
  }

  /** double-conversion DigitGen for grisu3; None = proof failed. */
  private def digitGen(low: DiyFp, w: DiyFp, high: DiyFp): Option[(String, Int)] = {
    var unit = 1L
    val tooLow = DiyFp(low.f - unit, low.e)
    val tooHigh = DiyFp(high.f + unit, high.e)
    var unsafeInterval = tooHigh.f - tooLow.f
    val oneF = 1L << -w.e
    var integrals = tooHigh.f >>> -w.e
    var fractionals = tooHigh.f & (oneF - 1)
    var kappa = {
      var d = 1
      while (d < 11 && integrals >= Pow10(d)) d += 1
      d
    }
    val buf = new Array[Char](32)
    var len = 0
    var kOut = 0
    while (kappa > 0) {
      val digit = integrals / Pow10(kappa - 1)
      buf(len) = ('0' + digit).toChar; len += 1
      integrals %= Pow10(kappa - 1)
      kappa -= 1
      val rest = (integrals << -w.e) + fractionals
      if (uLt(rest, unsafeInterval)) {
        kOut = kappa
        return if (roundWeed(buf, len, tooHigh.f - w.f, unsafeInterval, rest,
            Pow10(kappa) << -w.e, unit))
          Some((new String(buf, 0, len), kOut))
        else None
      }
    }
    while (true) {
      fractionals *= 10
      unit *= 10
      unsafeInterval *= 10
      val digit = (fractionals >>> -w.e).toInt
      buf(len) = ('0' + digit).toChar; len += 1
      fractionals &= oneF - 1
      kappa -= 1
      if (uLt(fractionals, unsafeInterval)) {
        kOut = kappa
        return if (roundWeed(buf, len, (tooHigh.f - w.f) * unit, unsafeInterval,
            fractionals, oneF, unit))
          Some((new String(buf, 0, len), kOut))
        else None
      }
    }
    None // unreachable
  }

  /** Grisu3: shortest digits + leading-digit exponent, or None. */
  private def grisu3(v: Double): Option[(String, Int)] = {
    val d = fromDouble(v)
    val w = normalize(d)
    val (bMinus, bPlus) = boundaries(d)
    val (tenMk, mk) = cachedPower(w.e)
    val scaledW = mul(w, tenMk)
    val sMinus = mul(bMinus, tenMk)
    val sPlus = mul(bPlus, tenMk)
    digitGen(sMinus, scaledW, sPlus).map { case (ds, kappa) =>
      // value = ds x 10^(-mk + kappa); exponent of the leading digit:
      val exp10 = ds.length - 1 - mk + kappa
      val stripped = ds.reverse.dropWhile(_ == '0').reverse
      (if (stripped.isEmpty) "0" else stripped, exp10)
    }
  }

  /** `%.17g` fallback: 17 correctly-rounded significant digits, trailing
    * zeros stripped (exact via BigDecimal on the binary value). Rounding is
    * HALF_EVEN to match C's %g (and hence R's formatter) on exact-tie
    * digits; MathContext's default HALF_UP would diverge on those ties. */
  private def fallback17(v: Double): (String, Int) = {
    val bd = new java.math.BigDecimal(v).round(
      new java.math.MathContext(17, java.math.RoundingMode.HALF_EVEN))
    val unscaled = bd.unscaledValue.toString
    val exp10 = unscaled.length - 1 - bd.scale
    val stripped = unscaled.reverse.dropWhile(_ == '0').reverse
    (if (stripped.isEmpty) "0" else stripped, exp10)
  }

  /** digits + decimal exponent of the leading digit for v > 0, finite. */
  def digits(v: Double): (String, Int) = {
    require(v > 0 && !v.isInfinite, s"grisu domain: $v")
    grisu3(v).getOrElse(fallback17(v))
  }
}
