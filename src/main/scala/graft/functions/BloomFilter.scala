package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.{Encoder, Encoders}

/** Bloom filter over long keys: the semi-join-reduction primitive.
  *
  * At 100 TB the dominant cost of `fact JOIN dim-subset` is shuffling the
  * fact rows that will NOT survive the join. A bloom built over the dim
  * keys (one partial-agg pass: per-partition bitsets, bitwise-OR merge —
  * same two-phase shape as any hash aggregate) is ~10 bits/key at 1% fpp,
  * 50-100x smaller than a broadcast hash relation over the same keys, so
  * it broadcasts cheaply even when the dim side is far past
  * `autoBroadcastJoinThreshold`. Probing it BEFORE the join's exchange
  * drops (1 - selectivity - fpp) of the fact scan from the shuffle; the
  * real join afterwards removes the false positives, so results are
  * bit-identical to the plain join (which is the oracle for
  * `x6_bloom_join`).
  *
  * Wire format: bytes[0..3] = k (number of probe hashes, big-endian),
  * bytes[4..] = the bitset, little-endian within each byte. Probe hashes
  * use splitmix64 double hashing (Kirsch-Mitzenmacher: h1 + i*h2 is as
  * good as k independent hashes).
  */
object Bloom {
  final val HeaderBytes = 4

  /** Bits for `n` keys at false-positive rate `fpp`, rounded up to bytes. */
  def sizeFor(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    val ln2 = math.log(2)
    val m = math.max(64L, math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong)
    val mBytes = math.toIntExact((m + 7) / 8)
    val k = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (mBytes, k)
  }

  def empty(n: Long, fpp: Double): Array[Byte] = {
    val (mBytes, k) = sizeFor(n, fpp)
    val b = new Array[Byte](HeaderBytes + mBytes)
    b(0) = (k >>> 24).toByte; b(1) = (k >>> 16).toByte
    b(2) = (k >>> 8).toByte; b(3) = k.toByte
    b
  }

  @inline private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def kOf(b: Array[Byte]): Int =
    ((b(0) & 0xFF) << 24) | ((b(1) & 0xFF) << 16) | ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)

  def put(bits: Array[Byte], key: Long): Unit = {
    val k = kOf(bits)
    val m = (bits.length - HeaderBytes).toLong * 8L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits(HeaderBytes + (idx >>> 3).toInt) =
        (bits(HeaderBytes + (idx >>> 3).toInt) | (1 << (idx & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Static probe — called from both interpreted eval and generated code. */
  def mightContain(bits: Array[Byte], key: Long): Boolean = {
    val k = kOf(bits)
    val m = (bits.length - HeaderBytes).toLong * 8L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits(HeaderBytes + (idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "bloom size mismatch in merge")
    val out = new Array[Byte](a.length)
    System.arraycopy(a, 0, out, 0, HeaderBytes)
    var i = HeaderBytes
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }
}

/** Distributed builder: `udaf(new BloomBuildAgg(n, fpp))` over a long
  * column. Partial bitsets are built per partition and OR-merged — the
  * canonical two-phase aggregate, one small binary row out. Null keys are
  * skipped (a null never equi-joins, so it needs no bit). */
class BloomBuildAgg(expectedKeys: Long, fpp: Double)
    extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Bloom.empty(expectedKeys, fpp)
  override def reduce(b: Array[Byte], key: java.lang.Long): Array[Byte] = {
    if (key != null) Bloom.put(b, key)
    b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bloom.or(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `bloom_might_contain(bloomBinary, keyLong)`: codegen'd membership probe.
  * Null bloom or null key → null (mirrors equi-join null semantics). The
  * bloom side is a broadcast-sized literal in practice, so the generated
  * loop probes a shared byte array with no per-row allocation. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bits: Any, key: Any): Any =
    Bloom.mightContain(bits.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) =>
      s"${ev.value} = graft.functions.Bloom.mightContain($bits, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
