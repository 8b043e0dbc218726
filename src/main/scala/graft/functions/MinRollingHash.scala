package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_rolling_hash(text)`: minimum Rabin–Karp polynomial hash over all
  * 8-code-point windows of `text` — the document-fingerprint primitive
  * (winnowing-style min-shingle digest) as ONE O(n) rolling pass.
  *
  * Replaces the previous `transform(sequence(...), i -> md5(substring(...)))`
  * form, which evaluated one md5 + substring allocation per character
  * (the slowest non-WDI bench query at sf0.1). The hash is
  * `sum cp[i+j] * B^(7-j) mod M` with B=257, M=1e9+7 — small enough that
  * every intermediate fits a 64-bit signed long on both Spark and DuckDB
  * (the oracle mirrors it with an 8-term nested expression; perf there is
  * irrelevant), and reduced into [0, M) so min() agrees across engines.
  * Texts shorter than 8 code points hash as one window of their full
  * length (DuckDB side: `list_reduce`). Code points, not UTF-16 units,
  * so `length`/`substring` semantics line up with SQL `len`/`substring`.
  */
case class MinRollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "min_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.eval($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): MinRollingHash =
    copy(child = newChild)
}

/** Standalone object (deliberately NOT the case class's companion): scalac
  * emits Java static forwarders only for objects without a companion class,
  * and the generated code above calls `RollingHash.eval` as a static. */
object RollingHash {
  final val W = 8
  final val B = 257L
  final val M = 1000000007L
  /** B^(W-1) mod M, the out-going-char multiplier of the rolling step. */
  final val BW: Long = {
    var p = 1L
    var i = 0
    while (i < W - 1) { p = p * B % M; i += 1 }
    p
  }

  /** Static so both interpreted eval and generated code share one body
    * (the loop is already branch-free scalar arithmetic; inlining it into
    * generated Java would not widen any codegen span it isn't already in). */
  def eval(s: String): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n <= W) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + cps(i)) % M; i += 1 }
      h
    } else {
      var h = 0L
      var i = 0
      while (i < W) { h = (h * B + cps(i)) % M; i += 1 }
      var min = h
      while (i < n) {
        h = ((h + M - cps(i - W) * BW % M) % M * B + cps(i)) % M
        if (h < min) min = h
        i += 1
      }
      min
    }
  }
}
