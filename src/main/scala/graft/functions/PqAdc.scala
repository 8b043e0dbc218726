package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(tab, codes)`: product-quantization asymmetric-distance lookup —
  * sum over subspaces j of `tab[j][codes[j]]`, where `tab` is a query's
  * per-subspace dot-product table (array<array<double>>, m x k) and `codes`
  * is a corpus vector's PQ code word (array<int>, length m).
  *
  * Semantically identical to the higher-order fold
  * `aggregate(sequence(0, m-1), 0D, (acc, j) ->
  *    acc + element_at(element_at(tab, j+1), element_at(codes, j+1) + 1))`
  * but a native codegen Expression: HOFs are CodegenFallback, and the
  * interpreted fold runs once per (query, corpus-vector) pair — the entire
  * inner loop of the ADC scan. Null on null/short inputs or out-of-range
  * codes (the HOF's element_at would throw/null the same cases).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tab.numElements() < m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || tab.isNullAt(j)) return null
      val row = tab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tab, codes) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = $codes.numElements();
         |if ($tab.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j) || $tab.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($j);
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $row.getDouble($c);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
