package graft.ts

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Applies a per-group series kernel as a distributed Spark operator.
  *
  * Shape: `groupByKey(group key).flatMapGroups` — one shuffle on the group
  * key, then each group's rows are sorted by the order column in-task and the
  * kernel runs on plain arrays (the reference's per-country column vector,
  * detrendandstat_quad.R:146-168). Appends one output column per spec,
  * preserving all input columns, so downstream aggregation reuses the same
  * group-hash partitioning.
  *
  * Scale notes: parallelism = number of groups (countries / users / series
  * ids), each group must fit in task memory (bounded: <= a few thousand
  * points/series). Skewed giant groups would need windowed chunking — not a
  * semantics the reference has.
  */
object GroupKernels {

  /** @param specs (inputCol, outputCol) pairs, each run through `kernel`
    * @param kernel (t, y) => out, all length-preserving, NaN = missing
    */
  def withKernel(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      specs: Seq[(String, String)],
      kernel: (Array[Double], Array[Double]) => Array[Double]): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields ++ specs.map { case (_, o) => StructField(o, DoubleType) })
    val keyIdx = keyCols.map(inSchema.fieldIndex).toArray
    val ordIdx = inSchema.fieldIndex(orderCol)
    val inIdx = specs.map { case (in, _) => inSchema.fieldIndex(in) }.toArray
    implicit val rowEnc = Encoders.row(outSchema)

    df.groupByKey { r: Row =>
        keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u001f")
      }(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(numAt(_, ordIdx))
        val t = rows.map(numAt(_, ordIdx))
        val outs = inIdx.map { ci =>
          val y = rows.map(numAt(_, ci))
          kernel(t, y)
        }
        rows.iterator.zipWithIndex.map { case (r, i) =>
          val extra = outs.map { o =>
            val v = o(i)
            if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
          }
          Row.fromSeq(r.toSeq ++ extra)
        }
      }
  }

  /** Null-safe numeric read: null (or non-numeric) becomes NaN. */
  private def numAt(r: Row, i: Int): Double =
    if (r.isNullAt(i)) Double.NaN
    else r.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case ts: java.sql.Timestamp => ts.getTime.toDouble
      case other => throw new IllegalArgumentException(
        s"non-numeric order/value column at $i: ${other.getClass}")
    }
}
