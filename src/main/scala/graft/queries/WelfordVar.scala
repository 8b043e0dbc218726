package graft.queries

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Welford/Chan online sample variance as a typed
  * [[org.apache.spark.sql.expressions.Aggregator]] — the user-defined
  * aggregate extension point. State is (n, mean, M2); `reduce` is the
  * classic Welford update and `merge` the Chan et al. pairwise
  * combination, so partial aggregates from any partitioning merge
  * associatively and the plan is a normal two-phase hash aggregate (no
  * collect, no sort). Numerically this is the stable formulation —
  * catastrophic cancellation of the naive sum-of-squares never appears —
  * and it matches `var_samp` to well below the round(6) the oracle
  * pairing uses. */
object WelfordVar {

  case class State(n: Long, mean: Double, m2: Double)

  val agg: Aggregator[Double, State, Double] =
    new Aggregator[Double, State, Double] {
      def zero: State = State(0L, 0.0, 0.0)
      def reduce(s: State, x: Double): State = {
        val n = s.n + 1
        val d = x - s.mean
        val mean = s.mean + d / n
        State(n, mean, s.m2 + d * (x - mean))
      }
      def merge(a: State, b: State): State = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          State(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      }
      def finish(s: State): Double =
        if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)
      def bufferEncoder: Encoder[State] = Encoders.product[State]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private lazy val fn = udaf(agg)

  def udafCol(c: Column): Column = fn(c)
}
