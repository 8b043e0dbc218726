package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure band inequality join
  *
  * {{{ A JOIN B ON a >= b AND a < b + k }}}
  *
  * (integer-typed `a` from one side, `b` from the other, literal band
  * width `k > 0`, and NO equi-conjunct Spark could already hash on) into
  * the banded bucket equi-join:
  *
  *  - the `a` side gains `bucket(a) = floorDiv(a, k)`;
  *  - the `b` side is exploded to the two buckets its `[b, b+k)` window
  *    can overlap, `floorDiv(b, k)` and `floorDiv(b, k) + 1`;
  *  - the join becomes an EQUI-join on the bucket plus the original
  *    predicate, then a projection drops the helper columns.
  *
  * Each qualifying pair matches in exactly one bucket (`bucket(a)` is a
  * single value), so no dedup is needed and the result multiset is
  * unchanged. Without this rule Spark plans a BroadcastNestedLoopJoin —
  * O(|A|x|B|) pairs evaluated; with it, the shuffle is O(|A| + 2|B|) rows
  * keyed by bucket and the predicate only runs within a bucket. This is
  * the declarative-user path to the same plan `Olap.j5_range_join` builds
  * by hand, injected via `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Scope (deliberately narrow, semantics-preserving):
  *  - inner joins only, both band bounds over the SAME (a, b) pair;
  *  - `a`/`b` are int/long expressions; floor division is sign-safe
  *    (`(x - pmod(x, k)) div k`), so negative domains bucket correctly;
  *  - fires only when no equi-conjunct exists (anything hashable means
  *    Spark's join selection already avoids the nested loop).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BandCol = "__graft_band"

  /** Sign-safe floor division as a Catalyst expression over longs. */
  private def floorDiv(x: Expression, k: Expression): Expression =
    IntegralDivide(Subtract(x, Pmod(x, k)), k)

  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case IntegerType => Cast(e, LongType)
    case _ => e
  }

  private def intLike(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def longLit(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case _ => None
  }

  /** `(a, b, k)` such that the conjunct set contains `a >= b` and
    * `a < b + k` with `a` strictly from one join side and `b` from the
    * other. */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def oneSided(a: Expression, b: Expression): Boolean = {
      val aL = a.references.subsetOf(left.outputSet)
      val aR = a.references.subsetOf(right.outputSet)
      val bL = b.references.subsetOf(left.outputSet)
      val bR = b.references.subsetOf(right.outputSet)
      a.references.nonEmpty && b.references.nonEmpty &&
        ((aL && bR) || (aR && bL))
    }
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(a, b) if oneSided(a, b) => (a, b)
      case LessThanOrEqual(b, a) if oneSided(a, b) => (a, b)
    }
    val uppers = conjuncts.collect {
      case LessThan(a, Add(b, l: Literal, _)) => (a, b, l)
      case LessThan(a, Add(l: Literal, b, _)) => (a, b, l)
      case GreaterThan(Add(b, l: Literal, _), a) => (a, b, l)
      case GreaterThan(Add(l: Literal, b, _), a) => (a, b, l)
    }
    (for {
      (a, b) <- lowers
      if intLike(a) && intLike(b) && a.deterministic && b.deterministic
      (a2, b2, l) <- uppers
      if a2.semanticEquals(a) && b2.semanticEquals(b)
      k <- longLit(l)
      if k > 0
    } yield (a, b, k)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(e1, e2) =>
          (e1.references.subsetOf(left.outputSet) &&
            e2.references.subsetOf(right.outputSet)) ||
          (e1.references.subsetOf(right.outputSet) &&
            e2.references.subsetOf(left.outputSet))
        case _ => false
      }
      if (hasEqui) j
      else findBand(conjuncts, left, right) match {
        case None => j
        case Some((a, b, k)) =>
          val kLit = Literal(k, LongType)
          val aFromLeft = a.references.subsetOf(left.outputSet)
          val aPlan = if (aFromLeft) left else right
          val bPlan = if (aFromLeft) right else left

          val aBand = Alias(floorDiv(asLong(a), kLit), BandCol + "_a")()
          val aProj = Project(aPlan.output :+ aBand, aPlan)

          val bBucket = floorDiv(asLong(b), kLit)
          val gen = Explode(CreateArray(Seq(bBucket, Add(bBucket, Literal(1L)))))
          val genOut = AttributeReference(BandCol + "_b", LongType,
            nullable = gen.elementSchema.head.nullable)()
          val bGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(genOut), child = bPlan)

          val bandEq = EqualTo(aBand.toAttribute, genOut)
          val (newLeft, newRight) =
            if (aFromLeft) (aProj: LogicalPlan, bGen: LogicalPlan)
            else (bGen: LogicalPlan, aProj: LogicalPlan)
          Project(j.output, Join(newLeft, newRight, Inner,
            Some(And(bandEq, cond)), hint))
      }
  }
}
