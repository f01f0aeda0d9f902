package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Optimizer rule that recognizes the *declarative* nearest-centroid
  * pattern a user writes with pure built-ins —
  *
  *   cast(array_position(D, array_min(D)) - 1 as int)
  *   where D = transform(<literal array<array<double>>>,
  *                       c -> aggregate(zip_with(v, c, (x,y) -> (x-y)*(x-y)),
  *                                      0.0, (a,x) -> a+x))
  *
  * (exactly `KMeansOps.assignDyn`'s shape) — and replaces it with the
  * allocation-free native [[NearestCentroid]] expression. Semantics are
  * identical by construction: same left-to-right accumulation, and the
  * first-occurrence contract of array_position equals the strict-<
  * argmin tie-break.
  *
  * This is the (c) tier of the extension ladder (Rule + extensions
  * registration) applied where it genuinely pays: users keep writing
  * the declarative form, the optimizer lowers it to the hand-tuned
  * kernel. Enable per-session via
  * `spark.experimental.extraOptimizations :+= RewriteNearestCentroid`
  * or at session build with
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
object RewriteNearestCentroid extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(Subtract(
            ArrayPosition(t1: ArrayTransform, ArrayMin(t2: ArrayTransform)),
            one, _), IntegerType, _, _)
          if isLongOne(one) && t1.semanticEquals(t2) =>
        extract(t1).map { case (vec, cents) =>
          new NearestCentroid(vec, cents): Expression
        }.getOrElse(c)
    }

  private def isLongOne(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case 1L => true
      case 1 => true
      case _ => false
    })

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  /** sq-dist fold body: aggregate(zip_with(v, c, (x,y)->(x-y)*(x-y)),
    * 0.0, (a,x)->a+x, identity). Returns the point-vector expression. */
  private def sqDistBody(body: Expression,
                         cVar: NamedLambdaVariable): Option[Expression] =
    body match {
      case ArrayAggregate(
            ZipWith(vec, cRef, LambdaFunction(
              Multiply(Subtract(a1, b1, _), Subtract(a2, b2, _), _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero, LambdaFunction(
              Add(accRef, xRef, _),
              Seq(acc: NamedLambdaVariable, ax: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isVar(cRef, cVar) &&
            isVar(a1, x) && isVar(b1, y) && isVar(a2, x) && isVar(b2, y) &&
            isVar(accRef, acc) && isVar(xRef, ax) && isVar(fin, fv) &&
            zero.foldable && zero.eval() == 0.0 =>
        Some(vec)
      case _ => None
    }

  private def extract(
      t: ArrayTransform): Option[(Expression, Array[Array[Double]])] =
    t match {
      case ArrayTransform(
            Literal(data: ArrayData, ArrayType(ArrayType(DoubleType, _), _)),
            LambdaFunction(body, Seq(cVar: NamedLambdaVariable), _))
          // empty or null-bearing centroid literals yield NULL/absent
          // results declaratively; the native kernel returns -1 — refuse
          // the rewrite rather than change an edge-case answer
          if data.numElements() > 0 &&
            (0 until data.numElements()).forall(!data.isNullAt(_)) =>
        sqDistBody(body, cVar).map { vec =>
          val cents = (0 until data.numElements())
            .map(i => data.getArray(i).toDoubleArray()).toArray
          (vec, cents)
        }
      case _ => None
    }
}

/** `spark.sql.extensions` entry point: registers the optimizer rewrite
  * AND the native expressions as SQL functions, so `spark.sql` users
  * can write `graft_dot(a, b)` and
  * `nearest_centroid(v, array(array(…), …))` directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteNearestCentroid)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    // eager aggregation: keyed fan-out statistics written as
    // join-then-aggregate collapse to per-side aggregates
    e.injectOptimizerRule(_ => graft.plans.PushAggThroughJoin)
    e.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.CoOccurrencePairsStrategy)
    // SQL lowering for SnapshotCatalog tables (reads incl. time
    // travel, MERGE INTO) onto the programmatic snapshot engine
    e.injectResolutionRule(session =>
      new graft.sources.ResolveSnapshotSql(session))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) expects 2 arguments")
        new DotProduct(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "nearest_centroid(v, centroids) expects 2 arguments")
        val centsExpr = args(1)
        require(centsExpr.foldable && centsExpr.dataType.isInstanceOf[ArrayType],
          "nearest_centroid: centroids must be a literal array<array<double>>")
        val data = centsExpr.eval().asInstanceOf[ArrayData]
        val cents = (0 until data.numElements())
          .map(i => data.getArray(i).toDoubleArray()).toArray
        new NearestCentroid(args(0), cents)
      }))
  }
}
