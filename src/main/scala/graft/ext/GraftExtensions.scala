package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IsNotNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{CosineSim, DotConst, FullToHalf, Deligature}

/** Optimizer rule: `cosine_sim(x, x)` is 1.0 for any non-null vector —
  * fold the self-similarity away instead of running the O(d) loop per row
  * (a self-join near-dup query hits this on its diagonal). Semantics-
  * preserving: CosineSim itself defines two zero-norm vectors as 1.0, so
  * the folded and unfolded paths agree on every input, whether the
  * expression arrives via SQL or the Column API. */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
      org.apache.spark.sql.catalyst.expressions.If(
        IsNotNull(a), Literal(1.0, DoubleType), Literal(null, DoubleType))
  }
}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.ext.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("full_to_half"),
      info("full_to_half", "full_to_half(s) - fullwidth chars to halfwidth"),
      (args: Seq[Expression]) => FullToHalf(args.head)))
    e.injectFunction((FunctionIdentifier("deligature"),
      info("deligature", "deligature(s) - typographic ligatures to ASCII"),
      (args: Seq[Expression]) => Deligature(args.head)))
    e.injectOptimizerRule(_ => FoldSelfCosine)
  }
}
