package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DotConst, FullToHalf, Deligature}

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
  }
}
