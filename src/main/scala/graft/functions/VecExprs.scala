package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two numeric array columns as a native Catalyst
  * expression with whole-stage codegen: one fused loop instead of the
  * interpreted `aggregate(zip_with(...))` HOF chain (~30x on the ANN brute
  * force). Floats are widened to double per element and each accumulator is
  * a left-to-right fold, bit-identical to the DuckDB oracle's
  * `list_reduce(list_transform(...))` formulation. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"CosineSim expects array<float|double>, got $t")
  }

  // Length-mismatched arrays return null (ragged embeddings fail loudly —
  // a truncated partial dot product would silently diverge from the DuckDB
  // oracle's list_zip NULL). Two zero-norm vectors are defined as
  // similarity 1.0 so the FoldSelfCosine rewrite of cosine_sim(x, x) is
  // semantics-preserving for every non-null input.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 && ny == 0.0) 1.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.$lGet($i);
         |    double $yi = (double) $y.$rGet($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 && $ny == 0.0) ? 1.0
         |    : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product against a CONSTANT double vector (e.g. an LSH hyperplane):
  * the plane lives in the expression, so codegen reads it from a reference
  * array — no per-row literal array construction. */
case class DotConst(child: Expression, plane: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // lazy: dataType is only legal after analysis resolves the child
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Null on length mismatch, matching CosineSim: a partial dot product
  // against a hyperplane silently mis-buckets ragged embeddings.
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != plane.length) return null
    val n = plane.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += xi * plane(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", plane, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $planeRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $planeRef.length; $i++) {
         |    $acc += ((double) $x.$get($i)) * $planeRef[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecFns {
  /** Column API for [[CosineSim]]. */
  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expr(a), GraftShim.expr(b)))

  /** Column API for [[DotConst]]. */
  def dotConst(v: Column, plane: Array[Double]): Column =
    GraftShim.column(DotConst(GraftShim.expr(v), plane))
}
