package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector arithmetic over embedding columns.
  *
  * The HOF formulations (`aggregate(zip_with(a, b, ...))`) are
  * CodegenFallback — every element is a boxed interpreted lambda call, and
  * a norm written as `transform(a, x -> x / sqrt(aggregate(a, ...)))`
  * re-evaluates the whole norm aggregate PER ELEMENT. These expressions
  * are tight primitive loops inside whole-stage codegen.
  *
  * Accumulation is left-to-right in double on each accumulator — exactly
  * the element order the HOF `aggregate` used — so every produced value is
  * bit-identical to the previous formulation (pinned by TextHashesSpec).
  */
object VectorOpsImpl {
  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elem(a, aFloat, i) * elem(b, bFloat, i); i += 1 }
    s
  }

  /** dot / (|a|·|b|) — three independent left-to-right sums in one pass. */
  def cos(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, aFloat, i); val y = elem(b, bFloat, i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  def normalize(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = elem(a, aFloat, i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = elem(a, aFloat, i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}

private[functions] trait VecArg { self: Expression =>
  protected def checkVec(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} expects $name: array<float|double>, " +
          s"got ${other.simpleString}")
    }
  protected def isFloatType(dt: DataType): Boolean =
    dt match { case ArrayType(FloatType, _) => true; case _ => false }
}

/** vec_dot(a, b) → double: Σ aᵢ·bᵢ, left-to-right. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecArg {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "a")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "b")
  }
  override def dataType: DataType = DoubleType
  private def lf = isFloatType(left.dataType)
  private def rf = isFloatType(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.dot(a.asInstanceOf[ArrayData], lf,
      b.asInstanceOf[ArrayData], rf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOpsImpl.dot($a, $lf, $b, $rf)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
}

/** vec_cos(a, b) → double: cosine similarity. */
case class VecCos(left: Expression, right: Expression)
    extends BinaryExpression with VecArg {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "a")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "b")
  }
  override def dataType: DataType = DoubleType
  private def lf = isFloatType(left.dataType)
  private def rf = isFloatType(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.cos(a.asInstanceOf[ArrayData], lf,
      b.asInstanceOf[ArrayData], rf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOpsImpl.cos($a, $lf, $b, $rf)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecCos = copy(l, r)
}

/** vec_normalize(a) → array<double>: a / |a|, one norm pass per row. */
case class VecNormalize(child: Expression)
    extends UnaryExpression with VecArg {
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "a")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def cf = isFloatType(child.dataType)
  override def nullSafeEval(a: Any): Any =
    VectorOpsImpl.normalize(a.asInstanceOf[ArrayData], cf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorOpsImpl.normalize($a, $cf)")
  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(c)
}

object VectorOps {
  private def arity(es: Seq[Expression], n: Int, name: String): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${es.length}")
  def dotBuilder(es: Seq[Expression]): Expression = {
    arity(es, 2, "vec_dot"); VecDot(es(0), es(1))
  }
  def cosBuilder(es: Seq[Expression]): Expression = {
    arity(es, 2, "vec_cos"); VecCos(es(0), es(1))
  }
  def normalizeBuilder(es: Seq[Expression]): Expression = {
    arity(es, 1, "vec_normalize"); VecNormalize(es.head)
  }
}
