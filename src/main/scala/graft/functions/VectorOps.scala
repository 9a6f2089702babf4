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

  /** floor(x·1e6 + 0.5) per element — the repo's cross-engine half-up
    * 6dp quantization, as exact integer micro-units. Input doubles are
    * bit-identical across engines (float→double widening is exact), so
    * the quantized lattice is too; every downstream sum/dot over the
    * longs is then order-free and engine-free.
    */
  def quantize6(a: ArrayData, aFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(elem(a, aFloat, i) * 1e6 + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact integer dot product over micro-unit arrays (Σ aᵢ·bᵢ as long —
    * order-free, no rounding; overflow-safe for micro-quantized
    * embeddings: |xq| ≤ ~1e7 ⇒ Σ over 64 dims ≤ ~6e15 ≪ 2⁶³).
    */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
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

/** vec_quantize6(a) → array<bigint>: half-up 6dp micro-unit lattice. */
case class VecQuantize6(child: Expression)
    extends UnaryExpression with VecArg {
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "a")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def cf = isFloatType(child.dataType)
  override def nullSafeEval(a: Any): Any =
    VectorOpsImpl.quantize6(a.asInstanceOf[ArrayData], cf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorOpsImpl.quantize6($a, $cf)")
  override protected def withNewChildInternal(c: Expression): VecQuantize6 =
    copy(c)
}

/** vec_dotq(a, b) → bigint: exact integer dot over micro-unit arrays. */
case class VecDotQ(left: Expression, right: Expression)
    extends BinaryExpression {
  private def checkLongVec(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_dotq expects $name: array<bigint>, got ${other.simpleString}")
    }
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkLongVec(left.dataType, "a")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkLongVec(right.dataType, "b")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOpsImpl.dotQ($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDotQ = copy(l, r)
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
  def quantize6Builder(es: Seq[Expression]): Expression = {
    arity(es, 1, "vec_quantize6"); VecQuantize6(es.head)
  }
  def dotQBuilder(es: Seq[Expression]): Expression = {
    arity(es, 2, "vec_dotq"); VecDotQ(es(0), es(1))
  }
}
