package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket signatures as a native codegen'd
  * expression.
  *
  * Replaces the nested higher-order-function formulation used by the
  * similarity/dedup queries: Spark's HigherOrderFunction expressions are
  * CodegenFallback (interpreted, per-row lambda dispatch), so computing
  * nTables × nPlanes × dim weighted projections through `aggregate`/
  * `transform` costs boxed lambda calls per element. This expression is a
  * tight primitive loop inside whole-stage codegen.
  *
  * Semantics are pinned by TextHashesSpec against the HOF form:
  * plane p = t·nPlanes + j uses integer weights
  * w(p, d) = ((p·2654435761 + d·2246822519) % 251) % 7 − 3 (multiplicative
  * mixing — decorrelated planes; d is 1-based). Each coordinate is
  * quantized ONCE to half-up 6dp micro-units (xq = ⌊x·10⁶ + 0.5⌋, the
  * same lattice as vec_quantize6), so the projection Σ xq_d·w(p,d) is an
  * exact integer sum — addition-order free, hence identical no matter how
  * an engine (Spark partial aggs, DuckDB's SUM) associates it. The former
  * double accumulation made the sign test `s > 0` a knife-edge: a
  * projection within rounding error of 0 could bucket differently between
  * engines and fail the bit-exact gate spuriously (round-8 ADVICE.md).
  * bucket_t = Σ_j [proj > 0]·2^j.
  */
object VectorLshImpl {
  def lshBuckets(arr: ArrayData, isFloat: Boolean,
      nTables: Int, nPlanes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val p = (t * nPlanes + j).toLong
        var s = 0L
        var i = 0
        while (i < n) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          val xq = Math.floor(x * 1000000.0 + 0.5).toLong
          val w = (p * 2654435761L + (i + 1).toLong * 2246822519L) % 251L % 7L - 3L
          s += xq * w
          i += 1
        }
        if (s > 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** lsh_buckets(array<float|double>, nTables, nPlanes) → array<bigint>
  * of one bucket id per hash table.
  */
case class LshBuckets(child: Expression, nTables: Int, nPlanes: Int)
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float> or array<double>, " +
        s"got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorLshImpl.lshBuckets(v.asInstanceOf[ArrayData], isFloat,
      nTables, nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorLshImpl.lshBuckets($c, $isFloat, $nTables, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}

object VectorLsh {
  /** Validated builder for lsh_buckets(arr, nTables, nPlanes). */
  def builder(es: Seq[Expression]): Expression = {
    def bad(why: String) = throw new IllegalArgumentException(
      s"lsh_buckets(array<float|double>, nTables, nPlanes): $why; " +
        "usage: lsh_buckets(embedding, 6, 6) with integer literals")
    if (es.length != 3) bad(s"expected 3 arguments, got ${es.length}")
    val ints = es.drop(1).map { e =>
      if (!e.foldable) bad("nTables/nPlanes must be literals")
      e.eval() match {
        case n: java.lang.Number => n.intValue()
        case other => bad(s"expected integer literal, got $other"); 0
      }
    }
    if (ints.exists(_ <= 0) || ints(1) > 63) bad(
      s"nTables/nPlanes must be positive (nPlanes <= 63), got $ints")
    LshBuckets(es.head, ints(0), ints(1))
  }
}
