package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bpe_apply(word, merges): encode one word with a learned BPE merge table
  * (the inference half of text_bpe_train; Sennrich et al. 2016). Canonical
  * encode loop: start from characters, repeatedly find the adjacent symbol
  * pair with the LOWEST merge rank and merge every occurrence
  * left-to-right, until no adjacent pair is in the table. Equivalent to
  * applying the merges in learned order (a later merge can never create an
  * instance of an earlier pair — the earlier pair's symbols predate the
  * later merge's output symbol), which BpeEncodeSpec pins by replaying the
  * trainer's per-round fold chain.
  *
  * The merge table arrives as ONE space-joined foldable string
  * "l1 r1 l2 r2 …" (symbols come from whitespace-split words, so they can
  * never contain a space — the only delimiter that is safe by
  * construction), is parsed once at plan construction, and is embedded in
  * generated code as a reference object — the per-row hot path is a
  * whole-stage-codegen static call with zero parsing and zero lambda
  * interpretation.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with GraftTypedUnary {
  override def expectedInputType: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // first occurrence wins: lowest rank for a duplicated pair
      if (!m.containsKey(l + " " + r)) m.put(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    BpeImpl.encode(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.encode($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}

object BpeImpl {
  /** Canonical BPE encode: lowest-rank adjacent pair merged (all
    * occurrences, leftmost-greedy) until fixpoint. O(len² · merges) worst
    * case, O(len · rounds) typical — words are short.
    */
  def encode(
      w: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = w.toString
    var syms = new Array[String](s.length)
    var i = 0
    while (i < s.length) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
    var settled = syms.length < 2
    while (!settled) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestL = syms(j); bestR = syms(j + 1)
        }
        j += 1
      }
      if (bestL == null) settled = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == bestL && syms(k + 1) == bestR) {
            out += bestL + bestR; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toArray
        settled = syms.length < 2
      }
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): Any))
  }

  /** Parse the space-joined "l1 r1 l2 r2 …" merge-table encoding. */
  def parseMerges(flat: String): Seq[(String, String)] = {
    if (flat.isEmpty) return Seq.empty
    val parts = flat.split(" ", -1)
    require(parts.length % 2 == 0,
      s"bpe_apply merge table must be 'l r l r …' pairs, got ${parts.length} symbols")
    parts.grouped(2).map(p => (p(0), p(1))).toSeq
  }

  /** Function builder: second arg must be a foldable string literal. */
  def builder(es: Seq[Expression]): Expression = {
    require(es.length == 2, "bpe_apply expects (word, merges_string)")
    require(es(1).foldable && es(1).dataType == StringType,
      "bpe_apply merge table must be a foldable string")
    val flat = es(1).eval(null) match {
      case null => ""
      case u: UTF8String => u.toString
    }
    BpeApply(es(0), parseMerges(flat))
  }
}
