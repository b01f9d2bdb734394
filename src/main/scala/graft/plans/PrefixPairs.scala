package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Native in-bucket candidate-pair expansion for the prefix-filter Jaccard
  * join ([[graft.operators.DedupOps.jaccardPrefixCandidates]]): one tight
  * loop over a bucket's sorted `(doc_id, sz, p)` members emitting the
  * `(doc_i, doc_j)` pairs that survive the two EXACTNESS-PRESERVING ppjoin
  * filters (length: `tNum·max(sz) <= tDen·min(sz)`; positional: `1 +
  * min(szx-px, szy-py) >= ceil(tNum·(szx+szy)/(tNum+tDen))`, exact integer
  * arithmetic).
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[MinHashBands]]): the built-in form is a doubly-nested
  * `transform`/`slice` whose filter lambda walks the interpreted evaluator
  * once per ORDERED SLOT — a token shared by m documents enumerates
  * m·(m-1)/2 slots whether or not the filters pass, and on a
  * small-vocabulary corpus those slots (≈6M at sf0.1) dominate the whole
  * query. Output pairs and their order are IDENTICAL to the HOF
  * composition (spec-asserted); only surviving pairs ever allocate.
  */
case class PrefixPairs(child: Expression, tNum: Int, tDen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 3 && s(0).dataType == LongType &&
          s(1).dataType == IntegerType && s(2).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<doc_id:bigint, sz:int, p:int>>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_i", LongType, nullable = false),
      StructField("doc_j", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_prefix_pairs"

  override protected def nullSafeEval(input: Any): Any =
    PrefixPairs.compute(input.asInstanceOf[ArrayData], tNum, tDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PrefixPairs$$.MODULE$$.compute($c, $tNum, $tDen)")

  override protected def withNewChildInternal(newChild: Expression): PrefixPairs =
    copy(child = newChild)
}

object PrefixPairs {
  def compute(members: ArrayData, tNum: Int, tDen: Int): ArrayData = {
    val n = members.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    val ps = new Array[Int](n)
    var i = 0
    while (i < n) {
      val m = members.getStruct(i, 3)
      ids(i) = m.getLong(0); szs(i) = m.getInt(1); ps(i) = m.getInt(2)
      i += 1
    }
    val out = ArrayBuffer.empty[InternalRow]
    val den = tNum + tDen
    i = 0
    while (i < n) {
      val sx = szs(i)
      var j = i + 1
      while (j < n) {
        val sy = szs(j)
        val mn = math.min(sx, sy); val mx = math.max(sx, sy)
        if (tNum.toLong * mx <= tDen.toLong * mn) {
          // ceil(tNum*(sx+sy)/(tNum+tDen)) in exact integers
          val alpha = (tNum.toLong * (sx + sy) + den - 1) / den
          val ubound = 1L + math.min(sx - ps(i), sy - ps(j))
          if (ubound >= alpha)
            out += InternalRow(ids(i), ids(j))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
