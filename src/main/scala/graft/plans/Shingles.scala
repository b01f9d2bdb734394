package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-bigram shingling — the preprocessing every dedup
  * pipeline shares ([[graft.operators.DedupOps.shingled]]).
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[MinHashBands]]): the built-in form
  * `array_distinct(filter(zip_with(split(t), slice(...), concat), notNull))`
  * walks the interpreted evaluator per token and is evaluated THREE times
  * in the exact-Jaccard join's DAG (candidate generation + both verify
  * sides) — at corpus scale tokenization dominates. This expression is
  * BIT-IDENTICAL to the composition (spec-asserted): Spark's
  * `split(text, " ")` keeps empty tokens (limit -1), bigrams are
  * `tok(i) ++ "_" ++ tok(i+1)`, and distinct keeps FIRST occurrences in
  * order (array_distinct semantics — byte equality for strings). */
case class Shingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  // containsNull = true matches the HOF chain's declared type (zip_with
  // elements are nullable even though every surviving value is non-null)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Shingles$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Sep = UTF8String.fromString(" ")
  private val Under = Array[Byte]('_')

  def compute(text: UTF8String): GenericArrayData = {
    // UTF8String.split with limit -1 = Spark's split(text, " ") (the space
    // byte never occurs inside a multi-byte UTF-8 sequence)
    val toks = text.split(Sep, -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i < n - 1) {
      seen.add(UTF8String.concat(toks(i), UTF8String.fromBytes(Under), toks(i + 1)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
