package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the MAXIMUM ELEMENT MULTIPLICITY
  * of a string array in one compiled pass — the per-n-gram repetition
  * kernel of [[graft.operators.TextOps.repetitionScores]] (q104).
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[SimHash64]]): the built-in composition sorts the array and folds a
  * run-length struct through an interpreted `aggregate` lambda — an
  * O(n log n) sort plus 3 struct fields re-built per element. This kernel
  * counts multiplicities with one open hash pass, no sort, no per-element
  * allocation beyond map nodes. BIT-IDENTICAL to the HOF form
  * (spec-asserted corpus-wide plus adversarial edges in TextOpsSpec):
  * max run over `array_sort(arr)` = max multiplicity, with Spark's
  * `array_sort` null placement making NULL ELEMENTS one run — so nulls
  * count as their own group here too; an EMPTY array is 0; a NULL array
  * is null (standard null-intolerant unary semantics, same as the HOF's
  * aggregate over a null array).
  *
  * Registered as `graft_max_run(arr)` through [[GraftExtensions]];
  * [[graft.operators.TextOps]] falls back to the HOF form when the
  * extension is absent.
  */
case class MaxRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_run"

  override protected def nullSafeEval(input: Any): Any =
    MaxRun.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MaxRun$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxRun =
    copy(child = newChild)
}

object MaxRun {

  /** One pass, open hashing on the UTF8String elements (valid for the
    * lifetime of this call — the backing buffer outlives the loop). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    // clamp BEFORE doubling: n * 2 in Int overflows negative for arrays
    // over 2^30 elements and the HashMap constructor would throw
    val counts = new java.util.HashMap[UTF8String, Integer](Math.min(n, 1 << 15) * 2)
    var best = 0
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        nulls += 1
        if (nulls > best) best = nulls
      } else {
        val s = arr.getUTF8String(i)
        val prev = counts.get(s)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(s, c)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }
}
