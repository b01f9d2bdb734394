package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression emitting the md5 fingerprint of every
  * `w`-token sliding window of a token array — the span-fingerprinting
  * stage of [[graft.operators.TextOps.duplicateSpans]] (q107).
  *
  * Why a custom Expression (the (b) tier, same rationale as [[MaxRun]] /
  * [[SimHash64]]): the built-in composition runs an interpreted
  * `transform` lambda per window, each materializing a `slice` array, an
  * `array_join` string and its UTF8 copy before hashing — ~n·w
  * intermediate objects per document. This kernel snapshots the token
  * bytes once and streams each window straight into a per-thread
  * MessageDigest (`update(bytes)` per token + separator), allocating only
  * the 32-char output hex per window. BIT-IDENTICAL to the HOF form
  * (spec-asserted corpus-wide plus adversarial edges in TextOpsSpec):
  *  - the digest input is exactly `array_join(slice(tok, i, w), " ")` —
  *    null tokens are SKIPPED along with their separator (array_join
  *    semantics), and the hex is lowercase like Spark's `md5`;
  *  - fewer than `w` tokens (or `w <= 0`) → an EMPTY array;
  *  - a null token ARRAY → null (the wrapper's HOF fallback mirrors
  *    this with an otherwise-less CASE).
  * The md5 basis keeps q107 fully oracle-checkable — DuckDB recomputes
  * every fingerprint from the same joined strings.
  *
  * Registered as `graft_span_hashes(tokens, w)` through
  * [[GraftExtensions]]; [[graft.operators.TextOps]] falls back to the
  * HOF form when the extension is absent.
  */
case class SpanHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override protected def nullSafeEval(arr: Any, w: Any): Any =
    SpanHashes.compute(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SpanHashes$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashes =
    copy(left = newLeft, right = newRight)
}

object SpanHashes {

  private def md5 = GraftExtensions.md5Local
  private val Sep = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(Array.empty[Any])
    // token bytes snapshotted once; each window streams straight into
    // the digest
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val d = md5.get()
    val out = new Array[Any](n - w + 1)
    var s = 0
    while (s <= n - w) {
      d.reset()
      var first = true
      var j = s
      while (j < s + w) {
        val b = toks(j)
        if (b != null) { // array_join skips null elements AND separators
          if (!first) d.update(Sep)
          d.update(b)
          first = false
        }
        j += 1
      }
      out(s) = UTF8String.fromString(hex(d.digest()))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def hex(dig: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < dig.length) {
      sb.append(Character.forDigit((dig(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(dig(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }
}
