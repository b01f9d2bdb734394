package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the 64-bit SimHash of a token
  * array in one compiled pass — the signature stage of the hamming-LSH
  * near-dup pipeline ([[graft.operators.DedupOps.simhashNeardupPairs]]).
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[MinHashBands]] / [[SrpSums]]): the built-in composition
  * ([[graft.functions.TextSig.simhashHof]]) accumulates 65 counter lanes
  * through an interpreted zip_with per TOKEN — tokens × 65 lambda
  * evaluations per document dominate the operator's runtime. This
  * expression is BIT-IDENTICAL to the HOF chain (spec-asserted corpus-wide
  * in DedupOpsSpec):
  *  - per token, `h = xxhash64(w)` — seed 42 over the UTF-8 bytes via the
  *    same public XXH64 kernel; a NULL token leaves the hash at its seed
  *    (Spark's HashExpression skips null children), so it contributes the
  *    bit pattern of 42L, exactly like the HOF's `xxhash64(w)`;
  *  - bit k of the result is the majority vote `2·count(k) >= n` packed
  *    with the HOF's fold order: counter 0 lands in bit 63 (MSB of the
  *    high word) down to counter 63 in bit 0 — an EMPTY token array is
  *    all-ones (-1L: `2·0 >= 0` holds for every lane), and a null array
  *    is null.
  *
  * Registered as `graft_simhash(tokens)` through [[GraftExtensions]];
  * [[graft.functions.TextSig.simhash]] falls back to the HOF form when
  * the extension is absent.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Seed used by Spark's xxhash64 SQL function. */
  private val Seed = 42L

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (toks.isNullAt(i)) Seed // xxhash64 skips null children
        else {
          val s = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        }
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    // majority-pack with the HOF's fold order: counter 0 → bit 63
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 32) { hi = hi * 2 + (if (2L * counts(k) >= n) 1L else 0L); k += 1 }
    while (k < 64) { lo = lo * 2 + (if (2L * counts(k) >= n) 1L else 0L); k += 1 }
    (hi << 32) | lo
  }
}
