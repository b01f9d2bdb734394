package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  *  - per token, `h = md5_low64(w)` — the first 8 MD5 digest bytes,
  *    big-endian, exactly `conv(substring(md5(w),1,8),16,10)<<32 |
  *    conv(substring(md5(w),9,8),16,10)`. The MD5 basis (not xxhash64) is
  *    deliberate: DuckDB computes the identical md5, so q72's oracle
  *    recomputes the whole pair set from scratch — the basis is what
  *    makes the operator fully hash-checkable cross-engine;
  *  - a NULL token hashes to null in the HOF (`md5(null)`), whose bit
  *    lanes all take the `otherwise(0)` branch — it votes for nothing but
  *    still counts toward n; the kernel mirrors that exactly;
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

  private def md5 = GraftExtensions.md5Local

  /** First 8 MD5 digest bytes, big-endian — the value chain of parsing
    * the first 16 hex chars of `md5(s)`, shared with the HOF fallback and
    * the DuckDB oracle (`('0x' || substr(md5(t),1,16))::UBIGINT`). */
  def hash64(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xFFL) << 56) | ((dig(1) & 0xFFL) << 48) |
      ((dig(2) & 0xFFL) << 40) | ((dig(3) & 0xFFL) << 32) |
      ((dig(4) & 0xFFL) << 24) | ((dig(5) & 0xFFL) << 16) |
      ((dig(6) & 0xFFL) << 8) | (dig(7) & 0xFFL)
  }

  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // a null token votes for nothing (the HOF's null-propagated lanes
      // all take otherwise(0)) but counts toward n
      if (!toks.isNullAt(i)) {
        val h = hash64(toks.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
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
