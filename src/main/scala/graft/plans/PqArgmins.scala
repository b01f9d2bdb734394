package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a vector's PRODUCT-QUANTIZATION
  * code assignment — for each of the m subspaces, the argmin-L2 codeword
  * index — in one compiled pass. This is the encode stage of the PQ ANN
  * pipeline ([[graft.operators.VectorOps.pqEncode]]) and, at m = 1, the
  * coarse-list assignment of the IVF-PQ composition
  * ([[graft.operators.VectorOps.ivfPqTopKOn]]).
  *
  * Why a custom Expression (the (b) tier, same rationale as [[SrpSums]] /
  * [[ArrayDot]]): the built-in composition — per subspace, `array_min`
  * over `transform(codebookLiteral, c -> struct(l2sq(slice(v), c), code))`
  * — re-enters the interpreted HOF evaluator once per CODEWORD, so a row
  * costs m × ksub lambda frames plus slice/struct allocations; encode was
  * measured at ~72% of the whole PQ query's wall time at 10× fixture
  * scale. Here the m × ksub × dsub multiply-accumulates run in one flat
  * loop over a codebook held as plain JVM arrays.
  *
  * BIT-IDENTICAL to the HOF chain (spec-asserted, VectorOpsSpec):
  *  - distances use the [[ArrayL2Sq]] arithmetic: float⊗float per term IN
  *    FLOAT, widened into a double accumulator (the codebook is
  *    `array<float>`, so int/long/float elements all take the float mode
  *    under Spark's coercion ladder; double elements take double mode);
  *  - argmin ties break to the SMALLER code, like `array_min` over
  *    (d2, code) structs; NaN distances order GREATEST
  *    (`java.lang.Double.compare` — Spark's double ordering);
  *  - a null input vector, a too-short vector, or a null element inside a
  *    subspace's slice makes every d2 of that subspace NULL; `array_min`'s
  *    struct ordering puts nulls FIRST, so the HOF yields the smallest
  *    code, 0 — and so does this kernel;
  *  - a subspace with zero codewords (an empty codebook slot) yields a
  *    null code, like `array_min` over an empty array.
  *
  * Registered as `graft_pq_argmins(v, flatCodebook, lens, dsub)` through
  * [[GraftExtensions]] — the codebook rides along as FOLDABLE literals
  * (flat float array in (sub, code) order + per-sub codeword counts),
  * materialized into JVM arrays once per expression instance.
  * [[graft.operators.VectorOps.pqCodesCol]] falls back to the HOF form
  * when the extension is absent.
  */
case class PqArgmins(child: Expression, flat: IndexedSeq[Float],
    lens: IndexedSeq[Int], dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (dsub >= 1 && lens.sum * dsub == flat.length) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebook shape mismatch: ${flat.length} floats for " +
          s"lens=${lens.mkString(",")} × dsub=$dsub")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int|bigint|float|double>, got ${other.simpleString}")
  }
  // element codes may be null (empty codebook slot); the array itself never is
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_argmins"

  @transient private lazy val elemCode: Int = child.dataType match {
    case ArrayType(IntegerType, _) => 0
    case ArrayType(LongType, _)    => 1
    case ArrayType(FloatType, _)   => 2
    case _                         => 3
  }
  @transient private lazy val flatArr: Array[Float] = flat.toArray
  @transient private lazy val lensArr: Array[Int] = lens.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input) // null vector still yields codes (HOF parity)
    PqArgmins.compute(v.asInstanceOf[ArrayData], elemCode, flatArr, lensArr, dsub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqFlat", flatArr, "float[]")
    val lensRef = ctx.addReferenceObj("pqLens", lensArr, "int[]")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.plans.PqArgmins.compute(
        |    ${childGen.isNull} ? null : ${childGen.value},
        |    $elemCode, $flatRef, $lensRef, $dsub);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqArgmins =
    copy(child = newChild)
}

object PqArgmins {

  /** One row's codes; `v` may be null. Never returns null (the codes array
    * exists even for degenerate vectors — only empty codebook slots leave
    * null elements), matching the HOF composition's observable behavior. */
  def compute(v: ArrayData, elemCode: Int, flat: Array[Float], lens: Array[Int],
      dsub: Int): ArrayData = {
    val m = lens.length
    val out = new Array[Any](m)
    val vlen = if (v == null) -1 else v.numElements()
    var off = 0
    var sub = 0
    while (sub < m) {
      val k = lens(sub)
      if (k == 0) out(sub) = null
      else {
        val base = sub * dsub
        var valid = vlen >= base + dsub
        if (valid) {
          var i = base
          val end = base + dsub
          while (valid && i < end) { if (v.isNullAt(i)) valid = false; i += 1 }
        }
        if (!valid) out(sub) = 0 // all-null d2: array_min's nulls-first → min code
        else {
          var best = -1
          var bestD = 0.0
          var code = 0
          while (code < k) {
            var d = 0.0
            val cbase = off + code * dsub
            var i = 0
            if (elemCode == 2) { // the hot path: float embeddings
              while (i < dsub) {
                val t = v.getFloat(base + i) - flat(cbase + i)
                d += (t * t).toDouble
                i += 1
              }
            } else if (elemCode == 3) { // double mode (double ⊗ float → double)
              while (i < dsub) {
                val t = v.getDouble(base + i) - flat(cbase + i).toDouble
                d += t * t
                i += 1
              }
            } else { // int/long ⊗ float coerce to FLOAT mode, like the HOF chain
              while (i < dsub) {
                val x = if (elemCode == 0) v.getInt(base + i).toFloat
                        else v.getLong(base + i).toFloat
                val t = x - flat(cbase + i)
                d += (t * t).toDouble
                i += 1
              }
            }
            // Double.compare = Spark's double ordering (NaN greatest); ties
            // keep the earlier = smaller code, like array_min's struct order
            if (best < 0 || java.lang.Double.compare(d, bestD) < 0) {
              best = code; bestD = d
            }
            code += 1
          }
          out(sub) = best
        }
      }
      off += k * dsub
      sub += 1
    }
    new GenericArrayData(out)
  }
}
