package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MathUtils}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the two hot vector folds —
  * `graft_dot(a, b)` and `graft_l2sq(a, b)` — the inner loops of exact
  * top-k cosine, IVF/PQ k-means assignment and ADC scoring
  * ([[graft.operators.VectorOps]]).
  *
  * Why (same (b)-tier rationale as [[MinHashBands]]): the built-in
  * composition `aggregate(zip_with(a, b, …), 0.0, _+_)` walks the
  * interpreted expression evaluator twice per element; at rows × ksub
  * candidate scorings per k-means iteration that evaluator overhead
  * dominates. These expressions produce BIT-IDENTICAL results to the HOF
  * chain (spec-asserted) by reproducing Spark's arithmetic coercion
  * per element pair:
  *  - float ⊗ float is computed IN FLOAT, then widened into the double
  *    accumulator (exactly `Multiply(FloatType)` under `zip_with`);
  *  - long ⊗ long / long ⊗ int (the quantized-exact path — `quantize`
  *    emits `array<bigint>`) runs in long arithmetic, exact below 2^53;
  *  - int ⊗ int runs in INT arithmetic before widening into the double
  *    accumulator, exactly `Multiply(IntegerType)` under `zip_with`:
  *    wrapping on overflow in non-ANSI mode, throwing Spark's
  *    ARITHMETIC_OVERFLOW under ANSI (the ANSI flag is captured at
  *    construction, like Spark's own BinaryArithmetic); integral long
  *    arithmetic honors the same ANSI contract;
  *  - anything involving a double runs in double.
  * Null semantics also mirror the HOF chain: any null element or a length
  * mismatch yields NULL (zip_with pads the shorter side with nulls and
  * `null ⊗ x` poisons the sum).
  *
  * Registered through [[GraftExtensions]]; [[graft.functions.VectorMath]]
  * falls back to the pure-functions form when the extension is absent.
  */
abstract class ArrayPairFold extends BinaryExpression {
  /** true = Σ (a-b)², false = Σ a·b. */
  def squaredDiff: Boolean

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(IntegerType, _) => 0
    case ArrayType(LongType, _)    => 1
    case ArrayType(FloatType, _)   => 2
    case ArrayType(DoubleType, _)  => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two arrays of int/bigint/float/double, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  @transient private lazy val ca = elemCode(left.dataType)
  @transient private lazy val cb = elemCode(right.dataType)
  // construction-time capture, mirroring Spark's BinaryArithmetic
  private val failOnError: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorNative.fold(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ca, cb, squaredDiff, failOnError)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      val r = ctx.freshName("fold")
      s"""
         |java.lang.Double $r = graft.plans.VectorNative.fold($av, $bv, $ca, $cb, $squaredDiff, $failOnError);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

case class ArrayDot(left: Expression, right: Expression) extends ArrayPairFold {
  override def squaredDiff: Boolean = false
  override def prettyName: String = "graft_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot = copy(newLeft, newRight)
}

case class ArrayL2Sq(left: Expression, right: Expression) extends ArrayPairFold {
  override def squaredDiff: Boolean = true
  override def prettyName: String = "graft_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2Sq = copy(newLeft, newRight)
}

object VectorNative {
  // element codes: 0 int, 1 long, 2 float, 3 double

  /** Left-to-right fold matching the HOF chain's value, null, and ANSI
    * overflow semantics; returns null on length mismatch or any null
    * element. `ansi` = the expression's construction-time
    * `spark.sql.ansi.enabled`: integral arithmetic then throws Spark's
    * ARITHMETIC_OVERFLOW (via MathUtils, same as Multiply/Subtract)
    * instead of wrapping. */
  def fold(a: ArrayData, b: ArrayData, ca: Int, cb: Int, l2: Boolean,
      ansi: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    // arithmetic mode = Spark's tightest common numeric type of the pair
    val mode = math.max(ca, cb) // int<long<float<double matches the ladder
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      mode match {
        case 3 =>
          val x = getD(a, i, ca); val y = getD(b, i, cb)
          acc += (if (l2) { val d = x - y; d * d } else x * y)
        case 2 =>
          val x = getF(a, i, ca); val y = getF(b, i, cb)
          acc += (if (l2) { val d = x - y; d * d } else x * y).toDouble
        case 1 =>
          val x = getL(a, i, ca); val y = getL(b, i, cb)
          acc += (if (l2) {
            val d = if (ansi) MathUtils.subtractExact(x, y) else x - y
            if (ansi) MathUtils.multiplyExact(d, d) else d * d
          } else if (ansi) MathUtils.multiplyExact(x, y) else x * y).toDouble
        case _ => // both int: Int arithmetic like Multiply(IntegerType), then widen
          val x = a.getInt(i); val y = b.getInt(i)
          acc += (if (l2) {
            val d = if (ansi) MathUtils.subtractExact(x, y) else x - y
            if (ansi) MathUtils.multiplyExact(d, d) else d * d
          } else if (ansi) MathUtils.multiplyExact(x, y) else x * y).toDouble
      }
      i += 1
    }
    acc
  }

  private def getD(v: ArrayData, i: Int, c: Int): Double = c match {
    case 0 => v.getInt(i).toDouble
    case 1 => v.getLong(i).toDouble
    case 2 => v.getFloat(i).toDouble
    case _ => v.getDouble(i)
  }
  private def getF(v: ArrayData, i: Int, c: Int): Float = c match {
    case 0 => v.getInt(i).toFloat
    case 1 => v.getLong(i).toFloat
    case _ => v.getFloat(i)
  }
  private def getL(v: ArrayData, i: Int, c: Int): Long = c match {
    case 0 => v.getInt(i).toLong
    case _ => v.getLong(i)
  }
}
