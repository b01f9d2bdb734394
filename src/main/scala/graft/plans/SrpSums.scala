package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression computing all `n` sign-random-projection
  * sums of an embedding in one compiled pass — the signature stage of the
  * SRP-LSH near-dup pipeline ([[graft.operators.VectorOps.lshNeardupPairs]]).
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[MinHashBands]] / [[ArrayDot]]): the built-in composition
  * ([[graft.functions.VectorMath.srpSums]]'s HOF fallback) walks the
  * interpreted expression evaluator per element × per hyperplane —
  * dim × bands × bits lambda evaluations per row dominate the LSH query's
  * runtime. This expression produces BIT-IDENTICAL output to the HOF
  * chain (spec-asserted in VectorOpsSpec):
  *  - per element j in array order, every accumulator k advances by
  *    `±x_j` with x_j cast to double first — identical IEEE addition
  *    order per k;
  *  - the sign of (k, j) is `xxhash64(k, j) & 1` with the SQL function's
  *    seed 42 and left-fold chaining, i.e.
  *    `XXH64.hashInt(j, XXH64.hashInt(k, 42))` — the same public XXH64
  *    kernel Spark's xxhash64 uses;
  *  - null semantics mirror the HOF chain's OBSERVABLE behavior
  *    (probe-verified): a null input array yields null; an empty array
  *    yields `n` zeros; any null ELEMENT yields `n` zeros — inside the
  *    HOF the null poisons every accumulator lane, and ArrayAggregate's
  *    final cast back to the zero-array's `containsNull=false` element
  *    type launders those nulls to 0.0 — and the result type is
  *    `array<double>` with `containsNull=false`, like the fold's.
  *
  * Signs depend only on (k, j), so a lazily-built per-JVM bitmask table
  * serves the first 64 hyperplanes × 4096 dimensions without hashing per
  * row; anything beyond falls back to inline hashing (same values).
  *
  * Registered as `graft_srp_sums(v, n)` through [[GraftExtensions]];
  * [[graft.functions.VectorMath.srpSums]] falls back to the HOF form when
  * the extension is absent.
  */
case class SrpSums(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int|bigint|float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_srp_sums"

  @transient private lazy val elemCode: Int = child.dataType match {
    case ArrayType(IntegerType, _) => 0
    case ArrayType(LongType, _)    => 1
    case ArrayType(FloatType, _)   => 2
    case _                         => 3
  }

  override protected def nullSafeEval(input: Any): Any =
    SrpSums.compute(input.asInstanceOf[ArrayData], elemCode, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SrpSums$$.MODULE$$.compute($c, $elemCode, $n)")

  override protected def withNewChildInternal(newChild: Expression): SrpSums =
    copy(child = newChild)
}

object SrpSums {

  /** Seed used by Spark's xxhash64 SQL function. */
  private val Seed = 42L

  private val MaxCachedK = 64
  private val MaxCachedJ = 4096

  /** sign bit of (k, j) for k < 64, j < 4096 — identical for every row,
    * built once per JVM (4096 × 64 int hashes, ~1 ms). */
  private lazy val signBits: Array[Long] = Array.tabulate(MaxCachedJ) { j =>
    var m = 0L
    var k = 0
    while (k < MaxCachedK) {
      if ((XXH64.hashInt(j, XXH64.hashInt(k, Seed)) & 1L) == 1L) m |= (1L << k)
      k += 1
    }
    m
  }

  private def signInline(k: Int, j: Int): Boolean =
    (XXH64.hashInt(j, XXH64.hashInt(k, Seed)) & 1L) == 1L

  def compute(v: ArrayData, elemCode: Int, n: Int): ArrayData = {
    val dim = v.numElements()
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) // HOF-parity: poisoned lanes launder to 0.0
        return new GenericArrayData(new Array[Double](n))
      j += 1
    }
    val acc = new Array[Double](n)
    j = 0
    while (j < dim) {
      val x = elemCode match {
        case 0 => v.getInt(j).toDouble
        case 1 => v.getLong(j).toDouble
        case 2 => v.getFloat(j).toDouble
        case _ => v.getDouble(j)
      }
      if (n <= MaxCachedK && j < MaxCachedJ) {
        val m = signBits(j)
        var k = 0
        while (k < n) {
          acc(k) += (if (((m >>> k) & 1L) == 1L) x else -x)
          k += 1
        }
      } else {
        var k = 0
        while (k < n) {
          acc(k) += (if (signInline(k, j)) x else -x)
          k += 1
        }
      }
      j += 1
    }
    new GenericArrayData(acc)
  }
}
