package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native thresholded set-intersection count — the verification kernel of
  * the exact Jaccard similarity join
  * ([[graft.operators.DedupOps.jaccardSimilarityJoinOn]]).
  *
  * `graft_inter_count(a, b, tNum, tDen)` returns |a ∩ b| when the pair
  * reaches Jaccard tNum/tDen (exact integer test:
  * `inter · (tNum+tDen) >= tNum · (|a|+|b|)`), and -1 otherwise. Inputs
  * must be SETS (distinct elements — shingle arrays are distinct by
  * construction); null elements count as one distinct value, matching
  * `array_intersect`.
  *
  * Why a custom Expression (the (b) tier, same rationale as
  * [[MinHashBands]]): the built-in form
  * `size(array_intersect(sh_i, sh_j))` materializes the intersection
  * ARRAY per candidate pair only to take its length — at sf0.1 the join
  * verifies ~667k candidate pairs for ~25 survivors, and Catalyst pushes
  * the threshold filter into the join condition, so the composition pays
  * the full intersect twice for survivors and once for every reject.
  * This kernel counts matches with a reused per-thread scratch set and
  * EARLY-EXITS the moment the remaining elements cannot reach the
  * threshold (`matched + remaining < ceil(tNum·(|a|+|b|)/(tNum+tDen))`),
  * which prunes most rejects after a handful of probes. The exactness
  * contract is unchanged: every pair at or above the threshold returns
  * its exact intersection size (the early exit can only fire when the
  * threshold is unreachable).
  */
case class InterCount(left: Expression, right: Expression, tNum: Int, tDen: Int)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def elemType(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => e
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    // compare ELEMENT types, not full ArrayTypes: two array<string>
    // inputs may differ only in containsNull (shingles are
    // containsNull=true, an array literal is not) and that must stay
    // accepted — the guard only has to stop a string/bigint MIX, where
    // the merge path would misread one side
    if (ok(left.dataType) && ok(right.dataType) &&
        elemType(left.dataType) == elemType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> or two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_inter_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      InterCount.computeSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tNum, tDen)
    else
      InterCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], tNum, tDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (isLong) "computeSortedLong" else "compute"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.InterCount$$.MODULE$$.$method($a, $b, $tNum, $tDen)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterCount =
    copy(left = newLeft, right = newRight)
}

object InterCount {
  // scratch set reused across rows; expressions may be shared within a
  // JVM, so the reuse is per-thread (tasks are single-threaded)
  private val scratch = new ThreadLocal[java.util.HashSet[UTF8String]] {
    override def initialValue(): java.util.HashSet[UTF8String] =
      new java.util.HashSet[UTF8String](256)
  }

  def compute(a: ArrayData, b: ArrayData, tNum: Int, tDen: Int): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val den = tNum + tDen
    // ceil(tNum*(na+nb)/den) in exact integer arithmetic
    val alpha = (tNum.toLong * (na + nb) + den - 1) / den
    if (math.min(na, nb) < alpha) return -1 // unreachable even at full overlap
    val set = scratch.get()
    set.clear()
    var seenNullA = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) seenNullA = true else set.add(a.getUTF8String(i))
      i += 1
    }
    var m = 0L
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) {
        if (seenNullA) { m += 1; seenNullA = false }
      } else if (set.remove(b.getUTF8String(j))) m += 1
      // remaining b elements bound the best case; bail when short of alpha
      if (m + (nb - j - 1) < alpha) return -1
      j += 1
    }
    if (m * den >= tNum.toLong * (na + nb)) m.toInt else -1
  }

  /** The compact-signature fast path: thresholded intersection count of
    * two SORTED-ASCENDING, DISTINCT, null-free `array<bigint>` inputs
    * (the hashed shingle signatures built by
    * [[graft.operators.DedupOps.jaccardSimilarityJoinOn]] — sorted and
    * deduplicated at construction). A linear two-pointer merge: no hash
    * set, no per-element allocation, and the same unreachability early
    * exit as the string path. Sortedness is the CALLER's contract —
    * unsorted inputs would undercount silently, so nothing else may
    * route here (the expression only accepts array<bigint>, which no
    * other graft call site produces). */
  def computeSortedLong(a: ArrayData, b: ArrayData, tNum: Int, tDen: Int): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val den = tNum + tDen
    val alpha = (tNum.toLong * (na + nb) + den - 1) / den
    if (math.min(na, nb) < alpha) return -1
    var i = 0; var j = 0; var m = 0L
    while (i < na && j < nb) {
      // remaining best case from the SHORTER tail; bail when short of alpha
      if (m + math.min(na - i, nb - j) < alpha) return -1
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { m += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (m * den >= tNum.toLong * (na + nb)) m.toInt else -1
  }
}
