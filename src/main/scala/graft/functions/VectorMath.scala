package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity column builders over `array<float>` embedding columns
  * — pure `org.apache.spark.sql.functions` compositions (zip_with /
  * aggregate / transform), no UDFs.
  *
  * Cross-engine determinism: similarity on raw floats is NOT reproducible
  * across engines (summation order and float/double promotion differ), so
  * the oracle-checked operators first QUANTIZE each component to an exact
  * integer (floor(x * 1e6), stored in a double): with 64 dims and |x| < 1,
  * every dot product and norm stays an exact integer below 2^53, making
  * the whole similarity computation order-insensitive and bit-identical in
  * Spark and DuckDB; the single final sqrt+divide runs on identical
  * operands in both engines.
  */
object VectorMath {

  /** Component-wise exact-integer quantization (stored as doubles). */
  def quantize(v: Column, scale: Double = 1e6): Column =
    transform(v, x => floor(x.cast("double") * scale))

  /** Dot product of two numeric arrays (left-to-right sum; exact when the
    * inputs are quantized integers). Native [[graft.plans.VectorNative]]
    * kernel when the session has GraftExtensions
    * ([[graft.plans.GraftExtensions.nativeCall]], the shared dispatch
    * gate); the pure-functions composition otherwise. Element domain is
    * array<int|bigint|float|double> — deliberately NOT cast-normalized
    * (unlike [[srpSums]]/[[graft.functions.TextSig.simhash]]) because the
    * element-typed arithmetic is part of the contract: int×int runs in
    * INT arithmetic with ANSI overflow behavior in BOTH forms
    * (spec-asserted), which a widening cast would silently erase. */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftExtensions.nativeCall(graft.plans.GraftExtensions.DotName, a, b)(
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** Cosine similarity from precomputed quantized vectors + squared norms
    * (one sqrt + one divide on exact-integer operands). */
  def cosineFromParts(dotAB: Column, normSqA: Column, normSqB: Column): Column =
    dotAB / sqrt(normSqA * normSqB)

  /** Raw (unquantized) cosine over numeric arrays — for engine-internal
    * math like k-means assignment where cross-engine bit-parity is not
    * needed (quantize first when an oracle will compare). */
  def cosineRaw(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Squared L2 distance — the product-quantization assignment metric. */
  def l2Sq(a: Column, b: Column): Column =
    graft.plans.GraftExtensions.nativeCall(graft.plans.GraftExtensions.L2SqName, a, b)(
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Sign-random-projection LSH code (`bits` hyperplanes): bit h is the
    * sign of the dot product with a deterministic ±1 hyperplane derived
    * from xxhash64(offset + h, j). Vectors at small angles share codes
    * with high probability (bit-sampling LSH for cosine); `offset` selects
    * an independent hyperplane family per band for multi-band LSH. */
  def srpCode(v: Column, bits: Int = 8, offset: Int = 0): Column = {
    require(bits >= 1 && bits <= 30, s"srpCode bits must be in [1, 30], got $bits (Int code)")
    val proj = (0 until bits).map { h =>
      val signed = aggregate(
        zip_with(
          v,
          sequence(lit(0), size(v) - 1),
          (x, j) => when(xxhash64(lit(offset + h), j).bitwiseAND(1) === 1, x.cast("double"))
            .otherwise(-x.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      when(signed >= 0, lit(1)).otherwise(lit(0)) * lit(1 << h)
    }
    proj.reduce(_ + _)
  }

  /** All `n` signed projection sums in ONE traversal of the vector — the
    * multi-band coding path. Hyperplane k's sum uses xxhash64(k, j) signs,
    * bit-identical to chaining [[srpCode]] with offset = band·bits (each
    * vector element updates every sum as it streams past, instead of n
    * full re-traversals — the single-pass aggregate lesson). Picks the
    * NATIVE kernel ([[graft.plans.SrpSums]], one compiled loop instead of
    * dim × n interpreted lambda evaluations) when the session has
    * GraftExtensions; the HOF composition below otherwise — bit-identical
    * by construction and spec. */
  def srpSums(v: Column, n: Int): Column = {
    // cast to array<double> so BOTH forms accept the same input domain
    // (the kernel type-checks array<int|bigint|float|double>; the HOF
    // casts every element to double anyway — so any numeric input, e.g.
    // decimal-element embeddings, analyzes identically with and without
    // GraftExtensions). float→double is exact; values are unchanged.
    val d = v.cast("array<double>")
    graft.plans.GraftExtensions.nativeCall(
      graft.plans.GraftExtensions.SrpSumsName, d, lit(n))(srpSumsHof(d, n))
  }

  /** The pure-functions form of [[srpSums]] — the no-extension fallback
    * and the bit-parity baseline the native kernel is spec-checked
    * against. */
  def srpSumsHof(v: Column, n: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, j) => struct(x.cast("double").as("x"), j.as("j"))),
      array_repeat(lit(0.0), n),
      (acc, e) => zip_with(acc, sequence(lit(0), lit(n - 1)), (s, k) =>
        s + when(xxhash64(k, e.getField("j")).bitwiseAND(1) === 1, e.getField("x"))
          .otherwise(-e.getField("x"))))

  /** Fold a MATERIALIZED sums column into per-band integer codes (band b =
    * sign bits of sums[b·bits .. b·bits+bits)). `sums` must be a stored
    * attribute, not an inline [[srpSums]] expression — the per-band lambda
    * references it `bands` times and an inline expression would recompute
    * the whole projection each time.
    *
    * CAUTION (the round-10 q91 lesson): exploding THIS array triggers
    * Catalyst's `InferFiltersFromGenerate` + predicate pushdown, which
    * substitutes the sums attribute's DEFINITION into the pushed
    * `size(codes) > 0` filter — re-evaluating the whole O(bands·bits·dim)
    * projection once per BIT inside an interpreted HOF fold (a measured
    * ~35× blowup at sf0.1). For explode pipelines, explode a constant
    * band range (its inferred filter constant-folds away) and compute one
    * band's code per row with [[srpBandCode]] instead. */
  def srpBandCodes(sums: Column, bands: Int, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, s"srp bits must be in [1, 30], got $bits (Int code)")
    transform(sequence(lit(0), lit(bands - 1)), b => bandFold(sums, b, bits))
  }

  /** One band's integer code from a materialized sums attribute — the
    * per-exploded-row sibling of [[srpBandCodes]] (bit-identical fold). */
  def srpBandCode(sums: Column, band: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, s"srp bits must be in [1, 30], got $bits (Int code)")
    bandFold(sums, band, bits)
  }

  private def bandFold(sums: Column, b: Column, bits: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0), (code, h) =>
      code + when(element_at(sums, b * lit(bits) + h + 1) >= 0,
        pow(lit(2.0), h).cast("int")).otherwise(lit(0)))
}
