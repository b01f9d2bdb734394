package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text signature column builders for the dedup / fingerprint operators —
  * all pure `org.apache.spark.sql.functions` compositions (higher-order
  * array functions + xxhash64): no UDFs, no serialization cliffs, and
  * identical results on any partitioning (each signature is a per-row
  * expression).
  *
  * PERFORMANCE RULE used throughout: an expression inlined into a
  * higher-order-function lambda body is re-evaluated on EVERY iteration of
  * that lambda (Catalyst collapses projections without accounting for
  * under-lambda multiplicity), so naive `bands(minhash(shingles(text)))`
  * nesting costs bands × hashes × |shingles| recomputations of the shingle
  * set per row. Every multi-stage signature here is therefore built as a
  * SINGLE `aggregate(...)` traversal whose intermediate values are bound
  * as lambda variables (evaluated once), with the final reshaping in the
  * aggregate's `finish` lambda.
  *
  * These power the training-data-pipeline operators (driver brief): exact
  * dedup, MinHash/LSH near-dup, SimHash, n-gram Jaccard.
  */
object TextSig {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Sorted distinct token set — the canonical form for exact set-dedup. */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokens(text)))

  /** Exact-dup key on raw bytes (md5 hex, identical in DuckDB). */
  def exactKey(text: Column): Column = md5(text)

  /** Normalized-dup key: md5 over the sorted distinct token set, so two
    * documents that permute/repeat the same vocabulary collide. */
  def tokenSetKey(text: Column): Column =
    md5(concat_ws(" ", tokenSet(text)))

  /** Distinct word-bigram shingles: order-sensitive, the standard unit for
    * near-duplicate Jaccard. Built with one `zip_with` over the token
    * array and its shifted self (the trailing null pair is dropped), so
    * the tokenization is evaluated O(1) times per row, not once per
    * shingle. */
  def shingles(text: Column): Column = {
    val tok = tokens(text)
    val grams = zip_with(tok, slice(tok, lit(2), greatest(size(tok) - 1, lit(0))),
      (x, y) => concat(x, lit("_"), y)) // concat -> null when y is the pad null
    array_distinct(filter(grams, g => g.isNotNull))
  }

  /** MinHash signature: `numHashes` hash functions simulated by hashing
    * each shingle's BYTES once (`xxhash64(s)`) and deriving function k as
    * the constant-time long-mix `xxhash64(k, xxhash64(s))`; element k =
    * min over the shingle set (the classic broder-minhash estimator of
    * Jaccard). One traversal of the shingle set; all mins updated per
    * element via `zip_with`. Bit-identical to the native
    * [[graft.plans.MinHashBands]] kernel, which runs the same chain as
    * one JVM loop (and, unlike this composition, really does hash each
    * shingle's bytes only once — HOF lambda bodies re-evaluate per k). */
  def minhash(shingleSet: Column, numHashes: Int = 32): Column =
    aggregate(
      shingleSet,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), k => xxhash64(k, xxhash64(s))),
        (a, h) => least(a, h)))

  /** MinHash signature folded straight into LSH band digests (bands ×
    * rows = numHashes): the `finish` lambda binds the completed signature
    * once, so the whole thing stays a single pass over the shingle set.
    * Two documents collide on a band iff that band of their signatures is
    * identical. */
  def minhashBands(shingleSet: Column, bands: Int = 8, rows: Int = 4): Column = {
    val numHashes = bands * rows
    aggregate(
      shingleSet,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), k => xxhash64(k, xxhash64(s))),
        (a, h) => least(a, h)),
      sig => bandDigests(sig, bands, rows))
  }

  /** LSH band digests over an ALREADY-MATERIALIZED signature column (a
    * lambda variable or stored column — do not nest an expensive
    * expression here, see the performance rule above). */
  def bandDigests(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rows + 1, lit(rows))))

  /** 64-bit SimHash over the token multiset: per bit, majority vote of
    * each token's hash bit. Near-duplicates land within a small hamming
    * distance. The per-token hash basis is the LOW 64 BITS OF MD5 (first
    * 8 digest bytes, big-endian) — chosen deliberately over xxhash64
    * because md5 is bit-identical across engines (Spark's `md5` and
    * DuckDB's `md5` agree on raw bytes), which makes the WHOLE near-dup
    * pipeline reproducible by the DuckDB oracle: q72's expected pair set
    * is brute-force recomputed from scratch, organic pairs included — a
    * full hash-check, not a planted-recall contract. (xxhash64 has no
    * DuckDB counterpart; the basis costs one 64-byte MD5 block per short
    * token and is invisible next to the pipeline's shuffles.)
    * Picks the NATIVE kernel ([[graft.plans.SimHash64]], one compiled
    * loop instead of tokens × 65 interpreted lambda lanes) when the
    * session has GraftExtensions; the HOF composition below otherwise —
    * bit-identical by construction and spec. */
  def simhash(tok: Column): Column = {
    // cast to array<string> so BOTH forms see the same input type (the
    // kernel requires array<string>; the HOF's md5 would otherwise take
    // engine-dependent implicit casts) — a no-op on the normal token path
    val t = tok.cast("array<string>")
    graft.plans.GraftExtensions.nativeCall(
      graft.plans.GraftExtensions.SimHashName, t)(simhashHof(t))
  }

  /** Low 64 bits of md5 (first 16 hex chars, big-endian) as a signed
    * long, parsed in two 32-bit halves (a single 16-digit conv would
    * overflow the signed cast for values >= 2^63). */
  def md5Low64(w: Column): Column = {
    val hx = md5(w)
    shiftleft(conv(substring(hx, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hx, 9, 8), 16, 10).cast("long"))
  }

  /** The pure-functions form of [[simhash]] — the no-extension fallback
    * and the bit-parity baseline the native kernel is spec-checked
    * against. Single pass: tokens are pre-hashed once, the aggregate
    * accumulates 64 bit-counters plus the token count, and the finish
    * lambda packs the majority bits into two 32-bit halves (a full
    * 64-bit acc*2+b chain would overflow ANSI arithmetic). A NULL token
    * hashes to null → every bit lane gets the `otherwise(0)` branch, so
    * it contributes nothing to the votes but still counts toward n (the
    * kernel mirrors this). */
  def simhashHof(tok: Column): Column = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(
      transform(tok, w => md5Low64(w)),
      array_repeat(lit(0L), 65),
      (acc, h) => zip_with(
        acc,
        concat(
          transform(masks, m => when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(0L))),
          array(lit(1L))),
        (a, v) => a + v),
      counts => {
        val n = element_at(counts, 65)
        val bits = transform(
          sequence(lit(0), lit(63)),
          k => when(element_at(counts, k + 1) * 2 >= n, lit(1L)).otherwise(lit(0L)))
        val hi = aggregate(slice(bits, 1, 32), lit(0L), (acc, b) => acc * 2 + b)
        val lo = aggregate(slice(bits, 33, 32), lit(0L), (acc, b) => acc * 2 + b)
        shiftleft(hi, 32).bitwiseOR(lo)
      })
  }

  /** Band digests of a 64-bit simhash for hamming-LSH bucketing: 4 bands
    * of 16 bits — any pair within hamming distance 3 shares at least one
    * identical band (pigeonhole), so bucket-joining the bands is a
    * complete candidate generator for distance <= 3. */
  def simhashBands(sim: Column): Column =
    array((0 until 4).map(b => shiftright(sim, b * 16).bitwiseAND(lit(0xFFFFL))): _*)

  /** Polynomial rolling-hash fingerprint (Karp–Rabin shape) over the raw
    * character stream, reduced mod 2^31-1 at every step so the chain
    * never overflows a long under ANSI arithmetic: acc < 2^31 and
    * base = 1e9+7 keep acc*base+c well inside 2^63. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(1000000007L) + c, lit(2147483647L)))
}
