package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-file contract between [[ScaleDnf]] (the Scala side that
  * EMITS scale-gate log lines) and `tools/round_bench.sh`'s GATE_RE (the
  * bash side that GREPS them): every failure shape the emitter can
  * produce must match the gate pattern read from the script itself, and
  * a healthy line must not — so neither file can drift without this spec
  * failing (ADVICE r13 #2: the recall DNF line silently missed the old
  * pattern because the two shapes lived in different files unchecked). */
class ScaleDnfSpec extends AnyFunSuite {
  TestSpark.armWindowStamp() // count this suite in SUITE_WINDOW.json (r21 #9)

  private def gateRe: scala.util.matching.Regex = {
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/round_bench.sh")), "UTF-8")
    val m = "(?m)^GATE_RE='([^']+)'$".r.findFirstMatchIn(script)
    assert(m.isDefined, "tools/round_bench.sh no longer defines GATE_RE='...'")
    m.get.group(1).r
  }

  test("fatal classification: Errors, interrupts AND resource exhaustion are fatal") {
    assert(ScaleDnf.isFatal(new OutOfMemoryError("boom")))
    assert(ScaleDnf.isFatal(new InterruptedException))
    // the r13 incident shape: Spark surfaces executor disk exhaustion to
    // the driver as NonFatal exception types — the MESSAGE is the signal
    // (review finding r14: JVM Error-ness alone misses exactly the
    // incident this feature was built for)
    assert(ScaleDnf.isFatal(new java.io.IOException("No space left on device")))
    assert(ScaleDnf.isFatal(new RuntimeException("Job aborted due to stage failure",
      new java.io.IOException("No space left on device"))))
    assert(ScaleDnf.isFatal(new RuntimeException(
      "Task failed: java.lang.OutOfMemoryError: Java heap space")))
    // the r14 incident shape: a JVM-shutdown signal mid-curve stops the
    // context; Spark surfaces it as NonFatal IllegalStateException / job
    // cancellation, but no later measurement can succeed — fatal-class
    assert(ScaleDnf.isFatal(new IllegalStateException(
      "Cannot call methods on a stopped SparkContext.\nThis stopped SparkContext was created at:")))
    assert(ScaleDnf.isFatal(new RuntimeException(
      "Job 1789 cancelled because SparkContext was shut down")))
    // ordinary one-off failures stay non-fatal
    assert(!ScaleDnf.isFatal(new RuntimeException("task failed")))
    assert(!ScaleDnf.isFatal(new java.io.IOException("connection reset")))
  }

  test("fatal classification terminates on a cause cycle") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b")
    a.initCause(b); b.initCause(a)
    assert(!ScaleDnf.isFatal(a))
  }

  test("every failure shape the harness emits matches the shell gate pattern") {
    val re = gateRe
    val failing = Seq(
      // measured-point DNFs, plain and fatal (colon form)
      s"[scale] q68_jaccard_similarity_join 100x: ${ScaleDnf.dnfTag(false)} — No space left",
      s"[scale] q68_jaccard_similarity_join 100x: ${ScaleDnf.dnfTag(true)} — Java heap space",
      // the recall DNF line (the ADVICE r13 #2 miss)
      s"[scale] recall at 10x: ${ScaleDnf.dnfTag(false)} — boom",
      // a healthy-looking measurement taken after a fatal DNF
      "[scale] q99_neardup_components 100x: 4.1s 47500r ratio=4.3 rows_linear_ok=true " +
        s"plan_same=true steal=0.0s${ScaleDnf.suspectLog(true)}",
      // a suspect recall measurement
      s"[scale] q77 recall@10 vs q39 at 10x: 0.900${ScaleDnf.suspectLog(true)}",
      // broken rows law, drifted plan, missing base
      "[scale] q38_minhash_neardup_pairs 10x: 1.2s 2000r ratio=1.8 rows_linear_ok=false " +
        "plan_same=true steal=0.0s",
      "[scale] q38_minhash_neardup_pairs 10x: 1.2s 2540r ratio=1.8 rows_linear_ok=true " +
        "plan_same=false steal=0.0s",
      "[scale] q1_orders_by_status 10x: 0.3s 3r NO_BASE steal=0.0s",
      // off-law exchange and nonzero spill (VERDICT r14 #2): the point the
      // r12 q68 incident-shape produces — same plan, N× the bytes
      "[scale] q68_jaccard_similarity_join 10x: 3.3s 2560r ratio=1.9 rows_linear_ok=true " +
        "plan_same=true shuffle=9000.000MB spill=0.000MB " +
        s"shuffle_linear_ok=${ScaleLaws.shuffleOk("linear", 10, 168.9, 9000.0)} " +
        "spill_zero_ok=true steal=0.0s",
      "[scale] q98_decon_fixed_bench 100x: 6.6s 154r ratio=12.3 rows_invariant_ok=true " +
        "plan_same=true shuffle=5.100MB spill=882.699MB " +
        "shuffle_constant_ok=true " +
        s"spill_zero_ok=${ScaleLaws.spillOk(882.699)} steal=0.0s",
      // a recall collapse below the variant's declared floor (r15: recall
      // is gated, not just printed; -1 unverifiable-sentinel included)
      "[scale] q77_ivfpq recall@10 vs q39 at 10x: 0.767 recall_ok=false",
      "[scale] q77 recall@10 vs q39 at 10x: -1.000 recall_ok=false")
    failing.foreach { line =>
      assert(re.findFirstIn(line).isDefined, s"gate MISSES failing line: $line")
    }
    val healthy = Seq(
      "[scale] q1_orders_by_status 100x: 0.650s 3r ratio=1.633 rows_invariant_ok=true " +
        "plan_same=true shuffle=12.345MB spill=0.000MB " +
        s"shuffle_constant_ok=${ScaleLaws.shuffleOk("constant", 100, 0.01, 12.345)} " +
        s"spill_zero_ok=${ScaleLaws.spillOk(0.0)} " +
        s"steal=0.000s${ScaleDnf.suspectLog(false)}",
      s"[scale] q77 recall@10 vs q39 at 10x: 0.900${ScaleDnf.suspectLog(false)}",
      s"[scale] q77_ivfpq recall@10 vs q39 at 10x: 0.933${ScaleDnf.suspectLog(false)}",
      "wrote SCALE_r14.json")
    healthy.foreach { line =>
      assert(re.findFirstIn(line).isEmpty, s"gate FALSE-POSITIVES on healthy line: $line")
    }
  }

  test("shuffle/spill laws: doctored off-law points fail, on-law points pass") {
    // the r12 q68 raw-shingle incident shape: plan unchanged, exchange 4×
    // wider than the law predicts at 10× — the gate must trip
    assert(!ScaleLaws.shuffleOk("linear", 10, 100.0, 100.0 * 10 * 4))
    assert(ScaleLaws.shuffleOk("linear", 10, 100.0, 100.0 * 10 * 2.9))
    // constant law: flat bytes pass at any point; linear growth fails
    assert(ScaleLaws.shuffleOk("constant", 100, 5.0, 5.2))
    assert(!ScaleLaws.shuffleOk("constant", 100, 5.0, 500.0))
    // quadratic law bounds the fixed-parameter LSH families: r14's
    // measured q38 point (605× at 100×) passes, a cartesian-ish blowup
    // beyond 3·K² fails
    assert(ScaleLaws.shuffleOk("quadratic", 100, 0.934, 565.503))
    assert(!ScaleLaws.shuffleOk("quadratic", 100, 0.934, 0.934 * 100 * 100 * 4))
    // the absolute floor: kilobyte-scale noise on a tiny base never fails
    assert(ScaleLaws.shuffleOk("constant", 100, 0.001, 0.9))
    assert(ScaleLaws.shuffleOk("constant", 100, 0.0, 15.9)) // under FloorMb
    assert(!ScaleLaws.shuffleOk("constant", 100, 0.0, 16.1))
    // spill: exactly-zero (within print rounding) passes, real spill fails
    assert(ScaleLaws.spillOk(0.0) && ScaleLaws.spillOk(0.04))
    assert(!ScaleLaws.spillOk(882.699) && !ScaleLaws.spillOk(1.0))
    // the absolute measured-bytes cap (ADVICE r15 #3): the K² allowance
    // sits ~50× above the LSH families' real exchange, so the cap —
    // pinned at 3× the r15-measured 100× bytes — is what actually trips
    // on a 10×-20× regression the exponent bound would bless
    assert(ScaleLaws.shuffleOk("quadratic", 100, 0.934, 565.503, capMb = Some(1700)))
    assert(!ScaleLaws.shuffleOk("quadratic", 100, 0.934, 5655.0, capMb = Some(1700)))
    assert(ScaleLaws.shuffleOk("linear", 100, 0.1, 8.2, capMb = None))
    // unknown laws are a programming error, not a silent pass
    intercept[IllegalArgumentException](ScaleLaws.shuffleOk("cubic", 10, 1.0, 1.0))
  }

  test("suspect JSON fragment renders only when flagged") {
    assert(ScaleDnf.suspectJson(true) == ""","suspect_after_fatal":true""")
    assert(ScaleDnf.suspectJson(false).isEmpty)
  }
}
