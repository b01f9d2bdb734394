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
      "[scale] q1_orders_by_status 10x: 0.3s 3r NO_BASE steal=0.0s")
    failing.foreach { line =>
      assert(re.findFirstIn(line).isDefined, s"gate MISSES failing line: $line")
    }
    val healthy = Seq(
      "[scale] q1_orders_by_status 100x: 0.650s 3r ratio=1.633 rows_invariant_ok=true " +
        s"plan_same=true shuffle=12.345MB spill=0.000MB steal=0.000s${ScaleDnf.suspectLog(false)}",
      s"[scale] q77 recall@10 vs q39 at 10x: 0.900${ScaleDnf.suspectLog(false)}",
      "wrote SCALE_r14.json")
    healthy.foreach { line =>
      assert(re.findFirstIn(line).isEmpty, s"gate FALSE-POSITIVES on healthy line: $line")
    }
  }

  test("suspect JSON fragment renders only when flagged") {
    assert(ScaleDnf.suspectJson(true) == ""","suspect_after_fatal":true""")
    assert(ScaleDnf.suspectJson(false).isEmpty)
  }
}
