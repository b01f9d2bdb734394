package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r12 #2 done-criterion: the Verify round summary's contract,
  * pinned as a spec. The failure mode on record (memory:
  * full-gate-before-commit): a FILTERED dev run printed the same shape as
  * the full gate and a grep for "all N queries dumped" mistook it for the
  * full registry run, masking a cross-scale bug. No Spark needed — the
  * summary is pure string construction. */
class VerifySummarySpec extends AnyFunSuite {
  TestSpark.armWindowStamp() // count this suite in SUITE_WINDOW.json (r21 #9)

  test("full-gate summary carries the familiar all-N shape and no FILTERED marker") {
    val s = Verify.summaryLine(116, 116, filtered = false, failed = Nil)
    assert(s == "[verify] all 116 queries dumped")
    assert(!s.contains("FILTERED"))
  }

  test("a filtered run can never read as the full gate") {
    val s = Verify.summaryLine(116, 3, filtered = true, failed = Nil)
    assert(s.contains("FILTERED (3 of 116)"), s)
    // the exact string a full-gate grep matches must NOT appear with the
    // registry total: "all 3 queries dumped" is visibly not the gate
    assert(!s.contains("all 116 queries dumped"), s)
  }

  test("even a filtered run of every query is labeled FILTERED") {
    // SPARK_GRAFT_VERIFY_ONLY listing all names is still a dev run — the
    // label follows the env var, not the count
    val s = Verify.summaryLine(116, 116, filtered = true, failed = Nil)
    assert(s.contains("FILTERED (116 of 116)"), s)
  }

  test("failures are loud, sorted, and keep the FILTERED scope") {
    val s = Verify.summaryLine(116, 5, filtered = true, failed = Seq("q9_x", "q1_a"))
    assert(s.contains("FILTERED (5 of 116)"), s)
    assert(s.contains("3/5 dumped"), s)
    assert(s.contains("FAILED: q1_a, q9_x"), s)
    val full = Verify.summaryLine(116, 116, filtered = false, failed = Seq("q50_z"))
    assert(full == "[verify] 115/116 dumped; FAILED: q50_z")
  }

  test("README's registry tally matches SparkEntry (drift tripwire)") {
    // VERDICT r19 hygiene nit: README said "127 oracle-checked + 3
    // rows-only" two queries after q131 landed — a hand-written count in
    // prose drifting from the code. The sentence now states the counts
    // AND this spec re-derives them from the registry, so any future
    // query registration that forgets the README fails the suite with
    // the exact numbers to paste.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val re = """(\d+) oracle-checked queries \+ (\d+) rows-only""".r
    val m = re.findFirstMatchIn(readme).getOrElse(
      fail("README.md no longer states the oracle-checked/rows-only tally"))
    val oracleChecked = SparkEntry.oracleSql.size
    val rowsOnly = SparkEntry.registry.size - oracleChecked
    assert(m.group(1).toInt == oracleChecked && m.group(2).toInt == rowsOnly,
      s"README says '${m.matched}' but the registry holds " +
        s"$oracleChecked oracle-checked + $rowsOnly rows-only — update README.md")
  }
}
