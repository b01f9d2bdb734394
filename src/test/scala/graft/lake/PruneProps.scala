package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import java.time.Instant
import scala.util.Random

/** Property-style tests (seeded random sampling) for the pruning layer's
  * one correctness-critical invariant: NO FALSE NEGATIVES. A file whose
  * partition contains a row matching the filter must survive `mayMatch` —
  * pruning may keep too much (the scan re-filters), but must never drop a
  * match. */
class PruneProps extends AnyFunSuite {

  private val rng = new Random(20260812L)
  private def randTs(): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(rng.between(0L, 4102444800L)))

  private val transforms = Seq(Transform.Month, Transform.Day, Transform.Year)

  private def partitionOf(t: Transform, ts: Timestamp): Map[String, String] =
    Map("p" -> t.valueOf(ts).getOrElse(sys.error("unrenderable")))

  test("time transforms never prune a file containing a matching row (Ge/Gt/Lt/Le/Eq)") {
    (1 to 2000).foreach { _ =>
      val rowTs = randTs()
      val filterTs = randTs()
      transforms.foreach { tr =>
        val spec = Seq(PartitionField("c", tr, "p"))
        val part = partitionOf(tr, rowTs)
        if (rowTs.compareTo(filterTs) >= 0)
          assert(PruneFilter.mayMatch(spec, part, PruneFilter.Ge("c", filterTs)),
            s"$tr pruned file holding $rowTs for >= $filterTs")
        if (rowTs.compareTo(filterTs) > 0)
          assert(PruneFilter.mayMatch(spec, part, PruneFilter.Gt("c", filterTs)),
            s"$tr pruned file holding $rowTs for > $filterTs")
        if (rowTs.compareTo(filterTs) < 0)
          assert(PruneFilter.mayMatch(spec, part, PruneFilter.Lt("c", filterTs)),
            s"$tr pruned file holding $rowTs for < $filterTs")
        if (rowTs.compareTo(filterTs) <= 0)
          assert(PruneFilter.mayMatch(spec, part, PruneFilter.Le("c", filterTs)),
            s"$tr pruned file holding $rowTs for <= $filterTs")
        assert(PruneFilter.mayMatch(spec, part, PruneFilter.Eq("c", rowTs)),
          s"$tr pruned file holding $rowTs for = $rowTs")
      }
    }
  }

  test("identity on numbers: typed range pruning, no false negatives, no lexicographic trap") {
    val spec = Seq(PartitionField("c", Transform.Identity, "p"))
    (1 to 2000).foreach { _ =>
      val rowV = rng.between(-1000000L, 1000000L)
      val filterV = rng.between(-1000000L, 1000000L)
      val part = Map("p" -> rowV.toString)
      if (rowV >= filterV)
        assert(PruneFilter.mayMatch(spec, part, PruneFilter.Ge("c", filterV)),
          s"identity pruned file holding $rowV for >= $filterV")
      if (rowV < filterV)
        assert(PruneFilter.mayMatch(spec, part, PruneFilter.Lt("c", filterV)),
          s"identity pruned file holding $rowV for < $filterV")
      if (rowV > filterV)
        assert(PruneFilter.mayMatch(spec, part, PruneFilter.Gt("c", filterV)))
      if (rowV <= filterV)
        assert(PruneFilter.mayMatch(spec, part, PruneFilter.Le("c", filterV)))
      // doubles through BigDecimal comparison
      val rowD = rng.nextDouble() * 1e6 - 5e5
      val filterD = rng.nextDouble() * 1e6 - 5e5
      val partD = Map("p" -> rowD.toString)
      if (rowD >= filterD)
        assert(PruneFilter.mayMatch(spec, partD, PruneFilter.Ge("c", filterD)))
      if (rowD < filterD)
        assert(PruneFilter.mayMatch(spec, partD, PruneFilter.Lt("c", filterD)))
    }
    // the lexicographic trap: "10" < "2" as strings, but 10 >= 2 as numbers
    assert(PruneFilter.mayMatch(spec, Map("p" -> "10"), PruneFilter.Ge("c", 2L)))
    // and typed pruning DOES prune what cannot match: 10 < 20
    assert(!PruneFilter.mayMatch(spec, Map("p" -> "10"), PruneFilter.Ge("c", 20L)))
    assert(!PruneFilter.mayMatch(spec, Map("p" -> "30"), PruneFilter.Lt("c", 20L)))
    // unparseable stored value against a numeric literal: conservative keep
    assert(PruneFilter.mayMatch(spec, Map("p" -> "oops"), PruneFilter.Ge("c", 2L)))
  }

  test("close timestamps in the same period are never cross-pruned") {
    (1 to 2000).foreach { _ =>
      val base = randTs()
      // same-month neighbor: jitter within a few hours
      val near = new Timestamp(base.getTime + rng.between(-3600_000L, 3600_000L))
      transforms.foreach { tr =>
        if (tr.valueOf(base) == tr.valueOf(near)) {
          val spec = Seq(PartitionField("c", tr, "p"))
          assert(PruneFilter.mayMatch(spec, partitionOf(tr, base), PruneFilter.Eq("c", near)))
        }
      }
    }
  }

  test("identity and bucket transforms: no false negatives on strings") {
    (1 to 2000).foreach { _ =>
      val s = rng.alphanumeric.take(rng.between(1, 12)).mkString
      val spec = Seq(PartitionField("c", Transform.Identity, "p"))
      assert(PruneFilter.mayMatch(spec, Map("p" -> s), PruneFilter.Eq("c", s)))
      assert(PruneFilter.mayMatch(spec, Map("p" -> s), PruneFilter.In("c", Seq(s, "other"))))
      // bucket renders no literal (engine-side hash) → always conservative:
      // any bucket value survives any filter
      val b = Transform.Bucket(16)
      assert(PruneFilter.mayMatch(
        Seq(PartitionField("c", b, "p")),
        Map("p" -> rng.between(0, 16).toString), PruneFilter.Eq("c", s)))
    }
  }

  test("truncate transform: prefix partitions never lose their own members") {
    (1 to 2000).foreach { _ =>
      val s = rng.alphanumeric.take(rng.between(1, 20)).mkString
      val w = rng.between(1, 8)
      val tr = Transform.Truncate(w)
      val spec = Seq(PartitionField("c", tr, "p"))
      val part = Map("p" -> tr.valueOf(s).get)
      assert(PruneFilter.mayMatch(spec, part, PruneFilter.Eq("c", s)),
        s"truncate[$w] pruned partition holding '$s'")
      assert(PruneFilter.mayMatch(spec, part, PruneFilter.In("c", Seq(s, "zz_other"))))
    }
  }

  test("range compare follows UTF-8 byte order (Spark's), not Java UTF-16 order") {
    // U+FFFD (3-byte UTF-8) sorts BELOW a supplementary char (4-byte) in
    // UTF-8/Spark order, but ABOVE its surrogates in Java's compareTo —
    // a UTF-16 comparison would falsely prune this file for `col <= supp`
    val supp = new String(Character.toChars(0x10000))
    val tr = Transform.Truncate(3)
    val spec = Seq(PartitionField("c", tr, "p"))
    val fileVal = tr.valueOf("\uFFFD" + "ab").get
    assert(PruneFilter.mayMatch(spec, Map("p" -> fileVal), PruneFilter.Le("c", supp + "zz")))
  }

  test("truncate renders literals by code points, matching the writer's substring") {
    // String.take counts UTF-16 units and would split a surrogate pair,
    // rendering a prefix that never matches the stored partition value
    val emoji = new String(Character.toChars(0x1F600)) // 2 UTF-16 units
    val tr = Transform.Truncate(2)
    assert(tr.valueOf(emoji + emoji + "abc").contains(emoji + emoji))
    val spec = Seq(PartitionField("c", tr, "p"))
    assert(PruneFilter.mayMatch(spec, Map("p" -> (emoji + emoji)),
      PruneFilter.Eq("c", emoji + emoji + "abc")),
      "truncate partition falsely pruned for a supplementary-character prefix")
  }

  test("identity on temporal columns never prunes (render formats differ from directory encoding)") {
    (1 to 500).foreach { _ =>
      val ts = randTs()
      val spec = Seq(PartitionField("c", Transform.Identity, "p"))
      // whatever the writer rendered into the directory, a temporal literal
      // must not prune it — Identity.valueOf declines temporal literals
      val dirValue = ts.toString // one plausible directory encoding
      assert(PruneFilter.mayMatch(spec, Map("p" -> dirValue), PruneFilter.Eq("c", ts)))
      assert(PruneFilter.mayMatch(spec, Map("p" -> dirValue),
        PruneFilter.In("c", Seq(ts, randTs()))))
    }
  }

  test("filters on non-partition columns never prune") {
    (1 to 500).foreach { _ =>
      val ts = randTs()
      val spec = Seq(PartitionField("c", Transform.Month, "p"))
      assert(PruneFilter.mayMatch(spec, partitionOf(Transform.Month, ts),
        PruneFilter.Ge("other_col", ts)))
    }
  }
}
