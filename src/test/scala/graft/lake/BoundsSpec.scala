package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Per-file column bounds: recorded at commit from footer stats, used by
  * planFiles to skip whole files on non-partition predicates. */
class BoundsSpec extends SparkSpec {
  import spark.implicits._

  test("ColumnBounds.mayMatch: numeric and string interval logic, conservative fallbacks") {
    val num = Map("x" -> ColBound("n", "10", "50"))
    import PruneFilter._
    assert(ColumnBounds.mayMatch(num, Eq("x", 10L)))
    assert(ColumnBounds.mayMatch(num, Eq("x", 50L)))
    assert(!ColumnBounds.mayMatch(num, Eq("x", 9L)))
    assert(!ColumnBounds.mayMatch(num, Eq("x", 51L)))
    assert(!ColumnBounds.mayMatch(num, Gt("x", 50L)))
    assert(ColumnBounds.mayMatch(num, Ge("x", 50L)))
    assert(!ColumnBounds.mayMatch(num, Lt("x", 10L)))
    assert(ColumnBounds.mayMatch(num, Le("x", 10L)))
    assert(ColumnBounds.mayMatch(num, In("x", Seq(1L, 30L))))
    assert(!ColumnBounds.mayMatch(num, In("x", Seq(1L, 2L))))
    // numeric compare is typed, not lexicographic: Lt(9) prunes [10, 2000]
    // even though "9" sorts after "10" as a string
    assert(!ColumnBounds.mayMatch(Map("x" -> ColBound("n", "10", "2000")), Lt("x", 9L)))
    assert(ColumnBounds.mayMatch(Map("x" -> ColBound("n", "10", "2000")), Lt("x", 11L)))
    val str = Map("s" -> ColBound("s", "bb", "dd"))
    assert(ColumnBounds.mayMatch(str, Eq("s", "cc")))
    assert(!ColumnBounds.mayMatch(str, Eq("s", "aa")))
    assert(!ColumnBounds.mayMatch(str, Gt("s", "dd")))
    // domain mismatch keeps the file (never a correctness dependency)
    assert(ColumnBounds.mayMatch(str, Eq("s", 42L)))
    assert(ColumnBounds.mayMatch(num, Eq("x", "nope")))
    // unknown column keeps
    assert(ColumnBounds.mayMatch(num, Eq("other", 1L)))
    // temporal canonicalization: date bounds are epoch days
    val d = Map("d" -> ColBound("n", "18000", "18100"))
    assert(ColumnBounds.mayMatch(d, Eq("d", java.time.LocalDate.ofEpochDay(18050))))
    assert(!ColumnBounds.mayMatch(d, Eq("d", java.time.LocalDate.ofEpochDay(17000))))
  }

  test("commits record bounds; planFiles skips files by value range without partitions") {
    val dir = Files.createTempDirectory("graft-bounds-spec").toString
    val lo = (1L to 50L).map(i => (i, s"u${100 + i}", i * 1.5)).toDF("id", "name", "v")
    val hi = (51L to 100L).map(i => (i, s"u${100 + i}", i * 1.5)).toDF("id", "name", "v")
    val t = LakeTable.create(spark, s"$dir/t", "t", lo.schema, clusterBy = Seq("id"))
    t.append(lo)
    t.append(hi)
    val snap = t.currentSnapshot
    assert(snap.dataFiles.size > 1)
    assert(snap.dataFiles.forall(_.bounds.contains("id")), "no id bounds recorded")
    assert(snap.dataFiles.forall(_.bounds.contains("name")), "no string bounds recorded")
    assert(snap.dataFiles.forall(_.bounds.contains("v")), "no double bounds recorded")

    // clustering makes per-file id ranges disjoint: a point lookup
    // touches exactly one file no matter how many tasks wrote
    val (kept1, total) = t.planFiles(snap, Seq(PruneFilter.Eq("id", 10L)))
    assert(kept1.size == 1, s"expected 1/$total files, got ${kept1.size}")
    // out-of-range prunes everything
    assert(t.planFiles(snap, Seq(PruneFilter.Gt("id", 200L)))._1.isEmpty)
    // double range keeps only the low-value files
    val keptV = t.planFiles(snap, Seq(PruneFilter.Le("v", 30.0)))._1
    assert(keptV.nonEmpty && keptV.size < total, s"${keptV.size}/$total")
    // string point lookup touches one file
    assert(t.planFiles(snap, Seq(PruneFilter.Eq("name", "u120")))._1.size == 1)
    // results are still exact through the pruned scan
    assert(t.scan(filters = Seq(PruneFilter.Eq("id", 10L))).count() == 1)
    assert(t.scan(filters = Seq(PruneFilter.Ge("id", 90L))).count() == 11)
    // bounds survive the manifest round trip
    LakeTable.manifestCache.clear()
    assert(t.currentSnapshot.dataFiles.forall(_.bounds.nonEmpty))
  }

  test("upsert tombstones still apply when the data files are bounds-pruned") {
    val dir = Files.createTempDirectory("graft-bounds-mor").toString
    val df = (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
    val t = LakeTable.create(spark, s"$dir/t", "t", df.schema,
      clusterBy = Seq("id"), primaryKey = Seq("id"))
    t.append(df)
    t.upsert(Seq((10L, 99.0)).toDF("id", "v"))
    val got = t.scan(filters = Seq(PruneFilter.Eq("id", 10L)))
      .select("id", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((10L, 99.0)), s"got $got")
  }
}
