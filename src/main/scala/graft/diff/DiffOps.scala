package graft.diff

import graft.NamedQuery

/** Pinned representatives of the generated differential family — one per
  * grammar scenario, registered as ordinary [[NamedQuery]]s so the
  * DRIVER's DuckDB gate hash-checks them every round exactly like the
  * hand-written queries. [[QueryGen]] is deterministic per seed, so these
  * are stable named plans; the full 120-seed family runs in QueryGenSpec
  * (DataFrame-vs-SparkSQL) and via [[DiffVerify]] (vs DuckDB). */
object DiffOps {

  /** The generator's SQL has no ORDER BY (LIMIT-bearing instances order
    * internally); the registry contract wants a canonically-ordered
    * oracle, so wrap instead of appending — `... LIMIT k ORDER BY ALL`
    * would not parse. */
  private def pinned(seed: Long, sc: Int, qname: String): NamedQuery = {
    val g = QueryGen.gen(seed, Some(sc))
    NamedQuery(qname, g.build,
      oracle = Some(s"SELECT * FROM (${g.sql}) ORDER BY ALL NULLS FIRST"))
  }

  val all: Seq[NamedQuery] = Seq(
    pinned(1001L, 0, "q110_diff_scan"),
    pinned(1002L, 1, "q111_diff_agg"),
    pinned(1003L, 2, "q112_diff_join2"),
    pinned(1004L, 3, "q113_diff_join3"),
    pinned(1005L, 4, "q114_diff_union"),
    pinned(1006L, 5, "q115_diff_join_scan"),
    pinned(1007L, 6, "q117_diff_scalar_fns"),
    pinned(1008L, 7, "q118_diff_leftjoin_nulls"),
    pinned(1009L, 8, "q119_diff_null_order_limit"),
    pinned(1010L, 9, "q120_diff_scalar_subquery"),
    // seed 1028 (not 1011): of the candidate draws it covers the most
    // window classes at once — ROW_NUMBER and a ROWS-framed running
    // decimal SUM over orders' unique key plus a whole-partition
    // COUNT(*), under a selective filter (153 rows at sf0.001)
    pinned(1028L, 10, "q121_diff_window"),
    // seed 1029: of the arm-11 candidates it exercises the whole lake
    // lifecycle at once — orders CTAS under a bucket(8) transform, an
    // upsert restating every odd key's o_totalprice, a % 5 tombstone
    // delete, and an outer predicate that READS the restated column
    // (o_totalprice < …), so a wrong last-writer-wins fold changes the
    // row set, not just a value
    pinned(1029L, 11, "q122_diff_lake_mor"),
    // seed 1061 (arm 12, r16): pins the TIME-TRAVEL read at the most
    // discriminating cut — snapshot 2 via scan(asOf), after the upsert
    // restatement but BEFORE the tombstone delete — with a projection
    // that reads the restated o_totalprice and an o_orderkey-range
    // predicate: a pinned read that leaks the later delete shrinks the
    // row set, one that loses the upsert halves projected values; both
    // hash-diverge against DuckDB's prefix-state rewrite
    pinned(1061L, 12, "q124_diff_lake_timetravel"),
    // seed 1106 (arm 13, r16): pins the CHANGELOG at the richest range —
    // (1,3), the update+delete union — with an outer predicate READING
    // o_totalprice, so the era of every emitted value decides row
    // membership: update rows must carry the DOUBLED to-state money,
    // delete rows the RAW from-state money; either era leaking into the
    // other branch changes the row set against DuckDB's structural dual
    pinned(1106L, 13, "q125_diff_lake_changelog"),
    // seed 1111 (arm 14, r17): pins SCHEMA EVOLUTION at its most
    // discriminating read — add-column between the two appends, then a
    // changelog over (0,3): the range spans BOTH appends AND the metadata
    // commit, the emitted schema is the evolved one, and the projection
    // READS g_extra — so era-1 rows must null-fill while era-2 rows carry
    // pk%97, under an outer predicate deciding row membership; a read
    // that serves the old schema, fails to null-fill, or populates the
    // wrong era hash-diverges against DuckDB's CASE rewrite
    pinned(1111L, 14, "q126_diff_lake_schema_evo"),
    // seed 1281 (arm 14, r18): pins the MAINTENANCE lifecycle at its
    // richest interaction — drop-column between the appends, expiry of
    // the non-head history, then compactDirty rewriting the era-mixed
    // partitions UNDER THE DROPPED SCHEMA before a head read with a row-
    // membership predicate (notes: op=2 read=2 rollback=true expire=true
    // maint=1; committed ops after expiry: append,compact). A compaction
    // that resurrects dropped-column bytes, loses era-1 rows, or breaks
    // the retired-schema lineage changes the row set against DuckDB's
    // converged rewrite — the compaction × evolution × expiry surface
    // the r16/r17 expiry draws kept finding bugs next to
    pinned(1281L, 14, "q127_diff_lake_maintenance"),
    // seed 1408 (arm 15, r18): pins the SQL-ROUTE lifecycle at its richest
    // interaction — CREATE + two INSERT commits, a merge-on-read MERGE
    // whose source both RESTATES the u-class money and INSERTS a
    // shifted-key class, DELETE FROM over the post-merge pks, then
    // compactDirty + a zero-age orphan sweep folding the MoR deltas
    // (notes: ctas=false mor=true mut=3 delete=true maint=3; committed
    // ops: create, append-dsv2 ×2, merge-mor, delete-mor, compact), under
    // an outer row-membership predicate. A DSv2 delta write that drops an
    // insert branch, mislabels a matched update, or a compaction that
    // unfolds the sidecars hash-diverges against DuckDB's converged
    // rewrite
    pinned(1408L, 15, "q130_diff_lake_sql_route"),
    // seed 1493 (arm 15, r19 — VERDICT r18 #2): pins the SQL-route ALTER
    // crossing a MoR restatement, the last un-fuzzed route×mutation cell —
    // CTAS, ADD COLUMN g_extra, then a merge-on-read MERGE that restates
    // the odd keys' money and INSERTS the %8=5 class shifted by 3e7, a
    // row-level UPDATE populating the EVOLVED column through the delta
    // path by each row's FINAL pk class (%4=2 — pre-ALTER files must
    // null-fill, post-merge inserts take their shifted class), DELETE FROM
    // over the post-merge pks, then compactDirty + zero-age orphan sweep
    // rewriting era-mixed files under the evolved schema (notes: ctas=true
    // mor=true mut=3 alter=1 delete=true maint=3; committed ops: create,
    // append-dsv2, add-column, merge-mor, update-mor, delete-mor,
    // compact), under a date row-membership predicate with g_extra
    // PROJECTED — a delta write that loses the added column, a populate
    // that touches the wrong era, or a compaction that un-null-fills
    // hash-diverges against DuckDB's post-union CASE rewrite
    pinned(1493L, 15, "q131_diff_lake_sql_alter"))
}
