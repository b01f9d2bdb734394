package graft.diff

import graft.{SparkSpec, Tables}

/** Randomized differential testing (VERDICT r11 #2): every seeded
  * [[QueryGen]] instance is executed through TWO independent frontends —
  * the DataFrame plan the generator composed with the DSL, and
  * `spark.sql` over the generator's ANSI string — and the results must
  * be identical multisets. 120 seeds × the §2 grammar turns the fixed
  * 104-oracle correctness surface into a family. The cross-ENGINE leg of
  * the same family (the identical SQL replayed by DuckDB via
  * `tools/check_oracle.py`) runs through [[DiffVerify]]. */
class QueryGenSpec extends SparkSpec {

  private val Seeds = 1 to 120

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("120 seeded grammar queries: DataFrame plan equals Spark SQL, non-degenerately") {
    Tables.names.foreach(t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t))
    var nonEmpty = 0
    val scenarios = scala.collection.mutable.Map.empty[Int, Int]
    var lakeSkipped = 0
    Seeds.foreach { seed =>
      // lakeCap=300: the lake arms (11/12) CTAS full tables otherwise —
      // the whole r15 suite wall-time creep (VERDICT r15 #2). The cap
      // renders into BOTH routes; the DuckDB soak legs (DiffVerify) and
      // the registry pins keep full tables.
      val g = QueryGen.gen(seed.toLong, lakeCap = Some(300))
      val sc = g.name.split("_sc").last.toInt
      scenarios(sc) = scenarios.getOrElse(sc, 0) + 1
      // the lake arms' cost is the LIFECYCLE's ~15 Spark jobs, not rows
      // (measured ~3.2 s per instance at sf0.001 even capped): executing
      // all ~32 drawn lake seeds would put the suite ~80 s over budget.
      // In-suite, the first 5 drawn instances per lake arm execute both
      // routes — a SAMPLE of each arm's draw classes (arm 13 draws 6
      // range classes and arm 14 draws 3 ops × 8 read classes, so 5
      // executions cannot cover them all — ADVICE r16); FULL class
      // coverage lives on the 1000-seed DuckDB soak legs, where the cost
      // is budgeted. Non-lake arms always execute.
      if (sc >= 11 && scenarios(sc) > 5) { lakeSkipped += 1 }
      else {
      val viaDf = g.build(spark, sfDir)
      val viaSql = spark.sql(g.sql)
      assert(viaDf.columns.toSeq == viaSql.columns.toSeq,
        s"${g.name}: column drift ${viaDf.columns.toSeq} vs ${viaSql.columns.toSeq}\n${g.sql}")
      val (a, b) = (rows(viaDf), rows(viaSql))
      assert(a == b,
        s"${g.name}: DataFrame and SQL routes diverged (${a.size} vs ${b.size} rows)\n" +
          s"${g.sql}\nonly-df=${(a.diff(b)).take(3)}\nonly-sql=${(b.diff(a)).take(3)}")
      if (a.nonEmpty) nonEmpty += 1
      }
    }
    // the family must exercise real data, not vacuous empty results, and
    // must cover every scenario arm of the grammar
    assert(nonEmpty >= (Seeds.size - lakeSkipped) / 2,
      s"only $nonEmpty/${Seeds.size - lakeSkipped} executed queries returned rows — " +
        "generator degenerate")
    // every lake arm must have hit its 5-execution budget — if the
    // sampling ever skips everything (a draw-distribution change), the
    // lifecycle smoke silently vanishes
    assert(Seq(11, 12, 13, 14, 15).forall(sc => scenarios.getOrElse(sc, 0) >= 5),
      s"lake arms under-drawn: $scenarios")
    // every arm must carry REAL weight, not just appear once: a skewed
    // draw (the nextInt(pow2) first-draw pathology produced exactly this
    // — one arm with 120 hits) passes a presence-only check. Uniform
    // expectation is 7.5/arm at 120 seeds over 16 arms; ≥5 holds for the
    // FIXED seed set 1..120 (re-checked when arm 15 landed) — a new arm
    // that redraws the family must re-verify, not assume.
    assert(scenarios.keySet == (0 until QueryGen.NumScenarios).toSet,
      s"scenario coverage hole: $scenarios")
    val thin = scenarios.filter(_._2 < 5)
    assert(thin.isEmpty, s"scenario arms drawn < 5 times in ${Seeds.size} seeds: $thin")
  }

  test("generation is deterministic: same seed renders byte-identical SQL") {
    Seeds.take(20).foreach { seed =>
      assert(QueryGen.gen(seed.toLong).sql == QueryGen.gen(seed.toLong).sql)
    }
  }

  test("pinned registry instances q110-q131 render their golden SQL") {
    // the pinned DiffOps entries are DRIVER-verified named queries whose
    // plan+oracle derive from the generator's draw SEQUENCE — any grammar
    // change (new arm, reordered draw) silently reshapes them while both
    // sides keep passing, breaking round-over-round comparability. A
    // grammar change must therefore update these goldens DELIBERATELY.
    val golden = Map(
      "q110_diff_scan" ->
        ("SELECT * FROM (SELECT DISTINCT s_acctbal, s_nationkey, s_suppkey FROM supplier " +
          "WHERE (s_nationkey < 23 AND s_name LIKE '%5%') ORDER BY s_acctbal ASC NULLS FIRST, " +
          "s_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST LIMIT 150) ORDER BY ALL NULLS FIRST"),
      "q111_diff_agg" ->
        ("SELECT * FROM (SELECT l_linestatus, l_returnflag, COUNT(*) AS cnt, " +
          "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_extendedprice " +
          "FROM lineitem WHERE (l_extendedprice < 56594.245 OR l_linestatus <> 'F') " +
          "GROUP BY l_linestatus, l_returnflag) ORDER BY ALL NULLS FIRST"),
      "q112_diff_join2" ->
        ("SELECT * FROM (SELECT n_regionkey, r_name, COUNT(*) AS cnt, " +
          "COUNT(DISTINCT n_nationkey) AS ndv_n_nationkey, MAX(r_regionkey) AS max_r_regionkey, " +
          "MIN(n_name) AS min_n_name FROM nation JOIN region ON n_regionkey = r_regionkey " +
          "WHERE r_regionkey >= 3 GROUP BY n_regionkey, r_name) ORDER BY ALL NULLS FIRST"),
      "q113_diff_join3" ->
        ("SELECT * FROM (SELECT n_name, c_nationkey, COUNT(*) AS cnt, " +
          "COUNT(DISTINCT c_nationkey) AS ndv_c_nationkey, MIN(n_name) AS min_n_name, " +
          "MAX(r_regionkey) AS max_r_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey WHERE (c_custkey >= 60 AND c_custkey <= 91) " +
          "GROUP BY n_name, c_nationkey) ORDER BY ALL NULLS FIRST"),
      "q114_diff_union" ->
        ("SELECT * FROM (SELECT o_orderkey, o_totalprice, o_orderdate FROM orders " +
          "WHERE o_orderpriority = '4-NOT SPECIFIED' UNION SELECT o_orderkey, o_totalprice, " +
          "o_orderdate FROM orders WHERE o_orderpriority <> '1-URGENT') ORDER BY ALL NULLS FIRST"),
      "q115_diff_join_scan" ->
        ("SELECT * FROM (SELECT c_custkey, n_regionkey, CASE WHEN c_acctbal > 4550.005 " +
          "THEN 'hi' ELSE 'lo' END AS bucket FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "WHERE ((n_nationkey < 24 OR n_nationkey < 10) AND n_name = 'NATION_13') " +
          "ORDER BY c_custkey ASC NULLS FIRST, n_regionkey ASC NULLS FIRST, " +
          "bucket ASC NULLS FIRST LIMIT 74) ORDER BY ALL NULLS FIRST"),
      // r13 arms (VERDICT r12 #4): scalar-fn projections and guaranteed
      // left-join null flow (note q118 groups by the RIGHT side's p_size —
      // the NULL group is part of the pinned result)
      "q117_diff_scalar_fns" ->
        ("SELECT * FROM (SELECT p_size, CAST(LENGTH(p_type) AS INT) AS len_p_type, " +
          "COALESCE(NULLIF(p_partkey, 62), -1) AS nz_p_partkey, " +
          "GREATEST(p_retailprice, 910.005) AS g_p_retailprice, " +
          "upper(substring(p_name, 1, 2)) AS u_p_name FROM part " +
          "ORDER BY p_size ASC NULLS FIRST, len_p_type ASC NULLS FIRST, " +
          "nz_p_partkey ASC NULLS FIRST, g_p_retailprice ASC NULLS FIRST, " +
          "u_p_name ASC NULLS FIRST LIMIT 136) ORDER BY ALL NULLS FIRST"),
      "q118_diff_leftjoin_nulls" ->
        ("SELECT * FROM (SELECT p_size, COUNT(*) AS cnt, COUNT(DISTINCT p_size) AS ndv_p_size, " +
          "MIN(p_retailprice) AS min_p_retailprice, COUNT(p_size) AS nn_p_size " +
          "FROM lineitem LEFT JOIN (SELECT * FROM part WHERE p_partkey % 7 = 4) fb " +
          "ON l_partkey = p_partkey GROUP BY p_size) ORDER BY ALL NULLS FIRST"),
      // arm 8: NULLs at the sorted-LIMIT boundary (asc_nulls_first vs
      // ASC NULLS FIRST vs DuckDB must cut the same multiset)
      "q119_diff_null_order_limit" ->
        ("SELECT * FROM (SELECT l_extendedprice, o_totalprice, o_orderdate, " +
          "COALESCE(o_orderkey, -1) AS co_o_orderkey FROM lineitem LEFT JOIN " +
          "(SELECT * FROM orders WHERE (o_custkey >= 12 AND o_custkey <= 17)) fb " +
          "ON l_orderkey = o_orderkey ORDER BY l_extendedprice ASC NULLS FIRST, " +
          "o_totalprice ASC NULLS FIRST, o_orderdate ASC NULLS FIRST, " +
          "co_o_orderkey ASC NULLS FIRST LIMIT 20) ORDER BY ALL NULLS FIRST"),
      // r14 arm 9: uncorrelated scalar-subquery threshold (J3 randomized)
      // — the SQL routes plan a real ScalarSubquery, the DataFrame route
      // a broadcast single-row cross join; all three must agree
      "q120_diff_scalar_subquery" ->
        ("SELECT * FROM (SELECT s_acctbal, s_nationkey, s_suppkey, " +
          "CASE WHEN s_acctbal > 4550.005 THEN 'hi' ELSE 'lo' END AS bucket FROM supplier " +
          "WHERE s_suppkey < (SELECT AVG(s_suppkey) FROM supplier) " +
          "ORDER BY s_acctbal ASC NULLS FIRST, s_nationkey ASC NULLS FIRST, " +
          "s_suppkey ASC NULLS FIRST, bucket ASC NULLS FIRST LIMIT 76) ORDER BY ALL NULLS FIRST"),
      // r14 arm 10: window functions — ROW_NUMBER and a ROWS-framed
      // running decimal SUM over orders' unique key + whole-partition
      // COUNT(*) (order-dependent draws require a TRUE unique key;
      // lineitem draws only the order-free class — the fixture pair
      // (l_orderkey, l_linenumber) is not unique, which the DuckDB soak
      // caught on this arm's first run)
      "q121_diff_window" ->
        ("SELECT * FROM (SELECT o_orderstatus, o_orderkey, " +
          "CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) AS INT) AS rn, " +
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_orderstatus " +
          "ORDER BY o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
          "AS rsum_o_totalprice, COUNT(*) OVER (PARTITION BY o_orderstatus) AS wc FROM orders " +
          "WHERE (o_orderdate >= TIMESTAMP '2000-05-13 00:00:00' AND o_totalprice >= 221171.765)" +
          ") ORDER BY ALL NULLS FIRST"),
      "q122_diff_lake_mor" ->
        ("SELECT * FROM (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM " +
          "(SELECT o_orderkey, o_custkey, o_orderstatus, " +
          "CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice, " +
          "o_orderdate, o_orderpriority FROM orders WHERE NOT (o_orderkey % 5 = 4)) g " +
          "WHERE ((o_totalprice < 4418.985 OR o_orderstatus = 'F') OR o_custkey % 3 = 2)" +
          ") ORDER BY ALL NULLS FIRST"),
      // r16 arm 12: TIME TRAVEL pinned at cut=2 (scan(asOf=2): the upsert
      // restatement is visible, the later tombstone delete is NOT — note
      // the CASE with no inner WHERE), projection reading the restated
      // o_totalprice
      "q124_diff_lake_timetravel" ->
        ("SELECT * FROM (SELECT o_totalprice, o_custkey FROM " +
          "(SELECT o_orderkey, o_custkey, o_orderstatus, " +
          "CASE WHEN o_orderkey % 3 = 2 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice, " +
          "o_orderdate, o_orderpriority FROM orders) g " +
          "WHERE ((o_orderkey >= 860 AND o_orderkey <= 1282) AND o_custkey >= 93)" +
          ") ORDER BY ALL NULLS FIRST"),
      // r16 arm 13: CHANGELOG pinned at the (1,3) update+delete union;
      // the outer predicate reads o_totalprice, so update rows must
      // carry DOUBLED to-state money and delete rows RAW from-state
      // money for the row set to match
      "q125_diff_lake_changelog" ->
        ("SELECT * FROM (SELECT o_orderstatus, o_orderpriority, _change_type FROM " +
          "(SELECT g.*, 'update' AS _change_type FROM (SELECT o_orderkey, o_custkey, " +
          "o_orderstatus, CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice * 2 ELSE o_totalprice " +
          "END AS o_totalprice, o_orderdate, o_orderpriority FROM orders " +
          "WHERE NOT (o_orderkey % 8 = 4)) g WHERE o_orderkey % 2 = 1 " +
          "UNION ALL SELECT g.*, 'delete' AS _change_type FROM (SELECT o_orderkey, o_custkey, " +
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders) g " +
          "WHERE o_orderkey % 8 = 4) h " +
          "WHERE (o_totalprice < 191721.725 AND o_orderpriority <> '2-HIGH')" +
          ") ORDER BY ALL NULLS FIRST"),
      // r17 arm 14: SCHEMA EVOLUTION pinned at add-column + changelog
      // (0,3) — the emitted schema is the evolved one and g_extra must be
      // NULL for era-1 rows, o_orderkey%97 for the era-2 class
      "q126_diff_lake_schema_evo" ->
        ("SELECT * FROM (SELECT o_custkey, o_orderdate, o_orderpriority, g_extra, " +
          "_change_type FROM (SELECT g.*, 'insert' AS _change_type FROM " +
          "(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
          "o_orderpriority, CASE WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey % 97 AS INT) " +
          "END AS g_extra FROM orders) g) h WHERE (o_orderstatus = 'O' OR o_custkey < 83)" +
          ") ORDER BY ALL NULLS FIRST"),
      // r18 arm 14: the MAINTENANCE pin — drop-column, expiry of the
      // non-head history, compactDirty under the dropped schema, then a
      // head read with a date predicate (seed-1281 notes: op=2 read=2
      // rollback=true expire=true maint=1). The SQL dual is the plain
      // converged rewrite: compaction must be invisible to it
      "q127_diff_lake_maintenance" ->
        ("SELECT * FROM (SELECT o_custkey, o_orderstatus, o_orderkey FROM " +
          "(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
          "FROM orders) g WHERE o_orderdate >= TIMESTAMP '1998-03-25 00:00:00'" +
          ") ORDER BY ALL NULLS FIRST"),
      // r18 arm 15: the SQL-ROUTE pin — MoR MERGE restating odd keys'
      // c_acctbal and INSERTing the %9=7 class shifted by 3e7, then
      // DELETE over the POST-merge pks (3e7 % 9 = 3: an inserted row's
      // delete-class membership differs from its source row's — the dual
      // applies the complement to each row's FINAL pk), then compaction +
      // zero-age sweep folding the deltas before the SELECT
      "q130_diff_lake_sql_route" ->
        ("SELECT * FROM (SELECT c_acctbal, c_custkey FROM (SELECT * FROM " +
          "(SELECT c_custkey, c_name, c_nationkey, " +
          "CASE WHEN c_custkey % 2 = 1 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal, " +
          "c_mktsegment FROM customer UNION ALL SELECT c_custkey + 30000000 AS c_custkey, " +
          "c_name, c_nationkey, c_acctbal * 2 AS c_acctbal, c_mktsegment FROM customer " +
          "WHERE c_custkey % 9 = 7) u0 WHERE NOT (c_custkey % 9 = 1)) g " +
          "WHERE c_mktsegment <> 'BUILDING'" +
          ") ORDER BY ALL NULLS FIRST"),
      // r19 arm 15: the SQL-route ALTER pin — ADD COLUMN between the CTAS
      // and a MoR MERGE (money restated, %8=5 class inserted shifted),
      // the added column populated by a delta UPDATE over each row's
      // FINAL pk (%4=2), a post-merge DELETE, compaction folding it all —
      // the dual computes g_extra as a post-union CASE (seed-1493 notes:
      // ctas=true mor=true mut=3 alter=1 delete=true maint=3)
      "q131_diff_lake_sql_alter" ->
        ("SELECT * FROM (SELECT o_orderkey, o_custkey, o_orderpriority, g_extra FROM " +
          "(SELECT * FROM (SELECT a0.*, CASE WHEN o_orderkey % 4 = 2 THEN " +
          "CAST(o_orderkey % 97 AS INT) END AS g_extra FROM (SELECT o_orderkey, " +
          "o_custkey, o_orderstatus, CASE WHEN o_orderkey % 2 = 1 THEN " +
          "o_totalprice * 2 ELSE o_totalprice END AS o_totalprice, o_orderdate, " +
          "o_orderpriority FROM orders UNION ALL SELECT o_orderkey + 30000000 AS " +
          "o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice, " +
          "o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 8 = 5) a0) u0 " +
          "WHERE NOT (o_orderkey % 8 = 2)) g " +
          "WHERE o_orderdate < TIMESTAMP '2001-07-17 00:00:00'" +
          ") ORDER BY ALL NULLS FIRST"))
    DiffOps.all.foreach { q =>
      assert(q.oracle.contains(golden(q.name)),
        s"${q.name} drifted from its golden SQL — a generator change reshaped a pinned " +
          s"registry query; update the golden deliberately.\nnow: ${q.oracle.get}")
    }
    assert(DiffOps.all.map(_.name).toSet == golden.keySet)
  }
}
