package graft.operators

import graft.NamedQuery
import graft.lake.PruneFilter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The lake-table operator surface (SURVEY §2.1 S2/S4–S7/S10/S12 and §1.4),
  * exercised end-to-end through [[LakePipelines]]'s deterministic builds and
  * oracle-checked against DuckDB over the SAME raw parquet inputs: every
  * query's expected content is a pure SQL function of the fixture tables,
  * so a hash match proves the whole write→commit→prune→merge→read path.
  */
object LakeOps {
  import RelationalOps.dsum

  // q23 — partitioned lake write + snapshot-backed read roundtrip
  // (S2/S4/S6/S7: scripts/iceberg-setup.sql:5-43 registers catalog tables;
  // destination.json:37-73 partition transforms, :115-118 clustering)
  val lakeRoundtrip: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersLake(s, dir).scan()

  // q24 — transform-aware pruned scan: raw o_orderdate range predicate
  // prunes month(o_orderdate) partitions at file-listing time (reference:
  // use_iceberg_partition_pruning=1, scripts/iceberg-setup.sql:2;
  // month-range query compare-query-performance.sql:52-61)
  val lakePrunedScan: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersLake(s, dir)
      .scan(filters = Seq(
        PruneFilter.Ge("o_orderdate", LakePipelines.PruneLo),
        PruneFilter.Lt("o_orderdate", LakePipelines.PruneHi)))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("revenue"))

  // q25 — time travel: the table as of its first append (S10; reference
  // SETTINGS iceberg_snapshot_id = N, BLOG_POST_COMPLETE_WALKTHROUGH.md:521-527)
  val lakeTimeTravel: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersLake(s, dir)
      .scan(asOf = Some(LakePipelines.OrdersFirstAppendSeq))

  // q26 — schema evolution: rows written before ALTER ADD COLUMN null-fill
  // the evolved column at read (S12/§1.4; BLOG:538-553)
  val lakeSchemaEvolution: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.customerEvolved(s, dir).scan()

  // q27 — merge-on-read upsert state (S5/J4: write_mode upsert with
  // merge_on_read, destination.json:89-91,132-134) — the q16 merge algebra
  // as an actual O(batch) table mutation, not an O(table) rewrite
  val lakeUpsertMor: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersMor(s, dir).scan(asOf = Some(LakePipelines.MorUpsertSeq))

  // q28 — merge-on-read delete state
  val lakeDeleteMor: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersMor(s, dir).scan(asOf = Some(LakePipelines.MorDeleteSeq))

  // q29 — post-compaction read: identical content, delete files folded in,
  // small files bin-packed (destination.json:262-263 auto_compact)
  val lakeCompacted: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersMor(s, dir).scan()

  // q30 — materialized SILVER serve: the curated projection read back from
  // the lake table it was persisted to (S8: scripts/iceberg-setup.sql:47-75
  // writes silver back to the object store; r1 only had the SELECT side)
  val silverServe: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.silverOrders(s, dir).scan()

  // q31 — materialized GOLD serve: the KPI rollup read from the stored gold
  // table — a lookup, not a recompute (S9: scripts/iceberg-setup.sql:80-101;
  // the 10–50 ms gold tier of the medallion speedup, BLOG:488-491)
  val goldServe: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.goldOrderMetrics(s, dir).scan()

  // q32 — re-aggregation served FROM the stored gold table (A9 over S9:
  // compare-query-performance.sql:143-151 runs against the gold MergeTree,
  // not raw) — same result as q20 but reading ~6k pre-aggregated rows
  // instead of re-scanning + re-aggregating the fact table
  val goldReaggServe: (SparkSession, String) => DataFrame = (s, dir) =>
    RelationalOps.goldReaggFrom(LakePipelines.goldOrderMetrics(s, dir).scan())

  // q33 — CDC streaming ingest end state (C1–C5): snapshot bootstrap +
  // streamed change-log drain + a deliberately REPLAYED batch; the hash
  // match proves the full readStream→foreachBatch→MoR-merge path AND
  // at-least-once idempotence (reference: OLake binlog replication,
  // destination.json:129-134, BLOG:297-300)
  val cdcIngested: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersCdc(s, dir).scan()

  // q34 — the CDC table as of its bootstrap snapshot: time travel back to
  // the pre-incremental state (C1's "initial snapshot" as a first-class
  // readable version)
  val cdcBootstrap: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersCdc(s, dir).scan(asOf = Some(LakePipelines.CdcBootstrapSeq))

  // q64/q65 — MULTI-TABLE CDC: two more tables replicated through the
  // same CdcIngest API (the reference runs 4 concurrent table pipelines,
  // destination.json:100-234; concurrency itself is spec-asserted in
  // CdcIngestSpec — each table's end state is oracle-hashed here)
  val cdcCustomer: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.customerCdc(s, dir).scan()

  val cdcEvents: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.eventsCdc(s, dir).scan()

  // q66 — INCREMENTAL medallion: the silver tier built by a STREAMING read
  // of the raw lake table (micro-batch offsets = snapshot seqs) with the
  // projection applied in-stream and foreachBatch appends — hash-matches
  // the batch-built silver (q30/q60), proving tail-the-lake ≡ rebuild
  val streamedSilver: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.silverStreamed(s, dir).scan()

  // q82 — CDC-OUT: a downstream replica kept in sync by the CHANGELOG
  // stream across upstream upserts + deletes (history the q66 append
  // stream must refuse); the replica's final state hash-matches the
  // equivalent relational restatement of the fixture
  val changelogReplica: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersChangelogReplica(s, dir).scan()

  // q83 — GROUP BY the identity-partition source answered from MANIFEST
  // METADATA: per-group COUNT(*) sums per-file row counts and per-group
  // MIN/MAX folds per-file bounds, so the whole rollup plans as a driver
  // LocalTableScan — zero tasks, zero data I/O at any table size (the
  // Iceberg metadata-count idea extended to grouped aggregates). The
  // query itself REQUIRES the metadata plan (not just the values): a
  // regression to a real scan fails the gate, not only the stopwatch.
  val partitionMetaRollup: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersMor(s, dir) // compacted: tombstone-free
    val df = s.read.format("graftlake").option("path", t.location).load()
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"partition rollup was not metadata-served:\n$plan")
    df
  }

  // q84 — per-month rollup grouped by DERIVED year()/month() of the
  // month-partitioned o_orderdate, answered from partition METADATA: the
  // rendered tuples ("yyyy-MM") determine both derived values, so the
  // whole rollup folds from the file listing on the driver
  // ([[graft.plans.LakeMetaAggregate]] — Spark's V2 pushdown cannot
  // translate month(), so this goes through the injected optimizer rule
  // rather than the connector aggregate API q83 uses). The query REQUIRES
  // the metadata plan: a regression to a real scan fails the gate.
  val monthlyMetaRollup: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersLake(s, dir)
    val df = s.read.format("graftlake").option("path", t.location).load()
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"monthly transform rollup was not metadata-served:\n$plan")
    df
  }

  // q85 — FILTERED metadata rollup: an aligned month-range WHERE plus a
  // GROUP BY the identity partition source, still answered wholly from
  // the file listing — every file is classified wholly-in/wholly-out by
  // the month tuples (the boundaries are first instants of their months)
  // and the identity tuples key the groups. The reference's dashboard
  // count shape at zero tasks; unaligned boundaries fall back to the
  // pruned scan (spec-asserted).
  val filteredMetaRollup: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersLake(s, dir)
    val df = s.read.format("graftlake").option("path", t.location).load()
      .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'") &&
        expr("o_orderdate < TIMESTAMP '2000-07-01 00:00:00'"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"filtered rollup was not metadata-served:\n$plan")
    df
  }

  // q86 — ADDITIVE metadata rollup: per-month SUM/AVG/COUNT(col) of an
  // integral revenue measure served from the per-file sums + non-null
  // counts the commit recorded in the manifests (graft.lake.ColumnSums) —
  // the reference's gold-tier revenue rollup (scripts/iceberg-setup.sql:
  // 80-101) computed with zero scan tasks at any table size. Doubles are
  // never served (order-dependent); the integral/decimal domain makes the
  // fold exact by construction, and AVG is served only in the provably
  // exact double regime (|value|·count ≤ 2^53). The query REQUIRES the
  // metadata plan: a regression to a real scan fails the gate.
  /** q109 — the curated-corpus report SERVED FROM METADATA: the text
    * pipeline's survivors live in a lake table partitioned by
    * identity(lang) ([[LakePipelines.curatedDocs]]), so the per-language
    * doc counts and token totals fold from manifest entries (per-file row
    * counts + commit-time column sums) as a zero-task LocalTableScan.
    * The oracle recomputes the whole curation chain from the raw corpus
    * — a hash match proves the lake write, the partition tuples AND the
    * recorded column sums all agree with the declarative q103 chain. */
  val curatedMetaServe: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.curatedDocs(s, dir)
    val df = s.read.format("graftlake").option("path", t.location).load()
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"curated rollup was not metadata-served:\n$plan")
    df
  }

  val metadataSumRollup: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersCents(s, dir)
    val df = s.read.format("graftlake").option("path", t.location).load()
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_cents")).as("revenue_cents"),
        avg(col("o_cents")).as("avg_cents"),
        count(col("o_custkey")).as("n_cust"),
        // distinct count of the identity-partition source: the tuples
        // ENUMERATE the distinct statuses per month — also zero tasks
        countDistinct(col("o_orderstatus")).as("n_status"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"additive rollup was not metadata-served:\n$plan")
    df
  }

  // q87 — the reference's HEADLINE money filter (`WHERE total_amount >
  // 1000`, compare-query-performance.sql:97) over a DECIMAL(12,2) lake
  // column through the DSv2 pushdown scan (cut at 300000.00 — same shape
  // and type, selective on TPC-H's 1k..500k money range). The money column
  // is the cluster key with range-disjoint files, so the decimal
  // comparison prunes whole files from manifest metadata — the builder
  // REQUIRES files to have been pruned (a regression to scan-everything,
  // or to round 7's unscaled-bounds wrong answer, fails the gate either
  // way).
  val decimalFilterPushdown: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersDecimal(s, dir)
    val cut = new java.math.BigDecimal("300000.00")
    val (kept, total) = t.planFiles(t.currentSnapshot,
      Seq(PruneFilter.Gt("total_amount", cut)))
    require(kept.size < total,
      s"decimal bounds pruned nothing: ${kept.size}/$total files kept")
    s.read.format("graftlake").option("path", t.location).load()
      .filter(col("total_amount") > lit(cut))
      // storage, pushdown and pruning all run on DECIMAL(12,2); only the
      // verify-sink projection widens to DOUBLE (exact here: cent multiples
      // ≤ 2^53) so the result hashes identically through every reader
      .withColumn("total_amount", col("total_amount").cast("double"))
  }

  // q90 — DECIMAL money rollup served wholly from MANIFEST METADATA:
  // per-status money extremes and exact revenue fold from per-file decimal
  // bounds (recorded SCALED by the parquet decimal annotation — round 7's
  // unscaled-stats bug made them unusable) and recorded exact decimal
  // sums, so the reference's money-summary shape plans as a driver
  // LocalTableScan — zero tasks, zero data I/O at any table size. The
  // query REQUIRES the metadata plan: a regression to a real scan fails
  // the gate, not only the stopwatch.
  val decimalMetaRollup: (SparkSession, String) => DataFrame = (s, dir) => {
    val t = LakePipelines.ordersDecimal(s, dir)
    val df = s.read.format("graftlake").option("path", t.location).load()
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("total_amount")).as("min_amount"),
        max(col("total_amount")).as("max_amount"),
        sum(col("total_amount")).as("revenue"))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"decimal money rollup was not metadata-served:\n$plan")
    // gate holds on the decimal plan; the verify sink widens to DOUBLE
    // (exact: cent multiples ≤ 2^53) for reader-independent hashing
    df.withColumn("min_amount", col("min_amount").cast("double"))
      .withColumn("max_amount", col("max_amount").cast("double"))
      .withColumn("revenue", col("revenue").cast("double"))
  }

  // q88 — GOLD serve with exact decimal money: the month×status revenue
  // rollup materialized from the decimal table and read back — money stays
  // DECIMAL end to end (raw cents → decimal(12,2) → decimal(22,2) sums),
  // never passing through a double (SURVEY §1.3)
  val decimalGoldServe: (SparkSession, String) => DataFrame = (s, dir) =>
    // the gold table itself stays DECIMAL(22,2) end to end; the query
    // boundary widens to DOUBLE (exact cent multiples) for the verify sink
    LakePipelines.goldDecimalMetrics(s, dir).scan()
      .withColumn("gross_revenue", col("gross_revenue").cast("double"))

  // q89 — cross-layer consistency ON DECIMALS (q54's golden test for the
  // money type): the same status-level revenue total computed from raw
  // parquet, the decimal lake table, and the materialized gold rollup must
  // agree to the exact cent
  val decimalCrossLayer: (SparkSession, String) => DataFrame = (s, dir) => {
    val amount = (round(col("o_totalprice") * 100).cast("long").cast("decimal(14,0)") *
      lit(new java.math.BigDecimal("0.01"))).cast("decimal(12,2)")
    val raw = graft.Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("order_count"), sum(amount).as("revenue"))
      .select(lit("1_raw").as("layer"), col("status"), col("order_count"), col("revenue"))
    val silver = LakePipelines.ordersDecimal(s, dir).scan()
      .groupBy(col("status"))
      .agg(count(lit(1)).as("order_count"), sum(col("total_amount")).as("revenue"))
      .select(lit("2_silver").as("layer"), col("status"), col("order_count"), col("revenue"))
    val gold = LakePipelines.goldDecimalMetrics(s, dir).scan()
      .groupBy(col("status"))
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("gross_revenue")).cast("decimal(22,2)").as("revenue"))
      .select(lit("3_gold").as("layer"), col("status"), col("order_count"), col("revenue"))
    raw.unionByName(silver).unionByName(gold)
      // all three layers computed and compared in DECIMAL; widen only the
      // final projection for the verify sink (exact cent multiples)
      .withColumn("revenue", col("revenue").cast("double"))
  }

  // q58 — the pruned-range aggregate (q24's semantics) through the DSv2
  // source and plain SQL: spark.read.format("graftlake") → temp view →
  // spark.sql, with the o_orderdate range pushed into the source
  // (SupportsPushDownFilters) where it prunes month partitions at
  // planning time. Proves the whole DSv2 read stack — filter pushdown,
  // column pruning, parquet decode — end-to-end against the oracle.
  val dsv2PrunedAgg: (SparkSession, String) => DataFrame = (s, dir) => {
    import RelationalOps.dsum
    val t = LakePipelines.ordersLake(s, dir)
    s.read.format("graftlake").option("path", t.location).load()
      .createOrReplaceTempView("orders_lake_v2")
    s.sql(
      s"""SELECT o_orderstatus, o_totalprice FROM orders_lake_v2
         |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'""".stripMargin)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  // q59 — DSv2 WRITE roundtrip: orders appended through
  // df.write.format("graftlake") (distributed two-phase commit, per-row
  // month-transform rendering), read back through the snapshot scan — the
  // hash match proves v2-written data is byte-compatible lake content
  val dsv2WriteRoundtrip: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersDsv2Written(s, dir).scan()

  // q57 — the canonical status aggregate served from the SILVER tier: the
  // middle rung of the medallion speedup ladder (raw 2–5 s → silver
  // 0.5–2 s → gold 10–50 ms, BLOG:488-491; compare-query-performance.sql
  // times the same query against raw and silver). Reads the curated,
  // month-partitioned, clustered lake table instead of raw parquet.
  val silverAgg: (SparkSession, String) => DataFrame = (s, dir) => {
    import RelationalOps.{davg, dsum}
    LakePipelines.silverOrders(s, dir).scan()
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("order_count"),
        davg(col("total_amount")).as("avg_value"),
        dsum(col("total_amount")).as("total_revenue"))
  }

  // q55 — snapshots metadata table (Iceberg's `table$snapshots` idiom):
  // the commit log of the MoR lifecycle table as a queryable DataFrame —
  // seq, parent, operation, schema version. Timestamps excluded (wall
  // clock); file counts excluded (layout-tuning dependent); the operation
  // SEQUENCE is the deterministic contract.
  val lakeSnapshots: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    LakePipelines.ordersMor(s, dir).snapshots
      .map(sn => (sn.seq, sn.parent.getOrElse(-1L), sn.operation, sn.schemaVersion))
      .toDF("seq", "parent", "operation", "schema_version")
  }

  // q54 — cross-layer consistency: the SAME aggregate computed from raw
  // parquet, the materialized silver lake table, and the materialized gold
  // rollup, side by side with a layer label — the reference's implicit
  // golden test (cross-database-analytics.sql runs one query per layer and
  // the numbers must agree; SURVEY §5 "Cross-layer consistency"). A hash
  // match proves the whole medallion pipeline preserves the data.
  val crossLayerConsistency: (SparkSession, String) => DataFrame = (s, dir) => {
    import RelationalOps.dsum
    val raw = graft.Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("revenue"))
      .select(lit("1_raw").as("layer"), col("status"), col("order_count"), col("revenue"))
    val silver = LakePipelines.silverOrders(s, dir).scan()
      .groupBy(col("status"))
      .agg(count(lit(1)).as("order_count"), dsum(col("total_amount")).as("revenue"))
      .select(lit("2_silver").as("layer"), col("status"), col("order_count"), col("revenue"))
    val gold = LakePipelines.goldOrderMetrics(s, dir).scan()
      .groupBy(col("status"))
      .agg(
        sum(col("order_count")).as("order_count"),
        sum(col("gross_revenue").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .select(lit("3_gold").as("layer"), col("status"), col("order_count"), col("revenue"))
    raw.unionByName(silver).unionByName(gold)
  }

  // q52 — DESCRIBE TABLE on the schema-evolved customer table (S11;
  // reference: DESCRIBE after ALTER ADD COLUMN, BLOG:549): the evolved
  // column, schema version and snapshot seq must all be visible. The
  // oracle is the expected catalog listing spelled as literals — a
  // feature probe, not a data derivation (there is nothing to derive it
  // from; the reference checks DESCRIBE output the same way).
  val lakeDescribe: (SparkSession, String) => DataFrame = (s, dir) => {
    LakePipelines.customerEvolved(s, dir) // ensure built
    LakePipelines.catalog(s, dir).describe("customer_evolved")
  }

  // q73 — read-time TYPE PROMOTION (§1.4 auto_promote_types,
  // destination.json:74-79): qty was INT and ratio FLOAT at schema v1;
  // after ALTER to BIGINT/DOUBLE, files from BOTH eras read back through
  // the one widened schema — old INT32/FLOAT pages decode as LONG/DOUBLE,
  // new files hold values only the wide types can represent
  val lakeTypePromotion: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersPromoted(s, dir).scan()

  // q74 — PARTITION SPEC EVOLUTION (Iceberg partition evolution; at 100 TB
  // re-partitioning by rewrite is not an option, so the spec is versioned
  // like the schema and evolves metadata-only): a date+status filter
  // straddling the evolution boundary reads files laid out under BOTH
  // specs — old files prune by month only, new files by month AND status,
  // and the returned rows must be the plain SQL answer either way
  val lakeSpecEvolved: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersSpecEvolved(s, dir).scan(filters = Seq(
      PruneFilter.Ge("o_orderdate",
        java.sql.Timestamp.from(java.time.Instant.parse("1998-07-01T00:00:00Z"))),
      PruneFilter.Lt("o_orderdate",
        java.sql.Timestamp.from(java.time.Instant.parse("1999-07-01T00:00:00Z"))),
      PruneFilter.Eq("o_orderstatus", "F")))

  // q78 — DROP COLUMN (metadata-only): files from before the drop still
  // hold the column's bytes but readers project the narrowed schema by
  // name and never decode them; files from after never wrote it. Both
  // eras hash-match the two-column oracle.
  val lakeDroppedColumn: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersDropped(s, dir).scan()

  // q79 — CHANGELOG READ (table_changes / CDC-out): the net row-level
  // deltas of the MoR table's upsert+delete range as typed change rows —
  // updates/inserts read only the range's new files (O(delta)); delete
  // rows restate the pre-image via one keyed join against the base
  val lakeChanges: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersMor(s, dir).changes(1L, 3L)

  // q75 — ROLLBACK: the table after an undo of its latest append
  // (metadata-only restatement; the bad commit stays time-travelable).
  // The scan must serve exactly the pre-bad-commit content.
  val lakeRolledBack: (SparkSession, String) => DataFrame = (s, dir) =>
    LakePipelines.ordersRolledBack(s, dir).scan()

  /** The q16/q27 merged state as a DuckDB CTE (shared by q27–q29). */
  private val morMergedCte =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0
      |), batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0
      |), merged AS (
      |  SELECT b.* FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM batch u WHERE u.o_orderkey = b.o_orderkey)
      |  UNION ALL SELECT * FROM batch
      |)""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q23_lake_roundtrip", lakeRoundtrip, bench = true, oracle = Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q24_lake_pruned_scan", lakePrunedScan, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
        |GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q25_lake_time_travel", lakeTimeTravel, oracle = Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q26_lake_schema_evolution", lakeSchemaEvolution, oracle = Some(
      """SELECT c_custkey, c_name, c_acctbal,
        |  CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment ELSE NULL END AS loyalty_tier
        |FROM customer ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q27_lake_upsert_mor", lakeUpsertMor, bench = true, oracle = Some(
      morMergedCte + "\nSELECT * FROM merged ORDER BY ALL NULLS FIRST")),
    NamedQuery("q28_lake_delete_mor", lakeDeleteMor, oracle = Some(
      morMergedCte + "\nSELECT * FROM merged WHERE o_orderkey % 5 <> 0 ORDER BY ALL NULLS FIRST")),
    NamedQuery("q29_lake_compacted", lakeCompacted, oracle = Some(
      morMergedCte + "\nSELECT * FROM merged WHERE o_orderkey % 5 <> 0 ORDER BY ALL NULLS FIRST")),
    NamedQuery("q83_partition_meta_rollup", partitionMetaRollup, bench = true, oracle = Some(
      morMergedCte +
        """
          |SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
          |FROM merged WHERE o_orderkey % 5 <> 0
          |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q84_monthly_meta_rollup", monthlyMetaRollup, bench = true, oracle = Some(
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_month,
        |  COUNT(*) AS n_orders,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q109_curated_meta_serve", curatedMetaServe, bench = true, oracle = Some(
      """WITH k AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tok,
        |    MIN(doc_id) OVER (PARTITION BY md5(array_to_string(
        |      list_sort(list_distinct(string_split(text, ' '))), ' '))) AS keeper,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT % 100
        |      AS BIGINT) AS bucket
        |  FROM documents
        |), f AS (
        |  SELECT lang, CAST(len(tok) AS BIGINT) AS n_tokens
        |  FROM k
        |  WHERE doc_id = keeper AND bucket < 80
        |    AND len(tok) >= 20
        |    AND CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) > 0.3
        |    AND CAST(len(list_filter(tok,
        |      w -> w IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE)
        |      / len(tok) < 0.2
        |)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM f GROUP BY lang ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q86_metadata_sum_rollup", metadataSumRollup, bench = true, oracle = Some(
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_cents,
        |  COUNT(o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderstatus) AS n_status
        |FROM orders GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q85_filtered_meta_rollup", filteredMetaRollup, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q87_decimal_filter_pushdown", decimalFilterPushdown, bench = true, oracle = Some(
      """WITH dec AS (
        |  SELECT o_orderkey AS order_id, o_custkey AS user_id, o_orderstatus AS status,
        |    o_orderdate AS order_date,
        |    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 0.01 AS DECIMAL(12,2)) AS total_amount
        |  FROM orders
        |)
        |SELECT order_id, user_id, status, order_date,
        |  CAST(total_amount AS DOUBLE) AS total_amount
        |FROM dec WHERE total_amount > 300000.00
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q90_decimal_meta_rollup", decimalMetaRollup, bench = true, oracle = Some(
      """WITH dec AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 0.01 AS DECIMAL(12,2)) AS total_amount
        |  FROM orders
        |)
        |SELECT status, COUNT(*) AS n_orders,
        |  CAST(MIN(total_amount) AS DOUBLE) AS min_amount,
        |  CAST(MAX(total_amount) AS DOUBLE) AS max_amount,
        |  CAST(CAST(SUM(total_amount) AS DECIMAL(22,2)) AS DOUBLE) AS revenue
        |FROM dec GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q88_decimal_gold_serve", decimalGoldServe, bench = true, oracle = Some(
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_month,
        |  o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 0.01 AS DECIMAL(12,2)))
        |    AS DECIMAL(22,2)) AS DOUBLE) AS gross_revenue
        |FROM orders GROUP BY 1, 2, 3 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q89_decimal_cross_layer", decimalCrossLayer, oracle = Some(
      """WITH agg AS (
        |  SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |    CAST(CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 0.01 AS DECIMAL(12,2)))
        |      AS DECIMAL(22,2)) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT '1_raw' AS layer, * FROM agg
        |  UNION ALL SELECT '2_silver', * FROM agg
        |  UNION ALL SELECT '3_gold', * FROM agg
        |) ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q30_silver_serve", silverServe, oracle = Some(
      """SELECT o_orderkey AS order_id, o_custkey AS user_id, o_orderstatus AS status,
        |  CAST(o_orderdate AS DATE) AS order_month, o_orderdate AS order_date,
        |  o_totalprice AS total_amount
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q31_gold_serve", goldServe, bench = true, oracle = Some(
      """SELECT CAST(o_orderdate AS DATE) AS order_month, o_orderstatus AS status,
        |  COUNT(DISTINCT o_custkey) AS user_count, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |FROM orders GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q32_gold_reagg_serve", goldReaggServe, bench = true, oracle = Some(
      """WITH gold AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_month, o_orderstatus AS status,
        |    COUNT(DISTINCT o_custkey) AS user_count, COUNT(*) AS order_count,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT status, CAST(SUM(order_count) AS BIGINT) AS total_orders,
        |  CAST(SUM(CAST(gross_revenue AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(user_count) AS BIGINT) AS total_user_count,
        |  CAST(SUM(CAST(FLOOR(avg_order_value * 1e6) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1e6) AS avg_avg_order_value
        |FROM gold GROUP BY status ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q33_cdc_ingested", cdcIngested, bench = true, oracle = Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 7 <> 0
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q34_cdc_bootstrap", cdcBootstrap, oracle = Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q64_cdc_customer", cdcCustomer, oracle = Some(
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'SYNTHETIC' ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 7 <> 0
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q66_streamed_silver", streamedSilver, oracle = Some(
      """SELECT o_orderkey AS order_id, o_custkey AS user_id, o_orderstatus AS status,
        |  CAST(o_orderdate AS DATE) AS order_month, o_orderdate AS order_date,
        |  o_totalprice AS total_amount
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q82_changelog_replica", changelogReplica, bench = true, oracle = Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 3 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 10 <> 7
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q65_cdc_events", cdcEvents, oracle = Some(
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 3 = 0 THEN 'U' ELSE event_type END AS event_type,
        |  CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END AS value
        |FROM events WHERE event_id % 7 <> 0
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q52_lake_describe", lakeDescribe, oracle = Some(
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'bigint', 'YES'),
        |  ('c_name', 'string', 'YES'),
        |  ('c_acctbal', 'double', 'YES'),
        |  ('loyalty_tier', 'string', 'YES'),
        |  ('# clustering', '', ''),
        |  ('# primary key', 'c_custkey', ''),
        |  ('# current snapshot', '3', ''),
        |  ('# schema version', '2', '')
        |) AS t(col_name, data_type, nullable)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q59_dsv2_write_roundtrip", dsv2WriteRoundtrip, oracle = Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q58_dsv2_pruned_agg", dsv2PrunedAgg, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
        |GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q57_silver_agg", silverAgg, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q55_lake_snapshots", lakeSnapshots, oracle = Some(
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(-1 AS BIGINT), 'create',  1),
        |  (CAST(1 AS BIGINT), CAST(0 AS BIGINT),  'append',  1),
        |  (CAST(2 AS BIGINT), CAST(1 AS BIGINT),  'upsert',  1),
        |  (CAST(3 AS BIGINT), CAST(2 AS BIGINT),  'delete',  1),
        |  (CAST(4 AS BIGINT), CAST(3 AS BIGINT),  'compact', 1)
        |) AS t(seq, parent, operation, schema_version)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q73_type_promotion", lakeTypePromotion, oracle = Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_orderkey % 1000 AS BIGINT)
        |       ELSE o_orderkey % 1000 + 5000000000 END AS qty,
        |  CASE WHEN o_orderkey % 2 = 1 THEN CAST(CAST(o_orderkey % 7 AS REAL) AS DOUBLE)
        |       ELSE CAST(o_orderkey % 7 AS DOUBLE) + 0.5 END AS ratio
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q74_partition_spec_evolution", lakeSpecEvolved, bench = true, oracle = Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-07-01 00:00:00'
        |  AND o_orderstatus = 'F'
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q78_drop_column", lakeDroppedColumn, oracle = Some(
      """SELECT o_orderkey, o_totalprice
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q79_table_changes", lakeChanges, bench = true, oracle = Some(
      """WITH changes AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice,
        |    CASE WHEN o_orderkey % 4 <> 0 THEN 'update' ELSE 'insert' END AS _change_type
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete'
        |  FROM orders WHERE o_orderkey % 4 <> 0 AND o_orderkey % 5 = 0
        |)
        |SELECT * FROM changes ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q75_rollback", lakeRolledBack, oracle = Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q54_cross_layer_consistency", crossLayerConsistency, oracle = Some(
      """WITH agg AS (
        |  SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT '1_raw' AS layer, * FROM agg
        |  UNION ALL SELECT '2_silver', * FROM agg
        |  UNION ALL SELECT '3_gold', * FROM agg
        |) ORDER BY ALL NULLS FIRST""".stripMargin)),
  )
}
