package graft.operators

import graft.{NamedQuery, Tables}
import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PURE-SQL catalog surface (S12 closed): the reference drives its
  * whole pipeline through SQL DDL/DML against a catalog — `CREATE TABLE …
  * ENGINE=Iceberg`, `INSERT INTO silver SELECT …`, `DESCRIBE`, snapshot-
  * pinned reads (`scripts/iceberg-setup.sql:5-12,47-90`;
  * `BLOG_POST_COMPLETE_WALKTHROUGH.md:521-549`). These queries rebuild the
  * silver/gold medallion tiers using `spark.sql` ONLY — CREATE TABLE with
  * partition transforms + table properties, INSERT INTO … SELECT, then
  * serve — through [[graft.sources.GraftCatalog]], and hash-match the same
  * oracles as the Scala-API-built q30/q31/q25 counterparts: proof the SQL
  * route produces byte-identical lake content.
  */
object SqlCatalogOps {

  /** Register the `graft` catalog over this scale factor's warehouse
    * (idempotent; the warehouse conf is read per-operation, see
    * [[graft.sources.GraftCatalog]]). */
  private def registerCatalog(s: SparkSession, dir: String): Unit = {
    val cls = classOf[graft.sources.GraftCatalog].getName
    val wh = LakePipelines.warehouse(dir)
    // no-op when already registered: a serve-path query calls this per
    // invocation and a redundant conf.set is pure overhead
    if (!s.conf.getOption("spark.sql.catalog.graft").contains(cls))
      s.conf.set("spark.sql.catalog.graft", cls)
    if (!s.conf.getOption("spark.graft.catalog.warehouse").contains(wh))
      s.conf.set("spark.graft.catalog.warehouse", wh)
  }

  /** Silver tier built with spark.sql ONLY (CREATE + INSERT INTO SELECT) —
    * same content contract as [[LakePipelines.silverOrders]]. */
  def silverOrdersSql(s: SparkSession, dir: String): LakeTable =
    LakePipelines.cached(s, dir, "silver_orders_sql") { cat =>
      registerCatalog(s, dir)
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_raw")
      s.sql(
        """CREATE TABLE graft.silver_orders_sql (
          |  order_id BIGINT, user_id BIGINT, status STRING,
          |  order_month DATE, order_date TIMESTAMP_NTZ, total_amount DOUBLE)
          |PARTITIONED BY (months(order_date))
          |TBLPROPERTIES ('cluster_by'='order_id', 'primary_key'='order_id')""".stripMargin)
      s.sql(
        """INSERT INTO graft.silver_orders_sql
          |SELECT o_orderkey, o_custkey, o_orderstatus,
          |       to_date(o_orderdate), o_orderdate, o_totalprice
          |FROM graft_orders_raw""".stripMargin)
      cat.table("silver_orders_sql")
    }

  /** Gold tier built with spark.sql ONLY — same aggregate contract as
    * [[RelationalOps.goldRollup]] (exact-decimal sums cast to double once,
    * unrounded IEEE quotient for the average). */
  def goldMetricsSql(s: SparkSession, dir: String): LakeTable =
    LakePipelines.cached(s, dir, "gold_order_metrics_sql") { cat =>
      registerCatalog(s, dir)
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_raw")
      s.sql(
        """CREATE TABLE graft.gold_order_metrics_sql (
          |  order_month DATE, status STRING, user_count BIGINT, order_count BIGINT,
          |  gross_revenue DOUBLE, avg_order_value DOUBLE)
          |TBLPROPERTIES ('cluster_by'='order_month,status')""".stripMargin)
      s.sql(
        """INSERT INTO graft.gold_order_metrics_sql
          |SELECT to_date(o_orderdate) AS order_month, o_orderstatus AS status,
          |  COUNT(DISTINCT o_custkey) AS user_count, COUNT(*) AS order_count,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
          |FROM graft_orders_raw
          |GROUP BY 1, 2""".stripMargin)
      cat.table("gold_order_metrics_sql")
    }

  /** Orders replicated via SQL, then thinned with SQL `DELETE FROM` — the
    * delete commits as merge-on-read key files, never a rewrite. */
  def ordersSqlDeleted(s: SparkSession, dir: String): LakeTable =
    LakePipelines.cached(s, dir, "orders_sqldel") { cat =>
      registerCatalog(s, dir)
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_raw")
      s.sql(
        """CREATE TABLE graft.orders_sqldel (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          |TBLPROPERTIES ('primary_key'='o_orderkey')""".stripMargin)
      s.sql(
        """INSERT INTO graft.orders_sqldel
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft_orders_raw""".stripMargin)
      s.sql("DELETE FROM graft.orders_sqldel WHERE o_orderstatus = 'F' OR o_orderkey < 100")
      val t = cat.table("orders_sqldel")
      require(t.currentSnapshot.deleteFiles.nonEmpty, "SQL DELETE was not merge-on-read")
      t
    }

  // q67 — SQL DELETE FROM end state: the thinned table hash-matches the
  // complement predicate over the raw fixture
  val sqlDeleteServe: (SparkSession, String) => DataFrame = (s, dir) => {
    ordersSqlDeleted(s, dir)
    registerCatalog(s, dir)
    s.sql("SELECT * FROM graft.orders_sqldel")
  }

  /** Orders replicated via SQL across TWO commits (≥2 data files), then
    * restated with SQL `UPDATE` under the reference's declared
    * `write.update.mode = merge-on-read` (destination.json:89-91): matched
    * rows land as new data files + delete-key sidecars; NO pre-existing
    * data file is rewritten — at 100 TB a sparse UPDATE costs O(changed
    * rows), not O(files holding them). The builder asserts exactly that. */
  def ordersSqlUpdatedMor(s: SparkSession, dir: String): LakeTable =
    LakePipelines.cached(s, dir, "orders_sqlupd") { cat =>
      registerCatalog(s, dir)
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_raw")
      s.sql(
        """CREATE TABLE graft.orders_sqlupd (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          |TBLPROPERTIES ('primary_key'='o_orderkey')""".stripMargin)
      s.sql(
        """INSERT INTO graft.orders_sqlupd
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft_orders_raw
          |WHERE o_orderkey % 2 = 0""".stripMargin)
      s.sql(
        """INSERT INTO graft.orders_sqlupd
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft_orders_raw
          |WHERE o_orderkey % 2 = 1""".stripMargin)
      val before = cat.table("orders_sqlupd").currentSnapshot.dataFiles
      s.sql(
        """UPDATE graft.orders_sqlupd
          |SET o_totalprice = o_totalprice + 100.0, o_orderstatus = 'U'
          |WHERE o_orderkey % 7 = 0""".stripMargin)
      val t = cat.table("orders_sqlupd")
      val snap = t.currentSnapshot
      require(snap.operation == "update-mor",
        s"SQL UPDATE was not merge-on-read: ${snap.operation}")
      require(snap.deleteFiles.nonEmpty, "MoR UPDATE committed no delete sidecar")
      val carried = snap.dataFiles.filter(f => before.contains(f))
      require(carried.size == before.size,
        s"MoR UPDATE rewrote pre-existing data files: ${before.size - carried.size}")
      t
    }

  // q80 — SQL UPDATE under merge-on-read: end state hash-matches the
  // restated fixture; the builder proves no data file was rewritten
  val sqlUpdateMorServe: (SparkSession, String) => DataFrame = (s, dir) => {
    ordersSqlUpdatedMor(s, dir)
    registerCatalog(s, dir)
    s.sql("SELECT * FROM graft.orders_sqlupd")
  }

  /** MERGE INTO under merge-on-read: matched rows delete+re-insert as
    * deltas, unmatched source rows append — one snapshot, no rewrite. */
  def ordersSqlMergedMor(s: SparkSession, dir: String): LakeTable =
    LakePipelines.cached(s, dir, "orders_sqlmrg") { cat =>
      registerCatalog(s, dir)
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_raw")
      s.sql(
        """CREATE TABLE graft.orders_sqlmrg (
          |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
          |TBLPROPERTIES ('primary_key'='o_orderkey')""".stripMargin)
      s.sql(
        """INSERT INTO graft.orders_sqlmrg
          |SELECT o_orderkey, o_orderstatus, o_totalprice FROM graft_orders_raw""".stripMargin)
      val before = cat.table("orders_sqlmrg").currentSnapshot.dataFiles
      s.sql(
        """CREATE OR REPLACE TEMPORARY VIEW orders_sqlmrg_src AS
          |SELECT o_orderkey, 'M' AS s, o_totalprice * 2 AS p
          |FROM graft_orders_raw WHERE o_orderkey % 5 = 0
          |UNION ALL
          |SELECT o_orderkey + 30000000, 'N', CAST(1.0 AS DOUBLE)
          |FROM graft_orders_raw WHERE o_orderkey % 11 = 0""".stripMargin)
      s.sql(
        """MERGE INTO graft.orders_sqlmrg t USING orders_sqlmrg_src c
          |ON t.o_orderkey = c.o_orderkey
          |WHEN MATCHED THEN UPDATE SET t.o_orderstatus = c.s, t.o_totalprice = c.p
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
          |  VALUES (c.o_orderkey, c.s, c.p)""".stripMargin)
      val t = cat.table("orders_sqlmrg")
      val snap = t.currentSnapshot
      require(snap.operation == "merge-mor",
        s"SQL MERGE was not merge-on-read: ${snap.operation}")
      require(snap.deleteFiles.nonEmpty, "MoR MERGE committed no delete sidecar")
      require(snap.dataFiles.filter(f => before.contains(f)).size == before.size,
        "MoR MERGE rewrote pre-existing data files")
      t
    }

  // q81 — MERGE INTO under merge-on-read: matched rows restated, unmatched
  // inserted; hash-matches the equivalent relational restatement
  val sqlMergeMorServe: (SparkSession, String) => DataFrame = (s, dir) => {
    ordersSqlMergedMor(s, dir)
    registerCatalog(s, dir)
    s.sql("SELECT * FROM graft.orders_sqlmrg")
  }

  // q60 — silver tier CREATEd, LOADed and SELECTed through SQL alone;
  // hash-matches q30's oracle (the Scala-API-built silver table)
  val sqlSilverServe: (SparkSession, String) => DataFrame = (s, dir) => {
    silverOrdersSql(s, dir)
    registerCatalog(s, dir)
    s.sql("SELECT * FROM graft.silver_orders_sql")
  }

  // q61 — gold tier through SQL alone; hash-matches q31's oracle
  val sqlGoldServe: (SparkSession, String) => DataFrame = (s, dir) => {
    goldMetricsSql(s, dir)
    registerCatalog(s, dir)
    s.sql("SELECT * FROM graft.gold_order_metrics_sql")
  }

  // q62 — SQL time travel: `VERSION AS OF <first append>` on the lake
  // orders table; hash-matches q25's oracle (the imperative asOf scan)
  val sqlTimeTravel: (SparkSession, String) => DataFrame = (s, dir) => {
    LakePipelines.ordersLake(s, dir) // ensure built in this warehouse
    registerCatalog(s, dir)
    s.sql(s"SELECT * FROM graft.orders_lake VERSION AS OF ${LakePipelines.OrdersFirstAppendSeq}")
  }

  // q63 — SQL DESCRIBE TABLE on the schema-evolved table: the evolved
  // column must be visible through the catalog route (section rows —
  // partitioning etc. — are filtered; they are covered by SqlCatalogSpec)
  val sqlDescribe: (SparkSession, String) => DataFrame = (s, dir) => {
    LakePipelines.customerEvolved(s, dir)
    registerCatalog(s, dir)
    s.sql("DESCRIBE TABLE graft.customer_evolved")
      .select(col("col_name"), col("data_type"))
      .filter(!col("col_name").startsWith("#") &&
        col("col_name") =!= "" && !col("col_name").startsWith("Part "))
  }

  // q76 — METADATA TABLE through SQL: `graft.`t$snapshots`` serves the
  // commit log of the MoR lifecycle table from snapshot metadata alone
  // (zero tasks, zero data I/O — the Iceberg `table$snapshots` idiom).
  // Deterministic columns only: wall-clock timestamps and layout-dependent
  // file counts/bytes are excluded; delete_files IS deterministic here
  // (upsert adds 1, delete adds 1 more, compact folds to 0).
  val sqlSnapshotsMeta: (SparkSession, String) => DataFrame = (s, dir) => {
    LakePipelines.ordersMor(s, dir) // ensure built in this warehouse
    registerCatalog(s, dir)
    s.sql(
      """SELECT seq, parent, operation, schema_version, spec_version, delete_files
        |FROM graft.`orders_mor$snapshots`""".stripMargin)
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q76_sql_snapshots_meta", sqlSnapshotsMeta, oracle = Some(
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(-1 AS BIGINT), 'create',  1, 0, 0),
        |  (CAST(1 AS BIGINT), CAST(0 AS BIGINT),  'append',  1, 0, 0),
        |  (CAST(2 AS BIGINT), CAST(1 AS BIGINT),  'upsert',  1, 0, 1),
        |  (CAST(3 AS BIGINT), CAST(2 AS BIGINT),  'delete',  1, 0, 2),
        |  (CAST(4 AS BIGINT), CAST(3 AS BIGINT),  'compact', 1, 0, 0)
        |) AS t(seq, parent, operation, schema_version, spec_version, delete_files)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q60_sql_silver_serve", sqlSilverServe, oracle = Some(
      """SELECT o_orderkey AS order_id, o_custkey AS user_id, o_orderstatus AS status,
        |  CAST(o_orderdate AS DATE) AS order_month, o_orderdate AS order_date,
        |  o_totalprice AS total_amount
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q61_sql_gold_serve", sqlGoldServe, bench = true, oracle = Some(
      """SELECT CAST(o_orderdate AS DATE) AS order_month, o_orderstatus AS status,
        |  COUNT(DISTINCT o_custkey) AS user_count, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |FROM orders GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q62_sql_time_travel", sqlTimeTravel, oracle = Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q67_sql_delete", sqlDeleteServe, oracle = Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE NOT (o_orderstatus = 'F' OR o_orderkey < 100)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q80_sql_update_mor", sqlUpdateMorServe, bench = true, oracle = Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END
        |    AS o_totalprice
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q81_sql_merge_mor", sqlMergeMorServe, bench = true, oracle = Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END
        |    AS o_totalprice
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 30000000, 'N', CAST(1.0 AS DOUBLE) FROM orders
        |WHERE o_orderkey % 11 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q63_sql_describe", sqlDescribe, oracle = Some(
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'bigint'),
        |  ('c_name', 'string'),
        |  ('c_acctbal', 'double'),
        |  ('loyalty_tier', 'string')
        |) AS t(col_name, data_type)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
  )
}
