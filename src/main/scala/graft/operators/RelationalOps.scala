package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The reference's relational query surface (SURVEY.md §2.2–2.8), rebuilt as
  * declarative DataFrame plans so Catalyst does pushdown / pruning / join
  * selection. Reference operators covered per query are cited inline as
  * SURVEY §2 operator ids (P*, J*, A*, O*, U*) with the underlying reference
  * file:line given in SURVEY.md.
  */
object RelationalOps {

  /** Exact-decimal accumulation of a double column: deterministic across
    * engines and partitionings (decimal addition is associative), converted
    * back to double once at the end. */
  private[operators] def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** exact-sum / count as a raw double quotient — the reference's AVG shape
    * (A2/A7) made engine-deterministic. Spark's ROUND on doubles goes
    * through the shortest decimal string repr (BigDecimal.valueOf) while
    * DuckDB rounds the binary value, so rounded doubles are NOT
    * hash-stable across engines; an unrounded IEEE quotient of
    * deterministic operands is. */
  private[operators] def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------------
  // q1 — canonical orders-by-status aggregate (A1/A2/A3, O1;
  // reference cross-database-analytics.sql:5-13 / performance-with-timing.sh:10)
  val ordersByStatus: (SparkSession, String) => DataFrame = (s, dir) => {
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        davg(col("o_totalprice")).as("avg_value"),
        dsum(col("o_totalprice")).as("total_revenue"))
      .orderBy(col("order_count").desc, col("status"))
  }

  // q2 — monthly trends: toYYYYMM bucket × status (A8, O2;
  // reference compare-query-performance.sql:52-61)
  val monthlyTrends: (SparkSession, String) => DataFrame = (s, dir) => {
    t(s, dir, "orders")
      .groupBy(
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("int").as("order_month"),
        col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("order_month").desc, col("status"))
  }

  // q3 — high-value order analysis: conjunction of predicates incl.
  // IN-list and interval arithmetic against max(date) (P3/P4/P5/P6, A5;
  // reference compare-query-performance.sql:91-102)
  val highValueOrders: (SparkSession, String) => DataFrame = (s, dir) => {
    val o = t(s, dir, "orders")
    val cutoff = o.agg(
      (max(col("o_orderdate")) - expr("INTERVAL '12' MONTH")).as("cut"))
    o.join(broadcast(cutoff))
      .filter(
        col("o_totalprice") > 1000 &&
        col("o_orderstatus").isin("O", "F") &&
        col("o_orderdate") >= col("cut"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        max(col("o_totalprice")).as("max_value"),
        davg(col("o_totalprice")).as("avg_value"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("status"))
  }

  // q4 — exact distinct customers per status + null-guarded ratio
  // (A6 uniqExact, A7 NULLIF; reference compare-query-performance.sql:122-131)
  val distinctCustomers: (SparkSession, String) => DataFrame = (s, dir) => {
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        countDistinct(col("o_custkey")).as("customer_count"),
        count(lit(1)).as("order_count"),
        (count(lit(1)).cast("double") /
          nullif(countDistinct(col("o_custkey")), lit(0L)))
          .as("orders_per_customer"))
      .orderBy(col("status"))
  }

  // q5 — 3-table inner equi-join order detail report (J1;
  // reference mysql-init/01-setup.sql:308-320). Dimension sides broadcast.
  // Unordered on purpose: a total sort of the full fact output is a
  // range-partition shuffle of every row at scale; Verify's sink owns the
  // canonical order.
  val orderDetailsJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        o("o_orderkey").as("order_id"),
        c("c_name").as("customer_name"),
        n("n_name").as("nation_name"),
        o("o_orderstatus").as("status"),
        o("o_totalprice").as("total_amount"))
  }

  // q6 — lineitem pricing summary (TPC-H Q1 shape: grouped sums of derived
  // per-row arithmetic; A1/A3 over P2-style derivations).
  // All arithmetic in exact INTEGER units: the source doubles carry <= 2
  // decimal digits, so cents/percent quantization is exact, every per-row
  // product and group sum stays a long (max ~6e16 < 2^63), and the single
  // final int->double cast + division is identical in both engines. (The
  // r1 decimal formulation was equally exact but its precision-38
  // intermediate sums run on heap BigDecimals — the integer form keeps the
  // whole aggregation in primitive longs inside codegen.)
  val lineitemPricing: (SparkSession, String) => DataFrame = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val priceC = cents(col("l_extendedprice"))          // 1e-2 dollars
    val discP  = cents(col("l_discount"))               // 1e-4 fraction units
    val taxP   = cents(col("l_tax"))
    val discPriceU  = priceC * (lit(100L) - discP)      // 1e-4 dollars
    val chargeU     = discPriceU * (lit(100L) + taxP)   // 1e-6 dollars
    l.filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        (sum(priceC).cast("double") / 100.0).as("sum_base_price"),
        (sum(discPriceU).cast("double") / 1e4).as("sum_disc_price"),
        (sum(chargeU).cast("double") / 1e6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // q7 — 4-way UNION ALL row-count reconciliation (U1, A10;
  // reference generate-more-data.sql:190-196 / inspect-mysql-data.sh:10-16)
  val tableCountsUnion: (SparkSession, String) => DataFrame = (s, dir) => {
    def one(n: String): DataFrame =
      t(s, dir, n).agg(count(lit(1)).as("row_count"))
        .select(lit(n).as("table_name"), col("row_count"))
    one("orders").unionByName(one("lineitem"))
      .unionByName(one("customer")).unionByName(one("part"))
      .orderBy(col("table_name"))
  }

  // q8 — DISTINCT verification (O5; reference BLOG:355)
  val distinctStatus: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders").select(col("o_orderstatus").as("status"))
      .distinct().orderBy(col("status"))

  // q9 — top-k by sort+limit with deterministic tiebreak (O4/O3)
  val topParts: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey")).limit(10)

  // q10 — scalar-function surface: CONCAT, ELT, IF, NULLIF, COALESCE,
  // FLOOR, ROUND (SURVEY §2.8) over nation
  val scalarFunctions: (SparkSession, String) => DataFrame = (s, dir) => {
    val picks = array(Seq("alpha", "beta", "gamma", "delta", "epsilon").map(lit): _*)
    t(s, dir, "nation").select(
      col("n_nationkey"),
      col("n_name"),
      concat(col("n_name"), lit("#"), col("n_regionkey").cast("string")).as("tag"),
      element_at(picks, col("n_regionkey") + 1).as("pick"),
      when(col("n_regionkey") === 0, "zero").otherwise("nonzero").as("flag"),
      coalesce(nullif(col("n_regionkey"), lit(0)), lit(-1)).as("nz"),
      floor(col("n_nationkey") / 3.0).as("bucket3"),
      round(col("n_nationkey").cast("double") * 1.5, 1).as("scaled"))
      .orderBy(col("n_nationkey"))
  }

  // q11 — point lookup by PK (P8; reference 01-setup.sql:219)
  val pointLookup: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "part").filter(col("p_partkey") === 42)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))

  // q12 — cross-join number synthesis (J2/U2; reference 01-setup.sql:148-160)
  val numbersCrossJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val d = s.range(0, 10).toDF("d")
    d.as("a").crossJoin(d.as("b"))
      .select((col("a.d") * 10 + col("b.d")).as("n"))
      .orderBy(col("n"))
  }

  // q13 — anti-join: customers with no pending ('P') orders
  // (J4 upsert shape / NOT EXISTS; status filter keeps the result non-trivial)
  val customersWithoutOrders: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  // q14 — semi-join: customers having orders (EXISTS)
  val customersWithOrders: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  // q15 — left outer join + COALESCE of missing aggregates
  val customerOrderCounts: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer")
    val agg = t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("rev"))
    c.join(agg, c("c_custkey") === agg("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("cnt"), lit(0L)).as("order_count"),
        coalesce(col("rev"), lit(0.0)).as("revenue"))
  }

  // q16 — batch PK upsert: last-writer-wins merge = anti-join + union
  // (J4/S5; reference destination.json write_mode: upsert, BLOG:284-289)
  val upsertMerge: (SparkSession, String) => DataFrame = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base  = o.filter(col("o_orderkey") % 4 =!= 0)
    val batch = o.filter(col("o_orderkey") % 2 === 0)
      .select(
        col("o_orderkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    base.join(batch, Seq("o_orderkey"), "left_anti")
      .unionByName(batch)
  }

  // q17 — event-time hourly bucketing over the events stream table
  // (date_trunc + grouped agg; streaming-shaped batch query)
  val eventsHourly: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy(col("hour_bucket"), col("event_type"))

  // q18 — window function: top event per user by value
  // (row_number — the upsert-dedupe idiom of SURVEY §2.5)
  val topEventPerUser: (SparkSession, String) => DataFrame = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  // q19 — gold rollup build: day × status KPIs with exact distinct users
  // (A6/A8; reference scripts/iceberg-setup.sql:92-101)
  val goldRollup: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(
        to_date(col("o_orderdate")).as("order_month"),
        col("o_orderstatus").as("status"))
      .agg(
        countDistinct(col("o_custkey")).as("user_count"),
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("gross_revenue"),
        davg(col("o_totalprice")).as("avg_order_value"))
      .orderBy(col("order_month").desc, col("status"))

  // q20 — re-aggregation of the pre-aggregate, reproducing the reference's
  // as-written semantics: SUM(user_count) over-counts repeat users and the
  // avg-of-avgs is unweighted (A9; reference compare:143-151).
  // The unweighted avg over per-group double quotients is made
  // engine-deterministic by floor-quantizing each quotient to integer
  // micro-units (floor acts on the raw binary double identically in both
  // engines) and summing exactly as longs.
  val goldReagg: (SparkSession, String) => DataFrame = (s, dir) =>
    goldReaggFrom(goldRollup(s, dir))

  /** A9 re-aggregation over any gold-shaped input — shared by the
    * recompute path (q20) and the materialized-gold serving path (q32). */
  def goldReaggFrom(gold: DataFrame): DataFrame = {
    val quantized = floor(col("avg_order_value") * 1e6).cast("long")
    gold.groupBy(col("status"))
      .agg(
        sum(col("order_count")).as("total_orders"),
        sum(col("gross_revenue").cast(DecimalType(18, 2))).cast("double")
          .as("total_revenue"),
        sum(col("user_count")).as("total_user_count"),
        (sum(quantized).cast("double") / (count(lit(1)) * 1e6))
          .as("avg_avg_order_value"))
      .orderBy(col("status"))
  }

  // q21 — silver projection: select/rename/derive curated columns
  // (P1/P2; reference scripts/iceberg-setup.sql:66-75)
  val silverProjection: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("user_id"),
      col("o_orderstatus").as("status"),
      to_date(col("o_orderdate")).as("order_month"),
      col("o_orderdate").as("order_date"),
      col("o_totalprice").as("total_amount"))

  // q22 — date/time function surface: to_date, year/month/day, interval
  // subtraction, unix epoch (SURVEY §2.8 date rows)
  val dateFunctions: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).as("od"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      to_date(col("o_orderdate") - expr("INTERVAL '30' DAY")).as("od_minus30"),
      unix_timestamp(col("o_orderdate")).as("unix_sec"))

  /** Exact integer-cents accumulation: ROUND(x*100) is safe because the
    * source doubles carry <= 2 decimal digits, so x*100 sits within one
    * ulp of an integer in both engines. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Half-up ROUND(sum/n, 2) computed entirely on exact integers:
    * round_half_up(s/n) = floor((2s+n)/(2n)); the single double division
    * runs on identical exact-integer operands in both engines, so the
    * result is hash-stable — this restores the reference's rounded
    * output shape (ROUND(AVG(x),2), A2/A7) that round 1 had dropped. */
  private def roundedRatio(sumC: Column, n: Column): Column =
    floor((sumC * 2 + n).cast("double") / (n.cast("double") * 2)) / 100.0

  // q45 — the reference's rounded aggregate surface (A2 ROUND(AVG(x),2),
  // A7 ROUND(count/NULLIF(uniq,0),2); cross-database-analytics.sql:8,
  // compare:127) with exact-cents arithmetic for cross-engine parity
  val roundedMetrics: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("order_count"),
        roundedRatio(sum(cents(col("o_totalprice"))), count(lit(1)))
          .as("avg_value_r2"),
        roundedRatio(count(lit(1)) * 100, nullif(countDistinct(col("o_custkey")), lit(0L)))
          .as("orders_per_customer_r2"))

  // q46 — A9 as written by the reference: ROUND(AVG(avg_order_value),2)
  // over the gold rollup (compare-query-performance.sql:147) — the
  // unweighted avg-of-avgs, rounded. Per-group quotients are quantized to
  // exact micro-units, so the final half-up rounding runs on exact ints.
  val roundedGoldReagg: (SparkSession, String) => DataFrame = (s, dir) => {
    val gold = goldRollup(s, dir)
    val micro = floor(col("avg_order_value") * 1e6).cast("long")
    gold.groupBy(col("status"))
      .agg(
        sum(col("order_count")).as("total_orders"),
        (floor((sum(micro) * 2 + count(lit(1)) * 10000L).cast("double") /
          (count(lit(1)).cast("double") * 20000L)) / 100.0)
          .as("avg_avg_order_value_r2"))
  }

  // q47 — timestamp extrema per status (A4 MIN/MAX over timestamps;
  // cross-database-analytics.sql:9-10 first_order/most_recent_order)
  val orderDateRange: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("most_recent_order"),
        count(lit(1)).as("order_count"))

  // q48 — UNION distinct of two sources (U2; the reference's digit-table
  // constructor SELECT .. UNION SELECT .., 01-setup.sql:151-158)
  val unionDistinct: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders").select(col("o_orderstatus").as("flag"))
      .union(t(s, dir, "lineitem").select(col("l_returnflag").as("flag")))
      .distinct()

  // q49 — seeded random sample (O4 ORDER BY RAND() LIMIT n,
  // 01-setup.sql:210-212): deterministic per seed within Spark; no SQL
  // oracle (engines disagree on rand streams) — registered rows-only,
  // determinism spec-tested
  val SampleSeed = 42L
  val seededSample: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(rand(SampleSeed), col("p_partkey"))
      .limit(20)

  // q56 — approximate distinct count (HLL sketch): the documented 100 TB
  // fallback for A6 (SURVEY §2.1 notes the reference deliberately uses
  // EXACT uniqExact — so correctness tests use countDistinct — while
  // approx_count_distinct is the scale-out path when a 2% error is worth
  // removing the exact-distinct shuffle). Registered rows-only: HLL
  // sketches differ across engines; the accuracy bound is spec-tested.
  val approxDistinct: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"),
        count(lit(1)).as("order_count"))

  // q53 — NOW()/today() surface (F-now; reference 01-setup.sql:147,
  // compare:58): current_date/current_timestamp-derived columns.
  // Registered rows-only: wall-clock values cannot hash-match an oracle
  // that runs at a different instant.
  val nowFunctions: (SparkSession, String) => DataFrame = (s, dir) =>
    t(s, dir, "orders")
      .agg(max(col("o_orderdate")).as("latest_order"))
      .select(
        col("latest_order"),
        current_date().as("today"),
        current_timestamp().as("now"),
        datediff(current_date(), col("latest_order")).as("days_since_last_order"))
      .filter(col("days_since_last_order") > 0)

  // ---------------------------------------------------------------------

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q1_orders_by_status", ordersByStatus, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q2_monthly_trends", monthlyTrends, bench = true, oracle = Some(
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS order_month,
        |  o_orderstatus AS status, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q3_high_value_orders", highValueOrders, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  MAX(o_totalprice) AS max_value,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_totalprice > 1000 AND o_orderstatus IN ('O', 'F')
        |  AND o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 12 MONTH FROM orders)
        |GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q4_distinct_customers", distinctCustomers, bench = true, oracle = Some(
      """SELECT o_orderstatus AS status,
        |  COUNT(DISTINCT o_custkey) AS customer_count, COUNT(*) AS order_count,
        |  CAST(COUNT(*) AS DOUBLE) / NULLIF(COUNT(DISTINCT o_custkey), 0) AS orders_per_customer
        |FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q5_order_details_join", orderDetailsJoin, bench = true, oracle = Some(
      """SELECT o_orderkey AS order_id, c_name AS customer_name, n_name AS nation_name,
        |  o_orderstatus AS status, o_totalprice AS total_amount
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q6_lineitem_pricing", lineitemPricing, bench = true, oracle = Some(
      """WITH u AS (
        |  SELECT l_returnflag, l_linestatus, l_quantity,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_p,
        |    CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_p
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(price_c * (100 - disc_p)) AS DOUBLE) / 1e4 AS sum_disc_price,
        |  CAST(SUM(price_c * (100 - disc_p) * (100 + tax_p)) AS DOUBLE) / 1e6 AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM u
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q7_table_counts_union", tableCountsUnion, oracle = Some(
      """SELECT * FROM (
        |  SELECT 'orders' AS table_name, COUNT(*) AS row_count FROM orders
        |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |  UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |  UNION ALL SELECT 'part', COUNT(*) FROM part
        |) ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q8_distinct_status", distinctStatus, oracle = Some(
      "SELECT DISTINCT o_orderstatus AS status FROM orders ORDER BY ALL NULLS FIRST")),
    NamedQuery("q9_top_parts", topParts, oracle = Some(
      """SELECT * FROM (
        |  SELECT p_partkey, p_name, p_retailprice FROM part
        |  ORDER BY p_retailprice DESC, p_partkey LIMIT 10
        |) ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q10_scalar_functions", scalarFunctions, oracle = Some(
      """SELECT n_nationkey, n_name,
        |  CONCAT(n_name, '#', CAST(n_regionkey AS VARCHAR)) AS tag,
        |  (['alpha','beta','gamma','delta','epsilon'])[n_regionkey + 1] AS pick,
        |  CASE WHEN n_regionkey = 0 THEN 'zero' ELSE 'nonzero' END AS flag,
        |  COALESCE(NULLIF(n_regionkey, 0), -1) AS nz,
        |  CAST(FLOOR(n_nationkey / 3.0) AS BIGINT) AS bucket3,
        |  ROUND(CAST(n_nationkey AS DOUBLE) * 1.5, 1) AS scaled
        |FROM nation ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q11_point_lookup", pointLookup, oracle = Some(
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE p_partkey = 42""".stripMargin)),
    NamedQuery("q12_numbers_crossjoin", numbersCrossJoin, oracle = Some(
      """SELECT a.d * 10 + b.d AS n
        |FROM range(0, 10) a(d) CROSS JOIN range(0, 10) b(d) ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q13_customers_without_orders", customersWithoutOrders, oracle = Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q14_customers_with_orders", customersWithOrders, oracle = Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q15_customer_order_counts", customerOrderCounts, oracle = Some(
      """SELECT c_custkey, c_mktsegment,
        |  COALESCE(cnt, 0) AS order_count, COALESCE(rev, CAST(0 AS DOUBLE)) AS revenue
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY o_custkey
        |) ON c_custkey = o_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q16_upsert_merge", upsertMerge, bench = true, oracle = Some(
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 4 <> 0
        |), batch AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |)
        |SELECT * FROM (
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM batch u WHERE u.o_orderkey = b.o_orderkey)
        |  UNION ALL SELECT * FROM batch
        |) ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q17_events_hourly", eventsHourly, bench = true, oracle = Some(
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q18_top_event_per_user", topEventPerUser, oracle = Some(
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q19_gold_rollup", goldRollup, bench = true, oracle = Some(
      """SELECT CAST(o_orderdate AS DATE) AS order_month, o_orderstatus AS status,
        |  COUNT(DISTINCT o_custkey) AS user_count, COUNT(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |FROM orders GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q20_gold_reagg", goldReagg, oracle = Some(
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
    NamedQuery("q21_silver_projection", silverProjection, oracle = Some(
      """SELECT o_orderkey AS order_id, o_custkey AS user_id, o_orderstatus AS status,
        |  CAST(o_orderdate AS DATE) AS order_month, o_orderdate AS order_date,
        |  o_totalprice AS total_amount
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q22_date_functions", dateFunctions, oracle = Some(
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        |  CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(o_orderdate - INTERVAL 30 DAY AS DATE) AS od_minus30,
        |  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS unix_sec
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q45_rounded_metrics", roundedMetrics, oracle = Some(
      """SELECT o_orderstatus AS status, COUNT(*) AS order_count,
        |  FLOOR((2 * SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) + COUNT(*))
        |    / (2.0 * COUNT(*))) / 100.0 AS avg_value_r2,
        |  FLOOR((2 * COUNT(*) * 100 + NULLIF(COUNT(DISTINCT o_custkey), 0))
        |    / (2.0 * NULLIF(COUNT(DISTINCT o_custkey), 0))) / 100.0 AS orders_per_customer_r2
        |FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q46_rounded_gold_reagg", roundedGoldReagg, oracle = Some(
      """WITH gold AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_month, o_orderstatus AS status,
        |    COUNT(*) AS order_count,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT status, CAST(SUM(order_count) AS BIGINT) AS total_orders,
        |  FLOOR((2 * SUM(CAST(FLOOR(avg_order_value * 1e6) AS BIGINT)) + COUNT(*) * 10000)
        |    / (2.0 * COUNT(*) * 10000)) / 100.0 AS avg_avg_order_value_r2
        |FROM gold GROUP BY status ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q47_order_date_range", orderDateRange, oracle = Some(
      """SELECT o_orderstatus AS status, MIN(o_orderdate) AS first_order,
        |  MAX(o_orderdate) AS most_recent_order, COUNT(*) AS order_count
        |FROM orders GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q48_union_distinct", unionDistinct, oracle = Some(
      """SELECT o_orderstatus AS flag FROM orders
        |UNION SELECT l_returnflag FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin)),
    NamedQuery("q49_seeded_sample", seededSample), // rows-only: rand streams differ per engine
    NamedQuery("q53_now_functions", nowFunctions), // rows-only: wall-clock dependent
    NamedQuery("q56_approx_distinct", approxDistinct), // rows-only: sketches differ per engine
  )
}
