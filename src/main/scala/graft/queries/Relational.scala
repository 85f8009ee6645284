package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Relational operator surface (SURVEY.md §2.4 rows 1–6): joins, aggregation,
  * windows, sort/limit, set ops, scalar functions — all declarative
  * DataFrame plans so Catalyst handles pushdown/pruning/join selection.
  *
  * Determinism discipline (oracle = DuckDB on the same parquet):
  *   - Never `sum(double)`: cast each addend to a fixed-scale decimal first,
  *     so the sum is exact and order-independent, then cast the final
  *     aggregate back to double. Identical in DuckDB via
  *     `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`.
  *   - Every result has a total ORDER BY on a unique key set.
  *   - Counts stay BIGINT on both sides (DuckDB SUM(int) would widen to
  *     HUGEINT — avoided by only summing decimals/doubles).
  */
object Relational {

  /** Exact, order-independent sum of a 2-decimal-place double column. */
  private def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a computed double expression at 8dp, ROUNDED to 2dp
    * before the final double cast. The round is load-bearing for oracle
    * parity, not cosmetics: at bench scale the 8dp sum's unscaled value
    * (Σ·10⁸ ≈ 10¹⁸) exceeds 2⁵³, and DuckDB's decimal→double conversion
    * rounds the unscaled integer to a double BEFORE the scale division —
    * up to ~10⁻⁶ off the correctly-rounded result Spark produces. At
    * scale 2 the unscaled value stays < 2⁵³, both engines correctly round
    * the same rational, and the doubles agree bit-for-bit at any SF.
    */
  private def dsum8(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 8))), 2).cast("double")

  /** q01: scan → filter (pushed to parquet) → hash agg → sort. TPC-H Q1 shape.
    * Partial aggregation is map-side; the shuffle carries only 6 grouped rows
    * per partition, so this scales linearly with input at 100 TB.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    // resplit AFTER the filter (pushdown intact): the decimal partial
    // aggregation is the CPU cost, and a single-split source would run it
    // on one core; order-independent because every sum is decimal
    resplit(lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum8(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum8(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        (dsum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: 5-way star join, revenue by nation for one region. The two dim
    * tables are broadcast (they are tiny at any scale factor); the
    * customer⋈orders⋈lineitem chain shuffles on its join keys and AQE picks
    * broadcast for customer when it fits. TPC-H Q5 shape.
    */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(28, 8))
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      // round-to-2 before the double cast: see dsum8 — same 2^53 hazard
      .agg(round(sum(rev), 2).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q02Sql: String =
    """SELECT n_name,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q03: global top-k. Spark plans TakeOrderedAndProject: each partition
    * keeps its local top-10, only k rows per partition reach the driver —
    * no full sort, no full shuffle, scale-safe.
    */
  def q03TopOrders(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q03Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q04: ranking window functions — row_number with a unique tiebreak plus
    * rank over the raw (tied) ordering; top-3 orders per customer.
    */
  def q04TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(wr).cast("long").as("price_rank"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q04Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
      |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q05: running total per customer — frame-based window aggregate. The sum
    * is over per-row decimal casts so the prefix sums are exact (order of
    * addition irrelevant).
    */
  def q05RunningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q05Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q06: lag/lead navigation + day gap between consecutive orders. */
  def q06OrderGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q06Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | lag(o_orderkey, 1) OVER w AS prev_order,
      | lead(o_orderkey, 1) OVER w AS next_order,
      | date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q07: set ops — UNION(distinct) then EXCEPT. Spark `union` is UNION ALL;
    * `.distinct()`/`.except()` give the SQL set semantics.
    */
  def q07SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir)
    val building  = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("custkey"))
    val finished  = orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    building.union(machinery).distinct().except(finished).orderBy(col("custkey"))
  }

  val q07Sql: String =
    """SELECT custkey FROM (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY custkey""".stripMargin

  /** q08: left-semi join (EXISTS). Only the key column of the right side is
    * shuffled; output carries no right-side columns.
    */
  def q08SemiJoin(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q08Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** q09: left-anti join (NOT EXISTS) — customers with no pending order. */
  def q09AntiJoin(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q09Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** q10: left outer join + aggregate keeping zero-order customers. */
  def q10CustomerSpend(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))), lit(0))
          .cast("double").as("total_spend"))
      .orderBy(col("c_custkey"))

  val q10Sql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      | CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  /** q11: ROLLUP grouping-set aggregate (subtotals + grand total). */
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q11Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** q12: exact distinct aggregation (count-distinct expands to a two-phase
    * aggregate; the first phase dedups (status, custkey) pairs map-side).
    */
  def q12DistinctCustomers(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  val q12Sql: String =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q13: scalar string functions — all codegen'd builtins, no UDFs. */
  def q13StringFuncs(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .select(col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 4).as("type_pfx"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"))
      .orderBy(col("p_partkey"))

  val q13Sql: String =
    """SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc,
      | substring(p_type, 1, 4) AS type_pfx,
      | concat(p_brand, ':', p_type) AS brand_type,
      | length(p_name) AS name_len,
      | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      | regexp_replace(p_name, ' ', '_', 'g') AS name_us
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q14: date/time scalar functions over order dates. */
  def q14DateFuncs(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch95"))
      .orderBy(col("o_orderkey"))

  val q14Sql: String =
    """SELECT o_orderkey, year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
      | day(o_orderdate) AS o_day, quarter(o_orderdate) AS o_quarter,
      | date_trunc('month', o_orderdate) AS month_start,
      | date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch95
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q15: JSON extraction from the events.props string column. */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy(col("event_id"))

  val q15Sql: String =
    """SELECT event_id, event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** q16: event-time tumbling window aggregate (batch mode `window()` —
    * the same expression Structured Streaming uses; epoch-aligned like
    * DuckDB's time_bucket).
    */
  def q16TumblingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  val q16Sql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin
}
