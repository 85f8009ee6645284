package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Second tranche of the relational surface (SURVEY.md §2.4): CUBE
  * grouping sets, pivot, cross join, full outer join, the UDF/UDAF
  * extension surface, and approximate distinct counting.
  */
object RelationalExt {

  private def dsum2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** q30: CUBE — all four grouping sets of (returnflag, linestatus) in one
    * pass; Spark plans a single Expand + hash aggregate, so the input is
    * scanned once regardless of how many grouping sets expand.
    */
  def q30Cube(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q30Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** q31: pivot — order-status columns out of rows, one aggregate pass.
    * Values are enumerated explicitly ("F","O","P"): at scale an
    * unenumerated pivot needs an extra distinct-values job first, so the
    * explicit list is both deterministic and one scan cheaper.
    */
  def q31Pivot(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum2(col("o_totalprice")))
      .orderBy(col("o_year"))

  val q31Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F",
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O",
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P"
      |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin

  /** q32: cross join (cartesian) — legitimate only because both sides are
    * tiny dimension tables (5 × 25); Spark requires the explicit
    * crossJoin call precisely so an accidental cartesian at scale is an
    * API error, not a silent 10^12-row plan.
    */
  def q32CrossJoin(s: SparkSession, dir: String): DataFrame =
    region(s, dir).crossJoin(nation(s, dir))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"),
        (col("n_regionkey") === col("r_regionkey")).as("is_home"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  val q32Sql: String =
    """SELECT r_regionkey, r_name, n_nationkey, n_name,
      | (n_regionkey = r_regionkey) AS is_home
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin

  /** q33: full outer join — BUILDING-segment customers vs per-customer
    * pending-order counts; null-extended rows survive on BOTH sides
    * (BUILDING customers without pending orders, pending orders from
    * other segments), the case inner/left joins silently drop.
    */
  def q33FullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val ord = orders(s, dir).filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
  }

  val q33Sql: String =
    """SELECT c_custkey, c_name, o_custkey, n_orders
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
      |FULL OUTER JOIN (
      |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      |  WHERE o_orderstatus = 'P' GROUP BY o_custkey) o
      | ON c_custkey = o_custkey
      |ORDER BY c_custkey NULLS FIRST, o_custkey NULLS FIRST""".stripMargin

  /** Typed UDAF demonstrating the Aggregator extension point: exact count
    * of rows whose quantity exceeds a threshold. Long-only state keeps it
    * order-independent (merge is addition), so it is safe under any
    * partitioning — the property every distributed UDAF must have.
    */
  private object CountAbove extends Aggregator[Double, Long, Long] {
    val threshold = 25.0
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = if (a > threshold) b + 1 else b
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder = Encoders.scalaLong
    def outputEncoder = Encoders.scalaLong
  }

  /** q34: the UDF/UDAF surface — a scalar Scala UDF (revenue) and the
    * [[CountAbove]] Aggregator in one aggregation. UDFs are opaque to
    * Catalyst (no pushdown through them, no codegen inside), which is why
    * the rest of the engine prefers built-in expressions; this query
    * exists to prove the extension point works and stays oracle-exact
    * (the UDF's double output is cast to decimal per row before summing).
    */
  def q34UdfSurface(s: SparkSession, dir: String): DataFrame = {
    val revenue = udf((price: Double, discount: Double) => price * (1.0 - discount))
    val countAbove = udaf(CountAbove)
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        // round-to-2 before the double cast: see Relational.dsum8 — at
        // bench scale the 8dp sum's unscaled value exceeds 2^53 and
        // DuckDB's decimal→double conversion diverges from Spark's
        round(sum(revenue(col("l_extendedprice"), col("l_discount")).cast(DecimalType(28, 8))), 2)
          .cast("double").as("revenue"),
        countAbove(col("l_quantity")).as("n_big"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q34Sql: String =
    """SELECT l_returnflag,
      | CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
      | CAST(COUNT(*) FILTER (WHERE l_quantity > 25.0) AS BIGINT) AS n_big,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q41: array aggregation + array scalar functions — rows collapsed to
    * per-order part lists (collect_list → sort_array for determinism:
    * collect order under parallelism is arbitrary), then array_join /
    * size / membership. Output is the joined string, which compares
    * exactly through every comparator (nested-array cells don't).
    */
  def q41ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    resplit(lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")))
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("parts_raw"),
        count(lit(1)).as("n_items"))
      .select(col("l_orderkey"), col("n_items"),
        size(array_distinct(col("parts_raw"))).cast("long").as("n_distinct_parts"),
        array_join(sort_array(col("parts_raw")), ",").as("parts_sorted"),
        array_contains(col("parts_raw"), 1L).as("has_part_1"))
      .orderBy(col("l_orderkey"))

  val q41Sql: String =
    """SELECT l_orderkey, COUNT(*) AS n_items,
      | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts,
      | array_to_string(list_sort(list(l_partkey)), ',') AS parts_sorted,
      | bool_or(l_partkey = 1) AS has_part_1
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** q44: explicit GROUPING SETS with grouping() markers — the general
    * form of rollup/cube (q11/q30), via the SQL surface (the DataFrame
    * API only exposes the rollup/cube special cases). Still one Expand +
    * single-pass hash aggregate. grouping() disambiguates "NULL because
    * aggregated away" from "NULL in the data" — load-bearing for
    * downstream consumers of subtotal rows.
    */
  def q44GroupingSets(s: SparkSession, dir: String): DataFrame = {
    lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n_rows
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  val q44Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** q35: approximate distinct counting (HyperLogLog++). At 100 TB this
    * is the difference between a fixed few-KB sketch per group and a
    * shuffle of every distinct key.
    *
    * Oracle contract (hash-checkable since r13): sketch INTERNALS differ
    * across engines, so the estimate itself can't be hash-compared —
    * instead the engine emits, per group, the exact distinct count plus
    * `approx_within_rsd` = whether its own HLL estimate sits within the
    * documented deterministic-safe envelope of its own exact count
    * (relErr < 5·rsd = 10%; rsd=0.02 is one sigma — same bound
    * RelationalExtSpec has pinned since r2), and the oracle emits the
    * same groups with literal TRUE from exact counts. A hash match
    * therefore PROVES the error bound held, turning the old rows-only
    * check into a checked contract.
    */
  def q35ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    resplit(orders(s, dir).select(col("o_orderstatus"), col("o_custkey")))
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
        countDistinct(col("o_custkey")).as("exact_cust"))
      .select(col("o_orderstatus"), col("exact_cust"),
        (abs(col("approx_cust") - col("exact_cust")).cast("double")
          < col("exact_cust").cast("double") * 0.10).as("approx_within_rsd"))
      .orderBy(col("o_orderstatus"))

  val q35Sql: String =
    """SELECT o_orderstatus,
      | count(DISTINCT o_custkey) AS exact_cust,
      | TRUE AS approx_within_rsd
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
