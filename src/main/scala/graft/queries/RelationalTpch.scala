package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Classic TPC-H multi-join shapes (Q3/Q7/Q18 adapted to the fixture
  * schema) — the workhorse analytics plans a warehouse user runs daily:
  * selective fact-dim joins with pushed filters, multi-way joins with a
  * derived grouping key, and a having-on-aggregate semi-join. All
  * built-in Spark; the value at 100 TB is in what Catalyst is ALLOWED to
  * do with them (filter pushdown before the join, broadcast of the
  * filtered dims, partial aggregation before the shuffle) — verified in
  * plan tests for the q01/q02 representatives of the same shapes.
  */
object RelationalTpch {

  /** Exact revenue sum, rounded to 2dp before the double cast (the 2^53
    * rule — see [[Relational]] dsum8).
    */
  private def revSum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 8))), 2).cast("double")

  private val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** q62: shipping-priority (TPC-H Q3 shape) — revenue of not-yet-shipped
    * items for one market segment: two selective joins (both filters
    * pushed to the scans), aggregate on (order, date), top-10 by revenue.
    */
  def q62ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, dir).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(resplit(lineitem(s, dir).filter(col("l_shipdate") > cutoff)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(revSum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q62Sql: String =
    """SELECT l_orderkey, o_orderdate,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q63: volume shipping (TPC-H Q7 shape) — trade volume between two
    * nations (NATION_3/NATION_8 — both host suppliers at every fixture scale) by year and direction. Supplier and customer each resolve to
    * a nation (two broadcast dim joins per side); the asymmetric nation
    * pair condition keeps both directions; the grouping key includes a
    * derived year column.
    */
  def q63VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation(s, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    // project to the 5 consumed columns BEFORE the resplit, per resplit's
    // own contract ("never on a wide row"): the round-robin exchange
    // carries 5 columns instead of lineitem's full 16
    resplit(lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"), col("l_extendedprice"), col("l_discount")))
      .join(supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8")
        || (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revSum(rev).as("volume"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q63Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | year(l_shipdate) AS l_year,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,8))), 2) AS DOUBLE) AS volume,
      | COUNT(*) AS n_items
      |FROM lineitem
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation n1 ON s_nationkey = n1.n_nationkey
      | JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q64: large-volume orders (TPC-H Q18 shape) — orders whose total
    * quantity exceeds a threshold, with customer context. The HAVING
    * aggregate runs FIRST on lineitem alone (partial-aggregated
    * map-side), and only qualifying orders join to orders/customer — the
    * aggregate acts as its own semi-join filter, so the wide join sees
    * the few large orders, not the fact table.
    */
  def q64LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = resplit(lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("total_qty"))
      .filter(col("total_qty") > 300.0)
    big
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  val q64Sql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM (
      |  SELECT l_orderkey,
      |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0)
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin
}
