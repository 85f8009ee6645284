package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Window-function long tail (SURVEY.md §2.4 windows row): RANGE frames,
  * distribution functions, ntile, value-navigation — plus the SQL
  * subquery surface (scalar / IN / EXISTS), which the DataFrame API
  * cannot express directly and therefore goes through `spark.sql` over
  * registered views (Catalyst decorrelates them into joins; see the
  * RewriteCorrelatedScalarSubquery rule).
  */
object WindowsExt {

  /** q42: value-range window frame (trailing 30-day spend — a RANGE
    * frame over days, not N rows), distribution functions
    * (percent_rank/cume_dist), quartile bucketing (ntile) and value
    * navigation (first/nth_value). RANGE frames order by a numeric day
    * index: Spark range frames need numeric ordering, and it makes the
    * two engines' interval arithmetic identical by construction.
    */
  def q42WindowFeatures(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate"), lit("1990-01-01").cast("date")).cast("long")
    val byCust = Window.partitionBy(col("o_custkey"))
    val wRange = byCust.orderBy(col("o_day")).rangeBetween(-30L, 0L)
    val wOrder = byCust.orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = byCust.orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), day.as("o_day"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_day"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wRange)
          .cast("double").as("spend_30d"),
        round(percent_rank().over(wOrder), 6).as("pct_rank"),
        round(cume_dist().over(wOrder), 6).as("cume"),
        ntile(4).over(wOrder).cast("long").as("quartile"),
        first(col("o_orderkey")).over(wFull).as("cheapest_order"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_cheapest"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q42Sql: String =
    """SELECT o_custkey, o_orderkey,
      | date_diff('day', DATE '1990-01-01', o_orderdate) AS o_day,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
      |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d,
      | ROUND(percent_rank() OVER w, 6) AS pct_rank,
      | ROUND(cume_dist() OVER w, 6) AS cume,
      | ntile(4) OVER w AS quartile,
      | first_value(o_orderkey) OVER wf AS cheapest_order,
      | nth_value(o_orderkey, 2) OVER wf AS second_cheapest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
      | wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q43: the SQL subquery surface — a correlated scalar subquery, a
    * correlated EXISTS, and an uncorrelated IN, written as SQL text over
    * registered views. Catalyst decorrelates all three into joins
    * (scalar → left outer aggregate join, EXISTS → left semi, IN → left
    * semi), so the executed plan is shuffle-join-shaped, not
    * per-row-subquery-shaped — which is what makes them viable at scale.
    */
  def q43Subqueries(s: SparkSession, dir: String): DataFrame = {
    customer(s, dir).createOrReplaceTempView("customer_v")
    orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name,
        | (SELECT COUNT(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        | EXISTS (SELECT 1 FROM orders_v o
        |         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P') AS has_pending,
        | c_nationkey IN (SELECT n_nationkey FROM (SELECT 1 AS n_nationkey
        |                 UNION ALL SELECT 2 UNION ALL SELECT 3)) AS in_nations
        |FROM customer_v c
        |ORDER BY c_custkey""".stripMargin)
  }

  val q43Sql: String =
    """SELECT c_custkey, c_name,
      | (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      | EXISTS (SELECT 1 FROM orders o
      |         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P') AS has_pending,
      | c_nationkey IN (1, 2, 3) AS in_nations
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin
}
