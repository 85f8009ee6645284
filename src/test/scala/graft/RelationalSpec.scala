package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("every registered query runs and yields a sane result on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n  = df.count()
      assert(n > 0, s"$name returned an empty result on sf0.001")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every query has an oracle — no rows-only entries remain") {
    // r13 retired the last three rows-only entries (q35/q55/q114) via
    // bound-contract oracles: the engine emits its own sketch-vs-exact
    // verdict, the oracle emits TRUE from exact values, and the hash
    // match proves the bound held. Every registered query is now
    // hash-checkable.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries missing oracle SQL: $noOracle")
  }

  test("q01 aggregates lineitem exactly") {
    val rows = queries.Relational.q01PricingSummary(spark, sf).collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus minus absent combos
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val base  = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === base)
  }

  test("q03 top-k is ordered descending") {
    val prices = queries.Relational.q03TopOrders(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q04 emits at most 3 rows per customer, rn dense from 1") {
    val byCust = queries.Relational.q04TopOrdersPerCustomer(spark, sf)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), min("rn").as("lo"), max("rn").as("hi"))
      .collect()
    byCust.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n <= 3 && r.getAs[Int]("lo") == 1 && r.getAs[Int]("hi") == n)
    }
  }

  test("q07 set ops exclude customers with finished orders") {
    val out = queries.Relational.q07SetOps(spark, sf).collect().map(_.getLong(0)).toSet
    val finished = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(out.intersect(finished).isEmpty)
  }

  test("events timestamps are truncated ns->us, not corrupted") {
    val tsRange = Tables.events(spark, sf)
      .agg(min("ts").as("lo"), max("ts").as("hi")).collect()(0)
    val lo = tsRange.getAs[java.sql.Timestamp]("lo")
    assert(lo.toInstant.toString.startsWith("2024-01-"), s"bad ts: $lo")
  }
}
