package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalExt

class RelationalExtSpec extends SparkTestBase {

  test("q35 approx_count_distinct stays within its rsd envelope on every group") {
    // the bound (relErr < 5·rsd = 10%) is computed IN the query since r13
    // and hash-proven by the oracle's TRUE column at gate scale; here the
    // verdict is re-derived independently from the exact count and a
    // fresh approx_count_distinct over the same column, so a broken
    // boolean expression in the query can't self-certify
    val rows = RelationalExt.q35ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_within_rsd"),
      s"group ${r.get(0)}: bound violated"))
    val indep = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("a").toDouble, r.getAs[Long]("e").toDouble)).toMap
    rows.foreach { r =>
      val (a, e) = indep(r.getString(0))
      assert(math.abs(a - e) / e < 0.10, s"group ${r.get(0)}: indep recompute err")
      assert(r.getAs[Long]("exact_cust").toDouble === e)
    }
  }

  test("q30 cube emits all four grouping-set shapes") {
    val rows = RelationalExt.q30Cube(spark, sf).collect()
    def shape(r: org.apache.spark.sql.Row) = (r.isNullAt(0), r.isNullAt(1))
    val shapes = rows.map(shape).toSet
    assert(shapes === Set((false, false), (false, true), (true, false), (true, true)))
    // grand total row equals the table count
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).map(_.getAs[Long]("n_rows"))
    assert(total.toSeq === Seq(Tables.lineitem(spark, sf).count()))
  }

  test("q31 pivot columns partition total order value") {
    val p = RelationalExt.q31Pivot(spark, sf)
    assert(p.columns.toSeq === Seq("o_year", "F", "O", "P"))
    val pivotTotal = p.select(
      sum(coalesce(col("F"), lit(0.0)) + coalesce(col("O"), lit(0.0)) + coalesce(col("P"), lit(0.0))))
      .head().getDouble(0)
    val direct = Tables.orders(spark, sf)
      .select(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).head().getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }

  test("q33 full outer preserves both null-extended sides") {
    val rows = RelationalExt.q33FullOuter(spark, sf).collect()
    assert(rows.exists(_.isNullAt(2)), "BUILDING customer with no orders (right nulls)")
    assert(rows.exists(_.isNullAt(0)), "non-BUILDING customer's orders (left nulls)")
  }
}
