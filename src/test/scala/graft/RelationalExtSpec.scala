package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalExt

class RelationalExtSpec extends SparkTestBase {

  test("q35 approx_count_distinct stays within its 2% rsd bound on every group") {
    RelationalExt.q35ApproxDistinct(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_cust").toDouble
      val exact  = r.getAs[Long]("exact_cust").toDouble
      val relErr = math.abs(approx - exact) / exact
      // rsd=0.02 is one sigma; 5x gives a deterministic-safe margin
      assert(relErr < 0.10, s"group ${r.get(0)}: approx=$approx exact=$exact err=$relErr")
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
