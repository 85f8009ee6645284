package graft

import graft.queries.Temporal

/** Error-bound spec for the sketch-based quantiles (q55) — the oracle-less
  * query (like q35): sketch internals differ across engines, so accuracy
  * is pinned here instead of hash-compared.
  */
class TemporalSpec extends SparkTestBase {

  test("q55 approx_percentile stays within the GK rank-error bound on every group") {
    // accuracy=100 ⇒ max rank error 1/100; the returned value must lie
    // between the exact quantiles at (q ± eps) rank. Check via rank
    // position: the approximate value's rank among the group's values
    // must be within eps·n of the target rank.
    val rows = Temporal.q55ApproxQuantiles(spark, sf).collect()
    val eps = 1.0 / 100
    rows.foreach { r =>
      val status = r.getString(0)
      val values = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderstatus") === status)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val n = values.length
      for ((q, field) <- Seq(0.5 -> "approx_p50", 0.99 -> "approx_p99")) {
        val approx = r.getAs[Double](field)
        val rank = values.count(_ <= approx).toDouble / n
        assert(math.abs(rank - q) <= eps + 1.0 / n,
          s"$status $field: value=$approx rank=$rank target=$q")
      }
    }
  }
}
