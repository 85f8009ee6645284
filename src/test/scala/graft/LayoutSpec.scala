package graft

import org.apache.spark.sql.functions._

import graft.queries.Layout

/** The storage-layout operators' invariant is that layout is
  * SEMANTICS-FREE: a bucketed or partitioned copy holds exactly the
  * source rows, and every query through a layout equals the same
  * computation off the raw parquet. (The plan-shape payoffs — no
  * shuffle under the bucketed join, PartitionFilters on the pruned
  * scans — are pinned in PlanSpec.)
  */
class LayoutSpec extends SparkTestBase {

  test("bucketed layouts hold exactly the source multiset, one file per bucket") {
    val li  = Tables.lineitem(spark, sf)
    val lib = Layout.bucketedLineitem(spark, sf)
    assert(lib.count() === li.count())
    assert(lib.exceptAll(li).isEmpty, "bucketed copy has rows the source lacks")
    assert(li.exceptAll(lib).isEmpty, "bucketed copy dropped source rows")
    // the repartition-before-write discipline: exactly BucketCount files,
    // so sorted-bucket scans stay sort-free and file counts stay bounded
    assert(lib.inputFiles.length === Layout.BucketCount,
      s"expected ${Layout.BucketCount} bucket files, got ${lib.inputFiles.length}")
  }

  test("q102 equals the identical rollup computed off the raw parquet") {
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    val got = Layout.q102BucketedJoin(spark, sf).collect().toSeq
    assert(got === raw)
    assert(got.nonEmpty, "fixture has no 'F' orders — test proves nothing")
  }

  test("partitioned events hold every source row; q103 equals the raw computation") {
    val ev  = Tables.events(spark, sf)
    val evp = Layout.partitionedEvents(spark, sf)
    assert(evp.count() === ev.count())
    // re-derive the partition value from the payload ts: every row's
    // directory must agree with its own timestamp
    assert(evp.filter(col("event_date") =!= to_date(col("ts"))).count() === 0L,
      "a row landed in the wrong date partition")

    val raw = ev.withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date").between(
        lit("2024-01-10").cast("date"), lit("2024-01-12").cast("date")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("event_date").cast("timestamp").as("event_date"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("event_date", "event_type")
      .collect().toSeq
    val got = Layout.q103PartitionPruned(spark, sf).collect().toSeq
    assert(got === raw)
    assert(got.nonEmpty, "3-day window matched no events — fixture drifted")
  }

  test("q104 equals the raw mid-month computation and conserves event counts") {
    val raw = Tables.events(spark, sf)
      .filter(dayofmonth(to_date(col("ts"))).between(8, 14))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("event_type")
      .collect().toSeq
    val got = Layout.q104DynamicPruning(spark, sf).collect().toSeq
    assert(got === raw)
    // conservation: the dim join is a pure filter — week slice is a
    // strict subset of the full corpus count
    val total = Tables.events(spark, sf).count()
    val sliced = got.map(_.getAs[Long]("n_events")).sum
    assert(sliced > 0L && sliced < total,
      s"mid-month slice ($sliced of $total) is not a proper subset")
  }

  test("dropLayouts + clearMemos round-trip: layouts rebuild and answer identically") {
    // the documented in-session rewrite protocol for the one memoized
    // surface whose state outlives its memo handles (Layout class doc):
    // dropLayouts removes this JVM's graft_* catalog tables, clearMemos
    // the handles; the next consumer must rebuild from the sf dir and
    // answer exactly as before
    val before = Layout.q102BucketedJoin(spark, sf).collect().toSeq
    // an unrelated table that merely shares the graft_ prefix must
    // survive: dropLayouts removes only the tables Layout registered
    spark.sql("CREATE TABLE IF NOT EXISTS graft_unrelated_probe AS SELECT 1 AS x")
    Layout.dropLayouts(spark)
    graft.queries.Dedup.clearMemos()
    assert(spark.catalog.tableExists("graft_unrelated_probe"),
      "dropLayouts destroyed a table it did not register")
    spark.sql("DROP TABLE graft_unrelated_probe")
    assert(!spark.catalog.tableExists(s"graft_lineitem_b_test_gone"),
      "sanity: catalog lookup works")
    val after = Layout.q102BucketedJoin(spark, sf).collect().toSeq
    assert(after === before, "rebuilt layout diverged from the original")
    assert(Layout.bucketedLineitem(spark, sf).inputFiles.length === Layout.BucketCount,
      "rebuild lost the one-file-per-bucket discipline")
  }
}
