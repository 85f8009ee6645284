package graft

import graft.queries.Temporal

/** Error-bound spec for the sketch-based quantiles (q55) — the oracle-less
  * query (like q35): sketch internals differ across engines, so accuracy
  * is pinned here instead of hash-compared.
  */
class TemporalSpec extends SparkTestBase {

  test("q55 approx_percentile stays within the GK rank-error bound on every group") {
    // accuracy=100 ⇒ max rank error 1/100. Since r13 the query computes
    // this verdict itself (hash-proven by the oracle's TRUE column at
    // gate scale); here the SAME rank check is re-derived in memory from
    // a fresh approx_percentile over the raw values, so a broken rank
    // expression in the query can't self-certify.
    val rows = Temporal.q55ApproxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok"), s"${r.get(0)}: p50 bound violated")
      assert(r.getAs[Boolean]("p99_rank_ok"), s"${r.get(0)}: p99 bound violated")
    }
    val eps = 1.0 / 100
    val approx = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("o_orderstatus"))
      .agg(
        org.apache.spark.sql.functions.expr(
          "approx_percentile(o_totalprice, 0.5D, 100)").as("a50"),
        org.apache.spark.sql.functions.expr(
          "approx_percentile(o_totalprice, 0.99D, 100)").as("a99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val status = r.getString(0)
      val values = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderstatus") === status)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val n = values.length
      assert(r.getAs[Long]("n_orders") === n.toLong)
      for ((q, est) <- Seq(0.5 -> approx(status)._1, 0.99 -> approx(status)._2)) {
        val rank = values.count(_ <= est).toDouble / n
        assert(math.abs(rank - q) <= eps + 1.0 / n,
          s"$status p$q: value=$est rank=$rank target=$q")
      }
    }
  }

  test("q106: intervals tile per user, runs alternate states, and every event is covered") {
    import org.apache.spark.sql.functions._
    val out = Temporal.q106StateHistory(spark, sf).cache()
    // run-length conservation: the compaction loses no events
    assert(out.agg(sum(col("n_events"))).head.getLong(0) ===
      Tables.events(spark, sf).count())
    val perUser = out.collect().groupBy(_.getAs[Long]("user_id"))
    perUser.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      // versions are dense from 1
      assert(sorted.map(_.getAs[Long]("version")).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        // half-open tiling: this run ends exactly where the next begins
        assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"))
        // maximal compaction: consecutive runs never share a state
        assert(a.getAs[String]("state") !== b.getAs[String]("state"))
      }
      // only the newest run is open-ended
      assert(sorted.init.forall(!_.isNullAt(sorted.head.fieldIndex("valid_to_us"))))
      assert(sorted.last.isNullAt(sorted.head.fieldIndex("valid_to_us")))
    }
    // point-in-time correctness: each event's covering interval carries
    // the event's own state (intervals are half-open [from, to))
    val ev = Tables.events(spark, sf)
      .select(col("user_id").as("u"), unix_micros(col("ts")).as("t"),
        col("event_type").as("et"))
    val bad = ev.join(out, col("u") === col("user_id")
        && col("t") >= col("valid_from_us")
        && (col("valid_to_us").isNull || col("t") < col("valid_to_us")))
      .filter(col("et") =!= col("state"))
    assert(bad.isEmpty, "an event fell inside an interval of a different state")
    out.unpersist()
  }

  test("q112: ledger covers every user once; verdicts agree with the raw log") {
    import org.apache.spark.sql.functions._
    val out = Temporal.q112SnapshotDiff(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(out.count() === ev.select(col("user_id")).distinct().count(),
      "one ledger row per user in either snapshot")
    // an append-only log can never lose a user
    assert(out.filter(col("change_type") === "removed").isEmpty)
    val cut = lit(Temporal.DiffCutoff).cast("timestamp")
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    val j = out.join(spans, Seq("user_id")).cache()
    // a user born after the cutoff must be 'added'; one silent since the
    // cutoff must be 'unchanged' (their last state IS the old state)
    assert(j.filter(col("first_ts") > cut && col("change_type") =!= "added").isEmpty)
    assert(j.filter(col("last_ts") <= cut && col("change_type") =!= "unchanged").isEmpty)
    // verdict internal consistency
    assert(out.filter(col("change_type") === "changed" &&
      (col("old_state") <=> col("new_state")) &&
      (col("old_value") <=> col("new_value"))).isEmpty)
    assert(out.filter(col("change_type") === "unchanged" &&
      (!(col("old_state") <=> col("new_state")) ||
       !(col("old_value") <=> col("new_value")))).isEmpty)
    assert(out.filter(col("change_type") === "added" && col("old_state").isNotNull).isEmpty)
    j.unpersist(); out.unpersist()
  }

  test("q118: dense per-user hourly spine; LOCF state matches a direct recompute") {
    import org.apache.spark.sql.functions._
    val out = Temporal.q118ResampleLocf(spark, sf).collect()
    val evRows = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val byUser = evRows.groupBy(_._1)
    val hourUs = 3600L * 1000000L
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val ev = byUser(u).sortBy(e => (e._2, e._3))
      val h0 = ev.map(_._2).min / hourUs * hourUs
      val h1 = ev.map(_._2).max / hourUs * hourUs
      val grid = rows.sortBy(_.getAs[Long]("grid_us"))
      // the spine is exactly the dense hour grid of the user's own span
      assert(grid.map(_.getAs[Long]("grid_us")).toSeq ===
        (h0 to h1 by hourUs).toSeq, s"user $u spine not dense")
      grid.foreach { g =>
        val t = g.getAs[Long]("grid_us")
        val seen = ev.filter(_._2 <= t)
        assert(g.getAs[Long]("n_seen") === seen.length.toLong,
          s"user $u at $t: n_seen mismatch")
        val expectState = seen.lastOption.map(_._4).orNull
        assert(g.getAs[String]("state") === expectState,
          s"user $u at $t: LOCF state mismatch")
      }
    }
  }

  test("q118: a NULL event_type is a carried state, not a skipped observation") {
    // q106's convention: NULL is a real state. The LOCF must carry the
    // LAST event even when its type is NULL (struct-wrapped carry), and
    // only report NULL-because-no-event when n_seen = 0.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_locfnull").toString
    Seq(
      (1L, "2024-01-01 00:30:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 01:30:00", 1L, null.asInstanceOf[String], 1.0, "{}"),
      (3L, "2024-01-01 03:30:00", 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Temporal.q118ResampleLocf(spark, dir).collect()
      .sortBy(_.getAs[Long]("grid_us"))
      .map(r => (r.getAs[String]("state"), r.getAs[Long]("n_seen"))).toSeq
    // grid hours 00:00..03:00: no event yet → (null, 0); after 'view' →
    // ("view", 1); after the NULL event → (null, 2) — NOT "view"; after
    // 'click' is beyond the last grid point (03:00 < 03:30)
    assert(got === Seq((null, 0L), ("view", 1L), (null, 2L), (null, 2L)))
  }

  test("q106: a stream opening with NULL event_type still versions densely from 1") {
    // Regression guard for the lag-boundary corner: for the FIRST row of a
    // partition, lag's NULL <=> a NULL event_type is true, so the change
    // flag alone would emit a version-0 run; the row_number()=1 disjunct
    // pins the documented 1-based contract.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2null").toString
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, null.asInstanceOf[String], 1.0, "{}"),
      (2L, "2024-01-01 00:01:00", 1L, "view", 1.0, "{}"),
      (3L, "2024-01-01 00:02:00", 1L, null.asInstanceOf[String], 1.0, "{}"),
      (4L, "2024-01-01 00:00:00", 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.q106StateHistory(spark, dir).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L).sortBy(_.getAs[Long]("version"))
    assert(u1.map(_.getAs[Long]("version")).toSeq === Seq(1L, 2L, 3L))
    assert(u1.map(_.getAs[String]("state")).toSeq === Seq(null, "view", null))
    assert(out.filter(_.getAs[Long]("user_id") == 2L)
      .map(_.getAs[Long]("version")).toSeq === Seq(1L))
  }

  test("q122: MERGE emits insert/update/carry correctly with a deterministic tie-break") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd1").toString
    // cutoff is 2024-01-16 00:00:00 (Temporal.DiffCutoff)
    Seq(
      // user 1: pre-cutoff only → carry (target row survives untouched)
      (1L, "2024-01-10 08:00:00", 1L, "signup", 1.5, "{}"),
      (2L, "2024-01-12 09:00:00", 1L, "view", 2.5, "{}"),
      // user 2: both sides; two post-cutoff events at the SAME ts — the
      // higher event_id must win (deterministic latest-wins tie order)
      (3L, "2024-01-11 10:00:00", 2L, "signup", 3.0, "{}"),
      (5L, "2024-01-20 12:00:00", 2L, "click", 4.0, "{}"),
      (4L, "2024-01-20 12:00:00", 2L, "view", 5.0, "{}"),
      // user 3: post-cutoff only → insert
      (6L, "2024-01-22 13:00:00", 3L, "purchase", 6.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.q122Scd1Merge(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[Double]("value"), r.getAs[Long]("last_event_id"),
        r.getAs[String]("merge_op")))
    assert(out.toSeq === Seq(
      (1L, "view", 2.5, 2L, "carry"),
      (2L, "click", 4.0, 5L, "update"),
      (3L, "purchase", 6.0, 6L, "insert")))
  }

  test("q122: on the real fixture, the merged table is the per-user latest event") {
    import org.apache.spark.sql.functions._
    val out = Temporal.q122Scd1Merge(spark, sf)
    // the MERGE result must equal the plain latest-state reduction over
    // the full log — upsert(target, source) ≡ latest(base ∪ delta)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val direct = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type").as("state"), col("value"),
        unix_micros(col("ts")).as("updated_us"),
        col("event_id").as("last_event_id"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1).drop("rn")
    assert(out.drop("merge_op").collect().toSet === direct.collect().toSet)
    // every user appears exactly once
    val users = out.select("user_id").collect().map(_.getLong(0))
    assert(users.length === users.distinct.length)
  }

  test("q146: TWAP matches a per-user replay and diverges from the plain mean somewhere") {
    import org.apache.spark.sql.functions._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rows = Temporal.q146TimeWeighted(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Double]("held_s"),
         r.getAs[Double]("mean_value"), r.getAs[Double]("twap_value"))).toMap
    evs.groupBy(_._1).foreach { case (uid, g) =>
      val ordered = g.sortBy(e => (e._2, e._3))
      val segs = ordered.zip(ordered.tail).map { case (a, b) =>
        (a._4, (b._2 - a._2).toDouble / 1e6) // (value, held seconds)
      }
      if (segs.isEmpty) assert(!rows.contains(uid), s"user $uid has no holding interval")
      else {
        val (n, held, mean, twap) = rows(uid)
        assert(n === segs.length.toLong)
        assert(math.abs(held - segs.map(_._2).sum) < 1e-2)
        // the sample mean covers EVERY event, including the final one
        // that contributes no holding weight
        val all = ordered.map(_._4)
        assert(math.abs(mean - all.sum / all.length) < 1e-4)
        val expectTwap = segs.map { case (v, d) => v * d }.sum / segs.map(_._2).sum
        assert(math.abs(twap - expectTwap) < 1e-4, s"user $uid TWAP diverged")
      }
    }
    // the operator's reason to exist: holding times are uneven enough
    // that the time-weighted mean differs from the sample mean somewhere
    assert(rows.values.exists { case (_, _, m, t) => math.abs(m - t) > 1e-3 })
  }

  test("q132: concurrency at every change point equals the brute-force interval count") {
    import org.apache.spark.sql.functions._
    val out = Temporal.q132IntervalSweep(spark, sf).collect().map(r =>
      (r.getAs[java.sql.Timestamp]("day").toInstant
         .atZone(java.time.ZoneOffset.UTC).toLocalDate,
       r.getAs[Long]("net"), r.getAs[Long]("open_orders")))
    assert(out.nonEmpty)
    // ground truth: per-order [orderdate, max shipdate] fulfillment intervals
    val iv = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("e"))
      .join(Tables.orders(spark, sf)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s")),
        col("l_orderkey") === col("o_orderkey"))
      .collect()
      .map { r =>
        val s = r.getAs[java.sql.Date]("s").toLocalDate
        val e = r.getAs[java.sql.Date]("e").toLocalDate
        (s, if (e.isBefore(s)) s else e)
      }
    out.foreach { case (day, _, open) =>
      val expect = iv.count { case (s, e) => !day.isBefore(s) && !day.isAfter(e) }
      assert(open === expect.toLong, s"open-interval count diverged at $day")
    }
    // every emitted row is a genuine change point
    assert(out.forall(_._2 != 0L), "a net=0 day is not a change point")
    // sweep conservation: every +1 has its −1, so the book closes at zero
    assert(out.map(_._2).sum === 0L)
    assert(out.last._3 === 0L, "the last change point must close all intervals")
    // change points are emitted in strictly increasing day order
    assert(out.map(_._1).sliding(2).forall {
      case Array(a, b) => a.isBefore(b); case _ => true })
  }
}
