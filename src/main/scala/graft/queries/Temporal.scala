package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Temporal operators Spark lacks as builtins, composed scale-correctly
  * from existing ops (SURVEY.md §2 custom-operator preference (a)).
  */
object Temporal {

  /** q37: as-of join — every event matched to the same user's most recent
    * 'purchase' event at-or-before it.
    *
    * Implementation is the union + ordered carry-forward merge, NOT a
    * range join: tag the probe stream (1) and the build stream (0), union,
    * then one window pass per user ordered by (ts, tag) carrying the last
    * non-null build payload forward. Cost is a single shuffle+sort per
    * side — identical asymptotics to a sort-merge join — where the naive
    * `l JOIN r ON key AND r.ts <= l.ts` + max() formulation explodes to
    * O(|l|·|r|) pairs per key at scale. Build rows order before probe rows
    * at equal ts (tag 0 < 1), giving inclusive `<=` semantics; (user_id,
    * ts) is unique in the data, so the merge order is total and the
    * result deterministic. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q37AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val probe = ev.select(
      col("user_id"), col("ts"), lit(1).as("tag"),
      col("event_id"), col("event_type"),
      lit(null).cast("long").as("p_id"), lit(null).cast("timestamp").as("p_ts"))
    val build = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(0).as("tag"),
      lit(null).cast("long").as("event_id"), lit(null).cast("string").as("event_type"),
      col("event_id").as("p_id"), col("ts").as("p_ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.union(build)
      .withColumn("last_purchase_id", last(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      // matched ts as epoch micros: a NULLABLE timestamp column trips
      // ns-vs-µs dtype coercion in pandas-based comparators (NaT has no
      // unit conversion), while longs compare exactly
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("last_purchase_id"), unix_micros(col("last_purchase_ts")).as("last_purchase_us"))
      .orderBy(col("event_id"))
  }

  val q37Sql: String =
    """SELECT e.event_id, e.user_id, e.ts, e.event_type,
      | p.event_id AS last_purchase_id, epoch_us(p.ts) AS last_purchase_us
      |FROM events e ASOF LEFT JOIN (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
      | ON e.user_id = p.user_id AND p.ts <= e.ts
      |ORDER BY e.event_id""".stripMargin

  /** q46: time-spine gap filling — the feature-pipeline primitive that
    * turns an irregular event stream into a dense per-(user, day) series:
    * each user gets a complete day spine over their active range
    * (`sequence` generator — rows multiply where the data lives, no
    * shuffle), left-joined against observed daily counts with zero-fill.
    * Sparse→dense is what makes downstream window features (rolling
    * averages, streak counts) correct on days with no events.
    */
  def q46GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"),
      col("value"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      // day emitted as midnight timestamp: Spark DATE surfaces as python
      // date objects in pandas-based comparators while DuckDB dates
      // become datetime64 — timestamps compare exactly on both sides
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("was_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  val q46Sql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |daily AS (
      |  SELECT user_id, day, COUNT(*) AS n_events FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi FROM ev GROUP BY 1))
      |SELECT spine.user_id, CAST(spine.day AS TIMESTAMP) AS day,
      | COALESCE(daily.n_events, 0) AS n_events,
      | daily.n_events IS NULL AS was_gap
      |FROM spine LEFT JOIN daily
      |  ON spine.user_id = daily.user_id AND spine.day = daily.day
      |ORDER BY spine.user_id, spine.day""".stripMargin

  /** q38: exact percentiles (linear interpolation) of order value per
    * status. Exact percentile sorts each group's values — fine per-group
    * here; at 100 TB with huge groups the sketch-based
    * `approx_percentile` (cf. q35's HLL pattern) is the scale path.
    * Rounded to 6dp: both engines interpolate linearly but may differ in
    * the last ulp of the arithmetic form.
    */
  def q38Percentiles(s: SparkSession, dir: String): DataFrame =
    resplit(orders(s, dir).select(col("o_orderstatus"), col("o_totalprice")))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.5D)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9D)"), 6).as("p90"),
        round(expr("percentile(o_totalprice, 0.99D)"), 6).as("p99"))
      .orderBy(col("o_orderstatus"))

  val q38Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      | ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      | ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
      | ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q55: sketch-based quantiles — q38's scale path. `approx_percentile`
    * is Spark's Greenwald–Khanna sketch: mergeable fixed-size per-group
    * state, so huge groups aggregate in one pass with map-side partials
    * instead of sorting each group.
    *
    * Oracle contract (hash-checkable since r13, cf. q35): the sketch
    * VALUE can't be hash-compared across engines, but its documented
    * guarantee can — GK at accuracy=100 promises max rank error
    * 1/accuracy = 1%, so the engine measures the RANK of its own
    * estimate within the group (one extra aggregate over the same
    * scan, with the 3-row estimate table broadcast back) and emits
    * `p50_rank_ok`/`p99_rank_ok` = |rank − q| ≤ 1% + 1/n (the same
    * bound TemporalSpec has pinned in-memory since r2); the oracle
    * emits the exact percentiles (cross-engine 6dp agreement is the
    * already-proven q38 contract) with literal TRUE. A hash match
    * PROVES the rank bound held at gate scale.
    */
  def q55ApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val src = resplit(orders(s, dir).select(col("o_orderstatus"), col("o_totalprice")))
    val g = src
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("approx_percentile(o_totalprice, 0.5D, 100)").as("approx_p50"),
        expr("approx_percentile(o_totalprice, 0.99D, 100)").as("approx_p99"),
        round(expr("percentile(o_totalprice, 0.5D)"), 6).as("exact_p50"),
        round(expr("percentile(o_totalprice, 0.99D)"), 6).as("exact_p99"))
    // rank-of-estimate: count values ≤ the estimate per group — the
    // group-count-sized estimate frame broadcasts into a rescan, so the
    // audit costs one more map-side aggregate, never a second shuffle of
    // the data by anything wider than the group key
    val ranks = src
      .join(broadcast(g.select(col("o_orderstatus"), col("approx_p50"), col("approx_p99"))),
        Seq("o_orderstatus"))
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_totalprice") <= col("approx_p50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col("o_totalprice") <= col("approx_p99"), 1L).otherwise(0L)).as("r99"))
    def rankOk(r: Column, q: Double): Column =
      abs(r.cast("double") / col("n_orders").cast("double") - q) <=
        lit(1.0 / 100) + lit(1.0) / col("n_orders").cast("double")
    g.join(broadcast(ranks), Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_orders"), col("exact_p50"), col("exact_p99"),
        rankOk(col("r50"), 0.5).as("p50_rank_ok"),
        rankOk(col("r99"), 0.99).as("p99_rank_ok"))
      .orderBy(col("o_orderstatus"))
  }

  val q55Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      | ROUND(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
      | ROUND(quantile_cont(o_totalprice, 0.99), 6) AS exact_p99,
      | TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q106: SCD2-style state-history compaction (gaps-and-islands). Each
    * user's event stream collapses to versioned state intervals: a run of
    * consecutive identical `event_type` values becomes ONE row with
    * `[valid_from, valid_to)` validity (half-open, `valid_to` = next run's
    * start, NULL while current) — the standard slowly-changing-dimension
    * history build that turns an append-only event log into a
    * point-in-time-queryable state table. Island detection is the lag →
    * change-flag → running-sum pattern; the run id doubles as the per-user
    * version number (1-based).
    *
    * Scale shape: both windows partition by user_id (never global), and
    * the run-collapse groupBy((user_id, version)) aligns with the window
    * partitioning so the sort-shuffle is paid once; the second window runs
    * over the RUNS frame (state-change-sized, ≪ events). Validity bounds
    * ship as epoch micros — a nullable timestamp would trip ns-vs-µs NaT
    * coercion in pandas-based comparators (same note as q37).
    */
  def q106StateHistory(s: SparkSession, dir: String): DataFrame = {
    // (ts, event_id) order, not ts alone: (user_id, ts) happens to be
    // unique in the fixtures, but a tied timestamp would otherwise make
    // the run segmentation engine- and run-nondeterministic (same rule as
    // q37's (ts, tag) and q96's (ts, event_id) tie-breaks)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    val flagged = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      // null-SAFE inequality (<=>), mirroring the oracle's IS DISTINCT
      // FROM: a NULL event_type must start its own run in both engines.
      // The row_number()=1 disjunct pins the documented 1-based contract
      // when a partition OPENS with NULL: there, lag's boundary NULL <=>
      // NULL is true, so the change flag alone would yield a version-0
      // run. Same window spec, so no extra shuffle or sort.
      .withColumn("chg", when(row_number().over(wOrd) === 1 ||
        !(prev <=> col("event_type")), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("vf"),
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("version"))
    runs
      .select(col("user_id"), col("version"), col("state"),
        unix_micros(col("vf")).as("valid_from_us"),
        unix_micros(lead(col("vf"), 1).over(wNext)).as("valid_to_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  val q106Sql: String =
    """WITH f AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
      |      OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM events),
      |v AS (
      |  SELECT user_id, ts, event_type,
      |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM f),
      |runs AS (
      |  SELECT user_id, version, min(event_type) AS state, min(ts) AS vf,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM v GROUP BY user_id, version)
      |SELECT user_id, version, state,
      | epoch_us(vf) AS valid_from_us,
      | epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY version)) AS valid_to_us,
      | n_events
      |FROM runs ORDER BY user_id, version""".stripMargin

  /** Snapshot cutoff for q112's OLD side (mid-stream; the new side is the
    * full log). Events span 2024-01-01..30 at every sf. */
  val DiffCutoff = "2024-01-16 00:00:00"

  /** q112: snapshot diff / CDC reconciliation — reduce the event log to
    * per-user LAST-state at two snapshot times and emit the change ledger
    * between them: `added` (user appears only in the new snapshot),
    * `removed` (only in the old — impossible on an append-only log, but
    * the branch is part of the operator), `changed` (state or value
    * differs, null-safely), `unchanged`. This is the table-reconciliation
    * primitive behind incremental loads, replication audits, and
    * warehouse MERGE planning: diff two keyed snapshots without trusting
    * either side's change feed.
    *
    * Scale shape: each snapshot is one user_id-partitioned window
    * (row_number=1 by (ts, event_id) DESC — q96's last-touch shape), and
    * the reconciliation is a full outer join of two user-sized frames on
    * the SAME key their windows just partitioned by, so AQE plans the
    * join off the existing exchanges. Nothing is driver-side; `value`
    * passes through unrounded (no arithmetic — exact in both engines).
    */
  def q112SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def stateAt(cut: Option[String]): DataFrame = {
      val base = cut.foldLeft(events(s, dir))((e, c) => e.filter(col("ts") <= lit(c).cast("timestamp")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      base.select(col("user_id"), col("event_type"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
    }
    val old = stateAt(Some(DiffCutoff))
      .select(col("user_id").as("o_uid"), col("event_type").as("old_state"),
        col("value").as("old_value"))
    val neu = stateAt(None)
      .select(col("user_id").as("n_uid"), col("event_type").as("new_state"),
        col("value").as("new_value"))
    old.join(neu, col("o_uid") === col("n_uid"), "full_outer")
      .select(
        coalesce(col("o_uid"), col("n_uid")).as("user_id"),
        when(col("o_uid").isNull, lit("added"))
          .when(col("n_uid").isNull, lit("removed"))
          .when(!(col("old_state") <=> col("new_state")) ||
                !(col("old_value") <=> col("new_value")), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"),
        col("old_state"), col("new_state"), col("old_value"), col("new_value"))
      .orderBy(col("user_id"))
  }

  val q112Sql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, event_type, value FROM (
       |    SELECT user_id, event_type, value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts <= TIMESTAMP '$DiffCutoff') WHERE rn = 1),
       |s2 AS (
       |  SELECT user_id, event_type, value FROM (
       |    SELECT user_id, event_type, value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events) WHERE rn = 1)
       |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
       | CASE WHEN s1.user_id IS NULL THEN 'added'
       |      WHEN s2.user_id IS NULL THEN 'removed'
       |      WHEN s1.event_type IS DISTINCT FROM s2.event_type
       |        OR s1.value IS DISTINCT FROM s2.value THEN 'changed'
       |      ELSE 'unchanged' END AS change_type,
       | s1.event_type AS old_state, s2.event_type AS new_state,
       | s1.value AS old_value, s2.value AS new_value
       |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
       |ORDER BY COALESCE(s1.user_id, s2.user_id)""".stripMargin

  /** q118: per-key time-series resample — every user's event stream
    * re-gridded to an HOURLY spine spanning their own first..last event
    * hour, with last-observation-carried-forward state and a running
    * seen-event count at each grid point. This is the alignment step
    * before any cross-signal join of irregular event streams (features
    * at training time must be sampled on a common clock); q46 fills a
    * GLOBAL calendar with zeros — this one generates a spine PER KEY and
    * carries state, the LOCF semantics a zero-fill can't express.
    *
    * Scale shape: the spine generates from each user's own (min, max)
    * aggregate — per-user `sequence()` explode, distributed by the same
    * user_id key everything else here uses, bounded by the calendar (≤
    * 720 points/user-month); the LOCF is q37's union + ordered
    * carry-forward merge (one user_id-partitioned window pass — never a
    * per-grid-point range join). Grid rows order after event rows at
    * equal ts (tag 0 < 1), so an on-the-hour event is visible to its own
    * grid point — inclusive `<=` semantics, exactly q37's rule.
    */
  def q118ResampleLocf(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("ts"))
    val unioned = ev.select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("event_id"), col("event_type"))
      .union(grid.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("event_id"), lit(null).cast("string").as("event_type")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      // carry the last EVENT as a struct, not the last non-null
      // event_type: a NULL event_type is a real carried state (q106's
      // convention), distinct from "no event yet" (null struct) — a bare
      // last(ignoreNulls) would silently skip NULL-state events
      .withColumn("carried", last(when(col("tag") === 0,
        struct(col("event_type").as("et"))), ignoreNulls = true).over(w))
      .withColumn("state", col("carried.et"))
      .withColumn("n_seen", sum(when(col("tag") === 0, 1L).otherwise(0L)).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), unix_micros(col("ts")).as("grid_us"),
        col("state"), col("n_seen"))
      .orderBy(col("user_id"), col("grid_us"))
  }

  val q118Sql: String =
    """WITH span AS (
      |  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
      |    date_trunc('hour', max(ts)) AS h1
      |  FROM events GROUP BY user_id),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts
      |  FROM span),
      |u AS (
      |  SELECT user_id, ts, 0 AS tag, event_id, event_type FROM events
      |  UNION ALL
      |  SELECT user_id, ts, 1, NULL, NULL FROM grid),
      |l AS (
      |  SELECT user_id, ts, tag,
      |   (last_value(CASE WHEN tag = 0 THEN struct_pack(et := event_type) END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |     ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING)).et AS state,
      |   CAST(sum(CASE WHEN tag = 0 THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |     ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_seen
      |  FROM u)
      |SELECT user_id, epoch_us(ts) AS grid_us, state, n_seen
      |FROM l WHERE tag = 1 ORDER BY user_id, grid_us""".stripMargin

  // ---------------------------------------------------------------- q122

  /** q122: SCD1 MERGE / keyed upsert — the batch twin of the K2 sink's
    * idempotent upsert and the complement of q106's SCD2 history. The
    * TARGET is the per-user current-state table as of [[DiffCutoff]]
    * (latest event wins); the SOURCE is the post-cutoff event log reduced
    * the same way. MERGE semantics with deterministic latest-wins
    * conflict resolution — order by (ts, event_id) DESC, so replays and
    * equal-timestamp races resolve identically every run:
    *   - key in both        → `update` (source row wins; source events
    *                           are all strictly newer than the cutoff)
    *   - key only in source → `insert`
    *   - key only in target → `carry` (row survives unchanged — MERGE
    *                           never deletes here)
    *
    * Scale shape: each side is ONE user_id-partitioned window
    * (row_number = 1 — q96's last-touch reduction), and the merge is a
    * full outer join of two user-sized frames on the SAME key the windows
    * just partitioned by, so AQE plans the join off the exchanges already
    * paid. One shuffle key end-to-end, no global window, nothing
    * driver-side. At warehouse scale the target would be a stored table
    * and only the source side recomputed per batch — the join shape is
    * identical.
    */
  def q122Scd1Merge(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(DiffCutoff).cast("timestamp")
    def latest(side: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      side.select(col("user_id"), col("event_type"), col("value"),
          col("ts"), col("event_id"), row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
    }
    val ev = events(s, dir)
    val target = latest(ev.filter(col("ts") <= cut))
      .select(col("user_id").as("t_uid"), col("event_type").as("t_state"),
        col("value").as("t_value"), col("ts").as("t_ts"),
        col("event_id").as("t_eid"))
    val source = latest(ev.filter(col("ts") > cut))
      .select(col("user_id").as("s_uid"), col("event_type").as("s_state"),
        col("value").as("s_value"), col("ts").as("s_ts"),
        col("event_id").as("s_eid"))
    val srcHit = col("s_uid").isNotNull
    target.join(source, col("t_uid") === col("s_uid"), "full_outer")
      .select(
        coalesce(col("t_uid"), col("s_uid")).as("user_id"),
        when(srcHit, col("s_state")).otherwise(col("t_state")).as("state"),
        when(srcHit, col("s_value")).otherwise(col("t_value")).as("value"),
        unix_micros(when(srcHit, col("s_ts")).otherwise(col("t_ts"))).as("updated_us"),
        when(srcHit, col("s_eid")).otherwise(col("t_eid")).as("last_event_id"),
        when(col("t_uid").isNull, lit("insert"))
          .when(srcHit, lit("update"))
          .otherwise(lit("carry")).as("merge_op"))
      .orderBy(col("user_id"))
  }

  val q122Sql: String =
    s"""WITH tgt AS (
       |  SELECT user_id, event_type, value, ts, event_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts <= TIMESTAMP '$DiffCutoff') WHERE rn = 1),
       |src AS (
       |  SELECT user_id, event_type, value, ts, event_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts > TIMESTAMP '$DiffCutoff') WHERE rn = 1)
       |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       | CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS state,
       | CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
       | epoch_us(CASE WHEN s.user_id IS NOT NULL THEN s.ts ELSE t.ts END) AS updated_us,
       | CASE WHEN s.user_id IS NOT NULL THEN s.event_id ELSE t.event_id END AS last_event_id,
       | CASE WHEN t.user_id IS NULL THEN 'insert'
       |      WHEN s.user_id IS NOT NULL THEN 'update'
       |      ELSE 'carry' END AS merge_op
       |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
       |ORDER BY COALESCE(t.user_id, s.user_id)""".stripMargin

  // ---------------------------------------------------------------- q132

  /** q132: sweep-line interval concurrency — how many orders are IN
    * FLIGHT (placed but not yet fully shipped) on each day the count
    * changes. The fulfillment interval is [o_orderdate, max(l_shipdate)]
    * per order; "active intervals at a point in time" is the primitive
    * behind capacity dashboards, SLA monitors, and concurrent-session
    * audits.
    *
    * The naive formulation (calendar spine JOIN intervals ON day BETWEEN
    * start AND end) is a range join that degenerates to days×orders
    * pairs. The sweep-line reduction is linear: each interval becomes two
    * deltas (+1 at start, −1 the day AFTER end, so the end day itself
    * still counts as open), deltas aggregate by day, and concurrency is
    * the running sum over days — emitted only at change points (between
    * them the count is constant by construction, so a date spine adds
    * rows but no information).
    *
    * The running sum is the scale hazard: a global `SUM() OVER (ORDER BY
    * day)` is one task sorting the whole domain — the exact unpartitioned
    * -window shape the suite-wide plan guard bans. This is the two-level
    * SEGMENTED PREFIX SUM instead: a within-month cumsum (month-
    * partitioned window) plus each month's STARTING OFFSET — the sum of
    * all prior months' nets — computed on the months-sized aggregate via
    * a bounded inequality join (the build side is an aggregate, bounded
    * by construction; months ≈ thousands even for decades of history).
    * Both levels shuffle day- or month-domain rows only; the row-count
    * of the fact tables never flows through any window.
    */
  def q132IntervalSweep(s: SparkSession, dir: String): DataFrame = {
    val iv = lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("ship_end"))
      .join(orders(s, dir).select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("start_day")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("start_day"),
        greatest(col("ship_end"), col("start_day")).as("end_day"))
    val deltas = iv.select(col("start_day").as("day"), lit(1L).as("delta"))
      .union(iv.select(date_add(col("end_day"), 1).as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("net"))
      // net = 0 days (an interval opens while another closed the day
      // before) are NOT change points — drop them so the output contract
      // ("rows only where the count changes") holds exactly
      .filter(col("net") =!= 0)
      .localCheckpoint(true) // 3 consumers: the window + both offset branches
    // Month offsets on the months-sized aggregate. Deliberately NOT
    // checkpointed: a checkpoint would truncate the plan to a scan leaf,
    // which the BNLJ boundedness guard (correctly) cannot prove bounded —
    // as aggregate subtrees over the deltas checkpoint, both branches are
    // bounded by construction and recomputation costs one tiny re-agg.
    def months: DataFrame = deltas
      .groupBy(trunc(col("day"), "month").as("month"))
      .agg(sum(col("net")).as("m_net"))
    val offsets = months.select(col("month"))
      .join(months.select(col("month").as("p_month"), col("m_net")),
        col("p_month") < col("month"), "left")
      .groupBy(col("month"))
      .agg(coalesce(sum(col("m_net")), lit(0L)).as("offset"))
    val wm = Window.partitionBy(trunc(col("day"), "month")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("cum", sum(col("net")).over(wm))
      .join(offsets, trunc(col("day"), "month") === col("month"))
      .select(col("day").cast("timestamp").as("day"), col("net"),
        (col("offset") + col("cum")).as("open_orders"))
      .orderBy(col("day"))
  }

  val q132Sql: String =
    """WITH iv AS (
      |  SELECT CAST(o.o_orderdate AS DATE) AS start_day,
      |   greatest(max(CAST(l.l_shipdate AS DATE)), CAST(o.o_orderdate AS DATE)) AS end_day
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY o.o_orderkey, o.o_orderdate),
      |d AS (
      |  SELECT start_day AS day, CAST(1 AS BIGINT) AS delta FROM iv
      |  UNION ALL
      |  SELECT CAST(end_day + INTERVAL 1 DAY AS DATE), CAST(-1 AS BIGINT) FROM iv),
      |g AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS net FROM d
      |      GROUP BY day HAVING SUM(delta) <> 0)
      |SELECT CAST(day AS TIMESTAMP) AS day, net,
      | CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
      |FROM g ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q146

  /** q146: TIME-WEIGHTED average (TWAP) of each user's `value` stream —
    * the feature-store reduction that a plain mean gets wrong: a state
    * held for 6 days must weigh 6 days, not 1 sample. Each event's value
    * holds until the user's NEXT event (LOCF hold, q118's carry
    * semantics); the user's final event has no holding interval and
    * contributes no weight. Output per user: segment count, total held
    * seconds, plain mean, and the time-weighted mean — the gap between
    * the last two columns is exactly the sampling-bias the operator
    * removes.
    *
    * Scale shape: ONE user_id-partitioned lead window (the only
    * event-sized pass) feeding one user-keyed aggregate — both stages
    * share the user_id exchange. Durations are computed in SECONDS
    * (µs precision retained as fractions) so the value·duration products
    * stay far inside double-exact range at any corpus size.
    */
  def q146TimeWeighted(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // mean_value must aggregate EVERY event (it is the sample mean being
    // contrasted with TWAP), while the weighted sums only see rows with a
    // holding interval — so the final-event rows stay in the frame and
    // the segment-side aggregates are conditional on dur_s.
    // Durations stay INTEGER MICROSECONDS through the aggregates and the
    // mean goes through exact integer cents (value is 2dp by generation;
    // round(value·100) is within 4e-12 of the integer): integer sums are
    // order-free, so a parallel-aggregation reorder can never move a
    // rounded digit. This is load-bearing for the oracle compare — the
    // r18 sf1 sweep caught DuckDB's multithreaded AVG(value) flipping a
    // user's 6dp mean run-to-run because its unrounded double sat one
    // ulp from the rounding boundary (user 13776: 36.0340625 exactly).
    // The one unavoidably-double aggregate (the twap numerator's
    // value·duration products) reports at 4dp, where the corpus-wide
    // boundary margin is 2.4e-8 against ~1e-11 summation noise.
    events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("dur_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("dur_us").isNotNull, 1L).otherwise(0L)).as("n_segments"),
        round(sum(coalesce(col("dur_us"), lit(0L))).cast("double") / lit(1000000.0), 3)
          .as("held_s"),
        round(sum(round(col("value") * lit(100)).cast("long")).cast("double")
          / (count(lit(1)).cast("double") * lit(100.0)), 6).as("mean_value"),
        // Gate on positive TOTAL held time: ≥2 events at the same
        // microsecond give sum(dur_us)=0, and 0/0 is NULL on Spark but
        // NaN under DuckDB's IEEE division — emit NULL explicitly in
        // both engines instead of leaning on either's 0-divisor rule.
        round(when(sum(coalesce(col("dur_us"), lit(0L))) > 0,
          sum(when(col("dur_us").isNotNull,
            col("value") * (col("dur_us").cast("double") / lit(1000000.0))))
            / (sum(coalesce(col("dur_us"), lit(0L))).cast("double") / lit(1000000.0))), 4)
          .as("twap_value"))
      .filter(col("n_segments") > 0) // single-event users have no held time
      .orderBy(col("user_id"))
  }

  val q146Sql: String =
    """WITH seg AS (
      |  SELECT user_id, value,
      |   (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |     - epoch_us(ts)) AS dur_us
      |  FROM events)
      |SELECT user_id,
      | CAST(SUM(CASE WHEN dur_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
      | ROUND(CAST(SUM(COALESCE(dur_us, 0)) AS DOUBLE) / 1000000.0, 3) AS held_s,
      | ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |   / (COUNT(*) * 100.0), 6) AS mean_value,
      | ROUND(CASE WHEN SUM(COALESCE(dur_us, 0)) > 0
      |   THEN SUM(CASE WHEN dur_us IS NOT NULL THEN value * (dur_us / 1000000.0) END)
      |        / (CAST(SUM(COALESCE(dur_us, 0)) AS DOUBLE) / 1000000.0)
      |   END, 4) AS twap_value
      |FROM seg
      |GROUP BY user_id
      |HAVING SUM(CASE WHEN dur_us IS NOT NULL THEN 1 ELSE 0 END) > 0
      |ORDER BY user_id""".stripMargin
}
