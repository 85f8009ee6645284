package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.streaming.EventStreams

/** Batch-mode registrations of the streaming window plans (SURVEY.md §2.4
  * streaming row). `window()` / `session_window()` evaluate identically in
  * batch and streaming, so running them over the `events` parquet makes
  * the semantics DuckDB-oracle-checkable; true-streaming behavior
  * (watermarks, late drop, incremental state) is covered by StreamingSpec
  * driving the same [[graft.streaming.EventStreams]] plans from a
  * MemoryStream.
  */
object Streaming {

  /** q27: per-user session windows, 30-minute inactivity gap. Oracle uses
    * the classic gaps-and-islands rewrite: a new session starts when the
    * gap from the previous event is ≥ the timeout (Spark sessions are
    * half-open [start, last+gap)); session end = last event + gap.
    */
  def q27SessionWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessions(events(s, dir), "30 minutes")
      .orderBy(col("user_id"), col("s_start"))

  val q27Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM o)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL '30 minutes' AS s_end,
      | user_id, CAST(count(*) AS BIGINT) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, s_start""".stripMargin

  /** q28: sliding windows, 1 hour wide hopping every 15 minutes — each
    * event contributes to exactly 4 windows. Oracle expands the 4 window
    * starts per event (time_bucket minus k·15min) and re-aggregates.
    */
  def q28SlidingWindow(s: SparkSession, dir: String): DataFrame =
    EventStreams.sliding(events(s, dir), "1 hour", "15 minutes")
      .orderBy(col("w_start"), col("event_type"))

  val q28Sql: String =
    """WITH x AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
      |   event_type, value
      |  FROM events, unnest(range(0, 4)) AS u(k))
      |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM x GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  /** Session inactivity gap for q72, microseconds (30 minutes — the q27
    * convention).
    */
  val GapUs: Long = 30L * 60L * 1000000L

  /** q72: typed-API sessionization — the `Dataset[T].groupByKey.
    * flatMapGroups` surface, for per-key logic `session_window` can't
    * express in one pass: each user's events are walked in time order and
    * labeled with a 1-based session index (new session when the gap from
    * the previous event reaches [[GapUs]], matching q27's half-open
    * semantics), then per-session analytics (span, distinct event types,
    * exact value sum) aggregate DataFrame-side.
    *
    * Scale design: the typed stage shuffles once on user_id and emits one
    * labeled row per event — state per task is one user's events (the
    * same bound `session_window`'s sort-merge needs), and everything
    * downstream is ordinary partial-aggregating hash aggregation on
    * (user, session) keys, which only narrows the exchange. The in-memory
    * sort inside a group is per-user, never global.
    */
  def q72TypedSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labeled = events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        // event_id tiebreak makes the walk order total; equal-ts ties
        // can't open a session (gap 0 < GapUs) so labels are order-stable
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var idx = 0L
        var prevTs = Long.MinValue
        evs.iterator.map { e =>
          if (prevTs == Long.MinValue || e._2 - prevTs >= GapUs) idx += 1
          prevTs = e._2
          (uid, idx, e._2, e._4, e._5)
        }
      }
      .toDF("user_id", "session_idx", "ts_us", "event_type", "value")
    labeled
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("last_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_idx"),
        timestamp_micros(col("start_us")).as("s_start"),
        timestamp_micros(col("last_us")).as("s_last"),
        (col("last_us") - col("start_us")).as("duration_us"),
        col("n_events"), col("n_types"), col("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q72Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_type, value,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM o)
      |SELECT user_id, CAST(grp AS BIGINT) AS session_idx,
      | min(ts) AS s_start, max(ts) AS s_last,
      | date_diff('microsecond', min(ts), max(ts)) AS duration_us,
      | CAST(count(*) AS BIGINT) AS n_events,
      | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, session_idx""".stripMargin
}
