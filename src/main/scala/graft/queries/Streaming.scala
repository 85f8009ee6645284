package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
