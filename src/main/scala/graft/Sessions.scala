package graft

import org.apache.spark.sql.SparkSession

/** Single place where engine sessions are configured, so every entry point
  * (Verify, Bench, tests) runs with identical semantics:
  *
  *   - `shuffle.partitions` sized to the local core count (the harness runs
  *     `local[N]`; on a real cluster this would be tuned to ~2-3× total
  *     cores or left to AQE coalescing).
  *   - UTC session timezone — oracle (DuckDB) parity for timestamps.
  *   - `parquet.nanosAsLong` — the `events` table is TIMESTAMP(NANOS),
  *     which Spark 4 otherwise rejects; set once here (not as a hidden
  *     side effect of a table loader) so behavior is call-order-independent.
  *   - AQE on (Spark 4 default, made explicit): runtime coalescing of
  *     shuffle partitions and skew-join splitting are part of the scale
  *     design, not an accident of defaults.
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Session for the harness mains: `local[$SPARK_GRAFT_CPUS]`. */
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    builder(s"local[$cpus]", cpus).appName(appName).getOrCreate()
  }
}
