package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotFold

/** Single place where engine sessions are configured, so every entry point
  * (Verify, Bench, tests) runs with identical semantics:
  *
  *   - `shuffle.partitions` sized to the local core count (the harness runs
  *     `local[N]`; on a real cluster this would be tuned to ~2-3× total
  *     cores or left to AQE coalescing).
  *   - UTC session timezone — oracle (DuckDB) parity for timestamps.
  *   - `parquet.nanosAsLong` — TIMESTAMP(NANOS) parquet (older fixture
  *     drops; raw-nanos test fixtures) otherwise fails the read in Spark 4;
  *     set once here (not as a hidden side effect of a table loader) so
  *     behavior is call-order-independent. [[Tables.events]] dispatches on
  *     the resulting dtype, so both nanos-long and timestamp[us] drops load.
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
      // ObjectHashAggregate (TypedImperativeAggregates like TopKPairs)
      // falls back to SORT-based aggregation after this many in-memory
      // keys — the default 128 silently turns a bounded-heap top-k into
      // a full sort. Our object buffers are tiny (k pairs), so a large
      // in-memory key budget is safe.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      // Engine extensions via the public SparkSessionExtensions hook:
      // dot_fold(array<double>, array<double>) as a SQL-callable function
      // backed by the codegen'd DotFold expression.
      .withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("dot_fold"),
          new ExpressionInfo(classOf[DotFold].getName, "dot_fold"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 2, "dot_fold takes exactly 2 arguments")
            DotFold(children.head, children(1))
          }))
        // Optimizer rule: the idiomatic HOF dot product
        // aggregate(zip_with(a,b,(x,y)->x*y), 0.0D, (acc,v)->acc+v)
        // rewrites to the codegen'd DotFold — same fold, same NULL
        // semantics, interpreted-lambda cost removed (see
        // graft.plans.RewriteHofDotProduct for the exact-match contract).
        ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
      }

  /** Session for the harness mains: `local[$SPARK_GRAFT_CPUS]`.
    * `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the partition count
    * (default = core count) — the knob behind the r13 partitions-scaled
    * A/B on the sf1 relational outliers (BASELINE.md): on a real cluster
    * this is the ~2-3× total-cores setting noted on [[builder]], and the
    * A/B documents how the fixed local default behaves at 10× data.
    */
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder(s"local[$cpus]", parts).appName(appName).getOrCreate()
  }
}
