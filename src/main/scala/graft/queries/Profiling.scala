package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Dataset-profiling and governance operators (SURVEY.md §2.4 extension
  * surface): the audits a training-data pipeline runs before releasing a
  * corpus — re-identification risk (k-anonymity), numeric column profiles
  * (moments, correlation), and value-distribution histograms.
  *
  * All three are single hash-aggregate plans: map-side partials, a shuffle
  * keyed by low-cardinality group keys, and presentation-scale output, so
  * at 100 TB each is one pass over the scan with whole-stage codegen and a
  * few-KB result. No windows, no joins wider than a broadcast dim.
  */
object Profiling {

  /** k-anonymity group-size floor below which a quasi-identifier group is
    * flagged re-identifiable.
    */
  val KAnon: Int = 5

  /** Account-balance generalization band width (the k-anonymity
    * "generalization" step: exact balances → 1000-wide bands).
    */
  val BalBand: Double = 1000.0

  /** q68: k-anonymity audit — generalize customer quasi-identifiers
    * (market segment, nation, account-balance band) and measure every
    * equivalence class's size k; classes with k < [[KAnon]] re-identify
    * individuals and must be suppressed or further generalized before the
    * table ships as training data.
    *
    * Plan: broadcast the 25-row nation dim, one hash aggregate on the
    * generalized keys. Group count is bounded by the generalization lattice
    * (segments × nations × bands), not the row count, so the shuffle output
    * is KBs at any scale.
    */
  def q68AnonymizeAudit(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("segment"), col("n_name").as("nation"),
        (floor(col("c_acctbal") / BalBand) * BalBand.toLong).cast("long").as("bal_band"))
      .groupBy(col("segment"), col("nation"), col("bal_band"))
      .agg(count(lit(1)).as("k"))
      .withColumn("at_risk", col("k") < KAnon)
      .orderBy(col("segment"), col("nation"), col("bal_band"))

  val q68Sql: String =
    s"""SELECT c_mktsegment AS segment, n_name AS nation,
       | CAST(floor(c_acctbal / $BalBand) * ${BalBand.toLong} AS BIGINT) AS bal_band,
       | CAST(count(*) AS BIGINT) AS k, count(*) < $KAnon AS at_risk
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** q71: numeric column profile — per-group count, mean, sample
    * stddev/variance, covariance and correlation between quantity and
    * price. The multi-moment aggregates all partial-aggregate map-side
    * (Spark's ImperativeAggregate merge), so the shuffle carries one
    * moment tuple per (group × partition).
    *
    * Oracle discipline: every statistic is rounded at a scale coarse
    * enough that the two engines' summation orders can't flip a digit
    * (doubles agree to ~1e-10 relative; the roundings leave ≥1e3 margin).
    */
  def q71NumericProfile(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(min(col("l_quantity")), 2).as("min_qty"),
        round(max(col("l_quantity")), 2).as("max_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))

  val q71Sql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      | ROUND(avg(l_quantity), 4) AS avg_qty,
      | ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
      | ROUND(min(l_quantity), 2) AS min_qty,
      | ROUND(max(l_quantity), 2) AS max_qty,
      | ROUND(var_samp(l_extendedprice), 2) AS var_price,
      | ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
      | ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Histogram bucket width for q73 (order total price; data spans
    * ~1e3..5e5, so 10 equi-width buckets).
    */
  val HistWidth: Double = 50000.0

  /** Highest bucket index (values ≥ HistWidth·(HistBuckets) clamp here —
    * none in the fixtures, but the clamp keeps the bucket domain closed
    * under data drift, mirrored exactly in the oracle).
    */
  val HistMax: Int = 9

  /** q73: equi-width histogram of order totals with per-bucket share of
    * rows. The global total comes from a broadcast 1-row aggregate
    * (cross join), not an unpartitioned window — the aggregate tree is
    * map-side partial all the way down, so no single-partition stage sees
    * unbounded input.
    */
  def q73PriceHistogram(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val bucketed = o
      .select(least(floor(col("o_totalprice") / HistWidth), lit(HistMax.toDouble))
        .cast("long").as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("o_totalprice")), 2).as("avg_price"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
    val total = o.agg(count(lit(1)).as("total_n"))
    bucketed.crossJoin(broadcast(total))
      .withColumn("lo", (col("bucket") * HistWidth.toLong).cast("long"))
      .withColumn("share", round(col("n").cast("double") / col("total_n"), 6))
      .select(col("bucket"), col("lo"), col("n"), col("share"),
        col("avg_price"), col("min_price"), col("max_price"))
      .orderBy(col("bucket"))
  }

  val q73Sql: String =
    s"""WITH b AS (
       |  SELECT CAST(least(floor(o_totalprice / $HistWidth), ${HistMax}.0) AS BIGINT) AS bucket,
       |   o_totalprice
       |  FROM orders),
       |g AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |   ROUND(avg(o_totalprice), 2) AS avg_price,
       |   ROUND(min(o_totalprice), 2) AS min_price,
       |   ROUND(max(o_totalprice), 2) AS max_price
       |  FROM b GROUP BY bucket),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS total_n FROM orders)
       |SELECT bucket, CAST(bucket * ${HistWidth.toLong} AS BIGINT) AS lo, n,
       | ROUND(CAST(n AS DOUBLE) / total_n, 6) AS share,
       | avg_price, min_price, max_price
       |FROM g CROSS JOIN t
       |ORDER BY bucket""".stripMargin

  /** Decile grid for q81 (9 interior bounds → 10 equi-depth buckets). */
  val DepthQs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** q81: equi-DEPTH histogram of order totals — q73's complement: bucket
    * BOUNDS adapt to the distribution so each bucket holds ~10% of rows
    * (what a partitioner or a feature-binning step actually wants; an
    * equi-width histogram collapses under skew). Two-phase, scale-safe:
    * the 9 interior decile bounds reduce to ONE broadcast row, and bucket
    * assignment is a map-only array scan (`size(filter(bounds, b → v >
    * b))`) — no window, no per-row shuffle, no global sort. At 100 TB the
    * exact percentile swaps for `approx_percentile` (q55's sketch) with
    * the same downstream shape.
    *
    * Bound-equality parity: where the decile index is integral both
    * engines return the exact data value; where it interpolates, the
    * bound lies strictly between two data values ≫ 1 ulp apart, so a
    * last-ulp difference in interpolation arithmetic can never flip a
    * `v > bound` comparison on 2-decimal data.
    */
  def q81EquiDepthHistogram(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select(col("o_totalprice").cast("double").as("v"))
    val qsLit = DepthQs.map(q => s"${q}D").mkString("array(", ", ", ")")
    val bounds = o.agg(expr(s"percentile(v, $qsLit)").as("bs"))
    o.crossJoin(broadcast(bounds))
      .select(size(filter(col("bs"), b => col("v") > b)).cast("long").as("bucket"), col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 2).as("lo"),
        round(max(col("v")), 2).as("hi"),
        round(avg(col("v")), 4).as("avg_v"))
      .orderBy(col("bucket"))
  }

  val q81Sql: String =
    s"""WITH o AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
       |b AS (SELECT quantile_cont(v, [${DepthQs.mkString(", ")}]) AS bs FROM o)
       |SELECT CAST(len(list_filter(bs, x -> v > x)) AS BIGINT) AS bucket,
       | CAST(count(*) AS BIGINT) AS n,
       | ROUND(min(v), 2) AS lo, ROUND(max(v), 2) AS hi, ROUND(avg(v), 4) AS avg_v
       |FROM o CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin

  /** q92: data-quality constraint audit — the Deequ-style validation pass
    * a pipeline runs before trusting an ingest: declared row-level
    * constraints (derived-column consistency, mandatory fields, non-empty
    * payload) plus the one table-level constraint row predicates can't
    * express (key uniqueness), each reported as a violation count and a
    * pass verdict. Downstream jobs gate on `pass`; the counts tell the
    * on-call how bad a red light is.
    *
    * Scale shape: every row-level constraint is one conditional-sum slot
    * in a SINGLE scan's aggregate (adding a constraint adds a column, not
    * a pass); uniqueness is a key-partitioned aggregate that only ships
    * duplicate groups past the map side. The per-constraint report rows
    * come from exploding a 5-element literal array over the 1×1 joined
    * summaries — constant-size, never data-sized.
    */
  def q92QualityAudit(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val dup = d.groupBy(col("doc_id")).agg(count(lit(1)).as("k"))
      .filter(col("k") > 1)
      .agg(coalesce(sum(col("k")), lit(0L)).as("v_dup"))
    val flat = d.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("n_chars") =!= length(col("text")), lit(1L)).otherwise(lit(0L)))
        .as("v_chars"),
      sum(when(col("lang").isNull || col("lang") === "", lit(1L)).otherwise(lit(0L)))
        .as("v_lang"),
      sum(when(col("source").isNull || col("source") === "", lit(1L)).otherwise(lit(0L)))
        .as("v_source"),
      sum(when(length(trim(col("text"))) === 0, lit(1L)).otherwise(lit(0L)))
        .as("v_text"))
    flat.crossJoin(broadcast(dup))
      .select(col("n_rows"), explode(array(
        struct(lit("chars_match").as("check_name"), col("v_chars").as("n_violations")),
        struct(lit("doc_id_unique").as("check_name"), col("v_dup").as("n_violations")),
        struct(lit("lang_present").as("check_name"), col("v_lang").as("n_violations")),
        struct(lit("source_present").as("check_name"), col("v_source").as("n_violations")),
        struct(lit("text_nonempty").as("check_name"), col("v_text").as("n_violations"))))
        .as("c"))
      .select(col("c.check_name").as("check_name"), col("c.n_violations"),
        col("n_rows"), (col("c.n_violations") === 0L).as("pass"))
      .orderBy(col("check_name"))
  }

  val q92Sql: String =
    """WITH m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |   CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_chars,
      |   CAST(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
      |   CAST(sum(CASE WHEN source IS NULL OR source = '' THEN 1 ELSE 0 END) AS BIGINT) AS v_source,
      |   CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_text
      |  FROM documents),
      |dup AS (
      |  SELECT CAST(COALESCE(sum(k), 0) AS BIGINT) AS v_dup FROM (
      |    SELECT count(*) AS k FROM documents GROUP BY doc_id HAVING count(*) > 1)),
      |u AS (
      |  SELECT 'chars_match' AS check_name, v_chars AS n_violations, n_rows
      |  FROM m CROSS JOIN dup
      |  UNION ALL SELECT 'doc_id_unique', v_dup, n_rows FROM m CROSS JOIN dup
      |  UNION ALL SELECT 'lang_present', v_lang, n_rows FROM m CROSS JOIN dup
      |  UNION ALL SELECT 'source_present', v_source, n_rows FROM m CROSS JOIN dup
      |  UNION ALL SELECT 'text_nonempty', v_text, n_rows FROM m CROSS JOIN dup)
      |SELECT check_name, n_violations, n_rows, n_violations = 0 AS pass
      |FROM u ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------- q128

  /** q128: cross-table REFERENTIAL-INTEGRITY audit — the warehouse-side
    * complement of q92's single-table value checks: every foreign-key
    * edge of the relational schema (lineitem→orders, orders→customer,
    *customer→nation, events→customer) verified as a constraint ledger
    * (checked / violating / rate per edge). This is the dbt-style "test"
    * suite a warehouse runs after every load; the events→customer edge is
    * the interesting row — the event log is app-emitted, not
    * warehouse-constrained, so its orphan count is a real data-quality
    * signal rather than a tautology.
    *
    * Scale shape: each FK check is ONE left anti-join on the key (child
    * rows with no parent — NOT EXISTS semantics, so NULL keys count as
    * orphans exactly like SQL's NOT EXISTS) followed by a scalar count;
    * parent sides project the key column only, so the anti-join build
    * side is key-width. `nation` broadcasts; the larger parents shuffle
    * on the key they're already organized by. The four 1-row results
    * union into the ledger — presentation-sized output, no wide rows
    * anywhere.
    */
  def q128FkAudit(s: SparkSession, dir: String): DataFrame = {
    // fully declarative — one left join against the (distinct, key-width)
    // parent side and a 1-row conditional aggregate per constraint;
    // nothing driver-side, a NULL or orphaned child key counts exactly as
    // NOT EXISTS would
    def fk(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey).as("k"))
        .join(parent.select(col(parentKey).as("pk")).distinct(),
          col("k") === col("pk"), "left")
        .agg(count(lit(1)).as("n_checked"),
          count(when(col("pk").isNull, lit(1))).as("n_violations"))
        .select(lit(name).as("constraint_name"), col("n_checked"),
          col("n_violations"),
          round(col("n_violations").cast("double")
            / col("n_checked").cast("double"), 6).as("violation_rate"))
    val rows = Seq(
      fk("fk_lineitem_orders", lineitem(s, dir), "l_orderkey",
        orders(s, dir), "o_orderkey"),
      fk("fk_orders_customer", orders(s, dir), "o_custkey",
        customer(s, dir), "c_custkey"),
      fk("fk_customer_nation", customer(s, dir), "c_nationkey",
        nation(s, dir), "n_nationkey"),
      fk("fk_events_customer", events(s, dir), "user_id",
        customer(s, dir), "c_custkey"))
    rows.reduce(_ unionByName _).orderBy(col("constraint_name"))
  }

  val q128Sql: String =
    """WITH checks AS (
      |  SELECT 'fk_lineitem_orders' AS constraint_name,
      |   CAST(count(*) AS BIGINT) AS n_checked,
      |   CAST(count(*) FILTER (WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      |     AS n_violations
      |  FROM lineitem l
      |  UNION ALL
      |  SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT),
      |   CAST(count(*) FILTER (WHERE NOT EXISTS
      |     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      |  FROM orders o
      |  UNION ALL
      |  SELECT 'fk_customer_nation', CAST(count(*) AS BIGINT),
      |   CAST(count(*) FILTER (WHERE NOT EXISTS
      |     (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
      |  FROM customer c
      |  UNION ALL
      |  SELECT 'fk_events_customer', CAST(count(*) AS BIGINT),
      |   CAST(count(*) FILTER (WHERE NOT EXISTS
      |     (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT)
      |  FROM events e)
      |SELECT constraint_name, n_checked, n_violations,
      | ROUND(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_rate
      |FROM checks ORDER BY constraint_name""".stripMargin

  // ---------------------------------------------------------------- q133

  /** q133: ANALYZE-style whole-table column statistics — the per-column
    * (row count, null count, exact NDV, numeric min/max) ledger a
    * cost-based optimizer, a MERGE planner, or a data-contract check
    * reads before touching the table. One operator profiles EVERY column
    * in ONE scan: each row explodes into (col_name, value) lanes — a
    * string lane for null/NDV accounting (cast is injective per engine
    * for these types, so NDV is exact) and a numeric lane (doubles as-is,
    * timestamps as epoch micros, non-numeric NULL) for min/max — then a
    * single hash aggregate keyed by col_name does all the counting.
    *
    * Scale shape: one scan + a Generate (bounded fan-out = #columns) + a
    * two-phase aggregate. The NDV is the one genuinely value-domain-sized
    * shuffle (Spark plans the distinct as a (col_name, value) partial
    * aggregate — map-side combined, so the wire carries the per-partition
    * DISTINCT values, not the rows). At 100 TB the drop-in scale path is
    * `approx_count_distinct` — q114's HLL sketch family, mergeable
    * fixed-size state — with everything else unchanged; exact NDV is kept
    * here because the oracle can check it.
    */
  /** Shared ANALYZE machinery (q133 + q151): explode each row into
    * (col_name, string-lane, numeric-lane) structs and aggregate the
    * standard column-stats ledger, keyed by col_name plus any extra
    * grouping columns already present on `df` (q151's period side). ONE
    * definition so the lane contract — per-engine-injective string casts
    * for NDV/null accounting, numeric lanes for min/max, and the
    * documented `approx_count_distinct` scale swap — can never drift
    * between the profiler and the drift report.
    */
  private def laneStats(df: DataFrame, lanes: Seq[(String, Column, Column)],
      keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ explode(array(lanes.map { case (n, vs, vn) =>
        struct(lit(n).as("col_name"), vs.as("v_str"), vn.as("v_num"))
      }: _*)).as("c"): _*)
      .select(keyCols :+ col("c.col_name") :+ col("c.v_str") :+ col("c.v_num"): _*)
      .groupBy(col("col_name") +: keyCols: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v_str").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v_str")).as("ndv"),
        min(col("v_num")).as("min_num"),
        max(col("v_num")).as("max_num"))
  }

  def q133AnalyzeStats(s: SparkSession, dir: String): DataFrame = {
    val lanes = Seq[(String, Column, Column)](
      ("o_orderkey", col("o_orderkey").cast("string"), col("o_orderkey").cast("double")),
      ("o_custkey", col("o_custkey").cast("string"), col("o_custkey").cast("double")),
      ("o_orderstatus", col("o_orderstatus"), lit(null).cast("double")),
      ("o_totalprice", col("o_totalprice").cast("string"), col("o_totalprice")),
      // o_orderdate ships as parquet TIMESTAMP_NTZ; the session TZ is
      // pinned to UTC, so the cast reinterprets the wall-clock value as
      // the identical UTC instant (same convention as Tables.events)
      ("o_orderdate", col("o_orderdate").cast("string"),
        unix_micros(col("o_orderdate").cast("timestamp")).cast("double")),
      ("o_orderpriority", col("o_orderpriority"), lit(null).cast("double")))
    laneStats(orders(s, dir), lanes, Nil).orderBy(col("col_name"))
  }

  val q133Sql: String = {
    def lane(name: String, strCast: String, numCast: String): String =
      s"""SELECT '$name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(count(*) - count($strCast) AS BIGINT) AS n_null,
         | CAST(count(DISTINCT $strCast) AS BIGINT) AS ndv,
         | min($numCast) AS min_num, max($numCast) AS max_num FROM orders""".stripMargin
    Seq(
      lane("o_orderkey", "CAST(o_orderkey AS VARCHAR)", "CAST(o_orderkey AS DOUBLE)"),
      lane("o_custkey", "CAST(o_custkey AS VARCHAR)", "CAST(o_custkey AS DOUBLE)"),
      lane("o_orderstatus", "o_orderstatus", "CAST(NULL AS DOUBLE)"),
      lane("o_totalprice", "CAST(o_totalprice AS VARCHAR)", "o_totalprice"),
      lane("o_orderdate", "CAST(o_orderdate AS VARCHAR)", "CAST(epoch_us(o_orderdate) AS DOUBLE)"),
      lane("o_orderpriority", "o_orderpriority", "CAST(NULL AS DOUBLE)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------- q137

  /** q137: pre-join cardinality and fan-out estimator — the planning
    * probe a 100 TB deployment runs BEFORE committing to a join strategy.
    * Both sides reduce to per-key histograms (key → row count); the
    * histograms equi-join on the key (key-domain-sized, not row-domain);
    * one final aggregate emits the EXACT equi-join output cardinality
    * Σ c_l·c_r, the matched/unmatched key counts, the worst per-key
    * fan-out, and a hot-key count — exactly the numbers that decide
    * broadcast vs shuffle vs salted (q123) vs bucketed (q102) plans, and
    * the numbers q128's FK audit assumes are healthy.
    *
    * Cost: two map-side-combined aggregates + one join over key-domain
    * frames + a 1-row final aggregate — strictly cheaper than the join
    * being planned, and embarrassingly parallel at any scale.
    */
  def q137JoinCard(s: SparkSession, dir: String): DataFrame = {
    val lh = orders(s, dir).groupBy(col("o_orderkey").as("k"))
      .agg(count(lit(1)).as("c_l"))
    val rh = lineitem(s, dir).groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("c_r"))
    lh.join(rh, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(when(col("c_l").isNotNull, 1L)), lit(0L)).as("n_keys_left"),
        coalesce(sum(when(col("c_r").isNotNull, 1L)), lit(0L)).as("n_keys_right"),
        coalesce(sum(when(col("c_l").isNotNull && col("c_r").isNotNull, 1L)), lit(0L))
          .as("n_keys_matched"),
        coalesce(sum(col("c_l") * col("c_r")), lit(0L)).as("est_join_rows"),
        coalesce(max(col("c_l") * col("c_r")), lit(0L)).as("max_key_fanout"),
        coalesce(sum(when(col("c_r") >= HotFanout, 1L)), lit(0L)).as("n_hot_keys"))
  }

  /** Per-key fan-out at or above which q137 flags a key as hot (a salting
    * / skew-split candidate for the planned join).
    */
  val HotFanout: Int = 7

  val q137Sql: String =
    s"""WITH lh AS (SELECT o_orderkey AS k, count(*) AS c_l FROM orders GROUP BY 1),
       |rh AS (SELECT l_orderkey AS k, count(*) AS c_r FROM lineitem GROUP BY 1)
       |SELECT CAST(count(lh.k) AS BIGINT) AS n_keys_left,
       | CAST(count(rh.k) AS BIGINT) AS n_keys_right,
       | CAST(COALESCE(SUM(CASE WHEN lh.k IS NOT NULL AND rh.k IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_keys_matched,
       | CAST(COALESCE(SUM(c_l * c_r), 0) AS BIGINT) AS est_join_rows,
       | CAST(COALESCE(MAX(c_l * c_r), 0) AS BIGINT) AS max_key_fanout,
       | CAST(COALESCE(SUM(CASE WHEN c_r >= $HotFanout THEN 1 END), 0) AS BIGINT) AS n_hot_keys
       |FROM lh FULL OUTER JOIN rh ON lh.k = rh.k""".stripMargin

  // ---------------------------------------------------------------- q138

  /** q138: CHECK-constraint audit — q128's FK ledger extended to
    * intra-row and cross-table VALUE rules: range checks, domain checks,
    * sign checks, and the temporal sanity rule (a lineitem cannot ship
    * before its order was placed). SQL CHECK semantics exactly: a row
    * violates only when the predicate IS FALSE — a NULL operand makes
    * the predicate unknown, which CHECK passes (so the audit can never
    * inflate violation counts on sparse columns; NULL hygiene is q128's
    * FK job and q133's n_null column).
    *
    * Scale shape: all same-table rules for a table share ONE scan — a
    * single 1-row conditional aggregate computes every rule's counts,
    * then a bounded explode unpivots the row into the per-constraint
    * ledger (rules × 3 columns, never rules × scans). The one
    * cross-table rule pays exactly one orderkey equi-join. Ledger format
    * matches q128 so the two audits union into one governance report.
    */
  def q138CheckAudit(s: SparkSession, dir: String): DataFrame = {
    def ledger(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
      val aggs = rules.flatMap { case (n, pred) => Seq(
        count(lit(1)).as(s"${n}__checked"),
        sum(when(pred <=> lit(false), 1L).otherwise(0L)).as(s"${n}__viol"))
      }
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rules.map { case (n, _) =>
          struct(lit(n).as("constraint_name"),
            col(s"${n}__checked").as("n_checked"),
            col(s"${n}__viol").as("n_violations"))
        }: _*)).as("r"))
        .select(col("r.constraint_name"), col("r.n_checked"), col("r.n_violations"))
    }
    val li = ledger(lineitem(s, dir), Seq(
      "chk_li_discount_range" -> col("l_discount").between(0, 1),
      "chk_li_qty_positive"   -> (col("l_quantity") > 0),
      "chk_li_tax_range"      -> col("l_tax").between(0, 1),
      "chk_li_status_domain"  -> col("l_linestatus").isin("O", "F")))
    val lo = ledger(
      lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        .join(orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey")),
      Seq("chk_li_ship_after_order" -> (col("l_shipdate") >= col("o_orderdate"))))
    val o = ledger(orders(s, dir), Seq(
      "chk_o_totalprice_positive" -> (col("o_totalprice") > 0),
      "chk_o_status_domain"       -> col("o_orderstatus").isin("O", "F", "P")))
    li.union(lo).union(o)
      .withColumn("violation_rate",
        round(col("n_violations").cast("double") / col("n_checked"), 6))
      .orderBy(col("constraint_name"))
  }

  val q138Sql: String =
    """WITH checks AS (
      |  SELECT 'chk_li_discount_range' AS constraint_name,
      |   CAST(count(*) AS BIGINT) AS n_checked,
      |   CAST(SUM(CASE WHEN (l_discount BETWEEN 0 AND 1) IS FALSE THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_li_qty_positive', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (l_quantity > 0) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_li_tax_range', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (l_tax BETWEEN 0 AND 1) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_li_status_domain', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (l_linestatus IN ('O', 'F')) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_li_ship_after_order', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (l.l_shipdate >= o.o_orderdate) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'chk_o_totalprice_positive', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (o_totalprice > 0) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'chk_o_status_domain', CAST(count(*) AS BIGINT),
      |   CAST(SUM(CASE WHEN (o_orderstatus IN ('O', 'F', 'P')) IS FALSE THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders)
      |SELECT constraint_name, n_checked, n_violations,
      | ROUND(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_rate
      |FROM checks ORDER BY constraint_name""".stripMargin

  // ---------------------------------------------------------------- q141

  /** Winsorization clip quantiles (lower, upper tail). */
  val WinsorLo: Double = 0.01
  val WinsorHi: Double = 0.99

  /** q141: per-group WINSORIZATION — clip each status group's order
    * totals to its own [p01, p99] and report the clip bounds, clipped-row
    * counts, and before/after moments. The standard outlier treatment
    * before q88-style calibration or z-scoring: clipping (unlike
    * dropping) keeps row counts — and therefore joins and shares —
    * stable, while bounding the influence of tail values on means and
    * variances.
    *
    * Scale shape: the canonical TWO-PASS clip. Pass 1 reduces each group
    * to its two quantiles (per-group exact percentile — groups are few;
    * q55's sketch is the drop-in for huge groups). The bounds frame is
    * group-domain-sized, so it BROADCASTS back onto the second scan —
    * clipping is then map-side arithmetic feeding one hash aggregate.
    * Nothing row-sized crosses the wire except the original scan's
    * partials.
    */
  def q141Winsorize(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select(col("o_orderstatus"), col("o_totalprice"))
    val bounds = o.groupBy(col("o_orderstatus").as("b_status"))
      .agg(expr(s"percentile(o_totalprice, ${WinsorLo}D)").as("lo"),
        expr(s"percentile(o_totalprice, ${WinsorHi}D)").as("hi"))
    o.join(broadcast(bounds), col("o_orderstatus") === col("b_status"))
      .withColumn("w", least(greatest(col("o_totalprice"), col("lo")), col("hi")))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") < col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("o_totalprice") > col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        round(min(col("lo")), 6).as("lo"),  // constant within the group
        round(min(col("hi")), 6).as("hi"),
        round(avg(col("o_totalprice")), 4).as("mean_raw"),
        round(avg(col("w")), 4).as("mean_wins"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd_raw"),
        round(stddev_samp(col("w")), 4).as("sd_wins"))
      .orderBy(col("o_orderstatus"))
  }

  val q141Sql: String =
    s"""WITH b AS (
       |  SELECT o_orderstatus AS b_status,
       |   quantile_cont(o_totalprice, $WinsorLo) AS lo,
       |   quantile_cont(o_totalprice, $WinsorHi) AS hi
       |  FROM orders GROUP BY 1)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       | CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       | CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       | ROUND(min(lo), 6) AS lo, ROUND(min(hi), 6) AS hi,
       | ROUND(avg(o_totalprice), 4) AS mean_raw,
       | ROUND(avg(LEAST(GREATEST(o_totalprice, lo), hi)), 4) AS mean_wins,
       | ROUND(stddev_samp(o_totalprice), 4) AS sd_raw,
       | ROUND(stddev_samp(LEAST(GREATEST(o_totalprice, lo), hi)), 4) AS sd_wins
       |FROM orders JOIN b ON o_orderstatus = b_status
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q144

  /** Deterministic stand-in for an erasure-request batch: every customer
    * whose key is divisible by this. (A real deployment feeds an explicit
    * id list; the modulus keeps the fixture reproducible.)
    */
  val EraseMod: Int = 37

  /** q144: ERASURE cascade plan — the right-to-be-forgotten dry run.
    * Given a batch of subject ids, report — per table, BEFORE deleting
    * anything — how many rows the erasure touches and through which
    * cascade edge they are reached: `customer` and `events` directly by
    * subject key (depth 1), `orders` through o_custkey (depth 1),
    * `lineitem` only transitively through the victim orders' keys
    * (depth 2 — the edge q128 audits as fk_lineitem_orders). A
    * compliance team signs off on this ledger; the delete job then
    * executes it table by table in reverse-depth order.
    *
    * Scale shape: the victim set is subject-domain-sized and BROADCASTS
    * into every depth-1 probe; the depth-2 probe equi-joins lineitem
    * against the victim ORDER keys (orders-of-victims-sized — AQE picks
    * broadcast when it fits, shuffle join when a huge batch doesn't).
    * Each table contributes one conditional-aggregate row; the ledger
    * assembles via q77's explode-of-structs over crossJoined 1-row
    * frames. Nothing row-sized reaches the driver.
    */
  def q144ErasurePlan(s: SparkSession, dir: String): DataFrame = {
    // Spark does not CSE across join branches, so the multiply-consumed
    // frames are checkpointed once (the repo's shared-frame convention):
    // victims feeds three probes, vOrders both the depth-1 ledger row and
    // the depth-2 lineitem probe.
    val victims = customer(s, dir)
      .filter(col("c_custkey") % EraseMod === 0)
      .select(col("c_custkey").as("uid"))
      .localCheckpoint(true)
    val cust = victims.agg(count(lit(1)).as("c_n"))
    val ev = events(s, dir).join(broadcast(victims), col("user_id") === col("uid"))
      .agg(count(lit(1)).as("e_n"), countDistinct(col("user_id")).as("e_k"))
    val vOrders = orders(s, dir).join(broadcast(victims), col("o_custkey") === col("uid"))
      .select(col("o_orderkey"), col("o_custkey"))
      .localCheckpoint(true)
    val ord = vOrders.agg(count(lit(1)).as("o_n"), countDistinct(col("o_custkey")).as("o_k"))
    val li = lineitem(s, dir)
      .join(vOrders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("l_n"), countDistinct(col("l_orderkey")).as("l_k"))
    cust.crossJoin(broadcast(ev)).crossJoin(broadcast(ord)).crossJoin(broadcast(li))
      .select(explode(array(
        struct(lit("customer").as("table_name"), lit(1).as("cascade_depth"),
          col("c_n").as("n_rows"), col("c_n").as("n_keys")),
        struct(lit("events").as("table_name"), lit(1).as("cascade_depth"),
          col("e_n").as("n_rows"), col("e_k").as("n_keys")),
        struct(lit("lineitem").as("table_name"), lit(2).as("cascade_depth"),
          col("l_n").as("n_rows"), col("l_k").as("n_keys")),
        struct(lit("orders").as("table_name"), lit(1).as("cascade_depth"),
          col("o_n").as("n_rows"), col("o_k").as("n_keys")))).as("r"))
      .select(col("r.table_name"), col("r.cascade_depth"),
        col("r.n_rows"), col("r.n_keys"))
      .orderBy(col("table_name"))
  }

  /** q151: PROFILE DRIFT — q133's ANALYZE ledger computed per PERIOD and
    * diffed. The reference side is the event log at or before
    * [[Temporal.DiffCutoff]], the current side everything after; for
    * every column both periods report rows / nulls / exact NDV / numeric
    * min-max side by side plus the NDV ratio — the whole-schema drift
    * check that catches what single-feature monitors miss (q99 watches
    * one categorical's shares, q147 one numeric's distribution; an
    * upstream schema change shows up HERE first, as an NDV collapse or a
    * range jump on a column nobody was watching).
    *
    * Scale shape: ONE scan — the side tag and the q133 lane explode are
    * both map-side, one (col_name, side) hash aggregate reduces to
    * 2×#columns rows (checkpointed), and the ref↔cur diff is an
    * equi-join of two filters over that tiny frame. NDV's scale path is
    * q133's: swap `countDistinct` for `approx_count_distinct`.
    */
  def q151ProfileDrift(s: SparkSession, dir: String): DataFrame = {
    val lanes = Seq[(String, Column, Column)](
      ("event_id", col("event_id").cast("string"), col("event_id").cast("double")),
      ("event_type", col("event_type"), lit(null).cast("double")),
      ("props", col("props"), lit(null).cast("double")),
      ("ts", col("ts").cast("string"), unix_micros(col("ts")).cast("double")),
      ("user_id", col("user_id").cast("string"), col("user_id").cast("double")),
      ("value", col("value").cast("string"), col("value")))
    val cut = lit(Temporal.DiffCutoff).cast("timestamp")
    val stats = laneStats(
        events(s, dir).withColumn("side",
          when(col("ts") <= cut, "ref").otherwise("cur")),
        lanes, Seq("side"))
      .localCheckpoint(true) // 2×#columns rows; both diff sides below
    val ref = stats.filter(col("side") === "ref").select(col("col_name"),
      col("n_rows").as("ref_rows"), col("n_null").as("ref_null"),
      col("ndv").as("ref_ndv"), col("min_num").as("ref_min"), col("max_num").as("ref_max"))
    val cur = stats.filter(col("side") === "cur").select(col("col_name").as("c_col"),
      col("n_rows").as("cur_rows"), col("n_null").as("cur_null"),
      col("ndv").as("cur_ndv"), col("min_num").as("cur_min"), col("max_num").as("cur_max"))
    ref.join(cur, col("col_name") === col("c_col"))
      .select(col("col_name"), col("ref_rows"), col("cur_rows"),
        col("ref_null"), col("cur_null"), col("ref_ndv"), col("cur_ndv"),
        round(col("cur_ndv").cast("double") / col("ref_ndv"), 6).as("ndv_ratio"),
        col("ref_min"), col("cur_min"), col("ref_max"), col("cur_max"))
      .orderBy(col("col_name"))
  }

  val q151Sql: String = {
    val cut = s"TIMESTAMP '${Temporal.DiffCutoff}'"
    def lane(name: String, strCast: String, numCast: String): String =
      s"""SELECT CASE WHEN ts <= $cut THEN 'ref' ELSE 'cur' END AS side,
         | '$name' AS col_name, $strCast AS v_str, $numCast AS v_num FROM events""".stripMargin
    val lanes = Seq(
      lane("event_id", "CAST(event_id AS VARCHAR)", "CAST(event_id AS DOUBLE)"),
      lane("event_type", "event_type", "CAST(NULL AS DOUBLE)"),
      lane("props", "props", "CAST(NULL AS DOUBLE)"),
      lane("ts", "CAST(ts AS VARCHAR)", "CAST(epoch_us(ts) AS DOUBLE)"),
      lane("user_id", "CAST(user_id AS VARCHAR)", "CAST(user_id AS DOUBLE)"),
      lane("value", "CAST(value AS VARCHAR)", "value"))
      .mkString("", "\nUNION ALL\n", "")
    s"""WITH lanes AS (
       |$lanes),
       |stats AS (
       |  SELECT col_name, side, CAST(count(*) AS BIGINT) AS n_rows,
       |   CAST(count(*) - count(v_str) AS BIGINT) AS n_null,
       |   CAST(count(DISTINCT v_str) AS BIGINT) AS ndv,
       |   min(v_num) AS min_num, max(v_num) AS max_num
       |  FROM lanes GROUP BY 1, 2)
       |SELECT r.col_name, r.n_rows AS ref_rows, c.n_rows AS cur_rows,
       | r.n_null AS ref_null, c.n_null AS cur_null,
       | r.ndv AS ref_ndv, c.ndv AS cur_ndv,
       | ROUND(CAST(c.ndv AS DOUBLE) / r.ndv, 6) AS ndv_ratio,
       | r.min_num AS ref_min, c.min_num AS cur_min,
       | r.max_num AS ref_max, c.max_num AS cur_max
       |FROM (SELECT * FROM stats WHERE side = 'ref') r
       |JOIN (SELECT * FROM stats WHERE side = 'cur') c ON r.col_name = c.col_name
       |ORDER BY r.col_name""".stripMargin
  }

  val q144Sql: String =
    s"""WITH v AS (SELECT c_custkey AS uid FROM customer WHERE c_custkey % $EraseMod = 0),
       |e AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT user_id) AS BIGINT) AS k
       |      FROM events JOIN v ON user_id = uid),
       |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
       |o AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT o_custkey) AS BIGINT) AS k
       |      FROM orders JOIN v ON o_custkey = uid),
       |oi AS (SELECT DISTINCT o_orderkey FROM orders JOIN v ON o_custkey = uid),
       |l AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS k
       |      FROM lineitem JOIN oi ON l_orderkey = o_orderkey)
       |SELECT * FROM (
       |  SELECT 'customer' AS table_name, 1 AS cascade_depth, c.n AS n_rows, c.n AS n_keys FROM c
       |  UNION ALL SELECT 'events', 1, e.n, e.k FROM e
       |  UNION ALL SELECT 'lineitem', 2, l.n, l.k FROM l
       |  UNION ALL SELECT 'orders', 1, o.n, o.k FROM o)
       |ORDER BY table_name""".stripMargin
}
