package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for out-of-band scale validation
  * (the sf1 sweep): the driver ships sf ≤ 0.1 only, so measuring growth
  * curves at 10× needs a dataset the engine builds itself.
  *
  * Two regimes, both pure functions of (source data, row id) — no RNG
  * state, no wall clock, reproducible on any cluster layout:
  *
  *   - TPC-H-ish tables (customer/supplier/part/orders/lineitem, events)
  *     REPLICATE factor× with key-block shifts: replica r adds
  *     r·(max_key+1) to every primary/foreign key, so value
  *     distributions, join fan-outs, and group cardinalities per key are
  *     preserved EXACTLY — the safest way to keep 150+ queries
  *     semantically interesting at 10× without re-deriving the driver's
  *     generator. Key-embedded names (Customer#…/Supplier#…) are
  *     re-derived from the shifted key.
  *   - documents/embeddings REGENERATE fresh at factor× size following
  *     the driver corpus's measured recipe (30-word uniform vocab,
  *     10–100 words/doc, source = doc_id mod 20, ~5% near-dups marked
  *     with a trailing "dup" token, ~0.16% exact copies; unit-norm
  *     float32 vectors on the uniform sphere, hash labels 0–9) —
  *     replication would have made every doc a member of a 10-way exact
  *     dup group and degenerated the whole dedup family.
  *
  * The generation itself is an engine workload: every table is a
  * map-only expression pipeline (explode for replication, hash-derived
  * values), so generating 6M lineitem rows is embarrassingly parallel.
  *
  * Usage: runMain graft.GenData <srcSfDir> <outDir> [factor=10]
  */
object GenData {

  /** Replica fan-out: one output row per (input row, replica). */
  private def replicated(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("r", explode(sequence(lit(0L), lit(factor - 1L))))

  /** Shift a key into replica r's block: key + r·(max+1). */
  private def shift(key: String, bound: Long): Column =
    col(key) + col("r") * lit(bound + 1)

  private def maxOf(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0)

  // ---- fresh documents, per the measured driver recipe ----

  private val Vocab = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch")

  /** The corpus's PURE text for an id: 10–100 uniform-vocab words. The
    * dup machinery below copies other ids' pure texts, so this must stay
    * a function of the id alone.
    */
  private def pureText(id: Column): Column = {
    val vocabLit = array(Vocab.map(lit): _*)
    val k = (pmod(xxhash64(id, lit("len")), lit(91)) + 10).cast("int")
    concat_ws(" ", transform(sequence(lit(1), k),
      i => element_at(vocabLit, (pmod(xxhash64(id, i, lit("w")), lit(30)) + 1).cast("int"))))
  }

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    // dup base: 1–37 ids back, nudged off slots whose STORED text is not
    // their pure text (near-dup and exact-copy slots), so copies always
    // materialize as real stored-pair duplicates
    val rawBase = id - 1 - pmod(xxhash64(id, lit("b")), lit(37))
    val base0 = when(rawBase < 0, lit(0L)).otherwise(rawBase)
    val base = when(base0 % 20 === 19 || base0 % 625 === 624, base0 - 1).otherwise(base0)
    val text = when(id % 625 === 624, pureText(base))             // exact copy
      .when(id % 20 === 19, concat(pureText(base), lit(" dup")))  // near-dup
      .otherwise(pureText(id))
    val langRoll = pmod(xxhash64(id, lit("lang")), lit(100))
    spark.range(n).select(
      id.as("doc_id"),
      text.as("text"),
      when(langRoll < 41, "en").when(langRoll < 56, "zh")
        .when(langRoll < 71, "es").when(langRoll < 86, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), (id % 20).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // ---- fresh embeddings: uniform unit sphere, float32 ----

  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    // Box-Muller from two hash-uniforms per (vector, dim): an isotropic
    // gaussian, normalized to the unit sphere — the measured shape of the
    // driver's vectors (unit norms, no label cluster structure)
    def unit(d: Column, salt: String): Column =
      (pmod(xxhash64(id, d, lit(salt)), lit(1000000000L)).cast("double") + 0.5) / 1e9
    val gauss = transform(sequence(lit(0), lit(63)), d =>
      sqrt(lit(-2.0) * log(unit(d, "g1"))) * cos(lit(2.0 * math.Pi) * unit(d, "g2")))
    val norm = sqrt(aggregate(gauss, lit(0.0), (acc, x) => acc + x * x))
    spark.range(n).select(
      id.as("vec_id"),
      transform(gauss, x => (x / norm).cast("float")).as("embedding"),
      pmod(xxhash64(id, lit("lab")), lit(10)).cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenData <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-gendata")
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[gendata] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // dimensions: fixed-domain tables copy as-is
    write(read("region"), "region")
    write(read("nation"), "nation")

    val custMax = maxOf(read("customer"), "c_custkey")
    val suppMax = maxOf(read("supplier"), "s_suppkey")
    val partMax = maxOf(read("part"), "p_partkey")
    val orderMax = maxOf(read("orders"), "o_orderkey")

    write(replicated(read("customer"), factor).select(
      shift("c_custkey", custMax).as("c_custkey"),
      format_string("Customer#%09d", shift("c_custkey", custMax)).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")

    write(replicated(read("supplier"), factor).select(
      shift("s_suppkey", suppMax).as("s_suppkey"),
      format_string("Supplier#%09d", shift("s_suppkey", suppMax)).as("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    write(replicated(read("part"), factor).select(
      shift("p_partkey", partMax).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")

    write(replicated(read("orders"), factor).select(
      shift("o_orderkey", orderMax).as("o_orderkey"),
      shift("o_custkey", custMax).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    write(replicated(read("lineitem"), factor).select(
      shift("l_orderkey", orderMax).as("l_orderkey"),
      shift("l_partkey", partMax).as("l_partkey"),
      shift("l_suppkey", suppMax).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    val ev = Tables.events(spark, src)
    val evMax = maxOf(ev, "event_id")
    val userMax = maxOf(ev, "user_id")
    write(replicated(ev, factor).select(
      shift("event_id", evMax).as("event_id"),
      col("ts"),
      shift("user_id", userMax).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    val nDocs = read("documents").count() * factor
    write(documents(spark, nDocs).repartition(32), "documents")
    val nVecs = read("embeddings").count() * factor
    write(embeddings(spark, nVecs).repartition(32), "embeddings")

    println(s"[gendata] done: factor=$factor from $src into $out")
    spark.stop()
  }
}
