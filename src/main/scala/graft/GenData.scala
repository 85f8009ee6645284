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
  *   - documents/embeddings REGENERATE fresh at factor× size (replication
  *     would have made every doc a member of a 10-way exact dup group and
  *     degenerated the whole dedup family), in one of two corpus modes:
  *
  *     `realistic` (default): vocabulary grows with the corpus by Heaps'
  *     law (V(n) ≈ 7·n^0.55, keeping the driver's 30 words as the head)
  *     and word ranks draw Zipf-like (log-uniform), so shingle document
  *     frequencies follow the long-tailed shape of real text instead of
  *     growing linearly with corpus size; embeddings get 64 planted
  *     cluster centers with per-dim gaussian noise, so nearest-neighbor
  *     structure exists (cluster-mates) and ANN recall measures something
  *     — the r11 uniform-sphere corpus made top-k neighbors meaningless.
  *     Doc length, language mix, source, dup/copy planting, unit norms,
  *     and hash labels keep the driver recipe exactly.
  *
  *     `stress-uniform`: the r11 recipe verbatim (30-word uniform vocab,
  *     uniform-sphere vectors) — kept as the documented ADVERSARIAL
  *     variant: a fixed vocab drives shingle df ∝ corpus size (quadratic
  *     candidate pressure on every df-keyed index), the worst case the
  *     dedup family should survive, not the expected case.
  *
  * The generation itself is an engine workload: every table is a
  * map-only expression pipeline (explode for replication, hash-derived
  * values), so generating 6M lineitem rows is embarrassingly parallel.
  *
  * Usage: runMain graft.GenData <srcSfDir> <outDir> [factor=10]
  *          [realistic|stress-uniform]
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

  /** Heaps-law vocabulary size: V(n) ≈ K·n^β with the driver's 30 words
    * as a floor (they stay the rank-1..30 HEAD of the realistic draw; the
    * draw itself still differs from the stress recipe — log-uniform rank
    * vs uniform pmod-30 — so even a vocabulary-floor corpus is not
    * bit-identical across modes). K=7, β=0.55 lands V(50k)≈2690 — inside
    * the published 0.4–0.6 β band for natural text.
    */
  private[graft] def vocabSize(n: Long): Int =
    math.max(Vocab.size, math.round(7.0 * math.pow(n.toDouble, 0.55)).toInt)

  /** The corpus's PURE text for an id: 10–100 words. The dup machinery
    * below copies other ids' pure texts, so this must stay a function of
    * the id alone (and of the fixed corpus mode).
    *
    * `realistic` draws word RANKS log-uniformly over [1, V] — P(rank=r) ∝
    * 1/r, the Zipf-1 shape — so a few head words dominate tokens while
    * the df of a typical shingle stays roughly CONSTANT as the corpus
    * (and with it V) grows: the property that keeps df-keyed dedup
    * indexes near-linear. `stress` draws uniformly over the fixed 30.
    */
  private def pureText(id: Column, vocab: Int, realistic: Boolean): Column = {
    val vocabLit = array(Vocab.map(lit): _*)
    val k = (pmod(xxhash64(id, lit("len")), lit(91)) + 10).cast("int")
    def word(i: Column): Column = {
      if (!realistic)
        element_at(vocabLit, (pmod(xxhash64(id, i, lit("w")), lit(30)) + 1).cast("int"))
      else {
        val u = (pmod(xxhash64(id, i, lit("w")), lit(1000000000L)).cast("double") + 0.5) / 1e9
        val rank = least(floor(pow(lit(vocab.toDouble), u)).cast("int"), lit(vocab))
        when(rank <= Vocab.size, element_at(vocabLit, rank))
          .otherwise(concat(lit("w"), rank.cast("string")))
      }
    }
    concat_ws(" ", transform(sequence(lit(1), k), i => word(i)))
  }

  def documents(spark: SparkSession, n: Long,
      realistic: Boolean = true): DataFrame = {
    val vocab = vocabSize(n)
    def pure(c: Column): Column = pureText(c, vocab, realistic)
    val id = col("id")
    // dup base: 1–37 ids back, nudged off slots whose STORED text is not
    // their pure text (near-dup and exact-copy slots), so copies always
    // materialize as real stored-pair duplicates
    val rawBase = id - 1 - pmod(xxhash64(id, lit("b")), lit(37))
    val base0 = when(rawBase < 0, lit(0L)).otherwise(rawBase)
    val base = when(base0 % 20 === 19 || base0 % 625 === 624, base0 - 1).otherwise(base0)
    val text = when(id % 625 === 624, pure(base))             // exact copy
      .when(id % 20 === 19, concat(pure(base), lit(" dup")))  // near-dup
      .otherwise(pure(id))
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

  // ---- fresh embeddings: float32 unit vectors ----

  /** Planted-cluster count and per-dim noise std for the realistic
    * corpus. Noise total norm² ≈ 64·0.25² = 4 around unit centers puts
    * typical within-cluster cosine near 1/(1+4) = 0.2 — cluster-mates are
    * each other's nearest neighbors (ANN recall is meaningful) while
    * pairs above the 0.45 near-dup threshold stay a thin tail (the q40
    * pair ledger doesn't explode combinatorially).
    */
  private[graft] val EmbClusters = 64
  private[graft] val EmbNoiseStd = 0.25

  def embeddings(spark: SparkSession, n: Long,
      realistic: Boolean = true): DataFrame = {
    val id = col("id")
    // Box-Muller from two hash-uniforms per (seed, dim): an isotropic
    // gaussian; all randomness is a pure function of (seed column, dim,
    // salt) so regeneration is deterministic on any cluster layout
    def unit(seed: Column, d: Column, salt: String): Column =
      (pmod(xxhash64(seed, d, lit(salt)), lit(1000000000L)).cast("double") + 0.5) / 1e9
    def gaussOf(seed: Column, s1: String, s2: String): Column =
      transform(sequence(lit(0), lit(63)), d =>
        sqrt(lit(-2.0) * log(unit(seed, d, s1))) * cos(lit(2.0 * math.Pi) * unit(seed, d, s2)))
    val noise = gaussOf(id, "g1", "g2")
    val raw =
      if (!realistic) noise // r11 shape: uniform sphere, no structure
      else {
        // planted clusters: unit center (a pure function of the cluster
        // id — no centroid table, no join) + scaled per-vector noise
        val cluster = pmod(xxhash64(id, lit("cl")), lit(EmbClusters.toLong))
        val centRaw = gaussOf(cluster, "c1", "c2")
        val cnorm = sqrt(aggregate(centRaw, lit(0.0), (acc, x) => acc + x * x))
        zip_with(centRaw, noise, (c, g) => c / cnorm + lit(EmbNoiseStd) * g)
      }
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    spark.range(n).select(
      id.as("vec_id"),
      transform(raw, x => (x / norm).cast("float")).as("embedding"),
      pmod(xxhash64(id, lit("lab")), lit(10)).cast("int").as("label"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GenData <srcSfDir> <outDir> [factor] [realistic|stress-uniform] [table,...]")
    val (src, out) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val realistic = args.lift(3) match {
      case None | Some("realistic") => true
      case Some("stress-uniform")   => false
      case Some(other) => sys.error(s"unknown corpus mode '$other'")
    }
    // optional 5th arg: only generate the named tables — for targeted
    // scale points (e.g. a factor-20 embeddings corpus for the
    // brute/banded crossover measurement) without paying for a full
    // dataset nobody reads
    val only: Option[Set[String]] = args.lift(4).map(_.split(",").toSet)
    val spark = Sessions.local("graft-gendata")
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: => DataFrame, t: String): Unit =
      if (only.forall(_.contains(t))) {
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
    write(documents(spark, nDocs, realistic).repartition(32), "documents")
    val nVecs = read("embeddings").count() * factor
    write(embeddings(spark, nVecs, realistic).repartition(32), "embeddings")

    // the external retrieval workload travels WITH the generated dataset
    // (scale-independent: ids < 500 exist at every factor; the committed
    // copy in fixtures/queries.parquet serves the read-only driver dirs)
    write(spark.range(1)
      .select(explode(typedlit(queries.Retrieval.ExternalQueryIds)).as("query_id"))
      .coalesce(1), "queries")

    println(s"[gendata] done: factor=$factor corpus=" +
      (if (realistic) "realistic" else "stress-uniform") + s" from $src into $out")
    spark.stop()
  }
}
