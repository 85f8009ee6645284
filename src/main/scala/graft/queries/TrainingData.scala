package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns._
import graft.functions.TopKPairs.topKPairs

/** Dataset-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity (SURVEY.md §2.4 LLM-pipeline row): deterministic
  * sampling (stratified, split assignment, weighted mixture), id
  * densification, repetition/quality statistics, corpus vocabulary
  * analytics (heavy hitters, TF-IDF), and event-time range joins.
  *
  * Scale design:
  *   - Sampling is HASH-based, not `rand()`: keep/drop is a pure function
  *     of the row key and a salt, so it is reproducible across runs,
  *     engines, partitionings, and retries (a failed task re-samples
  *     identically), and it needs no shuffle at all — at 100 TB each of
  *     q47–q49 is a map-only pass over the scan.
  *   - The corpus-analytics queries (q51–q53) all flow through one
  *     explode → hash-aggregate shape: partial aggregation runs map-side,
  *     and the shuffled keyspace is the vocabulary / document set, not the
  *     token stream.
  *   - The range join (q54) turns an inequality join into a bucketed
  *     equi-join + residual filter — the standard way to keep an interval
  *     join off the nested-loop path at scale.
  *
  * Hashes bottom out in md5 ([[graft.functions.TextFns.hash60]]) so every
  * query ships an exact DuckDB oracle.
  */
object TrainingData {

  /** 2^60 as a double: hash60 values are uniform in [0, 2^60), so
    * `hash60 / 2^60` is a deterministic uniform in [0, 1).
    */
  private[queries] val HashUnit = 1152921504606846976.0

  /** Deterministic uniform in [0,1) from a key column and a salt. Both
    * engines compute the identical double: same md5 prefix, same integer,
    * same IEEE division.
    */
  private[queries] def uhash(key: Column, salt: String): Column =
    (hash60(concat(key.cast("string"), lit(":" + salt))).cast("double") / HashUnit)

  private[queries] def uhashSql(keyExpr: String, salt: String): String =
    s"(CAST(concat('0x', substr(md5(concat(CAST($keyExpr AS VARCHAR), ':$salt')), 1, 15)) AS BIGINT) / $HashUnit)"

  // ---------------------------------------------------------------- q47

  /** Per-language sampling rates for the stratified sample. Rendered into
    * both the Spark plan and the oracle SQL.
    */
  val StratRates: Seq[(String, Double)] =
    Seq("de" -> 0.5, "en" -> 0.25, "es" -> 0.5, "fr" -> 0.75, "zh" -> 1.0)

  private def rateExpr: Column = StratRates.foldRight(lit(0.0): Column) {
    case ((l, r), els) => when(col("lang") === l, lit(r)).otherwise(els)
  }

  private def rateSqlCase: String =
    "CASE " + StratRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ") + " ELSE 0.0 END"

  /** q47: stratified sampling — each language stratum is kept at its own
    * rate (downsample the over-represented languages, keep all of the
    * rare one). Map-only: keep ⇔ uhash(doc_id) < rate(lang); no shuffle,
    * no state, reproducible under retries.
    */
  def q47StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val u = uhash(col("doc_id"), "q47")
    documents(s, dir)
      .withColumn("u", u)
      .filter(col("u") < rateExpr)
      .select(col("doc_id"), col("lang"), col("source"), round(col("u"), 6).as("u"))
      .orderBy(col("doc_id"))
  }

  val q47Sql: String =
    s"""SELECT doc_id, lang, source, ROUND(u, 6) AS u FROM (
       |  SELECT doc_id, lang, source, ${uhashSql("doc_id", "q47")} AS u FROM documents)
       |WHERE u < $rateSqlCase
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q48

  /** q48: train/val/test split assignment + stratification audit. The
    * split is the same hash-threshold trick (0.8/0.1/0.1 on a per-doc
    * uniform); the output is the (lang, split) contingency table a
    * pipeline checks before training. One map pass + one tiny aggregate.
    */
  def q48SplitAssign(s: SparkSession, dir: String): DataFrame = {
    val u = uhash(col("doc_id"), "q48")
    documents(s, dir)
      .withColumn("split",
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))
  }

  val q48Sql: String =
    s"""SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM (
       |  SELECT lang, n_chars,
       |   CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT lang, n_chars, ${uhashSql("doc_id", "q48")} AS u FROM documents))
       |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  // ---------------------------------------------------------------- q49

  /** q49: weighted source mixture — resample the corpus so source k
    * contributes with weight w(k) = 0.5 + (k mod 4)·0.75 (∈ {0.5, 1.25,
    * 2.0, 2.75}; derived from the source id so both engines compute it).
    * Integer part = hard copies (explode), fractional part = one
    * hash-sampled extra copy — deterministic fractional upsampling, the
    * standard way training mixtures realize non-integer epoch weights.
    * Map-only + explode; fan-out is bounded by ⌈w⌉.
    */
  def q49SourceMixture(s: SparkSession, dir: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "([0-9]+)", 1).cast("int")
    val w = lit(0.5) + (srcNum % 4).cast("double") * lit(0.75)
    val u = uhash(col("doc_id"), "q49")
    val copies = floor(w).cast("long") + when(u < (w - floor(w)), 1L).otherwise(0L)
    documents(s, dir)
      .withColumn("weight", w)
      .withColumn("copies", copies)
      .select(col("doc_id"), col("source"), col("weight"), col("copies"),
        explode(when(col("copies") > 0, sequence(lit(1L), col("copies")))
          .otherwise(array().cast("array<bigint>"))).as("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val q49Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |   0.5 + (CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) % 4) * 0.75 AS weight,
       |   ${uhashSql("doc_id", "q49")} AS u
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, CAST(weight AS DOUBLE) AS weight,
       |   CAST(floor(weight) AS BIGINT)
       |     + CASE WHEN u < weight - floor(weight) THEN 1 ELSE 0 END AS copies
       |  FROM t)
       |SELECT doc_id, source, weight, copies, copy_idx
       |FROM c, unnest(range(1, copies + 1)) AS r(copy_idx)
       |ORDER BY doc_id, copy_idx""".stripMargin

  // ---------------------------------------------------------------- q50

  /** q50: id densification + pseudonymization — remap sparse external
    * user ids to dense contiguous ints (what an embedding table wants)
    * and to a salted-hash pseudonym (what privacy wants), then carry the
    * mapping back onto the event stream. The rank runs on the DISTINCT
    * key set (dimension-sized, not corpus-sized); the join back to events
    * is an ordinary equi-join AQE turns into a broadcast when the mapping
    * fits.
    *
    * The global rank is a TWO-PHASE rank, never a single-partition
    * window: `row_number() OVER (ORDER BY user_id)` on one partition
    * means one task sorts the whole dictionary — ~10⁹ distinct users on
    * a 100 TB event corpus. Instead: range-partition the keys (ascending
    * ranges land in ascending partition ids), rank locally within each
    * partition, and add each partition's cumulative predecessor count.
    * The offsets are B rows (B = cluster parallelism), combined with a
    * broadcast theta-join so the whole plan stays distributed — output is
    * bit-identical to the oracle's global row_number.
    */
  def q50IdDensify(s: SparkSession, dir: String): DataFrame = {
    val buckets = s.sparkContext.defaultParallelism
    val keys = events(s, dir).select(col("user_id")).distinct()
      .repartitionByRange(buckets, col("user_id"))
      .withColumn("bucket", spark_partition_id())
    // Eager checkpoint pins ONE bucket assignment for both consumers below
    // (the local-rank branch and the cnts/offsets branch): range-partition
    // boundaries come from seeded SAMPLING tied to RDD identity, so if the
    // two branches re-planned the exchange independently (exchange reuse
    // off, AQE divergence) they could bucket keys differently and silently
    // emit duplicate/gapped uid_dense values. Dimension-sized, so cheap.
    val local = keys.withColumn("local_rn",
      row_number().over(Window.partitionBy(col("bucket")).orderBy(col("user_id"))))
      .localCheckpoint(true)
    val cnts = local.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    // cumulative offset per bucket = Σ counts of strictly-lower buckets;
    // B×B broadcast theta-join over B rows — trivially small, and unlike
    // a cumulative-sum window it never plans a single-partition stage
    val offsets = cnts.select(col("bucket"), col("cnt"))
      .join(broadcast(cnts.select(col("bucket").as("lb"), col("cnt").as("lc"))),
        col("lb") < col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("lc")), lit(0L)).as("off"))
    val mapping = local.join(broadcast(offsets), "bucket")
      .select(col("user_id"),
        (col("off") + col("local_rn")).cast("long").as("uid_dense"),
        md5(concat(lit("uid:"), col("user_id").cast("string"))).as("uid_pseudo"))
    events(s, dir).select(col("event_id"), col("user_id"))
      .join(mapping, "user_id")
      .select(col("event_id"), col("user_id"), col("uid_dense"), col("uid_pseudo"))
      .orderBy(col("event_id"))
  }

  val q50Sql: String =
    """WITH m AS (
      |  SELECT user_id,
      |   row_number() OVER (ORDER BY user_id) AS uid_dense,
      |   md5(concat('uid:', CAST(user_id AS VARCHAR))) AS uid_pseudo
      |  FROM (SELECT DISTINCT user_id FROM events))
      |SELECT e.event_id, e.user_id, m.uid_dense, m.uid_pseudo
      |FROM events e JOIN m USING (user_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q51

  /** q51: repetition statistics — the Gopher-style quality signals that
    * catch template/boilerplate text: top-word dominance (max term
    * frequency / length) and duplicate 3-gram fraction (1 − distinct/total
    * 3-grams). Two explode → hash-aggregate passes (tokens, shingles),
    * joined on doc_id; everything partial-aggregates map-side.
    */
  def q51RepetitionStats(s: SparkSession, dir: String): DataFrame = {
    val d = resplit(documents(s, dir).select(col("doc_id"), col("text")))
    val wc = d.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    // tri_total derives from n_words (Σ tf = token count), so the shingle
    // pass below is the only second scan — no third pass over the corpus
    val stats = wc.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("max_tf"))
      .withColumn("tri_total",
        when(col("n_words") >= 3, col("n_words") - 2).otherwise(0L))
    val triDistinct = d
      .select(col("doc_id"), explode(shingles(words(col("text")), 3)).as("sh"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("tri_distinct"))
    stats
      .join(triDistinct, Seq("doc_id"), "left")
      .withColumn("tri_distinct", coalesce(col("tri_distinct"), lit(0L)))
      .withColumn("top_word_ratio",
        round(col("max_tf").cast("double") / col("n_words").cast("double"), 6))
      .withColumn("dup_3gram_frac",
        when(col("tri_total") > 0,
          round(lit(1.0) - col("tri_distinct").cast("double") / col("tri_total").cast("double"), 6))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("max_tf"),
        col("top_word_ratio"), col("tri_total"), col("tri_distinct"), col("dup_3gram_frac"))
      .orderBy(col("doc_id"))
  }

  val q51Sql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS t FROM w),
      |wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
      |stats AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |   CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS max_tf,
      |   CAST(CASE WHEN sum(c) >= 3 THEN sum(c) - 2 ELSE 0 END AS BIGINT) AS tri_total
      |  FROM wc GROUP BY doc_id),
      |sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |      THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
      |      ELSE [] END) AS s
      |    FROM w)),
      |trid AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tri_distinct FROM sh GROUP BY doc_id)
      |SELECT stats.doc_id, n_words, n_distinct, max_tf,
      | ROUND(CAST(max_tf AS DOUBLE) / n_words, 6) AS top_word_ratio,
      | tri_total, COALESCE(tri_distinct, 0) AS tri_distinct,
      | CASE WHEN tri_total > 0
      |   THEN ROUND(1.0 - CAST(COALESCE(tri_distinct, 0) AS DOUBLE) / tri_total, 6)
      |   ELSE 0.0 END AS dup_3gram_frac
      |FROM stats LEFT JOIN trid USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q52

  /** q52: vocabulary heavy hitters — top-10 tokens per language by
    * document frequency. Distinct (lang, doc, token) → aggregate on the
    * vocabulary keyspace → per-language top-k window. The shuffle carries
    * (lang, token) groups, not the token stream; the window partitions by
    * language, so no global sort. At extreme cardinality you'd swap the
    * exact count for a count-min sketch; the exact form is the oracle.
    */
  def q52HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("doc_freq").desc, col("token"))
    resplit(documents(s, dir).select(col("lang"), col("doc_id"), col("text")))
      .select(col("lang"), col("doc_id"), explode(words(col("text"))).as("token"))
      .distinct()
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("doc_freq"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .orderBy(col("lang"), col("rn"))
  }

  val q52Sql: String =
    """SELECT lang, token, doc_freq, rn FROM (
      |  SELECT lang, token, doc_freq,
      |   row_number() OVER (PARTITION BY lang ORDER BY doc_freq DESC, token) AS rn
      |  FROM (
      |    SELECT lang, token, CAST(count(*) AS BIGINT) AS doc_freq
      |    FROM (
      |      SELECT DISTINCT lang, doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |      FROM documents)
      |    GROUP BY lang, token))
      |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- q53

  /** q53: TF-IDF top-5 terms per document. Term frequencies and document
    * frequencies are two hash-aggregates over the exploded token stream;
    * the corpus size joins in as a broadcast scalar; the top-k is a
    * per-document window. idf is rounded to 6dp BEFORE the tf· product so
    * a last-ulp ln() difference between engines cannot flip the ranking.
    */
  def q53Tfidf(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val wc = resplit(d.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = wc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nTotal = d.agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    wc.join(dfreq, "term")
      .join(broadcast(nTotal))
      .withColumn("idf",
        round(log(col("n_total").cast("double") / col("df").cast("double")), 6))
      .withColumn("tfidf", round(col("tf").cast("double") * col("idf"), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val q53Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      |wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wc GROUP BY term),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |   ROUND(CAST(tf AS DOUBLE)
      |         * ROUND(ln(CAST(n_total AS DOUBLE) / df), 6), 6) AS tfidf
      |  FROM wc JOIN dfreq USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tf, df, tfidf, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      |  FROM scored)
      |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q54

  /** q54: event-time range join — for every event, how many events the
    * same user produced in the preceding hour. The inequality join is
    * executed as a bucketed equi-join: both sides bucket ts into 1-hour
    * cells, the probe side fans out to (cell, cell+1) so every candidate
    * pair shares a bucket, and the exact [ts−1h, ts) predicate filters
    * residuals. Spark plans an ordinary shuffle hash join on
    * (user_id, bucket) — no nested-loop, no cross product; fan-out is a
    * constant 2×. The left join back preserves zero-count events.
    */
  def q54RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    // floor(), not a bare long cast: the cast truncates TOWARD ZERO, so
    // pre-1970 (negative-µs) timestamps land one cell high and "bucket"
    // stops meaning a true hour cell. (The ±1 probe fan-out below happens
    // to compensate — both sides shift together, so no pair was actually
    // lost — but correctness then rests on that accident instead of the
    // invariant; floor restores the invariant, pinned by the pre-1970
    // case in TrainingDataSpec.)
    val e = events(s, dir).select(col("event_id"), col("user_id"), col("ts"),
      unix_micros(col("ts")).as("t_us"))
      .withColumn("bucket", floor(col("t_us") / HourUs).cast("long"))
    val p = events(s, dir).select(col("user_id").as("p_user"),
      unix_micros(col("ts")).as("p_us"))
      .withColumn("p_bucket", floor(col("p_us") / HourUs).cast("long"))
      .select(col("p_user"), col("p_us"),
        explode(array(col("p_bucket"), col("p_bucket") + 1)).as("probe_bucket"))
    val counts = e.join(p,
        col("user_id") === col("p_user") && col("bucket") === col("probe_bucket")
          && col("p_us") >= col("t_us") - HourUs && col("p_us") < col("t_us"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
    e.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("n"), lit(0L)).as("n_prev_1h"))
      .orderBy(col("event_id"))
  }

  val q54Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      | CAST(COALESCE(c.n, 0) AS BIGINT) AS n_prev_1h
      |FROM events e LEFT JOIN (
      |  SELECT e.event_id, count(*) AS n
      |  FROM events e JOIN events p
      |    ON p.user_id = e.user_id
      |   AND epoch_us(p.ts) >= epoch_us(e.ts) - 3600000000
      |   AND epoch_us(p.ts) < epoch_us(e.ts)
      |  GROUP BY e.event_id) c USING (event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q56

  /** Chunk geometry: window of [[ChunkSize]] tokens advancing by
    * [[ChunkStride]] (overlap = size − stride), the standard
    * RAG/pretraining chunking shape.
    */
  val ChunkSize: Int = 50
  val ChunkStride: Int = 40

  /** q56: document chunking — split each document's token stream into
    * fixed-size overlapping windows (short docs → one whole-doc chunk).
    * Pure map + generator (`sequence` + `slice` + explode): rows multiply
    * where the data lives, no shuffle except the presentation sort; the
    * per-doc fan-out is ⌈max(n−size,0)/stride⌉+1, bounded by doc length.
    */
  def q56ChunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    // number of chunks c ≥ 1 such that (c-1)·stride + size covers n:
    // c = floor((max(n - size, 0) + stride - 1) / stride) + 1
    // (Column./ is double division; floor+cast recovers the integer form)
    val nChunks = floor(
      (greatest(size(ws) - ChunkSize, lit(0)) + (ChunkStride - 1)) / ChunkStride
    ).cast("long") + 1L
    documents(s, dir)
      .select(col("doc_id"), ws.as("ws"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("ws"), (col("chunk_idx") * ChunkStride + 1).cast("int"),
          lit(ChunkSize)), " ").as("chunk_text"),
        size(slice(col("ws"), (col("chunk_idx") * ChunkStride + 1).cast("int"),
          lit(ChunkSize))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q56Sql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, ws,
       |   (greatest(len(ws) - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride + 1 AS n_chunks
       |  FROM w)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       | array_to_string(ws[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkSize], ' ') AS chunk_text,
       | CAST(len(ws[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkSize]) AS BIGINT) AS n_tokens
       |FROM c, unnest(range(0, n_chunks)) AS r(chunk_idx)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q57

  /** q57: deterministic corpus shuffle — training pipelines need the
    * example order randomized but REPRODUCIBLE; `ORDER BY
    * md5(key‖salt)` gives a salt-keyed pseudorandom permutation that is
    * identical across runs, engines, and partitionings. Spark executes
    * the total order as a range-partitioned distributed sort (sampled
    * range exchange, per-partition sort) — the scale-correct global
    * shuffle, no single-partition window anywhere.
    */
  def q57CorpusShuffle(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":q57"))).as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  val q57Sql: String =
    """SELECT doc_id, lang, source,
      | md5(concat(CAST(doc_id AS VARCHAR), ':q57')) AS shuffle_key
      |FROM documents
      |ORDER BY shuffle_key, doc_id""".stripMargin

  // ---------------------------------------------------------------- q65

  /** Fixed per-stratum sample size. */
  val FixedK: Int = 20

  /** q65: fixed-budget stratified sampling — exactly [[FixedK]] docs per
    * language (rate-based q47 gives a BINOMIAL count per stratum; eval
    * sets and ablation budgets need an exact one). Selection = the k
    * smallest salted hashes per stratum, which is a uniform without-
    * replacement draw, reproducible across runs/engines/retries. Runs on
    * the [[graft.functions.TopKPairs]] bounded-heap aggregate (score =
    * −u), so each map partition contributes ≤ k candidates per stratum
    * to the shuffle — no per-stratum sort of the corpus.
    */
  def q65FixedSample(s: SparkSession, dir: String): DataFrame = {
    val u = uhash(col("doc_id"), "q65")
    documents(s, dir)
      .select(col("lang"), col("doc_id"), (-u).as("neg_u"))
      .groupBy(col("lang"))
      .agg(topKPairs(col("neg_u"), col("doc_id"), FixedK).as("picks"))
      .select(col("lang"), posexplode(col("picks")).as(Seq("pos", "p")))
      .select(col("lang"), col("p.id").as("doc_id"),
        round(-col("p.score"), 6).as("u"), (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  val q65Sql: String =
    s"""SELECT lang, doc_id, ROUND(u, 6) AS u, rnk FROM (
       |  SELECT lang, doc_id, u,
       |   row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rnk
       |  FROM (SELECT lang, doc_id, ${uhashSql("doc_id", "q65")} AS u FROM documents))
       |WHERE rnk <= $FixedK ORDER BY lang, rnk""".stripMargin

  // ---------------------------------------------------------------- q66

  /** Cosine threshold for semantic contamination. */
  val SemanticThreshold: Double = 0.30

  /** q66: semantic decontamination — the embedding-space counterpart of
    * q60's lexical check: flag training vectors whose cosine similarity
    * to ANY eval vector (every 10th id, mirroring q60's split) exceeds
    * the threshold. The eval side is tiny by construction, so Spark
    * broadcasts it and the scan of the training side is map-only — the
    * same shape at 100 TB. Threshold is corpus-calibrated (cf. q40);
    * production paraphrase-contamination runs at ~0.9+.
    */
  def q66SemanticDecontam(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.DotFold.dotFold
    def side(f: Column => Column) =
      resplit(embeddings(s, dir).filter(f(col("vec_id") % 10))
          .select(col("vec_id"), col("embedding")))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", sqrt(dotFold(col("v"), col("v"))))
    val evalSide = side(_ === 0)
      .select(col("vec_id").as("e_id"), col("v").as("ev"), col("norm").as("enorm"))
    side(_ =!= 0)
      .join(broadcast(evalSide),
        round(dotFold(col("v"), col("ev")) / (col("norm") * col("enorm")), 6)
          >= SemanticThreshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(round(dotFold(col("v"), col("ev")) / (col("norm") * col("enorm")), 6))
          .as("max_sim"))
      .orderBy(col("vec_id"))
  }

  val q66Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |     list_transform(v, x -> x * x)), (a, b) -> a + b)) AS norm
       |  FROM e),
       |ev AS (SELECT vec_id AS e_id, v AS evec, norm AS enorm FROM n WHERE vec_id % 10 = 0),
       |tr AS (SELECT vec_id, v, norm FROM n WHERE vec_id % 10 <> 0),
       |hits AS (
       |  SELECT tr.vec_id,
       |   ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |       list_transform(range(1, 65), i -> tr.v[i] * ev.evec[i])), (x, y) -> x + y)
       |     / (tr.norm * ev.enorm), 6) AS sim
       |  FROM tr JOIN ev ON TRUE)
       |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits, max(sim) AS max_sim
       |FROM hits WHERE sim >= $SemanticThreshold
       |GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q60

  /** Decontamination shingle width (word n-grams; 13 in the GPT-3 recipe,
    * 5 here because the synthetic docs are ~40 words).
    */
  val DecontamN: Int = 5

  /** Memoized distinct (doc_id, g) [[DecontamN]]-gram surface over the
    * WHOLE corpus, per (session, sfDir): the decontamination queries (q60
    * and the q100 funnel) both split this one frame into its eval and
    * train sides, so the corpus is shingled once per session, not once
    * per consumer — same sharing rationale (and snapshot contract) as
    * [[Dedup]]'s pair/label memos. Eagerly checkpointed: both consumers
    * read each half, and the frame is gram-surface-sized (bounded by
    * corpus tokens), the same thing the join itself must shuffle.
    */
  private val docGramsMemo = Dedup.registerMemo("decontam_doc_grams")
  private[graft] def docGrams(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(docGramsMemo, s, dir) {
      resplit(documents(s, dir).select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(shingles(words(col("text")), DecontamN)).as("g"))
        .distinct()
        .localCheckpoint(true)
    }

  /** q60: benchmark decontamination — flag training documents sharing any
    * word [[DecontamN]]-gram with the held-out eval set (stand-in: every
    * 10th doc), the overlap check run before any benchmark number is
    * trusted. Both sides are splits of the memoized [[docGrams]] surface
    * and meet in one equi-join on the shingle — an inverted-index
    * membership test like q22's, so cost is bounded by shared shingles,
    * not |train|×|eval|. At 100 TB the eval side is tiny: Spark
    * broadcasts it and the check degenerates to a map-side bloom/hash
    * lookup per training shingle.
    */
  def q60Decontamination(s: SparkSession, dir: String): DataFrame = {
    val g = docGrams(s, dir)
    val evalGrams = g.filter(col("doc_id") % 10 === 0)
      .select(col("g").as("eval_g"), col("doc_id").as("eval_doc"))
    val trainGrams = g.filter(col("doc_id") % 10 =!= 0)
    trainGrams
      .join(evalGrams, col("g") === col("eval_g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("eval_doc")).as("n_eval_docs"))
      .orderBy(col("doc_id"))
  }

  val q60Sql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamN
       |      THEN list_transform(range(1, len(w) - ${DecontamN - 2}),
       |             i -> array_to_string(w[i:i+${DecontamN - 1}], ' '))
       |      ELSE [] END) AS s
       |    FROM w)),
       |ev AS (SELECT doc_id AS eval_doc, s FROM g WHERE doc_id % 10 = 0),
       |tr AS (SELECT doc_id, s FROM g WHERE doc_id % 10 <> 0)
       |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       | CAST(count(DISTINCT ev.eval_doc) AS BIGINT) AS n_eval_docs
       |FROM tr JOIN ev ON tr.s = ev.s
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  // ---------------------------------------------------------------- q59

  /** Token budget per packed training sequence. */
  val PackBudget: Int = 512

  /** q59: sequence packing — lay the q56 chunks end-to-end per language
    * and cut packs every [[PackBudget]] tokens (a chunk belongs to the
    * pack where it STARTS, so packs are contiguous and deterministic;
    * boundary chunks overflow their pack, which real packers then
    * truncate/pad — the assignment, the distributed part, is what's
    * computed here). One prefix-sum window per language partition + one
    * aggregate; at 100 TB you pack within (shard, language) partitions —
    * the window key is the sharding key, never a global order.
    */
  def q59SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val langs = documents(s, dir).select(col("doc_id").as("d_id"), col("lang"))
    val chunks = q56ChunkDocuments(s, dir)
      .join(langs, col("doc_id") === col("d_id"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / PackBudget).cast("long"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("lang"), col("pack_id"))
  }

  val q59Sql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, ws,
       |   (greatest(len(ws) - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride + 1 AS n_chunks
       |  FROM w),
       |ch AS (
       |  SELECT doc_id, chunk_idx,
       |   CAST(len(ws[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkSize]) AS BIGINT) AS n_tokens
       |  FROM c, unnest(range(0, n_chunks)) AS r(chunk_idx)),
       |packed AS (
       |  SELECT d.lang, ch.doc_id, ch.chunk_idx, ch.n_tokens,
       |   SUM(ch.n_tokens) OVER (PARTITION BY d.lang ORDER BY ch.doc_id, ch.chunk_idx
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM ch JOIN documents d USING (doc_id))
       |SELECT lang, CAST((cum_tokens - n_tokens) // $PackBudget AS BIGINT) AS pack_id,
       | CAST(COUNT(*) AS BIGINT) AS n_chunks,
       | CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM packed GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin

  // ---------------------------------------------------------------- q58

  /** q58: the end-to-end curation funnel — the composition a real corpus
    * pipeline runs, with per-language counts at every stage for audit:
    *
    *   raw → quality filter (q18's composite ≥ 0.5)
    *       → near-dup removal (q45's connected components; a doc is
    *         dropped when its component canon is a different doc)
    *       → stratified sample (q47's per-language rates, fresh salt)
    *
    * The stages compose as column flags over one corpus scan joined to
    * the (tiny, near-dup-graph-sized) component labels — no stage
    * re-reads the corpus, and the funnel aggregate is a single group-by.
    */
  def q58CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    // the shared q18 composite (TextFns.qualityScore): filter and report
    // use the same definition by construction
    val quality = qualityScore(col("text"))
    // shared with q45 via the memo: one component computation per
    // (session, sfDir), not one per consumer — re-running the propagation
    // loop here was ⅓ of the round-4 bench
    val labels = Dedup.componentLabels(s, dir)
      .select(col("doc").as("l_doc"), col("comp"))
    def cnt(c: Column, name: String): Column = sum(when(c, 1L).otherwise(0L)).as(name)
    resplit(documents(s, dir).select(col("doc_id"), col("lang"), col("text")))
      .withColumn("quality", quality)
      .withColumn("u", uhash(col("doc_id"), "q58"))
      .join(labels, col("doc_id") === col("l_doc"), "left")
      .withColumn("qok", col("quality") >= 0.5)
      .withColumn("dropped", col("comp").isNotNull && col("comp") =!= col("doc_id"))
      .withColumn("samp", col("u") < rateExpr)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_raw"),
        cnt(col("qok"), "n_quality"),
        cnt(col("qok") && !col("dropped"), "n_deduped"),
        cnt(col("qok") && !col("dropped") && col("samp"), "n_sampled"))
      .orderBy(col("lang"))
  }

  val q58Sql: String =
    s"""WITH RECURSIVE ${Dedup.sqlComponentsCtes},
       |qd AS (
       |  SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\\s+') AS ww,
       |   ${uhashSql("doc_id", "q58")} AS u
       |  FROM documents),
       |qs AS (
       |  SELECT doc_id, lang, u,
       |   ${qualitySqlExpr("ww", "text")} AS quality
       |  FROM qd),
       |flags AS (
       |  SELECT qs.doc_id, lang,
       |   quality >= 0.5 AS qok,
       |   (l.comp IS NOT NULL AND l.comp <> qs.doc_id) AS dropped,
       |   u < $rateSqlCase AS samp
       |  FROM qs LEFT JOIN labels l ON qs.doc_id = l.doc)
       |SELECT lang,
       | CAST(COUNT(*) AS BIGINT) AS n_raw,
       | CAST(SUM(CASE WHEN qok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       | CAST(SUM(CASE WHEN qok AND NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
       | CAST(SUM(CASE WHEN qok AND NOT dropped AND samp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM flags GROUP BY lang ORDER BY lang""".stripMargin

  /** Flat sampling rate for the q100 capstone funnel. */
  val PipelineRate: Double = 0.5

  /** q100: the COMPLETE training-data pipeline as one query — the q58
    * funnel extended to the full production stage order, reported per
    * language over the training split:
    *
    *   train raw → quality (q18's composite ≥ 0.5)
    *             → deduped (q45's min-id component representative)
    *             → clean   (q60's eval-overlap decontamination)
    *             → sampled (q47's salted-hash thresholding)
    *
    * Each stage reuses the EXACT shared definition its standalone
    * operator verifies — qualityScore, the memoized component labels, the
    * DecontamN-gram eval overlap, uhash — so the funnel can never drift
    * from the operators it summarizes. Eval-split documents are not
    * stages here; they are the decontamination REFERENCE (and duplicates
    * of eval content drop at the dedup stage when the eval copy owns the
    * component: that is contamination removal working, not loss).
    *
    * Scale shape: the stage flags are one scan with three id-keyed
    * attachments — the pair-graph-sized labels, the broadcastable
    * contaminated-id set (distinct flagged TRAINING ids, a small fraction
    * of the corpus by construction of a held-out eval), and a map-only
    * hash — feeding one per-language conditional-sum aggregate. No new
    * exchange shapes beyond its verified components.
    */
  def q100FullPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val labels = Dedup.componentLabels(s, dir)
      .select(col("doc").as("l_doc"), col("comp"))
    val g = docGrams(s, dir)
    val evalG = g.filter(col("doc_id") % 10 === 0)
      .select(col("g").as("eval_g")).distinct()
    val contaminated = g.filter(col("doc_id") % 10 =!= 0)
      .join(evalG, col("g") === col("eval_g"), "left_semi")
      .select(col("doc_id").as("c_doc")).distinct()
    def cnt(c: Column, name: String): Column =
      sum(when(c, lit(1L)).otherwise(lit(0L))).as(name)
    resplit(d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("lang"), col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .join(labels, col("doc_id") === col("l_doc"), "left")
      .join(broadcast(contaminated), col("doc_id") === col("c_doc"), "left")
      .withColumn("qok", col("quality") >= 0.5)
      .withColumn("kept", col("comp").isNull || col("comp") === col("doc_id"))
      .withColumn("clean", col("c_doc").isNull)
      .withColumn("samp", uhash(col("doc_id"), "q100") < PipelineRate)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_raw"),
        cnt(col("qok"), "n_quality"),
        cnt(col("qok") && col("kept"), "n_deduped"),
        cnt(col("qok") && col("kept") && col("clean"), "n_clean"),
        cnt(col("qok") && col("kept") && col("clean") && col("samp"), "n_sampled"))
      .orderBy(col("lang"))
  }

  val q100Sql: String =
    s"""WITH RECURSIVE ${Dedup.sqlComponentsCtes},
       |w5 AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |g5 AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamN
       |      THEN list_transform(range(1, len(w) - ${DecontamN - 2}),
       |             i -> array_to_string(w[i:i+${DecontamN - 1}], ' '))
       |      ELSE [] END) AS s
       |    FROM w5)),
       |ev5 AS (SELECT DISTINCT s FROM g5 WHERE doc_id % 10 = 0),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM g5
       |  WHERE doc_id % 10 <> 0 AND s IN (SELECT s FROM ev5)),
       |qd AS (
       |  SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\\s+') AS ww,
       |   ${uhashSql("doc_id", "q100")} AS u
       |  FROM documents WHERE doc_id % 10 <> 0),
       |qs AS (
       |  SELECT doc_id, lang, u, ${qualitySqlExpr("ww", "text")} AS quality
       |  FROM qd),
       |flags AS (
       |  SELECT qs.doc_id, lang,
       |   quality >= 0.5 AS qok,
       |   (l.comp IS NULL OR l.comp = qs.doc_id) AS kept,
       |   c.doc_id IS NULL AS clean,
       |   u < $PipelineRate AS samp
       |  FROM qs LEFT JOIN labels l ON qs.doc_id = l.doc
       |  LEFT JOIN contam c ON qs.doc_id = c.doc_id)
       |SELECT lang,
       | CAST(COUNT(*) AS BIGINT) AS n_raw,
       | CAST(SUM(CASE WHEN qok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       | CAST(SUM(CASE WHEN qok AND kept THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
       | CAST(SUM(CASE WHEN qok AND kept AND clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       | CAST(SUM(CASE WHEN qok AND kept AND clean AND samp THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_sampled
       |FROM flags GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q105

  /** q105: leakage-safe train/val/test split. q48's per-document hash
    * split has a known eval-contamination failure mode: two near-duplicate
    * documents can land in different splits, so the model trains on a copy
    * of its own test data. The fix is to make the SPLIT UNIT the near-dup
    * connected component, not the document — hash the component label
    * (singletons label themselves), and every member inherits the
    * component's split. Output: per-split corpus composition plus a leak
    * audit measuring cross-split near-dup pairs under BOTH schemes —
    * structurally 0 for the component scheme (an edge's endpoints share a
    * component by construction; the query MEASURES it rather than assuming
    * it), and a genuine contamination count for the naive scheme.
    *
    * Scale shape: component labels are memoized from q45 (pair-graph-sized,
    * ≪ corpus) and ride one id-keyed equi-join onto a single corpus scan;
    * the split is a map-side pure function of the component id (same
    * salted-hash machinery as q47-q49, reproducible across engines and
    * retries). The leak audit joins the memoized pair set to the
    * pair-graph-sized label frame by id — never to the corpus — and its
    * 1-row result broadcasts onto the 3-row stats frame.
    */
  def q105LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    def splitOf(u: Column): Column =
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    val labels = Dedup.componentLabels(s, dir).select(col("doc"), col("comp"))
    val assigned = documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .join(labels, col("doc_id") === col("doc"), "left")
      .withColumn("comp_id", coalesce(col("comp"), col("doc_id")))
      .withColumn("split", splitOf(uhash(col("comp_id"), "q105")))
    // Leak audit on the pair graph alone: both endpoints of every near-dup
    // pair are in `labels`, so the corpus never enters this subtree.
    val sides = labels
      .withColumn("c_split", splitOf(uhash(col("comp"), "q105")))
      .withColumn("d_split", splitOf(uhash(col("doc"), "q48")))
    val leaks = Dedup.q22Cached(s, dir)
      .select(col("doc_a"), col("doc_b"))
      .join(sides.select(col("doc").as("pa"), col("c_split").as("ca"),
        col("d_split").as("da")), col("doc_a") === col("pa"))
      .join(sides.select(col("doc").as("pb"), col("c_split").as("cb"),
        col("d_split").as("db")), col("doc_b") === col("pb"))
      .agg(
        coalesce(sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L)), lit(0L))
          .as("comp_leaked_pairs"),
        coalesce(sum(when(col("da") =!= col("db"), 1L).otherwise(0L)), lit(0L))
          .as("naive_leaked_pairs"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("comp_id")).as("n_components"),
        sum(col("n_chars")).as("sum_chars"))
      .join(broadcast(leaks))
      .orderBy(col("split"))
  }

  val q105Sql: String =
    s"""WITH RECURSIVE ${Dedup.sqlComponentsCtes},
       |asg AS (
       |  SELECT d.doc_id, d.n_chars, COALESCE(l.comp, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc),
       |sp AS (
       |  SELECT doc_id, n_chars, comp_id,
       |    CASE WHEN ${uhashSql("comp_id", "q105")} < 0.8 THEN 'train'
       |         WHEN ${uhashSql("comp_id", "q105")} < 0.9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM asg),
       |sides AS (
       |  SELECT doc,
       |    CASE WHEN ${uhashSql("comp", "q105")} < 0.8 THEN 'train'
       |         WHEN ${uhashSql("comp", "q105")} < 0.9 THEN 'val'
       |         ELSE 'test' END AS c_split,
       |    CASE WHEN ${uhashSql("doc", "q48")} < 0.8 THEN 'train'
       |         WHEN ${uhashSql("doc", "q48")} < 0.9 THEN 'val'
       |         ELSE 'test' END AS d_split
       |  FROM labels),
       |lk AS (
       |  SELECT
       |    CAST(COALESCE(SUM(CASE WHEN a.c_split <> b.c_split THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS comp_leaked_pairs,
       |    CAST(COALESCE(SUM(CASE WHEN a.d_split <> b.d_split THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS naive_leaked_pairs
       |  FROM near JOIN sides a ON near.doc_a = a.doc
       |            JOIN sides b ON near.doc_b = b.doc)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       | CAST(COUNT(DISTINCT comp_id) AS BIGINT) AS n_components,
       | CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       | comp_leaked_pairs, naive_leaked_pairs
       |FROM sp CROSS JOIN lk
       |GROUP BY split, comp_leaked_pairs, naive_leaked_pairs
       |ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q142

  /** Temporal split cutoff (train ≤ cutoff) and embargo width. Events
    * span 2024-01-01..30 at every sf, so the cutoff leaves a real test
    * tail.
    */
  val SplitCutoff: String = "2024-01-22 00:00:00"
  val EmbargoDays: Int = 2

  /** q142: TEMPORAL train/test split with an EMBARGO gap — the third
    * member of the split family (q48 hashes rows, q105 splits by
    * near-dup component; this one splits by TIME). Backtest-honest
    * evaluation on sequential data requires train strictly before test,
    * and an embargo band after the cutoff that belongs to NEITHER side:
    * rows there share lookback windows with the train boundary (a lagged
    * feature computed at cutoff+1h reads train-era events), so keeping
    * them in test leaks and keeping them in train moves the boundary.
    * The report is the split ledger: per side, row/user counts, the
    * actual time extent (an audit that the boundaries hold), and the
    * corpus share.
    *
    * Scale shape: assignment is a map-side CASE on the timestamp — no
    * shuffle at all until the 3-group ledger aggregate; the share
    * denominator rides q73's broadcast 1-row total. On a date-partitioned
    * layout (q103) the two kept sides prune to their directories at scan
    * time.
    */
  def q142TemporalSplit(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(SplitCutoff).cast("timestamp")
    val embargoEnd = expr(s"TIMESTAMP '$SplitCutoff' + INTERVAL $EmbargoDays DAYS")
    val assigned = events(s, dir).select(
      when(col("ts") <= cut, "train")
        .when(col("ts") <= embargoEnd, "embargo_dropped")
        .otherwise("test").as("split"),
      col("user_id"), col("ts"))
    val ledger = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"))
    val total = assigned.agg(count(lit(1)).as("total"))
    ledger.crossJoin(broadcast(total))
      .withColumn("share", round(col("n_events").cast("double") / col("total"), 6))
      .drop("total")
      .orderBy(col("split"))
  }

  val q142Sql: String =
    s"""WITH a AS (
       |  SELECT CASE WHEN ts <= TIMESTAMP '$SplitCutoff' THEN 'train'
       |    WHEN ts <= TIMESTAMP '$SplitCutoff' + INTERVAL $EmbargoDays DAYS
       |      THEN 'embargo_dropped'
       |    ELSE 'test' END AS split, user_id, ts
       |  FROM events)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_events,
       | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       | epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us,
       | ROUND(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events), 6) AS share
       |FROM a GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q177

  /** Negatives kept per positive pair, and the attempt budget they are
    * drawn from. 8 attempts for 4 keeps: an attempt is burned only by
    * colliding with the anchor, the positive, or an anchor-neighbor —
    * a few rows against the corpus — so 2× budget is deep margin, and a
    * (deterministically) exhausted pair just yields fewer negatives in
    * BOTH engines.
    */
  val NegPerPair: Int = 4
  val NegAttempts: Int = 8

  /** q177: deterministic contrastive negative sampling — for every
    * near-dup positive pair (q67's mode-aware ε-graph at the calibrated
    * 0.45 bar), draw [[NegPerPair]] corpus negatives that are NOT
    * ε-neighbors of the anchor: the (anchor, positive, negative) triples
    * a contrastive embedding trainer consumes (InfoNCE-style batches),
    * with the standard false-negative filter (drawing an actual neighbor
    * as a "negative" poisons the loss).
    *
    * Sampling is hash-threshold house style (never `rand()` — map-only,
    * reproducible under task retries, and oracle-replayable): attempt t
    * of pair (a, p) proposes vec_id = hash60(a‖':'‖p‖':'‖t) mod n, and
    * the first [[NegPerPair]] attempts surviving the validity filter
    * (exists in corpus, ≠ a, ≠ p, ∉ N_ε(a)) win, in attempt order. Every
    * step is an equi-join or a pair-partitioned window over an
    * attempts-bounded frame (positives × [[NegAttempts]] rows); the
    * corpus appears only as the broadcast 1-row count and the existence/
    * neighbor probes.
    */
  def q177ContrastiveNegatives(s: SparkSession, dir: String): DataFrame = {
    val pos = Similarity.q67NearDupLsh(s, dir)
      .select(col("keep_id").as("anchor_id"), col("drop_id").as("pos_id"))
      .localCheckpoint(true) // read by attempts and the neighbor filter
    val edges = pos.select(col("anchor_id").as("ea"), col("pos_id").as("eb"))
      .union(pos.select(col("pos_id").as("ea"), col("anchor_id").as("eb")))
    val cnt = embeddings(s, dir).agg(count(lit(1)).as("c"))
    val att = pos.crossJoin(broadcast(cnt))
      .select(col("anchor_id"), col("pos_id"),
        explode(sequence(lit(1), lit(NegAttempts))).as("attempt"), col("c"))
      .withColumn("cand",
        hash60(concat(col("anchor_id").cast("string"), lit(":"),
          col("pos_id").cast("string"), lit(":"),
          col("attempt").cast("string"))) % col("c"))
    val valid = att
      .join(embeddings(s, dir).select(col("vec_id").as("cand")), Seq("cand"), "left_semi")
      .filter(col("cand") =!= col("anchor_id") && col("cand") =!= col("pos_id"))
      .join(edges, col("ea") === col("anchor_id") && col("eb") === col("cand"), "left_anti")
    valid
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("anchor_id"), col("pos_id")).orderBy(col("attempt"))))
      .filter(col("rnk") <= NegPerPair)
      .select(col("anchor_id"), col("pos_id"), col("cand").as("neg_id"),
        col("attempt").cast("long").as("attempt"), col("rnk").cast("long").as("rnk"))
      .orderBy(col("anchor_id"), col("pos_id"), col("rnk"))
  }

  val q177Sql: String =
    s"""WITH ${Similarity.ndPairsSqlCtes(Similarity.NearDupThreshold, Similarity.NdBruteCrossoverN)},
       |pos AS MATERIALIZED (
       |  SELECT keep_id AS anchor_id, drop_id AS pos_id FROM brute
       |  UNION ALL SELECT keep_id, drop_id FROM banded),
       |edges AS (
       |  SELECT anchor_id AS ea, pos_id AS eb FROM pos
       |  UNION ALL SELECT pos_id, anchor_id FROM pos),
       |att AS (
       |  SELECT anchor_id, pos_id, t.t AS attempt,
       |   CAST(concat('0x', substr(md5(anchor_id || ':' || pos_id || ':' || t.t), 1, 15))
       |     AS BIGINT) % c AS cand
       |  FROM pos, unnest(range(1, ${NegAttempts + 1})) AS t(t), cnt),
       |valid AS (
       |  SELECT att.anchor_id, att.pos_id, att.attempt, att.cand
       |  FROM att JOIN embeddings ex ON ex.vec_id = att.cand
       |  WHERE att.cand <> att.anchor_id AND att.cand <> att.pos_id
       |   AND NOT EXISTS (
       |    SELECT 1 FROM edges WHERE edges.ea = att.anchor_id AND edges.eb = att.cand))
       |SELECT anchor_id, pos_id, neg_id, attempt, rnk FROM (
       |  SELECT anchor_id, pos_id, cand AS neg_id,
       |   CAST(attempt AS BIGINT) AS attempt,
       |   CAST(row_number() OVER (
       |     PARTITION BY anchor_id, pos_id ORDER BY attempt) AS BIGINT) AS rnk
       |  FROM valid)
       |WHERE rnk <= $NegPerPair
       |ORDER BY anchor_id, pos_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q189

  /** Token budget per training shard (q189). 4096 whitespace tokens —
    * small enough that every sf produces a multi-shard plan, large
    * enough that shards hold many documents.
    */
  val ShardTokenBudget: Long = 4096L

  /** q189: token-budget shard planner — assign documents, in ingestion
    * order, to contiguous training shards of ≈[[ShardTokenBudget]]
    * tokens: shard_id = (tokens before this doc) div budget, the greedy
    * contiguous sharding every pretraining data loader uses (a document
    * straddling a boundary goes to the shard its first token lands in,
    * so shards can exceed the budget by at most one document). The
    * output is the shard MANIFEST — per shard: document count, token
    * count, id range — the artifact a 100 TB run materializes before
    * writing a single shard file.
    *
    * Scale shape: the running token total is a TWO-PHASE distributed
    * prefix sum (q50's rank pattern with SUM in place of COUNT:
    * range-partition by doc_id, running sum within each partition,
    * broadcast cumulative bucket offsets) — never a single-partition
    * window; the manifest is one shard-keyed hash aggregate. All
    * integers.
    */
  /** Two-phase distributed prefix sum over a (doc_id, tc) frame →
    * (doc_id, tc, cum_before): range-partition by doc_id, running sum
    * within each partition, broadcast cumulative bucket offsets (q50's
    * rank pattern with SUM in place of COUNT — never a single-partition
    * window). Shared by the batch planner (q189, whole corpus) and the
    * incremental fold (q192, delta batch only).
    */
  private def prefixTokens(s: SparkSession, docsTc: DataFrame): DataFrame = {
    val buckets = s.sparkContext.defaultParallelism
    val tc = docsTc.repartitionByRange(buckets, col("doc_id"))
      .withColumn("bucket", spark_partition_id())
    // eager checkpoint pins ONE bucket assignment for both consumers
    // (q50's range-partition determinism note)
    val local = tc.withColumn("cum_in",
      sum(col("tc")).over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
      .localCheckpoint(true)
    val tots = local.groupBy(col("bucket")).agg(sum(col("tc")).as("btot"))
    val offs = tots.select(col("bucket"), col("btot"))
      .join(broadcast(tots.select(col("bucket").as("lb"), col("btot").as("lt"))),
        col("lb") < col("bucket"), "left")
      .groupBy(col("bucket")).agg(coalesce(sum(col("lt")), lit(0L)).as("off"))
    local.join(broadcast(offs), "bucket")
      .select(col("doc_id"), col("tc"), (col("off") + col("cum_in") - col("tc")).as("cum_before"))
  }

  /** The shard-manifest aggregate over a (doc_id, tc, cum_before) frame
    * whose cum_before is offset by `base` tokens — the shared tail of
    * q189 (base = 0, whole corpus) and q192's delta leg. */
  private def shardManifest(assigned: DataFrame, base: Long): DataFrame =
    assigned
      .select(col("doc_id"), col("tc"),
        expr(s"(cum_before + ${base}L) div $ShardTokenBudget").as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))

  private def docTokens(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("tc"))

  def q189ShardPlan(s: SparkSession, dir: String): DataFrame =
    shardManifest(prefixTokens(s, docTokens(s, dir)), 0L)
      .orderBy(col("shard_id"))

  val q189Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tc
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tc,
       |   CAST(COALESCE(sum(tc) OVER (ORDER BY doc_id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM d)
       |SELECT CAST(cum_before // $ShardTokenBudget AS BIGINT) AS shard_id,
       | CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(tc) AS BIGINT) AS n_tokens,
       | min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- q192

  private val shardManifestMemo = Dedup.registerMemo("shard_manifest")

  /** The id threshold splitting the already-planned base from the append
    * batch: the top tenth of the id RANGE (integer arithmetic on
    * min/max, identical in both engines). Appends arrive at the top of
    * the id space — exactly the workload an incremental shard planner
    * faces. */
  private[graft] def shardSplitAt(s: SparkSession, dir: String): Long = {
    val r = documents(s, dir).agg(min(col("doc_id")), max(col("doc_id"))).head()
    r.getLong(0) + (r.getLong(1) - r.getLong(0) + 1L) * 9L / 10L
  }

  /** The STORED base manifest: the q189 plan over the base corpus,
    * written once as a bucketed-by-shard_id external parquet table
    * (q102's writer) and read back through the catalog — the durable
    * artifact a production shard planner keeps between ingest batches.
    */
  private[graft] def storedShardManifest(s: SparkSession, dir: String, thr: Long): DataFrame =
    Dedup.memoized(shardManifestMemo, s, dir)(
      Layout.materializeBucketed(s, dir, "shard_manifest", "shard_id")(
        shardManifest(prefixTokens(s, docTokens(s, dir).filter(col("doc_id") < thr)), 0L)))

  /** q192: INCREMENTAL shard-plan maintenance — extend the stored
    * manifest (q189's artifact) with an append batch without re-scanning
    * the base corpus, then prove the fold changes nothing: the oracle is
    * q189's batch plan over the full corpus, so the hash compare IS
    * fold ≡ batch (the incremental-family contract, here for the
    * training-shard manifest).
    *
    * Why the fold is exact: appends land ABOVE every base id (the split
    * is the top tenth of the id range), so a delta doc's batch
    * tokens-before equals (base total) + (tokens before it within the
    * delta) — the base total reads off the STORED manifest (Σ n_tokens,
    * a shard-count-sized aggregate), the delta prefix is the shared
    * two-phase prefix sum over the batch alone, and the manifest rows
    * are per-shard SUM/MIN/MAX — mergeable across the straddling shard
    * (the one shard both sides may touch) by one more shard-keyed
    * aggregate. Per-increment cost: O(Δ) + the stored-manifest read.
    */
  def q192ShardIncrement(s: SparkSession, dir: String): DataFrame = {
    val thr = shardSplitAt(s, dir)
    val base = storedShardManifest(s, dir, thr)
    val baseTotal = base.agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
    val delta = shardManifest(
      prefixTokens(s, docTokens(s, dir).filter(col("doc_id") >= thr)), baseTotal)
    base.unionByName(delta)
      .groupBy(col("shard_id"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"), max(col("last_doc")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  /** q192's oracle IS q189's batch recompute: fold ≡ batch, hash-proven. */
  val q192Sql: String = q189Sql

  // ---------------------------------------------------------------- q194

  /** q194: contamination-removal CASCADE — the removal plan that closes
    * the hole between the exact check and the embedding space: q60
    * flags training documents that verbatim-overlap the eval set, but a
    * SEMANTIC near-copy of a flagged document (paraphrase, re-crawl
    * with perturbations) leaks the same content while sharing no exact
    * 5-gram — the known evasion channel q66 measures from the eval
    * side. The plan removes the direct hits AND every train document
    * that is an ε-neighbor (the q173 radius, cos ≥ 0.40 — deliberately
    * the wide review net, not the 0.95 near-copy bar) of a direct hit,
    * each row carrying its reason (`direct` / `semantic`) and the hit
    * it cascaded through. Note the TEXT-graph cascade would be vacuous
    * by construction: an exact-shingle clone of a direct hit shares the
    * leaked grams and is already a direct hit itself — measured on all
    * three fixtures before this design was chosen.
    *
    * Scale shape: composes two MEMOIZED artifacts (q60's gram-join hit
    * set; the shared ε-pair frame [[Clustering.rawEpsPairs]]) with
    * id-keyed semi/anti-joins — no new corpus scan, no new pair
    * generation.
    */
  def q194ContamCascade(s: SparkSession, dir: String): DataFrame = {
    val direct = q60Decontamination(s, dir).select(col("doc_id")).localCheckpoint(true)
    val pairs = Clustering.rawEpsPairs(s, dir).select(col("keep_id"), col("drop_id"))
    val edges = pairs
      .union(pairs.select(col("drop_id").as("keep_id"), col("keep_id").as("drop_id")))
      .toDF("a", "b")
    val clones = edges
      .join(direct.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .filter(col("b") % 10 =!= 0)
      .join(direct.withColumnRenamed("doc_id", "b"), Seq("b"), "left_anti")
      .groupBy(col("b").as("doc_id")).agg(min(col("a")).as("via_doc"))
      .select(col("doc_id"), lit("semantic").as("reason"), col("via_doc"))
    val directRows = direct
      .select(col("doc_id"), lit("direct").as("reason"), col("doc_id").as("via_doc"))
    directRows.unionByName(clones).orderBy(col("doc_id"))
  }

  /** q194's oracle: q60's gram CTEs for the direct set + the mode-aware
    * ε-pair block for the semantic hop. */
  val q194Sql: String =
    s"""WITH ${Similarity.ndPairsSqlCtes(Clustering.DbscanEps, Clustering.DbscanCrossover)},
       |pairs2 AS (
       |  SELECT keep_id, drop_id FROM brute
       |  UNION ALL SELECT keep_id, drop_id FROM banded),
       |edges2 AS (
       |  SELECT keep_id AS a, drop_id AS b FROM pairs2
       |  UNION ALL SELECT drop_id, keep_id FROM pairs2),
       |w2 AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |g2 AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(w) >= $DecontamN
       |      THEN list_transform(range(1, len(w) - ${DecontamN - 2}),
       |             i -> array_to_string(w[i:i+${DecontamN - 1}], ' '))
       |      ELSE [] END) AS s
       |    FROM w2)),
       |ev AS (SELECT doc_id AS eval_doc, s FROM g2 WHERE doc_id % 10 = 0),
       |tr AS (SELECT doc_id, s FROM g2 WHERE doc_id % 10 <> 0),
       |direct AS (SELECT tr.doc_id FROM tr JOIN ev ON tr.s = ev.s GROUP BY tr.doc_id),
       |clones AS (
       |  SELECT e2.b AS doc_id, 'semantic' AS reason, min(e2.a) AS via_doc
       |  FROM edges2 e2 JOIN direct d ON e2.a = d.doc_id
       |  WHERE e2.b % 10 <> 0 AND e2.b NOT IN (SELECT doc_id FROM direct)
       |  GROUP BY e2.b),
       |directs AS (SELECT doc_id, 'direct' AS reason, doc_id AS via_doc FROM direct)
       |SELECT doc_id, reason, via_doc FROM directs
       |UNION ALL SELECT doc_id, reason, via_doc FROM clones
       |ORDER BY doc_id""".stripMargin
}
