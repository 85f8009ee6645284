package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns._
import graft.functions.TopKPairs.topKPairs

/** Full-text retrieval over the document corpus: BM25-scored top-k search
  * (the lexical side of every RAG / training-data-inspection stack, and
  * the classic complement of the embedding ANN family in
  * [[graft.queries.Similarity]]).
  *
  * Scale design — the whole operator is inverted-index shaped:
  *   - The only frames that ever shuffle are keyed by VOCABULARY (term →
  *     df), DOCUMENT (doc_id → length, doc_id → matched-term scores), or
  *     QUERY (query_id → top-k heap): never the raw token stream and never
  *     a pair stream. Postings for the query terms are carved out of the
  *     per-document term-frequency aggregate by a BROADCAST join with the
  *     (tiny) query-term table, so the index side is one hash-aggregate
  *     pass over the corpus regardless of query count.
  *   - Global "pick the query terms" and per-query "top-k documents" both
  *     run through [[graft.functions.TopKPairs]] — a bounded heap that
  *     partial-aggregates map-side — so no unpartitioned window ever sorts
  *     a corpus-sized frame (the suite-wide PlanSpec guard applies here
  *     like everywhere else).
  *   - At 1000 executors the per-query score aggregation shuffles ≤
  *     (matched docs) rows keyed by (query_id, doc_id), and the final heap
  *     exchange carries ≤ k·partitions rows per query.
  *
  * Determinism / oracle parity: per-term BM25 scores are rounded to 6dp
  * and cast to DECIMAL(18,6) BEFORE the per-document sum, so the sum is
  * exact integer arithmetic in both engines (no float associativity in
  * any cross-row fold); idf is rounded to 6dp before the product (q53's
  * trick) so a last-ulp `ln` difference can never flip a ranking. All
  * ranking orders are total (score DESC, doc_id ASC; df ASC, hash60 ASC).
  */
object Retrieval {

  /** BM25 term-saturation constant (Robertson–Spärck Jones defaults). */
  val BmK1 = 1.2

  /** BM25 length-normalization constant. */
  val BmB = 0.75

  /** Number of query terms selected from the vocabulary. */
  val QueryTermCount = 16

  /** Terms per synthetic query: 16 terms → 8 two-term queries. */
  val TermsPerQuery = 2

  /** Documents returned per query. */
  val BmTopK = 10

  /** Minimum token length for a term to be query-eligible. */
  val MinTermLen = 4

  // ---------------------------------------------------------------- q164

  /** q164: BM25 top-k retrieval. The query workload is derived from the
    * corpus itself so both engines construct it identically: the
    * [[QueryTermCount]] RAREST tokens of length ≥ [[MinTermLen]]
    * (rarest = most discriminative under idf; total order df ASC then
    * hash60(term) ASC), grouped [[TermsPerQuery]]-at-a-time into
    * query_ids. Each query then scores every document matching ≥ 1 of its
    * terms (disjunctive retrieval, the standard BM25 form) and keeps the
    * [[BmTopK]] best:
    *
    *   score(q,d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *   idf(t)     = ln(1 + (N − df + ½)/(df + ½))      (Lucene's variant)
    *
    * Term selection uses TopKPairs over the vocabulary frame with
    * hash60(term) as the heap id (the heap carries longs, and the hash is
    * also the deterministic tiebreak + join-back key); the per-query
    * result heap is TopKPairs keyed by query_id. See the object Scaladoc
    * for why no corpus-sized frame ever crosses an exchange un-aggregated.
    */
  def q164Bm25(s: SparkSession, dir: String): DataFrame = {
    val d = resplit(documents(s, dir).select(col("doc_id"), col("text")))
    val tok = d.select(col("doc_id"), explode(words(col("text"))).as("term"))
    // The postings frame IS the index: materialize it once (eager local
    // checkpoint, the repo's memo idiom) so term selection, document
    // frequencies, document lengths, and the postings probe all read the
    // materialized aggregate instead of re-scanning + re-tokenizing the
    // corpus — without this the plan paid FOUR full corpus scans. Doc
    // length falls out of the index itself: Σ tf over a document is its
    // token count, so no separate length scan exists at any scale.
    val wc = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = wc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = wc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_total"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    bm25Rank(wc, dfreq, dl, stats)
  }

  /** The ranking core shared by q164 (batch index) and q168 (incremental
    * index): given the four index components — postings `(doc_id, term,
    * tf)`, vocabulary `(term, df)`, lengths `(doc_id, dl)`, corpus stats
    * `(n_total, avgdl)` 1-row — select the query workload and rank. The
    * components are pure mergeable aggregates, which is exactly what makes
    * the incremental path of q168 possible: HOW they were produced (one
    * batch pass or a base+delta fold) cannot affect the ranking.
    */
  private def bm25Rank(wc: DataFrame, dfreq: DataFrame, dl: DataFrame,
      stats: DataFrame): DataFrame = {
    // Query-term selection: bounded heap over the vocabulary, score =
    // -df (so the heap's score-DESC order is df-ASC), id = hash60(term).
    val qtop = dfreq
      .filter(length(col("term")) >= MinTermLen)
      .agg(topKPairs((-col("df")).cast("double"), hash60(col("term")),
        QueryTermCount).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select((floor(col("pos") / lit(TermsPerQuery)) + 1).cast("long").as("query_id"),
        col("t.id").as("h"))
    val qterms = qtop.join(
      dfreq.select(col("term"), col("df"), hash60(col("term")).as("h")), "h")
      .select(col("query_id"), col("term"), col("df"))

    // Postings for the query terms only: broadcast the 16-row term table
    // into the per-document tf aggregate, then attach doc length.
    val scored = wc.join(broadcast(qterms), "term")
      .join(dl, "doc_id")
      .join(broadcast(stats))
      .withColumn("idf", round(log(lit(1.0) +
        (col("n_total").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))), 6))
      .withColumn("s_term", round(
        (col("idf") * (col("tf").cast("double") * lit(BmK1 + 1.0))) /
          (col("tf").cast("double") + lit(BmK1) * (lit(1.0 - BmB) +
            lit(BmB) * (col("dl").cast("double") / col("avgdl")))), 6)
        .cast("decimal(18,6)"))

    scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_term")).as("score_dec"))
      .groupBy(col("query_id"))
      .agg(topKPairs(col("score_dec").cast("double"), col("doc_id"), BmTopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("t.id").as("doc_id"), col("t.score").as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val q164Sql: String = {
    val h60 = "CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ww FROM documents),
       |tok AS (SELECT doc_id, unnest(ww) AS term FROM d),
       |wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df, $h60 AS h FROM wc GROUP BY term),
       |qsel AS (
       |  SELECT term, df, row_number() OVER (ORDER BY df ASC, h ASC) AS rn
       |  FROM dfreq WHERE length(term) >= $MinTermLen),
       |qterms AS (
       |  SELECT CAST(floor(CAST(rn - 1 AS DOUBLE) / $TermsPerQuery) AS BIGINT) + 1 AS query_id,
       |         term, df
       |  FROM qsel WHERE rn <= $QueryTermCount),
       |dl AS (SELECT doc_id, CAST(len(ww) AS BIGINT) AS dl FROM d),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
       |                 CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |scored AS (
       |  SELECT q.query_id, w.doc_id,
       |   CAST(ROUND(
       |     (ROUND(ln(1.0 + (CAST(s.n_total AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
       |                     / (CAST(q.df AS DOUBLE) + 0.5)), 6)
       |      * (CAST(w.tf AS DOUBLE) * ${BmK1 + 1.0}))
       |     / (CAST(w.tf AS DOUBLE) + $BmK1 * (${1.0 - BmB}
       |        + $BmB * (CAST(l.dl AS DOUBLE) / s.avgdl))), 6) AS DECIMAL(18,6)) AS s_term
       |  FROM wc w JOIN qterms q USING (term) JOIN dl l ON w.doc_id = l.doc_id
       |  CROSS JOIN stats s),
       |perdoc AS (
       |  SELECT query_id, doc_id, SUM(s_term) AS score_dec FROM scored GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, CAST(score_dec AS DOUBLE) AS score,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY CAST(score_dec AS DOUBLE) DESC, doc_id) AS rnk
       |  FROM perdoc)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score FROM r
       |WHERE rnk <= $BmTopK ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q168

  /** q168: INCREMENTAL index maintenance for the BM25 retrieval — fold a
    * corpus increment into the stored index without rescanning the base,
    * then prove the fold changes nothing: the oracle is q164's BATCH
    * recompute over the full corpus, so the hash compare IS the
    * fold ≡ batch theorem (the q120/q121/q124 incremental-family
    * contract). The increment is the q124 convention (`doc_id % 10 = 3`,
    * a fresh crawl batch); the base postings are eagerly checkpointed —
    * the materialization boundary standing in for the stored index.
    *
    * Why the fold is exact (and cheap): every index component is a
    * MERGEABLE aggregate over doc-disjoint sides —
    *   - postings: base ∪ delta (doc-keyed, disjoint — no merge logic),
    *   - document frequencies: full-outer on term, df = df_b + df_d,
    *   - lengths: union; corpus stats: n = n_b + n_d and
    *     avgdl = (Σdl_b + Σdl_d)/(n_b + n_d) — LONG addition of partials,
    *     so the double division is bit-identical to the batch form.
    * Per-increment cost is O(delta tokens + vocabulary merge); the base
    * is touched only through its (vocabulary-sized and doc-sized)
    * aggregate components, never re-tokenized. At 100 TB this is the
    * difference between an index update and an index rebuild.
    */
  def q168Bm25Increment(s: SparkSession, dir: String): DataFrame = {
    val isDelta = col("doc_id") % 10 === 3
    def components(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      val tok = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      val wc = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfq = wc.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val dl = wc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      (wc, dfq, dl)
    }
    val corpus = resplit(documents(s, dir).select(col("doc_id"), col("text")))
    // the stored index (checkpoint = materialization boundary)
    val (wcB0, dfB, dlB) = components(corpus.filter(!isDelta))
    val wcB = wcB0.localCheckpoint()
    val (wcD, dfD, dlD) = components(corpus.filter(isDelta))

    val wc = wcB.unionByName(wcD)
    val dfreq = dfB.withColumnRenamed("df", "df_b")
      .join(dfD.withColumnRenamed("df", "df_d"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_b"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
    val dl = dlB.unionByName(dlD)
    def partialStats(d: DataFrame, n: String, sdl: String) =
      d.agg(count(lit(1)).as(n), sum(col("dl")).as(sdl))
    val stats = partialStats(dlB, "n_b", "s_b")
      .join(broadcast(partialStats(dlD, "n_d", "s_d")))
      .select((col("n_b") + col("n_d")).as("n_total"),
        ((col("s_b") + col("s_d")).cast("double") /
          (col("n_b") + col("n_d")).cast("double")).as("avgdl"))
    bm25Rank(wc, dfreq, dl, stats)
  }

  /** q168's oracle IS the batch recompute: fold ≡ batch, hash-proven. */
  val q168Sql: String = q164Sql
}
