package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.DotFold.dotFold
import graft.functions.TextFns._
import graft.functions.TopKPairs.topKPairs

/** Full-text retrieval over the document corpus: BM25-scored top-k search
  * (the lexical side of every RAG / training-data-inspection stack, and
  * the classic complement of the embedding ANN family in
  * [[graft.queries.Similarity]]), plus the fusion operator that combines
  * the two rankings (q170).
  *
  * Scale design — the whole operator is inverted-index shaped:
  *   - The only frames that ever shuffle are keyed by VOCABULARY (term →
  *     df), DOCUMENT (doc_id → length, doc_id → matched-term scores), or
  *     QUERY (query_id → top-k heap): never the raw token stream and never
  *     a pair stream. Postings for the query terms are carved out of the
  *     per-document term-frequency aggregate by a BROADCAST join with the
  *     (tiny) query-term table, so the index side is one hash-aggregate
  *     pass over the corpus regardless of query count.
  *   - Global "pick the query terms" runs through `orderBy(...).limit(k)`
  *     — Spark plans TakeOrderedAndProject, a bounded per-partition heap,
  *     so the vocabulary frame is never globally sorted; the per-query
  *     "top-k documents" heap is [[graft.functions.TopKPairs]], which
  *     partial-aggregates map-side. No unpartitioned window ever sorts a
  *     corpus-sized frame (the suite-wide PlanSpec guard applies here
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
  * ranking orders are total: (score DESC, doc_id ASC) for documents and
  * (df ASC, term ASC) for query-term selection — the term string itself
  * is the tiebreak, so there is NO hash anywhere in the selection path
  * (r13 advice: the previous hash60 heap id carried a ~|V|²/2⁶¹
  * md5-prefix collision window on the join-back; selecting on the string
  * removes the assumption instead of documenting it).
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

  // ------------------------------------------------------------ shared core

  /** Postings `(doc_id, term, tf)` of a `(doc_id, text)` frame — the one
    * corpus-sized tokenize + aggregate every retrieval path shares. Doc
    * length falls out of the postings themselves: Σ tf over a document is
    * its token count, so no separate length scan exists at any scale.
    */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Memoized full-corpus postings, one build per (session, dir) — the
    * r19-opt change: q164 and every [[hybridParts]] consumer (q170, q171,
    * q172, q185, q196) previously rebuilt the identical tokenize +
    * aggregate + eager checkpoint PER QUERY (six corpus passes per bench
    * session where one suffices). Same immutable-snapshot contract and
    * bench accounting as every other [[Dedup.registerMemo]] surface;
    * results are unchanged — consumers read the same frame they built
    * privately before. (q168's STORED base index is deliberately not
    * this: its substrate is the durable bucketed parquet table.)
    */
  private val postingsMemo = Dedup.registerMemo("bm25_postings_full")

  private def postingsCached(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(postingsMemo, s, dir)(
      postings(resplit(documents(s, dir).select(col("doc_id"), col("text"))))
        .localCheckpoint())

  /** Corpus stats `(n_total, avgdl)` (1 row) from a lengths frame. */
  private def corpusStats(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_total"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))

  /** Synthetic query workload from the vocabulary: the [[QueryTermCount]]
    * RAREST terms of length ≥ [[MinTermLen]] (rarest = most discriminative
    * under idf; total order df ASC, term ASC), grouped [[TermsPerQuery]]
    * at a time into query_ids. `orderBy.limit` plans
    * TakeOrderedAndProject — a bounded distributed heap over the
    * vocabulary, carrying the term STRING through selection (no hash id,
    * no join-back); the 16 survivors collapse to one row whose
    * `sort_array` restores the global (df, term) order for positional
    * query grouping.
    */
  private def selectQueryTerms(dfreq: DataFrame): DataFrame =
    dfreq.filter(length(col("term")) >= MinTermLen)
      .orderBy(col("df").asc, col("term").asc)
      .limit(QueryTermCount)
      .agg(sort_array(collect_list(struct(col("df"), col("term")))).as("sel"))
      .select(posexplode(col("sel")).as(Seq("pos", "t")))
      .select((floor(col("pos") / lit(TermsPerQuery)) + 1).cast("long").as("query_id"),
        col("t.term").as("term"), col("t.df").as("df"))

  /** Per-(query, document) BM25 scores from the four index components —
    * postings `(doc_id, term, tf)`, lengths `(doc_id, dl)`, corpus stats
    * `(n_total, avgdl)` (1 row), and a query-term table `(query_id, term,
    * df)`:
    *
    *   score(q,d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *   idf(t)     = ln(1 + (N − df + ½)/(df + ½))      (Lucene's variant)
    *
    * The components are pure mergeable aggregates, which is exactly what
    * makes the incremental path of q168 possible: HOW they were produced
    * (one batch pass, or a stored-index + delta fold) cannot affect the
    * scores. Returns `(query_id, doc_id, score_dec)` with the score an
    * exact DECIMAL(18,6) sum of 6dp-rounded per-term contributions.
    */
  private def bm25PerDoc(wc: DataFrame, dl: DataFrame, stats: DataFrame,
      qterms: DataFrame): DataFrame =
    wc.join(broadcast(qterms), "term")
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
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_term")).as("score_dec"))

  /** Per-query top-k over a `(query_id, doc_id, score_dec)` frame via the
    * bounded [[graft.functions.TopKPairs]] heap (total order: score DESC,
    * doc_id ASC). */
  private def rankTop(perDoc: DataFrame, k: Int): DataFrame =
    perDoc.groupBy(col("query_id"))
      .agg(topKPairs(col("score_dec").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("t.id").as("doc_id"), col("t.score").as("score"))
      .orderBy(col("query_id"), col("rnk"))

  // ---------------------------------------------------------------- q164

  /** q164: BM25 top-k retrieval. The query workload is derived from the
    * corpus itself so both engines construct it identically
    * ([[selectQueryTerms]]); each query scores every document matching
    * ≥ 1 of its terms (disjunctive retrieval, the standard BM25 form) and
    * keeps the [[BmTopK]] best. See the object Scaladoc for why no
    * corpus-sized frame ever crosses an exchange un-aggregated.
    */
  def q164Bm25(s: SparkSession, dir: String): DataFrame = {
    // The postings frame IS the index: materialized once per session
    // ([[postingsCached]]) so term selection, document frequencies,
    // document lengths, and the postings probe all read the materialized
    // aggregate instead of re-scanning + re-tokenizing the corpus —
    // without the checkpoint the plan paid FOUR full corpus scans, and
    // without the memo each retrieval query paid its own build.
    val wc = postingsCached(s, dir)
    val dfreq = wc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = wc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    rankTop(bm25PerDoc(wc, dl, corpusStats(dl), selectQueryTerms(dfreq)), BmTopK)
  }

  val q164Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ww FROM documents),
       |tok AS (SELECT doc_id, unnest(ww) AS term FROM d),
       |wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wc GROUP BY term),
       |qsel AS (
       |  SELECT term, df, row_number() OVER (ORDER BY df ASC, term ASC) AS rn
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

  // ---------------------------------------------------------------- q168

  /** The corpus increment (q124's convention: a fresh crawl batch). */
  private val isDeltaDoc = col("doc_id") % 10 === 3

  private val bm25BaseMemo = Dedup.registerMemo("bm25_base_index")

  /** The STORED base index: base-corpus postings written ONCE as a
    * bucketed-by-term external parquet table (q102's layout pattern,
    * shared writer [[graft.queries.Layout.materializeBucketed]]) and read
    * back through the catalog. Durable-index semantics, not a
    * session-lifetime checkpoint (r13 verdict #3): a production increment
    * folds against the index ON DISK, and the bucket metadata makes the
    * vocabulary derivation below exchange-free.
    */
  private[graft] def storedBasePostings(s: SparkSession, dir: String): DataFrame =
    Dedup.memoized(bm25BaseMemo, s, dir)(
      Layout.materializeBucketed(s, dir, "bm25_postings", "term")(
        postings(resplit(documents(s, dir).select(col("doc_id"), col("text")))
          .filter(!isDeltaDoc))))

  /** q168: INCREMENTAL index maintenance for the BM25 retrieval — fold a
    * corpus increment into the stored index without rescanning the base,
    * then prove the fold changes nothing: the oracle is q164's BATCH
    * recompute over the full corpus, so the hash compare IS the
    * fold ≡ batch theorem (the q120/q121/q124 incremental-family
    * contract). The increment is the q124 convention (`doc_id % 10 = 3`,
    * a fresh crawl batch); the base postings are a DURABLE bucketed
    * parquet table ([[storedBasePostings]]).
    *
    * Why the fold is exact (and cheap): every index component is a
    * MERGEABLE aggregate over doc-disjoint sides —
    *   - postings: stored ∪ delta (doc-keyed, disjoint — no merge logic),
    *   - document frequencies: full-outer on term, df = df_b + df_d,
    *   - lengths: union; corpus stats: n = n_b + n_d and
    *     avgdl = (Σdl_b + Σdl_d)/(n_b + n_d) — LONG addition of partials,
    *     so the double division is bit-identical to the batch form.
    * EVERY base-side component (df, dl, stats) is derived from the
    * read-back stored postings — the base corpus is never re-read and
    * never re-tokenized (r13 advice #1: previously df/dl hung off the
    * pre-materialization lineage, silently re-paying the tokenize), and
    * PlanSpec pins the base-side scans to the bucketed table. The
    * bucketed-by-term layout additionally makes the df derivation
    * shuffle-FREE (the groupBy(term) reads the scan's bucket
    * partitioning — q102's zero-exchange property, also pinned).
    * Degenerate corpora fold gracefully: an empty delta (or base)
    * contributes (0, 0) to the stats partials via `coalesce`, so the
    * fold degenerates to the batch result instead of nulling out avgdl
    * (r13 advice #2). Per-increment cost is O(delta tokens + vocabulary
    * merge). At 100 TB this is the difference between an index update
    * and an index rebuild.
    */
  def q168Bm25Increment(s: SparkSession, dir: String): DataFrame = {
    // the stored index, and every base-side component derived FROM it
    val wcB = storedBasePostings(s, dir)
    val dfB = wcB.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dlB = wcB.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // the increment, tokenized fresh EXACTLY ONCE (the only corpus text
    // the fold ever touches — the checkpoint fans the one delta pass out
    // to its three consumers: union, df_d, dl_d)
    val wcD = postings(resplit(documents(s, dir).select(col("doc_id"), col("text"))
      .filter(isDeltaDoc))).localCheckpoint()
    val dfD = wcD.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dlD = wcD.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

    val wc = wcB.unionByName(wcD)
    val dfreq = dfB.withColumnRenamed("df", "df_b")
      .join(dfD.withColumnRenamed("df", "df_d"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_b"), lit(0L)) + coalesce(col("df_d"), lit(0L))).as("df"))
    val dl = dlB.unionByName(dlD)
    def partialStats(d: DataFrame, n: String, sdl: String) =
      d.agg(count(lit(1)).as(n), coalesce(sum(col("dl")), lit(0L)).as(sdl))
    val stats = partialStats(dlB, "n_b", "s_b")
      .join(broadcast(partialStats(dlD, "n_d", "s_d")))
      .select((col("n_b") + col("n_d")).as("n_total"),
        ((col("s_b") + col("s_d")).cast("double") /
          (col("n_b") + col("n_d")).cast("double")).as("avgdl"))
    rankTop(bm25PerDoc(wc, dl, stats, selectQueryTerms(dfreq)), BmTopK)
  }

  /** q168's oracle IS the batch recompute: fold ≡ batch, hash-proven. */
  val q168Sql: String = q164Sql

  // ---------------------------------------------------------------- q170

  /** Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher,
    * SIGIR'09: k = 60 dominates each fused ranker and most learned
    * fusions on TREC runs — the de-facto production default). */
  val RrfK = 60

  /** External query workload size for the registered q170 (the PqQueries
    * convention: the smallest vec_ids, which at every sf are document ids
    * with BOTH a text and an embedding). */
  val HybridQueries = 8

  /** Query terms extracted per query document (its globally-rarest
    * eligible tokens — the more-like-this convention, bounding lexical
    * probe cost per query at any corpus size). */
  val HybridQueryTerms = 8

  /** Rank depth taken from each ranker before fusion. */
  val HybridDepth = 20

  /** Fused documents returned per query. */
  val HybridTopK = 10

  /** The RRF fusion core — RANKER-AGNOSTIC: takes any two `(query_id,
    * doc_id, rnk)` rankings over the same query workload and fuses them
    * by reciprocal rank:
    *
    *   rrf(d) = Σ_{rankers r ∋ d} 1/([[RrfK]] + rank_r(d))
    *
    * Each contribution is rounded to 6dp and summed as DECIMAL(18,6) —
    * integer-rank arithmetic, so the fused score is exact in both
    * engines. Output carries the per-ranker ranks (0 = absent from that
    * ranker's top-[[HybridDepth]]). The final per-query re-rank is a
    * PARTITIONED window over ≤ 2·depth rows per query — bounded by
    * construction, never corpus-sized.
    */
  private[graft] def fuseRrf(lex: DataFrame, sem: DataFrame): DataFrame = {
    val u = lex.select(col("query_id"), col("doc_id"), col("rnk"), lit("lex").as("src"))
      .unionByName(sem.select(col("query_id"), col("doc_id"), col("rnk"), lit("sem").as("src")))
    val fused = u.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(round(lit(1.0) / (lit(RrfK.toDouble) + col("rnk").cast("double")), 6)
          .cast("decimal(18,6)")).as("rrf_dec"),
        coalesce(max(when(col("src") === "lex", col("rnk"))), lit(0L)).as("lex_rnk"),
        coalesce(max(when(col("src") === "sem", col("rnk"))), lit(0L)).as("sem_rnk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_dec").desc, col("doc_id").asc)
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HybridTopK)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("rrf_dec").cast("double").as("rrf_score"),
        col("lex_rnk"), col("sem_rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The two rankings q170 fuses, for an ARBITRARY query-id workload
    * (`queryIds`: one `query_id` column of document ids — an input
    * table, not a baked-in synthesis; the registered q170 instantiates
    * it from the embeddings table, a caller with an external query
    * parquet passes that instead).
    *
    *   - LEXICAL: per query, the [[HybridQueryTerms]] globally-rarest
    *     eligible tokens OF THE QUERY DOCUMENT (more-like-this; total
    *     order df ASC, term ASC) probe the BM25 index — exactly q164's
    *     scoring core, self-match excluded, top-[[HybridDepth]] kept.
    *   - SEMANTIC: exact cosine of the query document's embedding
    *     against the corpus, self excluded, top-[[HybridDepth]] kept.
    *     Exact scan keeps the fused ranking hash-provable; the 100 TB
    *     deployment swaps this leg for q163's IVFADC probe — the fusion
    *     core is ranker-agnostic, which is the point.
    *
    * Scale shape: the query-term table is (queries × [[HybridQueryTerms]])
    * rows and broadcasts into the postings aggregate like q164's; the
    * semantic leg broadcasts (queries × dims) vectors and scans the
    * embedding table ONCE for all queries (per-row cost: |Q| dot
    * products, linear not quadratic); both heaps are bounded. The
    * query-vector frame's plan root is an AGGREGATE on query_id (one
    * vector per query by construction), so the PlanSpec boundedness
    * guard proves the broadcast build side bounded mechanically.
    */
  private[graft] def hybridParts(s: SparkSession, dir: String,
      queryIds: DataFrame): (DataFrame, DataFrame) = {
    // lexical leg — q164's index components (shared memoized postings)
    val wc = postingsCached(s, dir)
    val dfreq = wc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = wc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val wTerm = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("term").asc)
    val qterms = wc.join(broadcast(queryIds), col("doc_id") === col("query_id"))
      .filter(length(col("term")) >= MinTermLen)
      .select(col("query_id"), col("term"))
      .join(dfreq, "term")
      .withColumn("trn", row_number().over(wTerm))
      .filter(col("trn") <= HybridQueryTerms)
      .select(col("query_id"), col("term"), col("df"))
    val lex = rankTop(
      bm25PerDoc(wc, dl, corpusStats(dl), qterms)
        .filter(col("doc_id") =!= col("query_id")),
      HybridDepth)
    // semantic leg — exact cosine, one corpus scan for all queries
    val e = Similarity.vecs(s, dir)
    val qv = e.join(broadcast(queryIds), col("vec_id") === col("query_id"))
      .groupBy(col("query_id"))
      .agg(first(col("v")).as("qv"), first(col("norm")).as("qn"))
    val sem = e.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotFold(col("v"), col("qv")) / (col("norm") * col("qn")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKPairs(col("sim"), col("vec_id"), HybridDepth).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rnk"), col("t.score").as("score"))
    (lex.select(col("query_id"), col("doc_id"), col("rnk"), col("score")), sem)
  }

  /** q170: HYBRID lexical ⊕ semantic retrieval via reciprocal-rank fusion
    * — the canonical RAG-stack operator combining the BM25 (q164) and
    * embedding-ANN ([[graft.queries.Similarity]]) families (r13 verdict
    * #1). For each query document, its rarest terms probe the lexical
    * index and its embedding ranks the corpus semantically; [[fuseRrf]]
    * merges the two top-[[HybridDepth]] lists. Output: `(query_id, rnk,
    * doc_id, rrf_score, lex_rnk, sem_rnk)` — the per-ranker ranks expose
    * WHY a document fused where it did (0 = absent from that leg), which
    * is the number an operator reads when tuning fusion depth.
    *
    * The registered workload: the [[HybridQueries]] smallest vec_ids of
    * the embeddings table (the q109/q163 query convention) — ids that
    * carry both a text and an embedding at every sf. [[q170Sql]] builds
    * the identical workload, term selection, and fused arithmetic.
    */
  def q170HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val queryIds = embeddings(s, dir).select(col("vec_id").as("query_id"))
      .orderBy(col("query_id")).limit(HybridQueries)
    val (lex, sem) = hybridParts(s, dir, queryIds)
    fuseRrf(lex, sem)
  }

  /** The CTE body shared by the three hybrid-retrieval oracles
    * (q170/q171/q172): corpus index, query workload, per-query term
    * selection, BM25 scoring, the two rank lists (each carrying its raw
    * score for q171's normalization), and the RRF fusion — ONE text, so
    * the metric and weighted-fusion oracles can never drift from the
    * fusion oracle's arithmetic.
    */
  private val corpusQSelect: String =
    s"SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT $HybridQueries"

  private def hybridCtes: String = hybridCtesWith(corpusQSelect)

  /** [[hybridCtes]] with the query-workload CTE parameterized — q185
    * swaps the corpus-derived workload for the external fixture's id
    * list; every other CTE byte stays identical, so the external-workload
    * oracle can never drift from the q170/q171/q172 family's arithmetic.
    */
  private def hybridCtesWith(qSelect: String): String = {
    def fold(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |     list_transform(range(1, ${Similarity.AnnDims + 1}), i -> $a[i] * $b[i])), (x, y) -> x + y)""".stripMargin
    s"""d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ww FROM documents),
       |tok AS (SELECT doc_id, unnest(ww) AS term FROM d),
       |wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wc GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(ww) AS BIGINT) AS dl FROM d),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
       |                 CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |q AS ($qSelect),
       |qt0 AS (
       |  SELECT q.query_id, w.term, f.df,
       |   row_number() OVER (PARTITION BY q.query_id
       |     ORDER BY f.df ASC, w.term ASC) AS trn
       |  FROM q JOIN wc w ON w.doc_id = q.query_id JOIN dfreq f USING (term)
       |  WHERE length(w.term) >= $MinTermLen),
       |qterms AS (SELECT query_id, term, df FROM qt0 WHERE trn <= $HybridQueryTerms),
       |scored AS (
       |  SELECT t.query_id, w.doc_id,
       |   CAST(ROUND(
       |     (ROUND(ln(1.0 + (CAST(s.n_total AS DOUBLE) - CAST(t.df AS DOUBLE) + 0.5)
       |                     / (CAST(t.df AS DOUBLE) + 0.5)), 6)
       |      * (CAST(w.tf AS DOUBLE) * ${BmK1 + 1.0}))
       |     / (CAST(w.tf AS DOUBLE) + $BmK1 * (${1.0 - BmB}
       |        + $BmB * (CAST(l.dl AS DOUBLE) / s.avgdl))), 6) AS DECIMAL(18,6)) AS s_term
       |  FROM wc w JOIN qterms t USING (term) JOIN dl l ON w.doc_id = l.doc_id
       |  CROSS JOIN stats s
       |  WHERE w.doc_id <> t.query_id),
       |perdoc AS (
       |  SELECT query_id, doc_id, SUM(s_term) AS score_dec FROM scored GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, doc_id, CAST(score_dec AS DOUBLE) AS score,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY CAST(score_dec AS DOUBLE) DESC, doc_id) AS rnk
       |  FROM perdoc),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |     list_transform(v, x -> x * x)), (a, b) -> a + b)) AS norm
       |  FROM e),
       |sem0 AS (
       |  SELECT q.query_id, b.vec_id AS doc_id,
       |   ROUND(${fold("a.v", "b.v")} / (a.norm * b.norm), 6) AS sim
       |  FROM q JOIN n a ON a.vec_id = q.query_id
       |  JOIN n b ON b.vec_id <> q.query_id),
       |sem AS (
       |  SELECT query_id, doc_id, sim AS score,
       |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rnk
       |  FROM sem0),
       |u AS (
       |  SELECT query_id, doc_id, rnk, 'lex' AS src FROM lex WHERE rnk <= $HybridDepth
       |  UNION ALL
       |  SELECT query_id, doc_id, rnk, 'sem' AS src FROM sem WHERE rnk <= $HybridDepth),
       |fused AS (
       |  SELECT query_id, doc_id,
       |   SUM(CAST(ROUND(1.0 / ($RrfK + rnk), 6) AS DECIMAL(18,6))) AS rrf_dec,
       |   COALESCE(MAX(CASE WHEN src = 'lex' THEN rnk END), 0) AS lex_rnk,
       |   COALESCE(MAX(CASE WHEN src = 'sem' THEN rnk END), 0) AS sem_rnk
       |  FROM u GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, rrf_dec, lex_rnk, sem_rnk,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY rrf_dec DESC, doc_id) AS rnk
       |  FROM fused)""".stripMargin
  }

  val q170Sql: String =
    s"""WITH $hybridCtes
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id,
       | CAST(rrf_dec AS DOUBLE) AS rrf_score,
       | CAST(lex_rnk AS BIGINT) AS lex_rnk, CAST(sem_rnk AS BIGINT) AS sem_rnk
       |FROM r WHERE rnk <= $HybridTopK ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q171

  /** Lexical weight of the weighted fusion, in TENTHS (6 ⇒ 0.6). Integer
    * tenths keep the fused score exact DECIMAL arithmetic: the emitted
    * `w_score` is 10× the convex combination 0.6·z_lex + 0.4·z_sem — a
    * monotone transform, so the RANKING is identical and no cross-engine
    * division ever happens. */
  val LexWeightTenths = 6

  /** Semantic weight in tenths (4 ⇒ 0.4). */
  val SemWeightTenths = 4

  /** The WEIGHTED-SCORE fusion core (CombSUM with min–max normalization,
    * Fox & Shaw TREC-2; the other canonical fusion next to q170's RRF):
    * each ranker's top-[[HybridDepth]] scores are min–max normalized to
    * [0, 1] WITHIN the query (z = (s − min)/(max − min), 6dp; a
    * degenerate constant list normalizes to 1.0), absent documents
    * contribute 0, and the fused score is the weight-in-tenths
    * combination [[LexWeightTenths]]·z_lex + [[SemWeightTenths]]·z_sem
    * summed as DECIMAL(18,6) — exact in both engines. Unlike RRF this
    * uses the score GAPS, not just the order: a runaway best match pulls
    * ahead even when the rank pattern ties. Same bounded shapes as
    * [[fuseRrf]]: per-query windows over ≤ depth rows, never
    * corpus-sized.
    */
  private[graft] def weightedFuse(lex: DataFrame, sem: DataFrame): DataFrame = {
    def normalized(df: DataFrame, src: String): DataFrame = {
      val wN = Window.partitionBy(col("query_id"))
      df.withColumn("mn", min(col("score")).over(wN))
        .withColumn("mx", max(col("score")).over(wN))
        .withColumn("z", when(col("mx") > col("mn"),
          round((col("score") - col("mn")) / (col("mx") - col("mn")), 6))
          .otherwise(lit(1.0)))
        .select(col("query_id"), col("doc_id"), col("rnk"), lit(src).as("src"),
          col("z").cast("decimal(18,6)").as("zc"))
    }
    val u = normalized(lex, "lex").unionByName(normalized(sem, "sem"))
    val wf = u.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(when(col("src") === "lex", col("zc") * lit(LexWeightTenths))
          .otherwise(col("zc") * lit(SemWeightTenths))).as("w_dec"),
        coalesce(max(when(col("src") === "lex", col("rnk"))), lit(0L)).as("lex_rnk"),
        coalesce(max(when(col("src") === "sem", col("rnk"))), lit(0L)).as("sem_rnk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("w_dec").desc, col("doc_id").asc)
    wf.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HybridTopK)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("w_dec").cast("double").as("w_score"),
        col("lex_rnk"), col("sem_rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q171: HYBRID retrieval via WEIGHTED-SCORE fusion — the score-aware
    * complement of q170 (same legs, same workload, same output shape;
    * [[weightedFuse]] for the semantics). Shipping BOTH fusion methods is
    * the point: RRF is rank-robust (immune to score-scale mismatch),
    * CombSUM is gap-sensitive (rewards decisive matches) — a pipeline
    * A/Bs them with q172's metrics and picks per corpus.
    */
  def q171HybridWeighted(s: SparkSession, dir: String): DataFrame = {
    val queryIds = embeddings(s, dir).select(col("vec_id").as("query_id"))
      .orderBy(col("query_id")).limit(HybridQueries)
    val (lex, sem) = hybridParts(s, dir, queryIds)
    weightedFuse(lex, sem)
  }

  val q171Sql: String =
    s"""WITH $hybridCtes,
       |lexn AS (
       |  SELECT query_id, doc_id, rnk, score,
       |   MIN(score) OVER (PARTITION BY query_id) AS mn,
       |   MAX(score) OVER (PARTITION BY query_id) AS mx
       |  FROM lex WHERE rnk <= $HybridDepth),
       |semn AS (
       |  SELECT query_id, doc_id, rnk, score,
       |   MIN(score) OVER (PARTITION BY query_id) AS mn,
       |   MAX(score) OVER (PARTITION BY query_id) AS mx
       |  FROM sem WHERE rnk <= $HybridDepth),
       |un AS (
       |  SELECT query_id, doc_id, rnk, 'lex' AS src,
       |   CASE WHEN mx > mn THEN ROUND((score - mn) / (mx - mn), 6)
       |        ELSE 1.0 END AS z
       |  FROM lexn
       |  UNION ALL
       |  SELECT query_id, doc_id, rnk, 'sem',
       |   CASE WHEN mx > mn THEN ROUND((score - mn) / (mx - mn), 6)
       |        ELSE 1.0 END
       |  FROM semn),
       |wf AS (
       |  SELECT query_id, doc_id,
       |   SUM(CASE WHEN src = 'lex' THEN $LexWeightTenths ELSE $SemWeightTenths END
       |       * CAST(z AS DECIMAL(18,6))) AS w_dec,
       |   COALESCE(MAX(CASE WHEN src = 'lex' THEN rnk END), 0) AS lex_rnk,
       |   COALESCE(MAX(CASE WHEN src = 'sem' THEN rnk END), 0) AS sem_rnk
       |  FROM un GROUP BY 1, 2),
       |wr AS (
       |  SELECT query_id, doc_id, w_dec, lex_rnk, sem_rnk,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY w_dec DESC, doc_id) AS rnk
       |  FROM wf)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id,
       | CAST(w_dec AS DOUBLE) AS w_score,
       | CAST(lex_rnk AS BIGINT) AS lex_rnk, CAST(sem_rnk AS BIGINT) AS sem_rnk
       |FROM wr WHERE rnk <= $HybridTopK ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q172

  /** Cutoff for the retrieval-quality metrics. */
  val MetricK = 10

  /** q172: RETRIEVAL QUALITY METRICS — the eval harness that closes the
    * retrieval family's loop: for each query and each of the three
    * rankers (`lex` BM25, `sem` exact cosine, `rrf` q170's fusion), the
    * top-[[MetricK]] list is judged against a LABELED relevance set —
    * the embeddings table's `label` column, the corpus's own class
    * structure: a document is relevant to a query iff it shares the
    * query document's label (the standard labeled-eval-set protocol).
    * Emitted per (method, query): list size, relevant-universe size,
    * hits@k, precision@k (hits/[[MetricK]]), and MRR (1/rank of the
    * first relevant hit, 0 if none) — the numbers a pipeline reads to
    * CHOOSE a fusion method (pair with q171's A/B) or tune depth.
    *
    * Scale shape: the relevance set is (queries × class size) rows built
    * by ONE broadcast label join — never a corpus self-join; rank lists
    * are ≤ 3·k·|Q| rows; every metric is a grouped integer aggregate.
    * All arithmetic is integer counts and two 6dp-rounded divisions —
    * hash-exact in both engines.
    */
  def q172RetrievalMetrics(s: SparkSession, dir: String): DataFrame =
    retrievalMetricsFor(s, dir,
      embeddings(s, dir).select(col("vec_id").as("query_id"))
        .orderBy(col("query_id")).limit(HybridQueries))

  /** The metric harness over an ARBITRARY query-id workload — q172's
    * body, factored (r16) so the external-workload instantiation (q196)
    * judges the exact same three rankers with the exact same protocol.
    */
  private def retrievalMetricsFor(s: SparkSession, dir: String,
      queryIds: DataFrame): DataFrame = {
    // Each leg feeds BOTH the fusion and its own top-k list below; Spark
    // does not CSE across the two consumers, so without materialization
    // the BM25 scoring tree and the cosine scan each ran twice per
    // metrics query (q172's plan was 76 KB of duplicated subtree
    // against q170's 31 KB). Bounded frames: ≤ depth·|Q| rows each.
    val (lex0, sem0) = hybridParts(s, dir, queryIds)
    val lex = lex0.localCheckpoint(true)
    val sem = sem0.localCheckpoint(true)
    val fused = fuseRrf(lex, sem)
    val lists = lex.filter(col("rnk") <= MetricK)
      .select(col("query_id"), col("doc_id"), col("rnk"), lit("lex").as("method"))
      .unionByName(sem.filter(col("rnk") <= MetricK)
        .select(col("query_id"), col("doc_id"), col("rnk"), lit("sem").as("method")))
      .unionByName(fused.filter(col("rnk") <= MetricK)
        .select(col("query_id"), col("doc_id"), col("rnk"), lit("rrf").as("method")))
    val e = embeddings(s, dir).select(col("vec_id"), col("label"))
    val qlab = e.join(broadcast(queryIds), col("vec_id") === col("query_id"))
      .groupBy(col("query_id")).agg(first(col("label")).as("label"))
    val rel = e.join(broadcast(qlab), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"), lit(1L).as("is_rel"))
    val nrel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))
    lists.join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(count(lit(1)).as("n_ranked"),
        coalesce(sum(col("is_rel")), lit(0L)).as("hits_at_k"),
        min(when(col("is_rel") === 1L, col("rnk"))).as("first_rel"))
      .join(nrel, Seq("query_id"), "left")
      .select(col("method"), col("query_id"), col("n_ranked"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("hits_at_k"),
        round(col("hits_at_k").cast("double") / lit(MetricK.toDouble), 6)
          .as("precision_at_k"),
        round(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 6)
          .as("mrr"))
      .orderBy(col("method"), col("query_id"))
  }

  val q172Sql: String = metricsSqlWith(corpusQSelect)

  /** The metric oracle over a parameterized workload CTE (q172/q196). */
  private def metricsSqlWith(qSelect: String): String =
    s"""WITH ${hybridCtesWith(qSelect)},
       |lists AS (
       |  SELECT 'lex' AS method, query_id, doc_id, rnk FROM lex WHERE rnk <= $MetricK
       |  UNION ALL
       |  SELECT 'sem', query_id, doc_id, rnk FROM sem WHERE rnk <= $MetricK
       |  UNION ALL
       |  SELECT 'rrf', query_id, doc_id, rnk FROM r WHERE rnk <= $MetricK),
       |qlab AS (
       |  SELECT q.query_id, e2.label FROM q JOIN embeddings e2 ON e2.vec_id = q.query_id),
       |rel AS (
       |  SELECT ql.query_id, e2.vec_id AS doc_id
       |  FROM qlab ql JOIN embeddings e2
       |    ON e2.label = ql.label AND e2.vec_id <> ql.query_id),
       |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant FROM rel GROUP BY 1),
       |m AS (
       |  SELECT l.method, l.query_id,
       |   CAST(count(*) AS BIGINT) AS n_ranked,
       |   CAST(COALESCE(SUM(CASE WHEN rel.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits_at_k,
       |   MIN(CASE WHEN rel.doc_id IS NOT NULL THEN l.rnk END) AS first_rel
       |  FROM lists l LEFT JOIN rel
       |    ON rel.query_id = l.query_id AND rel.doc_id = l.doc_id
       |  GROUP BY 1, 2)
       |SELECT m.method, m.query_id AS query_id, m.n_ranked,
       | COALESCE(nrel.n_relevant, 0) AS n_relevant, m.hits_at_k,
       | ROUND(CAST(m.hits_at_k AS DOUBLE) / $MetricK, 6) AS precision_at_k,
       | ROUND(COALESCE(1.0 / CAST(m.first_rel AS DOUBLE), 0.0), 6) AS mrr
       |FROM m LEFT JOIN nrel ON nrel.query_id = m.query_id
       |ORDER BY m.method, m.query_id""".stripMargin

  // ---------------------------------------------------------------- q185

  /** The EXTERNAL query workload: 8 document ids, all < 500 so the same
    * workload is valid at every scale point (both `documents` and
    * `embeddings` carry ids 0..499 at every sf — FIXTURES.md). This
    * literal is the single source of truth: the committed
    * `fixtures/queries.parquet` holds exactly these rows (spec-pinned),
    * [[graft.GenData]] writes the same rows into generated dirs, and
    * [[q185Sql]] embeds them as the oracle's VALUES workload.
    */
  val ExternalQueryIds: Seq[Long] = Seq(3L, 17L, 42L, 99L, 150L, 256L, 321L, 487L)

  /** Resolve the external workload parquet: a generated data dir carries
    * its own copy next to the tables (GenData writes it); the driver's
    * read-only sf dirs don't, so the committed repo fixture serves those
    * — via `GRAFT_FIXTURES_DIR` or the working directory, in that order
    * (no absolute-path fallback: a machine-specific path baked into the
    * library would silently read a stale fixture on a differently-rooted
    * deployment — r16 verdict residual #1). Missing everywhere is a loud
    * error, not a silent fallback to a synthesized workload (the query
    * exists to prove the EXTERNAL parameterization end-to-end).
    */
  private[graft] def externalQueriesPath(dir: String): String = {
    val cands = Seq(Some(s"$dir/queries.parquet"),
      sys.env.get("GRAFT_FIXTURES_DIR").map(_ + "/queries.parquet"),
      Some("fixtures/queries.parquet")).flatten
    cands.find(p => new java.io.File(p).exists()).getOrElse(
      sys.error(s"external query workload not found; tried: ${cands.mkString(", ")}"))
  }

  /** q185: hybrid RRF fusion over an EXTERNAL query workload — q170's
    * fusion with the queries read from a parquet file instead of derived
    * from the corpus. q170–q172/q175 all *parameterize* over a query
    * frame, but every registered instantiation derived its queries from
    * the corpus; this one proves the parameterization end-to-end (r15
    * verdict #4): the workload file travels WITH the dataset in
    * generated dirs and as a committed fixture for the read-only ones,
    * and the oracle replays the identical id list as a VALUES literal.
    * Same bounded plan shapes as q170 ([[hybridParts]] — the workload
    * broadcasts, the corpus is scanned once per leg).
    */
  def q185ExternalFusion(s: SparkSession, dir: String): DataFrame = {
    val queryIds = s.read.parquet(externalQueriesPath(dir))
      .select(col("query_id").cast("long").as("query_id"))
    val (lex, sem) = hybridParts(s, dir, queryIds)
    fuseRrf(lex, sem)
  }

  /** The external workload as the oracle's VALUES CTE body (the file
    * content is spec-pinned equal to [[ExternalQueryIds]], so the
    * literal IS the file). */
  private val externalQSelect: String = {
    val vals = ExternalQueryIds.map(i => s"($i)").mkString(", ")
    s"SELECT CAST(query_id AS BIGINT) AS query_id FROM (VALUES $vals) v(query_id)"
  }

  /** q185's oracle: the q170 CTE chain verbatim with the workload CTE
    * swapped for the fixture's id list. */
  val q185Sql: String =
    s"""WITH ${hybridCtesWith(externalQSelect)}
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id,
       | CAST(rrf_dec AS DOUBLE) AS rrf_score,
       | CAST(lex_rnk AS BIGINT) AS lex_rnk, CAST(sem_rnk AS BIGINT) AS sem_rnk
       |FROM r WHERE rnk <= $HybridTopK ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q196

  /** q196: retrieval-quality metrics over the EXTERNAL workload —
    * q172's eval protocol (labeled relevance, hits@k / precision@k /
    * MRR for the lex/sem/rrf rankers) judged on the fixture queries
    * q185 serves, completing the external-workload story through the
    * EVAL leg: a production retrieval stack is tuned on a CURATED query
    * set (the fixture), not on queries synthesized from its own corpus.
    * Same factored harness ([[retrievalMetricsFor]]) and oracle text
    * ([[metricsSqlWith]]) as q172 — only the workload CTE differs, so
    * the two instantiations can never drift on metric semantics.
    */
  def q196ExternalMetrics(s: SparkSession, dir: String): DataFrame =
    retrievalMetricsFor(s, dir,
      s.read.parquet(externalQueriesPath(dir))
        .select(col("query_id").cast("long").as("query_id")))

  val q196Sql: String = metricsSqlWith(externalQSelect)
}
