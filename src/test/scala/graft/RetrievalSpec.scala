package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

import graft.queries.Retrieval
import graft.queries.Retrieval._

/** Invariants of the BM25 retrieval + fusion operators beyond the DuckDB
  * oracle: a FULL independent replay (tokenize → select query terms →
  * score → rank, in plain Scala with the same rounding discipline),
  * ranking structure, degenerate-increment behavior of the fold, and
  * fusion ≡ hand-computed RRF.
  */
class RetrievalSpec extends SparkTestBase {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  /** Plain-Scala BM25 replay of q164's full contract. */
  private def replay(): Seq[(Long, Long, Long, Double)] = {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = docs.length.toLong
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val tf = docs.flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val df = tf.keys.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    // total order (df ASC, term ASC) — the term string IS the tiebreak
    val qterms = df.toSeq.filter(_._1.length >= MinTermLen)
      .sortBy { case (t, c) => (c, t) }
      .take(QueryTermCount).zipWithIndex
      .map { case ((t, c), i) => (i / TermsPerQuery + 1L, t, c) }
    val perDoc = qterms.flatMap { case (qid, t, tdf) =>
      val idf = round6(math.log(1.0 + (n.toDouble - tdf.toDouble + 0.5) / (tdf.toDouble + 0.5)))
      docs.collect { case (id, _) if tf.contains((id, t)) =>
        val f = tf((id, t)).toDouble
        val sTerm = round6((idf * (f * (BmK1 + 1.0))) /
          (f + BmK1 * ((1.0 - BmB) + BmB * (dl(id).toDouble / avgdl))))
        ((qid, id), BigDecimal(sTerm).setScale(6, RoundingMode.HALF_UP))
      }
    }.groupBy(_._1).map { case ((qid, id), g) => (qid, id, g.map(_._2).sum) }
    perDoc.groupBy(_._1).toSeq.flatMap { case (qid, g) =>
      g.toSeq.map { case (_, id, dec) => (id, dec.toDouble) }
        .sortBy { case (id, s) => (-s, id) }
        .take(BmTopK).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1L, id, s) }
    }.sortBy(r => (r._1, r._2))
  }

  test("q164: engine result equals a full plain-Scala BM25 replay") {
    val got = Retrieval.q164Bm25(spark, sf).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(got === replay())
  }

  test("q164: ranking structure — contiguous ranks, non-increasing scores, all query ids") {
    val rows = Retrieval.q164Bm25(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === (1 to QueryTermCount / TermsPerQuery).map(_.toLong).toSet,
      "every synthetic query must retrieve something on the fixture corpus")
    byQ.foreach { case (q, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to g.length.toLong),
        s"query $q: ranks must be contiguous from 1")
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q: scores must be non-increasing in rank")
      assert(g.length <= BmTopK)
    }
  }

  test("q168: the incremental fold serves rankings identical to the batch index") {
    val batch = Retrieval.q164Bm25(spark, sf).collect().map(_.toSeq).toSeq
    val folded = Retrieval.q168Bm25Increment(spark, sf).collect().map(_.toSeq).toSeq
    assert(folded === batch)
    // the equivalence is only a theorem if the increment is non-trivial:
    // both sides of the fold must carry documents
    val docs = Tables.documents(spark, sf).select(col("doc_id")).collect().map(_.getLong(0))
    assert(docs.exists(_ % 10 == 3) && docs.exists(_ % 10 != 3),
      "fixture must split into a non-empty base and a non-empty delta")
  }

  /** Copy the fixture's documents filtered by `keep` into a fresh dir, so
    * q164/q168 can run over a degenerate corpus geometry. */
  private def corpusWhere(tag: String, keep: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ret_$tag").toString
    Tables.documents(spark, sf).filter(keep)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q168: an EMPTY delta degenerates to the batch result, not an empty frame") {
    // r13 advice #2: with no doc_id % 10 == 3 rows, the delta-side sum(dl)
    // is null — un-coalesced, avgdl nulls out and the fold silently
    // returns empty instead of the batch ranking.
    val dir = corpusWhere("nodelta", col("doc_id") % 10 =!= 3)
    val batch = Retrieval.q164Bm25(spark, dir).collect().map(_.toSeq).toSeq
    val folded = Retrieval.q168Bm25Increment(spark, dir).collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "degenerate-corpus fixture must still rank documents")
    assert(folded === batch)
  }

  test("q168: an EMPTY base (all-delta corpus) also folds to the batch result") {
    val dir = corpusWhere("nobase", col("doc_id") % 10 === 3)
    val batch = Retrieval.q164Bm25(spark, dir).collect().map(_.toSeq).toSeq
    val folded = Retrieval.q168Bm25Increment(spark, dir).collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "degenerate-corpus fixture must still rank documents")
    assert(folded === batch)
  }

  // ---------------------------------------------------------------- q170

  test("fuseRrf: fusion equals hand-computed reciprocal-rank arithmetic on a known fixture") {
    import spark.implicits._
    // query 1: doc 10 is rank 1 lexically and rank 2 semantically; doc 20
    // only lexical (rank 2); doc 30 only semantic (rank 1).
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 30L, 1L), (1L, 10L, 2L)).toDF("query_id", "doc_id", "rnk")
    def c(r: Long): BigDecimal =
      BigDecimal(1.0 / (RrfK + r)).setScale(6, RoundingMode.HALF_UP)
    val expected = Seq(
      // doc 10: both lists — 1/61 + 1/62 beats any single-list doc
      (1L, 1L, 10L, (c(1) + c(2)).toDouble, 1L, 2L),
      // docs 30 and 20 tie-break on score first: rank-1 single beats rank-2 single
      (1L, 2L, 30L, c(1).toDouble, 0L, 1L),
      (1L, 3L, 20L, c(2).toDouble, 2L, 0L))
    val got = Retrieval.fuseRrf(lex, sem).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("q170: registered fusion equals a plain-Scala RRF replay of its own rank lists") {
    val queryIds = Tables.embeddings(spark, sf).select(col("vec_id").as("query_id"))
      .orderBy(col("query_id")).limit(HybridQueries)
    val (lexDf, semDf) = Retrieval.hybridParts(spark, sf, queryIds)
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rnk"))).toSeq
    val lex = ranks(lexDf); val sem = ranks(semDf)
    def contrib(r: Long): BigDecimal =
      BigDecimal(1.0 / (RrfK + r)).setScale(6, RoundingMode.HALF_UP)
    val byDoc = (lex.map { case (q, d, r) => ((q, d), ("lex", r)) } ++
      sem.map { case (q, d, r) => ((q, d), ("sem", r)) }).groupBy(_._1)
    val expected = byDoc.toSeq.map { case ((q, d), g) =>
      val m = g.map(_._2).toMap
      (q, d, g.map(x => contrib(x._2._2)).sum,
        m.getOrElse("lex", 0L), m.getOrElse("sem", 0L))
    }.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy { case (_, d, s, _, _) => (-s, d) }.take(HybridTopK).zipWithIndex
        .map { case ((_, d, s, lr, sr), i) => (q, i + 1L, d, s.toDouble, lr, sr) }
    }.sortBy(r => (r._1, r._2))
    val got = Retrieval.q170HybridRrf(spark, sf).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf_score"), r.getAs[Long]("lex_rnk"),
        r.getAs[Long]("sem_rnk"))).toSeq
    assert(got === expected)
  }

  test("q170: structure — the workload is the smallest vec_ids; ranks contiguous; both legs contribute") {
    val rows = Retrieval.q170HybridRrf(spark, sf).collect()
    val expectQ = Tables.embeddings(spark, sf).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(HybridQueries).collect().map(_.getLong(0)).toSet
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === expectQ, "every query must fuse a non-empty result on the fixture")
    byQ.foreach { case (q, g) =>
      val ranks = g.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(ranks === (1L to g.length.toLong), s"query $q: fused ranks must be contiguous")
      assert(g.length <= HybridTopK)
      g.foreach { r =>
        assert(r.getAs[Long]("lex_rnk") > 0 || r.getAs[Long]("sem_rnk") > 0,
          s"query $q: a fused doc must come from at least one leg")
        assert(r.getAs[Long]("doc_id") !== q, s"query $q: self-match must be excluded")
      }
    }
    // the fusion is genuinely hybrid on the fixture: some fused doc is
    // lexical-only and some is semantic-only somewhere in the report
    assert(rows.exists(r => r.getAs[Long]("lex_rnk") > 0 && r.getAs[Long]("sem_rnk") === 0L))
    assert(rows.exists(r => r.getAs[Long]("sem_rnk") > 0 && r.getAs[Long]("lex_rnk") === 0L))
  }

  test("weightedFuse: min-max normalization and weighting equal hand arithmetic on a known fixture") {
    import spark.implicits._
    // query 1 lex scores: 10 -> z=1.0, 20 -> z=0.0; sem: 30 -> z=1.0,
    // 10 -> z=0.0. doc 10: 6*1.0 + 4*0.0 = 6.0; doc 30: 4*1.0 = 4.0;
    // doc 20: 6*0.0 = 0.0. A degenerate single-entry list normalizes to 1.
    val lex = Seq((1L, 10L, 1L, 5.0), (1L, 20L, 2L, 3.0),
      (2L, 40L, 1L, 7.5)).toDF("query_id", "doc_id", "rnk", "score")
    val sem = Seq((1L, 30L, 1L, 0.9), (1L, 10L, 2L, 0.4)).toDF("query_id", "doc_id", "rnk", "score")
    val got = Retrieval.weightedFuse(lex, sem).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSeq
    val expected = Seq(
      (1L, 1L, 10L, 6.0, 1L, 2L),
      (1L, 2L, 30L, 4.0, 0L, 1L),
      (1L, 3L, 20L, 0.0, 2L, 0L),
      (2L, 1L, 40L, 6.0, 1L, 0L)) // single-entry list: z = 1.0 -> 6*1
    assert(got === expected)
  }

  test("q171: registered weighted fusion equals a plain-Scala CombSUM replay of its own rank lists") {
    val queryIds = Tables.embeddings(spark, sf).select(col("vec_id").as("query_id"))
      .orderBy(col("query_id")).limit(HybridQueries)
    val (lexDf, semDf) = Retrieval.hybridParts(spark, sf, queryIds)
    def scored(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rnk"), r.getAs[Double]("score"))).toSeq
    def norm(side: Seq[(Long, Long, Long, Double)]): Map[(Long, Long), (Long, BigDecimal)] =
      side.groupBy(_._1).flatMap { case (q, g) =>
        val (mn, mx) = (g.map(_._4).min, g.map(_._4).max)
        g.map { case (_, d, rk, sc) =>
          val z = if (mx > mn) round6((sc - mn) / (mx - mn)) else 1.0
          (q, d) -> (rk, BigDecimal(z).setScale(6, RoundingMode.HALF_UP))
        }
      }
    val ln = norm(scored(lexDf)); val sn = norm(scored(semDf))
    val expected = (ln.keySet ++ sn.keySet).toSeq.map { case (q, d) =>
      val w = ln.get((q, d)).map(_._2 * LexWeightTenths).getOrElse(BigDecimal(0)) +
        sn.get((q, d)).map(_._2 * SemWeightTenths).getOrElse(BigDecimal(0))
      (q, d, w, ln.get((q, d)).map(_._1).getOrElse(0L), sn.get((q, d)).map(_._1).getOrElse(0L))
    }.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy { case (_, d, w, _, _) => (-w, d) }.take(HybridTopK).zipWithIndex
        .map { case ((_, d, w, lr, sr), i) => (q, i + 1L, d, w.toDouble, lr, sr) }
    }.sortBy(r => (r._1, r._2))
    val got = Retrieval.q171HybridWeighted(spark, sf).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("w_score"), r.getAs[Long]("lex_rnk"),
        r.getAs[Long]("sem_rnk"))).toSeq
    assert(got === expected)
  }

  test("q172: metrics equal a plain-Scala judge of the rank lists against the label classes") {
    val queryIds = Tables.embeddings(spark, sf).select(col("vec_id").as("query_id"))
      .orderBy(col("query_id")).limit(HybridQueries)
    val (lexDf, semDf) = Retrieval.hybridParts(spark, sf, queryIds)
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rnk"))).toSeq
    val lists = Map(
      "lex" -> ranks(lexDf).filter(_._3 <= MetricK),
      "sem" -> ranks(semDf).filter(_._3 <= MetricK),
      "rrf" -> ranks(Retrieval.fuseRrf(lexDf, semDf)).filter(_._3 <= MetricK))
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qids = queryIds.collect().map(_.getLong(0)).toSeq
    val rel = qids.map(q => q ->
      labels.keySet.filter(v => v != q && labels(v) == labels(q))).toMap
    val expected = lists.toSeq.flatMap { case (m, l) =>
      l.groupBy(_._1).toSeq.map { case (q, g) =>
        val hits = g.count(x => rel(q).contains(x._2)).toLong
        val first = g.filter(x => rel(q).contains(x._2)).map(_._3).sorted.headOption
        (m, q, g.size.toLong, rel(q).size.toLong, hits,
          round6(hits.toDouble / MetricK),
          first.map(f => round6(1.0 / f)).getOrElse(0.0))
      }
    }.sortBy(r => (r._1, r._2))
    val got = Retrieval.q172RetrievalMetrics(spark, sf).collect().map(r =>
      (r.getAs[String]("method"), r.getAs[Long]("query_id"), r.getAs[Long]("n_ranked"),
        r.getAs[Long]("n_relevant"), r.getAs[Long]("hits_at_k"),
        r.getAs[Double]("precision_at_k"), r.getAs[Double]("mrr"))).toSeq
    assert(got === expected)
    // the metric must be non-degenerate on the fixture: somebody finds
    // something relevant, and not everybody is perfect
    assert(got.exists(_._5 > 0), "no ranker found any relevant doc - eval set degenerate")
    assert(got.exists(_._5 < MetricK), "every list perfect - eval set degenerate")
  }

  test("q185: committed workload fixture ≡ ExternalQueryIds, and the fusion serves it fully") {
    // the driver sf dirs carry no queries.parquet, so resolution lands on
    // the committed repo fixture — whose CONTENT must equal the literal
    // the oracle embeds (this pin is what makes the VALUES oracle honest)
    val path = Retrieval.externalQueriesPath(sf)
    assert(path.contains("fixtures"), s"unexpected resolution: $path")
    val ids = spark.read.parquet(path).collect().map(_.getLong(0)).toSeq
    assert(ids === Retrieval.ExternalQueryIds)
    // the external parameterization end-to-end: every fixture query is
    // served at full fused depth
    val got = Retrieval.q185ExternalFusion(spark, sf).collect()
    val perQuery = got.groupBy(_.getLong(0))
    assert(perQuery.keySet === Retrieval.ExternalQueryIds.toSet)
    perQuery.foreach { case (q, rows) =>
      assert(rows.length === Retrieval.HybridTopK, s"query $q short-served") }
    // and it is genuinely a DIFFERENT workload than q170's corpus-derived
    // one (ids are not the 8 smallest vec_ids)
    assert(Retrieval.ExternalQueryIds.toSet !== (0L until 8L).toSet)
  }

  test("q196: external-workload metrics cover every fixture query under the q172 protocol") {
    val got = Retrieval.q196ExternalMetrics(spark, sf).collect()
    assert(got.map(_.getAs[Long]("query_id")).distinct.sorted.toSeq ===
      Retrieval.ExternalQueryIds.sorted)
    assert(got.map(_.getAs[String]("method")).distinct.sorted.toSeq ===
      Seq("lex", "rrf", "sem"))
    got.foreach { r =>
      val p = r.getAs[Double]("precision_at_k")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Long]("hits_at_k") <= Retrieval.MetricK)
      assert(r.getAs[Long]("hits_at_k") <= r.getAs[Long]("n_relevant"))
    }
    // non-degenerate: some ranker finds something relevant for the
    // external queries, and not every list is perfect
    assert(got.exists(_.getAs[Long]("hits_at_k") > 0))
    assert(got.exists(r => r.getAs[Long]("hits_at_k") < Retrieval.MetricK))
  }
}
