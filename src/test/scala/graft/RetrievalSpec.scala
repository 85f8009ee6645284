package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

import graft.queries.Retrieval
import graft.queries.Retrieval._

/** Invariants of the BM25 retrieval operator beyond the DuckDB oracle:
  * a FULL independent replay (tokenize → select query terms → score →
  * rank, in plain Scala with the same rounding discipline), plus ranking
  * structure.
  */
class RetrievalSpec extends SparkTestBase {

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)
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
    val qterms = df.toSeq.filter(_._1.length >= MinTermLen)
      .sortBy { case (t, c) => (c, hash60(t)) }
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
}
