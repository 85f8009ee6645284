package graft

import graft.queries.Similarity

/** The contract that lets q67 (banded-LSH candidates + exact verify) ship
  * q40's brute-force oracle: identical pair sets at the calibrated
  * threshold. Planes and data are both deterministic, so recall here is a
  * fixed fact of the fixture, not a sampled probability.
  */
class SimilaritySpec extends SparkTestBase {

  test("q67 ≡ q40: LSH-bucketed near-dup finds exactly the brute-force pair set") {
    val brute = Similarity.q40EmbeddingNearDup(spark, sf).collect().toSet
    val lsh = Similarity.q67NearDupLsh(spark, sf).collect().toSet
    assert(lsh === brute)
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("q85: every cell is complete, members conserve the corpus, means sit in range") {
    import org.apache.spark.sql.functions._
    val out = Similarity.q85KmeansIteration(spark, sf).cache()
    // every seed assigns to itself at cosine 1.0, so all cells are
    // populated and each contributes exactly AnnDims dimension rows
    assert(out.count() === Similarity.IvfCells.toLong * Similarity.AnnDims)
    val members = out.select(col("cell"), col("n_members")).distinct()
    assert(members.count() === Similarity.IvfCells.toLong)
    val total = members.agg(sum(col("n_members"))).collect()(0).getLong(0)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(total === nVecs, s"cells hold $total vectors, corpus has $nVecs")
    // means are convex combinations of member coordinates (embeddings in
    // [-1, 1]) and the convergence cosine is a valid cosine
    assert(out.filter(col("c_val") < -1.0 || col("c_val") > 1.0).isEmpty)
    assert(out.filter(col("cos_old_new") < -1.0 || col("cos_old_new") > 1.0).isEmpty)
    out.unpersist()
  }
}
