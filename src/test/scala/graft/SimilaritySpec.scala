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
}
