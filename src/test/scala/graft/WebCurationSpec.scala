package graft

import org.apache.spark.sql.functions.col

import graft.queries.{Dedup, WebCuration => WC}

/** Pins for the pre-text web-curation operators (q203/q204) and the
  * multimodal funnel capstone (q205): the canonicalizer is a correct
  * GENERIC cleaner on handcrafted URLs (not just the synthesized lanes),
  * canonicalization is idempotent over the whole corpus, domain caps
  * bind and conserve documents, and the funnel is monotone with real
  * drops at every stage.
  */
class WebCurationSpec extends SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(WC.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalUrl cleans handcrafted URLs: case, www, fragment, tracking params, param order, trailing slash") {
    assert(canon("HTTPS://WWW.Ex1.COM/p/3") === Seq("https://ex1.com/p/3"))
    assert(canon("http://a.org/p/7#frag") === Seq("http://a.org/p/7"))
    assert(canon("http://a.org/p/7?utm_source=x&id=5&fbclid=z&gclid=q&ref=m")
      === Seq("http://a.org/p/7?id=5"))
    assert(canon("http://a.org/p?page=2&id=5") === Seq("http://a.org/p?id=5&page=2"),
      "kept params must serialize sorted")
    assert(canon("http://a.org/p/7/") === Seq("http://a.org/p/7"))
    assert(canon("http://a.org/?utm_source=x") === Seq("http://a.org"),
      "all-tracking query must drop the '?' entirely")
    // www only strips as a PREFIX label; an inner or bare match survives
    assert(canon("http://wwwx.org/p") === Seq("http://wwwx.org/p"))
    assert(canon("http://cdn.www.org/p") === Seq("http://cdn.www.org/p"))
  }

  test("registeredDomain: two labels by default, three under the two-level suffix") {
    import spark.implicits._
    val got = Seq("cdn.ex1.co.uk", "ex1.co.uk", "www2.deep.ex3.com", "ex3.net")
      .toDF("h").select(WC.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ex1.co.uk", "ex1.co.uk", "ex3.com", "ex3.net"))
  }

  test("q203 canonicalization is idempotent over the corpus and never keeps a tracking param") {
    val frame = WC.canonFrame(spark, sf)
    val twice = frame.select(col("doc_id"), col("url"),
      WC.canonicalUrl(col("url")).as("url2"))
    assert(twice.filter(col("url") =!= col("url2")).count() === 0L,
      "canonicalUrl is not idempotent")
    assert(frame.filter(col("url").rlike("[?&](utm_[^=]*|fbclid|gclid|ref)=")).count() === 0L)
    // the synthesis genuinely exercises the cleaner: every audit flag
    // fires somewhere, and some URL actually changed
    assert(frame.filter(col("had_tracking")).count() > 0L)
    assert(frame.filter(col("had_fragment")).count() > 0L)
    assert(frame.filter(col("raw_url") =!= col("url")).count() > 0L)
  }

  test("q204 caps bind and conserve: n_kept = min(n_docs, cap), totals cover the corpus") {
    val rows = WC.q204DomainCaps(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept === math.min(n, WC.DomainCap.toLong),
        s"domain ${r.getString(0)}: kept $kept of $n at cap ${WC.DomainCap}")
      assert(r.getAs[Long]("n_dup_docs") === n - r.getAs[Long]("n_urls"))
    }
    assert(rows.exists(_.getAs[Long]("n_docs") > WC.DomainCap),
      "cap never binds on this fixture — vacuous test geometry")
  }

  test("q205 funnel is monotone per source, covers the corpus, and every multimodal stage drops something somewhere") {
    val rows = WC.q205MultimodalFunnel(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_raw")).sum === nDocs)
    rows.foreach { r =>
      val seq = Seq("n_raw", "n_text_kept", "n_img_kept", "n_aud_kept",
        "n_vid_kept", "n_sampled").map(r.getAs[Long])
      seq.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a, s"funnel not monotone for ${r.getString(0)}: $seq")
      }
    }
    def total(c: String): Long = rows.map(_.getAs[Long](c)).sum
    assert(total("n_text_kept") < total("n_raw"), "text dedup dropped nothing")
    assert(total("n_img_kept") < total("n_text_kept"), "image near-dup dropped nothing")
    assert(total("n_aud_kept") < total("n_img_kept"), "audio near-dup dropped nothing")
    assert(total("n_vid_kept") < total("n_aud_kept"), "video near-dup dropped nothing")
    assert(total("n_sampled") < total("n_vid_kept"), "sampling dropped nothing")
    assert(total("pii_docs") > 0L)
    // stage totals agree with the standalone operators they compose
    val reps = Tables.documents(spark, sf).select(col("doc_id"))
      .join(Dedup.componentLabels(spark, sf)
        .filter(col("doc") =!= col("comp")).select(col("doc").as("doc_id")),
        Seq("doc_id"), "left_anti").count()
    assert(total("n_text_kept") === reps,
      "text stage diverged from the q45 component representatives")
  }
}
