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

  // ------------------------------------------------------------- q209

  /** Plain-Scala replay of the q209 rule battery: independent
    * tokenization and integer arithmetic over a page string. */
  private def replayFlags(page: String): Seq[Boolean] = {
    val ws = page.trim.split("\\s+").toSeq
    val lines = page.split("\n", -1).toSeq
    val nw = ws.size.toLong
    val nl = lines.size.toLong
    val nonws = page.count(!_.isWhitespace).toLong
    val sym = page.count(_ == '#').toLong + "\\.\\.\\.".r.findAllIn(page).size
    val bl = lines.count(_.startsWith("- ")).toLong
    val el = lines.count(_.endsWith("...")).toLong
    val aw = ws.count(_.exists(_.isLetter)).toLong
    val sw = WC.GopherStops.count(ws.contains(_)).toLong
    Seq(
      nw < 50L || nw > 100000L,
      nonws < nw * 3L || nonws > nw * 10L,
      sym * 10L > nw,
      bl * 10L > nl * 9L,
      el * 10L > nl * 3L,
      aw * 5L < nw * 4L,
      sw < WC.GopherMinStops.toLong)
  }

  private def replayLanes(docId: Long, text: String): String =
    text +
      (if (docId % 7 == 3) WC.BulletBlock else "") +
      (if (docId % 9 == 2) WC.EllipsisBlock else "") +
      (if (docId % 11 == 6) WC.SymbolBlock else "") +
      (if (docId % 13 == 9) WC.NumericBlock else "") +
      (if (docId % 17 == 4) WC.LongWordBlock else "")

  test("q209 gopherFlags match the plain-Scala replay on crafted single-rule pages") {
    import spark.implicits._
    val fill = Seq.tabulate(58)(i => s"word$i").mkString(" ")
    val crafted = Seq(
      // (label, page, the ONE rule index it should trip; -1 = keep)
      ("keep", s"the a $fill", -1),
      ("wc", "the a wordy", 0),
      ("mwl", "the a " + Seq.fill(58)("x" * 30).mkString(" "), 1),
      ("sym", "the a " + Seq.tabulate(50)(i => s"word$i").mkString(" ")
        + " # # # # # # # #", 2),
      ("bullet", s"the a $fill" + Seq.tabulate(12)(i => s"\n- pt$i").mkString, 3),
      ("ellipsis", s"the a $fill\nread more...\nread more...", 4),
      ("alpha", "the a " + Seq.tabulate(30)(i => s"word$i").mkString(" ")
        + " " + (0 until 28).mkString(" "), 5),
      ("stop", s"only $fill plain words here", 6))
    val got = crafted.map(c => (c._1, c._2)).toDF("label", "page")
      .select(col("label") +: WC.gopherFlags(col("page")): _*)
      .collect().map(r => r.getString(0) ->
        (1 to 7).map(r.getBoolean)).toMap
    crafted.foreach { case (label, page, rule) =>
      val expect = replayFlags(page)
      assert(got(label) === expect, s"engine != replay for $label")
      val want = Seq.tabulate(7)(_ == rule)
      assert(expect === want,
        s"crafted page '$label' should trip exactly rule $rule, got $expect")
    }
  }

  test("q209 per-source counts equal a full plain-Scala replay and no rule is vacuous") {
    val rows = WC.q209GopherRules(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 9).map(r.getLong)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val flags = ds.map { case (id, _, text) => replayFlags(replayLanes(id, text)) }
      val trips = Seq.tabulate(7)(i => flags.count(_(i)).toLong)
      src -> ((ds.length.toLong +: trips) :+ flags.count(f => !f.exists(identity)).toLong)
    }
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, want) =>
      assert(rows(src) === want, s"source $src diverged from the replay")
    }
    // the fixture genuinely exercises the battery: every rule trips
    // somewhere, somebody survives, and not everybody does
    val totals = Seq.tabulate(7)(i => expect.values.map(_(i + 1)).sum)
    totals.zipWithIndex.foreach { case (t, i) =>
      assert(t > 0L, s"rule $i never trips on the fixture — vacuous")
    }
    val (nDocs, nKept) = (expect.values.map(_.head).sum, expect.values.map(_.last).sum)
    assert(nKept > 0L, "no document survives the battery")
    assert(nKept < nDocs, "the battery keeps everything — vacuous")
  }

  // ------------------------------------------------------------- q210

  /** Plain-Scala replay of the q210 repetition battery: independent
    * tokenization, sliding-window n-grams, and integer arithmetic. */
  private def replayRepFlags(page: String): Seq[Boolean] = {
    val lines = page.split("\n", -1).toSeq
    val paras = page.split("\n\n", -1).toSeq
    val ws = page.trim.split("\\s+").toSeq
    val pagel = page.length.toLong
    val nonws = page.count(!_.isWhitespace).toLong
    val nl = lines.size.toLong
    val dl = nl - lines.distinct.size.toLong
    val dlc = lines.groupBy(identity).collect {
      case (l, occ) if occ.size > 1 => (occ.size - 1).toLong * l.length
    }.sum
    val np = paras.size.toLong
    val dp = np - paras.distinct.size.toLong
    def gramCounts(n: Int): Map[String, Long] =
      if (ws.size < n) Map.empty
      else ws.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    def topChars(n: Int): Long =
      (gramCounts(n).map { case (g, c) => c * g.length } ++ Seq(0L)).max
    val dup5 = gramCounts(5).collect {
      case (g, c) if c > 1 => c * g.length
    }.sum
    Seq(
      dl * 10L > nl * 3L,
      dlc * 5L > pagel,
      dp * 10L > np * 3L,
      topChars(2) * 5L > nonws,
      topChars(3) * 50L > nonws * 9L,
      dup5 * 20L > nonws * 3L)
  }

  private def replayRepLanes(docId: Long, text: String): String =
    text +
      (if (docId % 7 == 1) WC.DupLineBlock else "") +
      (if (docId % 11 == 3) WC.DupParaBlock else "") +
      (if (docId % 13 == 5) WC.Top2Block else "") +
      (if (docId % 17 == 8) WC.Dup5Block else "")

  test("q210 crafted pages trip exactly the intended repetition rules (incl. the sub-n-gram null path)") {
    import spark.implicits._
    val fill = Seq.tabulate(60)(i => s"tok$i").mkString(" ")
    val crafted = Seq(
      // (label, page, exact trip-index set expected)
      ("keep", fill, Set.empty[Int]),
      // one word: no 2/3/5-grams at all — pins the left-join null path
      ("short", "hello", Set.empty[Int]),
      // 4 identical appended lines on a short base: both line rules
      // blow their thresholds — and, because a duplicated line IS
      // duplicated n-grams, the whole n-gram family couples in (only
      // the paragraph rule stays silent). The coupling is faithful:
      // Gopher's rule families overlap by design, thresholds differ.
      ("dupline", "one two three four five" + "\nsubscribe today now" * 4,
        Set(0, 1, 3, 4, 5)),
      // repeated paragraph == repeated lines (count rule 0 trips, the
      // long base keeps the CHAR fraction under 0.2) == duplicated
      // spanning 5-grams (rule 5); the top-gram fractions stay under
      ("duppara", fill + "\n\nshare this piece" * 3, Set(0, 2, 5)),
      // one dominant 2-gram inline: its repeats are also the top 3-gram
      // and duplicated 5-grams, so the whole n-gram family fires
      ("top2", fill + "\n" + ("ab cd " * 40).trim, Set(3, 4, 5)),
      // a 10-word sentence repeated twice inline on a long base: ONLY
      // the dup-5-gram rule fires
      ("dup5", fill + "\n" + ("gamma delta epsilon zeta eta theta iota kappa lambda mu " * 2).trim,
        Set(5)))
    val frame = crafted.zipWithIndex
      .map { case ((label, page, _), i) => (i.toLong, label, page) }
      .toDF("id", "key", "page")
    val got = WC.repFlagFrame(frame)
      .collect().map(r => r.getString(0) -> (1 to 6).map(r.getBoolean)).toMap
    crafted.foreach { case (label, page, want) =>
      val expect = replayRepFlags(page)
      assert(got(label) === expect, s"engine != replay for $label")
      assert(expect.zipWithIndex.collect { case (true, i) => i }.toSet === want,
        s"crafted page '$label' tripped $expect — wanted exactly $want")
    }
  }

  test("q210 per-source counts equal a full plain-Scala replay and no repetition rule is vacuous") {
    val rows = WC.q210RepetitionRules(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 8).map(r.getLong)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val flags = ds.map { case (id, _, text) => replayRepFlags(replayRepLanes(id, text)) }
      val trips = Seq.tabulate(6)(i => flags.count(_(i)).toLong)
      src -> ((ds.length.toLong +: trips) :+ flags.count(f => !f.exists(identity)).toLong)
    }
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, want) =>
      assert(rows(src) === want, s"source $src diverged from the replay")
    }
    // the fixture genuinely exercises the battery — and not only via the
    // planted lanes: every rule trips somewhere, somebody survives, and
    // not everybody does
    val totals = Seq.tabulate(6)(i => expect.values.map(_(i + 1)).sum)
    totals.zipWithIndex.foreach { case (t, i) =>
      assert(t > 0L, s"repetition rule $i never trips on the fixture — vacuous")
    }
    val (nDocs, nKept) = (expect.values.map(_.head).sum, expect.values.map(_.last).sum)
    assert(nKept > 0L, "no document survives the repetition battery")
    assert(nKept < nDocs, "the repetition battery keeps everything — vacuous")
  }

  // ------------------------------------------------------------- q211

  /** Plain-Scala replay of the q211 line-keep predicate. */
  private def replayKeep(l: String): Boolean = {
    val ws = l.trim.split("\\s+").toSeq
    !l.startsWith("- ") && !l.endsWith("...") &&
      ws.size >= 3 &&
      ws.count(_.exists(_.isLetter)) * 2 >= ws.size
  }

  test("q211 crafted lines: each rule drops exactly its line class; clean prose survives") {
    import spark.implicits._
    val crafted = Seq(
      ("clean prose with letters here", true),
      ("- a bullet line with words", false),
      ("a teaser that trails off...", false),
      ("two words", false),
      ("# # # 1 2 3", false),           // zero alphabetic of 6 words
      ("a 1 2", false),                 // 1 of 3 alphabetic — under half
      ("a b 1 2", true),                // exactly half alphabetic — kept
      ("", false))
    val got = crafted.map(_._1).toDF("l")
      .select(col("l"), WC.lineKeep(col("l")).as("k"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    crafted.foreach { case (l, want) =>
      assert(replayKeep(l) === want, s"replay disagrees on '$l'")
      assert(got(l) === want, s"engine disagrees on '$l'")
    }
  }

  test("q211 per-source report equals a full plain-Scala replay; cleaning is idempotent and binding") {
    val rows = WC.q211LineClean(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val pages = ds.map { case (id, _, text) => replayLanes(id, text) }
      val stats = pages.map { p =>
        val ll = p.split("\n", -1).toSeq
        val kept = ll.filter(replayKeep)
        (ll.size.toLong, kept.size.toLong, p.length.toLong,
          kept.mkString("\n").length.toLong)
      }
      src -> Seq(ds.length.toLong,
        stats.count(s => s._2 < s._1).toLong,
        stats.map(_._1).sum, stats.map(_._2).sum,
        stats.map(_._3).sum, stats.map(_._4).sum)
    }
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, want) =>
      assert(rows(src) === want, s"source $src diverged from the replay")
    }
    // idempotence: cleaning a cleaned page never drops another line
    // (every kept line still passes the predicate) — engine-level pin
    val twice = Tables.documents(spark, sf)
      .select(WC.cleanedPage(WC.noisyPageCol).as("c1"))
      .select(col("c1"), WC.cleanedPage(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2")).count()
    assert(twice === 0L, "cleaning is not idempotent")
    // the transform binds: something dropped, plenty survived
    val (li, lk) = (expect.values.map(_(2)).sum, expect.values.map(_(3)).sum)
    val (ci, ck) = (expect.values.map(_(4)).sum, expect.values.map(_(5)).sum)
    assert(lk < li && lk > 0L, s"line filter vacuous: $lk of $li")
    assert(ck < ci && ck > 0L, s"char report vacuous: $ck of $ci")
    assert(expect.values.map(_(1)).sum > 0L, "no document ever changed")
  }
}
