package graft

import org.apache.spark.sql.functions._

import graft.queries.{Curation, Streaming, TrainingData}
import graft.queries.Curation._

/** Invariants of the round-8 curation/profiling/typed-API operators
  * (q68–q73) beyond the DuckDB oracle: threshold consistency, the Bloom
  * prefilter's zero-false-negative guarantee, typed sessionization
  * agreeing with the built-in `session_window` plan, and conservation
  * laws (group sizes / histogram counts summing to the table count).
  */
class CurationSpec extends SparkTestBase {

  test("q69: every passage meets the doc threshold and occurrences bound docs") {
    val out = Curation.q69BoilerplatePassages(spark, sf).cache()
    assert(out.filter(col("n_docs") < MinDocs || col("n_occ") < col("n_docs")).isEmpty,
      "n_docs >= MinDocs and n_occ >= n_docs must hold for every passage")
    // each passage really is PassageN words wide
    val widths = out.select(size(split(col("passage"), " ")).as("w"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(widths == Set(PassageN))
    out.unpersist()
  }

  test("q70: bloom prefilter loses no true hits — n_hit matches the exact join") {
    val out = Curation.q70BloomDecontam(spark, sf).cache()
    // exact recomputation without any bloom: distinct grams per side, semi join
    def grams(f: org.apache.spark.sql.Column) = Tables.documents(spark, sf).filter(f)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.shingles(
          graft.functions.TextFns.words(col("text")), BloomN)).as("g"))
      .distinct()
    val ev = grams(col("doc_id") % 10 === 0).select(col("g").as("eval_g")).distinct()
    val exact = grams(col("doc_id") % 10 =!= 0)
      .join(ev, col("g") === col("eval_g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_exact"))
    val joined = out.join(exact, Seq("doc_id"), "left")
      .withColumn("n_hit_exact", coalesce(col("n_hit_exact"), lit(0L)))
    assert(joined.filter(col("n_hit") =!= col("n_hit_exact")).isEmpty,
      "bloom-prefiltered hit counts must equal the exact inverted-index join")
    // keep decision is consistent with the raw fraction
    assert(out.filter(
      (col("n_hit").cast("double") / col("n_grams") < DropFrac) =!= col("keep")).isEmpty)
    out.unpersist()
  }

  test("q70: every training document appears exactly once, zero-hit docs included") {
    val out = Curation.q70BloomDecontam(spark, sf)
    val trainDocs = Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 0).count()
    assert(out.count() === trainDocs)
    assert(out.select("doc_id").distinct().count() === trainDocs)
  }

  test("q70: a training doc shorter than BloomN words still appears, kept with contam 0") {
    // zero shingles → nothing to overlap; the report must still carry the
    // doc (anchored on the documents table, not on the gram surface)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q70_short").toString
    Seq(
      (0L, "held out eval words common overlap tokens here", "en", "src0", 46L),
      (1L, "too short", "en", "src0", 9L), // 2 words < BloomN=4
      (2L, "held out eval words common overlap tokens here", "en", "src0", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.q70BloomDecontam(spark, dir).collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "both training docs must appear")
    val short = out.head
    assert(short.getAs[Long]("n_grams") == 0L && short.getAs[Long]("n_hit") == 0L)
    assert(short.getAs[Double]("contam_frac") == 0.0 && short.getAs[Boolean]("keep"))
    // the full-overlap duplicate of the eval doc must be dropped
    assert(!out(1).getAs[Boolean]("keep"))
  }

  test("q72: typed sessionization agrees with session_window (q27) on boundaries") {
    val typed = Streaming.q72TypedSessionize(spark, sf).cache()
    val builtin = Streaming.q27SessionWindow(spark, sf)
      .select(col("user_id").as("b_user"), col("s_start").as("b_start"),
        col("n_events").as("b_n"), col("sum_value").as("b_sum"))
    // same session count per user and identical (start, n_events, sum_value)
    val mismatched = typed.join(builtin,
        col("user_id") === col("b_user") && col("s_start") === col("b_start"),
        "full_outer")
      .filter(col("user_id").isNull || col("b_user").isNull ||
        col("n_events") =!= col("b_n") || col("sum_value") =!= col("b_sum"))
    assert(mismatched.isEmpty,
      "every typed session must match a session_window session exactly")
    // session_idx is a dense 1-based sequence per user
    val perUser = typed.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("session_idx")).as("lo"),
        max(col("session_idx")).as("hi"))
    assert(perUser.filter(col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty)
    typed.unpersist()
  }

  test("q68/q73: audit group sizes and histogram counts conserve the table counts") {
    val audit = graft.queries.Profiling.q68AnonymizeAudit(spark, sf)
    assert(audit.agg(sum(col("k"))).head.getLong(0) === Tables.customer(spark, sf).count())
    assert(audit.filter(col("at_risk") =!= (col("k") < graft.queries.Profiling.KAnon)).isEmpty)
    val hist = graft.queries.Profiling.q73PriceHistogram(spark, sf)
    assert(hist.agg(sum(col("n"))).head.getLong(0) === Tables.orders(spark, sf).count())
    val shareSum = hist.agg(sum(col("share"))).head.getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-3, s"bucket shares must sum to ~1, got $shareSum")
  }

  test("q71: profile statistics are internally consistent") {
    val p = graft.queries.Profiling.q71NumericProfile(spark, sf).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      val corr = r.getAs[Double]("corr_qty_price")
      assert(corr >= -1.0 && corr <= 1.0)
      assert(r.getAs[Double]("sd_qty") >= 0.0)
      assert(r.getAs[Double]("var_price") >= 0.0)
      assert(r.getAs[Double]("min_qty") <= r.getAs[Double]("avg_qty") &&
        r.getAs[Double]("avg_qty") <= r.getAs[Double]("max_qty"))
      // corr and covariance agree in sign (both rounded from the same moments)
      val cov = r.getAs[Double]("cov_qty_price")
      assert(cov == 0.0 || corr == 0.0 || cov.sign == corr.sign)
    }
  }

  test("q70 keeps the q60 contamination signal: any q60-flagged doc has hits here too") {
    // q60 flags docs sharing a 5-gram; every 5-gram contains a 4-gram, so
    // q70 (4-grams) must see a hit for every q60-flagged training doc.
    val q60docs = TrainingData.q60Decontamination(spark, sf).select("doc_id")
    val zeroHit = Curation.q70BloomDecontam(spark, sf).filter(col("n_hit") === 0)
      .select("doc_id")
    assert(q60docs.intersect(zeroHit).isEmpty)
  }

  test("q83: kept blocks conserve the distinct-block count and the first doc keeps all") {
    val out = Curation.q83PassageDedup(spark, sf).cache()
    assert(out.filter(col("n_kept") > col("n_blocks")).isEmpty,
      "a document can never keep more blocks than it has")
    assert(out.filter((col("n_kept") === 0) =!= (col("clean_text") === "")).isEmpty,
      "clean_text must be empty exactly when nothing survives")
    // every distinct block is kept exactly once, corpus-wide
    val blocks = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFns.words(col("text")).as("ww"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0L), ceil(size(col("ww")).cast("double") / BlockW).cast("long") - 1),
        i => array_join(slice(col("ww"), (i * BlockW + 1).cast("int"), lit(BlockW)), " ")))
        .as("blk")).cache()
    val nDistinct = blocks.select("blk").distinct().count()
    val sumKept = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    assert(sumKept === nDistinct,
      s"sum(n_kept)=$sumKept must equal the corpus distinct-block count $nDistinct")
    // the lowest doc_id wins every tie it participates in: it keeps one
    // occurrence per distinct block it contains
    val firstDoc = out.orderBy(col("doc_id")).first()
    val firstDistinct = blocks.filter(col("doc_id") === firstDoc.getLong(0))
      .select("blk").distinct().count()
    assert(firstDoc.getAs[Long]("n_kept") === firstDistinct)
    blocks.unpersist(); out.unpersist()
  }

  test("q88: ECDF tops out at 1 per source, keep is monotone in quality, rows conserve") {
    val out = Curation.q88QualityCalibration(spark, sf).cache()
    assert(out.count() === Tables.documents(spark, sf).count(),
      "every document gets exactly one calibration row")
    assert(out.filter(col("ecdf") <= 0.0 || col("ecdf") > 1.0).isEmpty)
    // the best document of each source sits at ECDF exactly 1
    val tops = out.groupBy(col("source")).agg(max(col("ecdf")).as("m")).collect()
    assert(tops.forall(_.getAs[Double]("m") == 1.0))
    // within a source, keep never flips back off as quality rises
    val perSource = out.select("source", "quality", "keep").collect()
      .groupBy(_.getAs[String]("source"))
    perSource.foreach { case (src, rows) =>
      val byQ = rows.sortBy(_.getAs[Double]("quality"))
      val kept = byQ.map(_.getAs[Boolean]("keep"))
      assert(!kept.zip(kept.tail).exists { case (a, b) => a && !b },
        s"keep must be monotone in quality within source $src")
    }
    // the fence drops at most KeepPct of each source (ties at the
    // boundary survive, so the dropped fraction is strictly below)
    val dropFrac = out.groupBy(col("source"))
      .agg((sum(when(!col("keep"), 1L).otherwise(0L)).cast("double")
        / count(lit(1)).cast("double")).as("f")).collect()
    assert(dropFrac.forall(_.getAs[Double]("f") < KeepPct),
      "a source can never lose KeepPct or more of its documents")
    out.unpersist()
  }

  test("q92: clean fixture passes every check; injected defects are counted exactly") {
    import graft.queries.Profiling
    val clean = Profiling.q92QualityAudit(spark, sf).collect()
    assert(clean.map(_.getAs[String]("check_name")).sorted.toSeq ===
      Seq("chars_match", "doc_id_unique", "lang_present", "source_present", "text_nonempty"))
    clean.foreach { r =>
      assert(r.getAs[Boolean]("pass") === (r.getAs[Long]("n_violations") == 0L))
      assert(r.getAs[Long]("n_violations") === 0L,
        s"driver fixture must be clean, ${r.getAs[String]("check_name")} is not")
    }
    // corrupt a copy: one duplicated id (2 rows), one wrong n_chars, one
    // empty text, one blank lang — and re-audit the corrupted directory
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    val d = Tables.documents(spark, sf)
    val dupId = d.select(min(col("doc_id"))).collect()(0).getLong(0)
    val bad = d.unionByName(d.filter(col("doc_id") === dupId)) // dup: 2 rows share an id
      .withColumn("n_chars",
        when(col("doc_id") === dupId + 1, col("n_chars") + 7).otherwise(col("n_chars")))
      .withColumn("text",
        when(col("doc_id") === dupId + 2, lit("   ")).otherwise(col("text")))
      .withColumn("lang",
        when(col("doc_id") === dupId + 3, lit("")).otherwise(col("lang")))
      // blanking text also breaks chars_match for that row; keep the
      // checks independent by repairing its n_chars
      .withColumn("n_chars",
        when(col("doc_id") === dupId + 2, lit(3L)).otherwise(col("n_chars")))
    bad.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val audit = Profiling.q92QualityAudit(spark, dir).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations")).toMap
    assert(audit("doc_id_unique") === 2L, "both rows of the duplicated id count")
    assert(audit("chars_match") === 1L)
    assert(audit("text_nonempty") === 1L)
    assert(audit("lang_present") === 1L)
    assert(audit("source_present") === 0L)
  }

  test("q93: totals conserve the corpus and drops agree with the q82 clusters") {
    val rows = Curation.q93EffectiveCorpus(spark, sf).collect()
    val d = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === d.count())
    val corpusTok = d.select(sum(size(
      graft.functions.TextFns.words(col("text"))).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === corpusTok)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens"))
      val f = r.getAs[Double]("savings_frac")
      assert(f >= 0.0 && f < 1.0)
    }
    // exactly one keeper survives per near-dup cluster: total drops must
    // equal Σ (cluster_size − 1) over the q82 report
    val dropped = rows.map(r => r.getAs[Long]("n_docs") - r.getAs[Long]("n_docs_kept")).sum
    val q82drop = Curation.q82KeeperSelection(spark, sf).collect()
      .map(_.getAs[Long]("cluster_size") - 1L).sum
    assert(dropped === q82drop,
      s"q93 drops $dropped docs but q82 clusters imply $q82drop")
  }

  test("q94: the drop ledger lists every non-keeper once, with q82's keepers and margins >= 0") {
    val audit = Curation.q94DedupAudit(spark, sf).collect()
    val q82 = Curation.q82KeeperSelection(spark, sf).collect()
    assert(audit.length.toLong === q82.map(_.getAs[Long]("cluster_size") - 1L).sum,
      "one audit row per removed document")
    val keeperOf = q82.map(r => r.getAs[Long]("comp") -> r.getAs[Long]("keeper")).toMap
    audit.foreach { r =>
      assert(r.getAs[Long]("doc") !== r.getAs[Long]("keeper"), "keepers are never audited")
      assert(r.getAs[Long]("keeper") === keeperOf(r.getAs[Long]("comp")),
        "audit and q82 must name the same keeper")
      assert(r.getAs[Double]("doc_quality") <= r.getAs[Double]("keeper_quality"))
      assert(r.getAs[Double]("margin") >= 0.0)
    }
  }

  test("q98: bounded-heap exemplars are row-identical to the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val heap = Curation.q98QualityExemplars(spark, sf).collect().toSeq
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    val windowed = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFns.qualityScore(col("text")).as("quality"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= Curation.ExemplarK)
      .select(col("source"), col("rnk"), col("doc_id"), col("quality"))
      .orderBy(col("source"), col("rnk"))
      .collect().toSeq
    assert(heap === windowed, "heap top-k must equal the window top-k, ties included")
  }

  test("q99: each dimension's shares sum to 1 per split and counts conserve the corpus") {
    val rows = Curation.q99SplitDrift(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    rows.groupBy(_.getAs[String]("dim")).foreach { case (dim, g) =>
      assert(g.map(_.getAs[Long]("n_train")).sum + g.map(_.getAs[Long]("n_eval")).sum
        === total, s"dim $dim must partition the corpus")
      assert(math.abs(g.map(_.getAs[Double]("train_share")).sum - 1.0) < 1e-4)
      assert(math.abs(g.map(_.getAs[Double]("eval_share")).sum - 1.0) < 1e-4)
    }
    rows.foreach { r =>
      val drift = r.getAs[Double]("drift")
      assert(drift >= 0.0 && drift <= 1.0)
      assert(math.abs(drift - math.abs(r.getAs[Double]("train_share")
        - r.getAs[Double]("eval_share"))) < 1e-5)
    }
  }

  test("q116: the operating curve is monotone and agrees with a direct recount") {
    import graft.functions.TextFns
    val rows = Curation.q116FilterSweep(spark, sf).collect().sortBy(_.getAs[Double]("tau"))
    assert(rows.map(_.getAs[Double]("tau")).toSeq === Curation.SweepThresholds)
    // raising the bar can only shrink the kept set and the leaked dups
    val kept = rows.map(_.getAs[Long]("n_kept"))
    val leaked = rows.map(_.getAs[Long]("n_dup_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => b <= a })
    assert(leaked.zip(leaked.tail).forall { case (a, b) => b <= a })
    rows.foreach(r => assert(r.getAs[Long]("n_dup_kept") <= r.getAs[Long]("n_kept")))
    // spot-verify one row against a direct recount at its threshold
    val mid = rows(4)
    val tau = mid.getAs[Double]("tau")
    val directKept = Tables.documents(spark, sf)
      .select(TextFns.qualityScore(col("text")).as("q"))
      .filter(col("q") >= tau).count()
    assert(mid.getAs[Long]("n_kept") === directKept,
      s"sweep row at tau=$tau disagrees with the direct recount")
  }

  test("q125: kept set is the greedy best-quality prefix of each source's budget") {
    val rows = Curation.q125BudgetSelect(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tok"), r.getAs[Double]("quality"),
        r.getAs[Long]("cum_tok"), r.getAs[Boolean]("keep")))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, g) =>
      val total = g.map(_._3).sum
      val budget = total.toDouble * Curation.BudgetFrac
      // re-derive the greedy selection order and running total in memory
      val ordered = g.sortBy { case (id, _, _, q, _, _) => (-q, id) }
      var cum = 0L
      ordered.foreach { case (id, _, nt, _, cumTok, keep) =>
        cum += nt
        assert(cumTok === cum, s"running total diverged at doc $id")
        assert(keep === (cum.toDouble <= budget), s"keep flag wrong at doc $id")
      }
      // the kept rows are a PREFIX of the quality order (greedy shape) …
      val keptFlags = ordered.map(_._6)
      assert(!keptFlags.dropWhile(identity).contains(true),
        s"source $src: kept set is not a prefix of the quality order")
      // … maximal under the budget, and the budget genuinely binds
      val kept = ordered.takeWhile(_._6)
      assert(kept.map(_._3).sum <= budget)
      if (kept.length < ordered.length)
        assert(kept.map(_._3).sum + ordered(kept.length)._3 > budget,
          s"source $src: selection stopped before the budget was exhausted")
      assert(kept.nonEmpty && kept.length < g.length,
        s"source $src: budget does not bind on the fixture — the test is vacuous")
    }
  }

  test("q128: orphaned and NULL child keys count as violations (NOT EXISTS semantics)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fk").toString
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("nation", Seq(0L, 1L).toDF("n_nationkey"))
    // customer 30 references a missing nation; customer 40 has a NULL key
    write("customer", Seq(
      (10L, Some(0L)), (20L, Some(1L)), (30L, Some(9L)), (40L, None)
    ).toDF("c_custkey", "c_nationkey"))
    // order 300 references a missing customer
    write("orders", Seq((100L, 10L), (200L, 20L), (300L, 99L))
      .toDF("o_orderkey", "o_custkey"))
    // two lineitems orphaned on a missing order
    write("lineitem", Seq(100L, 100L, 200L, 999L, 999L).toDF("l_orderkey"))
    // one event from an unknown user
    write("events", Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:01:00", 77L, "view", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(col("ts_s")))
      .drop("ts_s"))
    val got = graft.queries.Profiling.q128FkAudit(spark, dir).collect()
      .map(r => (r.getAs[String]("constraint_name"), r.getAs[Long]("n_checked"),
        r.getAs[Long]("n_violations")))
    assert(got.toSeq === Seq(
      ("fk_customer_nation", 4L, 2L),   // missing nation + NULL key
      ("fk_events_customer", 2L, 1L),
      ("fk_lineitem_orders", 5L, 2L),
      ("fk_orders_customer", 3L, 1L)))
  }

  test("q151: per-period profiles match a direct recount and conserve the row total") {
    val cutUs = java.time.LocalDateTime
      .parse(graft.queries.Temporal.DiffCutoff,
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val evs = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("user_id"), col("value"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val (ref, cur) = evs.partition(_._1 <= cutUs)
    val out = graft.queries.Profiling.q151ProfileDrift(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out.keySet === Set("event_id", "event_type", "props", "ts", "user_id", "value"))
    // row totals conserve on every column and match the period split
    out.values.foreach { r =>
      assert(r.getAs[Long]("ref_rows") === ref.length.toLong)
      assert(r.getAs[Long]("cur_rows") === cur.length.toLong)
      assert(r.getAs[Long]("ref_null") === 0L && r.getAs[Long]("cur_null") === 0L)
    }
    // spot-recount NDV and range per side on two columns
    val v = out("value")
    assert(v.getAs[Long]("ref_ndv") === ref.map(_._3).distinct.length.toLong)
    assert(v.getAs[Long]("cur_ndv") === cur.map(_._3).distinct.length.toLong)
    assert(v.getAs[Double]("ref_min") === ref.map(_._3).min)
    assert(v.getAs[Double]("cur_max") === cur.map(_._3).max)
    val t = out("event_type")
    assert(t.getAs[Long]("ref_ndv") === ref.map(_._4).distinct.length.toLong)
    assert(t.getAs[Long]("cur_ndv") === cur.map(_._4).distinct.length.toLong)
    assert(t.isNullAt(t.fieldIndex("ref_min")), "string column's numeric lane must be NULL")
    // the diff column is the ratio it claims to be
    assert(math.abs(v.getAs[Double]("ndv_ratio")
      - v.getAs[Long]("cur_ndv").toDouble / v.getAs[Long]("ref_ndv")) < 1e-6)
    // ts ranges respect the cutoff ordering (the drift ledger's sanity)
    val ts = out("ts")
    assert(ts.getAs[Double]("ref_max") <= cutUs.toDouble)
    assert(ts.getAs[Double]("cur_min") > cutUs.toDouble)
  }

  test("q147: PSI matches an interpolated-decile replay and the bins tile both periods") {
    val cutUs = java.time.LocalDateTime
      .parse(graft.queries.Temporal.DiffCutoff,
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val evs = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val ref = evs.filter(_._1 <= cutUs).map(_._2).sorted
    val cur = evs.filter(_._1 > cutUs).map(_._2)
    def pct(q: Double): Double = {
      val pos = q * (ref.length - 1); val i = pos.toInt; val f = pos - i
      if (i + 1 < ref.length) ref(i) * (1 - f) + ref(i + 1) * f else ref(i)
    }
    val bounds = (1 to 9).map(i => pct(i / 10.0))
    def bin(v: Double): Int = 1 + bounds.count(v > _)
    val expRef = ref.groupBy(bin).map { case (b, g) => b -> g.length.toLong }
    val expCur = cur.groupBy(bin).map { case (b, g) => b -> g.length.toLong }
    val rows = Curation.q147PsiDrift(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq === (1 to 10))
    var psi = 0.0
    rows.foreach { r =>
      val b = r.getAs[Int]("bin")
      assert(r.getAs[Long]("n_ref") === expRef.getOrElse(b, 0L), s"bin $b ref count")
      assert(r.getAs[Long]("n_cur") === expCur.getOrElse(b, 0L), s"bin $b cur count")
      val p = math.max(expRef.getOrElse(b, 0L).toDouble / ref.length, Curation.PsiEps)
      val q = math.max(expCur.getOrElse(b, 0L).toDouble / cur.length, Curation.PsiEps)
      assert(math.abs(r.getAs[Double]("psi_contrib") - (p - q) * math.log(p / q)) < 1e-5)
      psi += r.getAs[Double]("psi_contrib")
      // reference deciles: every bin holds ~10% of the reference period
      assert(math.abs(r.getAs[Double]("ref_share") - 0.1) < 0.02, s"bin $b not a decile")
    }
    // conservation: the bins tile both periods completely
    assert(rows.map(_.getAs[Long]("n_ref")).sum === ref.length.toLong)
    assert(rows.map(_.getAs[Long]("n_cur")).sum === cur.length.toLong)
    // a PSI is a sum of same-sign-free terms; just pin it is finite and small
    // on a stationary fixture (both periods draw from the same generator)
    assert(psi >= 0 && psi < 0.25, s"stationary fixture drifted: psi=$psi")
  }

  test("q144: the erasure ledger matches a manual cascade walk, including depth 2") {
    val uids = Tables.customer(spark, sf).select(col("c_custkey")).collect()
      .map(_.getLong(0)).filter(_ % graft.queries.Profiling.EraseMod == 0).toSet
    assert(uids.nonEmpty, "no erasure victims — vacuous fixture")
    val evU = Tables.events(spark, sf).select(col("user_id")).collect().map(_.getLong(0))
      .filter(uids)
    val ordRows = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(o => uids(o._2))
    val victimOrderKeys = ordRows.map(_._1).toSet
    val liKeys = Tables.lineitem(spark, sf).select(col("l_orderkey")).collect()
      .map(_.getLong(0)).filter(victimOrderKeys)
    val got = graft.queries.Profiling.q144ErasurePlan(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Int]("cascade_depth"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))).toMap
    assert(got("customer") === ((1, uids.size.toLong, uids.size.toLong)))
    assert(got("events") === ((1, evU.length.toLong, evU.distinct.length.toLong)))
    assert(got("orders") === ((1, ordRows.length.toLong, ordRows.map(_._2).distinct.length.toLong)))
    assert(got("lineitem") === ((2, liKeys.length.toLong, liKeys.distinct.length.toLong)))
    // the depth-2 edge genuinely fires: victim orders drag lineitems along
    assert(liKeys.nonEmpty, "no transitive lineitem rows — the cascade is vacuous")
  }

  test("q141: winsorization matches an interpolated-percentile replay and contracts variance") {
    val byStatus = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    // Spark `percentile`'s linear interpolation at rank q·(n−1)
    def pct(sorted: Array[Double], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val i = pos.toInt
      val frac = pos - i
      if (i + 1 < sorted.length) sorted(i) * (1 - frac) + sorted(i + 1) * frac
      else sorted(i)
    }
    val rows = graft.queries.Profiling.q141Winsorize(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === byStatus.keySet)
    rows.foreach { r =>
      val vs = byStatus(r.getString(0)).map(_._2).sorted
      val (lo, hi) = (pct(vs, graft.queries.Profiling.WinsorLo),
        pct(vs, graft.queries.Profiling.WinsorHi))
      assert(math.abs(r.getAs[Double]("lo") - lo) < 1e-4)
      assert(math.abs(r.getAs[Double]("hi") - hi) < 1e-4)
      assert(r.getAs[Long]("n_clipped_lo") === vs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clipped_hi") === vs.count(_ > hi).toLong)
      val w = vs.map(v => math.min(math.max(v, lo), hi))
      def mean(a: Array[Double]) = a.sum / a.length
      def sd(a: Array[Double]) = {
        val m = mean(a); math.sqrt(a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
      }
      assert(math.abs(r.getAs[Double]("mean_wins") - mean(w)) < 1e-2)
      assert(math.abs(r.getAs[Double]("sd_wins") - sd(w)) < 1e-2)
      // clipping is a contraction: pairwise distances shrink, so sample
      // variance can only go down; the clipped mean stays inside [lo, hi]
      assert(r.getAs[Double]("sd_wins") <= r.getAs[Double]("sd_raw"))
      assert(r.getAs[Double]("mean_wins") >= r.getAs[Double]("lo") - 1e-9 &&
        r.getAs[Double]("mean_wins") <= r.getAs[Double]("hi") + 1e-9)
    }
    // the clip genuinely fires somewhere on the fixture
    assert(rows.exists(r =>
      r.getAs[Long]("n_clipped_lo") + r.getAs[Long]("n_clipped_hi") > 0L))
  }

  test("q138: seeded violations are counted and a NULL operand passes CHECK") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chk").toString
    // row 2 violates qty/discount/status AND ships before its order;
    // row 3 has a NULL l_tax — SQL CHECK semantics must NOT count it
    Seq(
      (1L, 5.0, 0.05, Option(0.02), "O", "2024-01-10 00:00:00"),
      (1L, -1.0, 1.5, Option(0.02), "X", "2024-01-01 00:00:00"),
      (2L, 3.0, 0.0, None: Option[Double], "F", "2024-02-01 00:00:00"))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_linestatus", "ship_s")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.to_timestamp(col("ship_s")))
      .drop("ship_s")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(
      (1L, "2024-01-05 00:00:00", 100.0, "O"),
      (2L, "2024-01-20 00:00:00", -50.0, "Z"))
      .toDF("o_orderkey", "date_s", "o_totalprice", "o_orderstatus")
      .withColumn("o_orderdate", org.apache.spark.sql.functions.to_timestamp(col("date_s")))
      .drop("date_s")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.queries.Profiling.q138CheckAudit(spark, dir).collect()
      .map(r => (r.getAs[String]("constraint_name"), r.getAs[Long]("n_checked"),
        r.getAs[Long]("n_violations")))
    assert(got.toSeq === Seq(
      ("chk_li_discount_range", 3L, 1L),
      ("chk_li_qty_positive", 3L, 1L),
      ("chk_li_ship_after_order", 3L, 1L),
      ("chk_li_status_domain", 3L, 1L),
      ("chk_li_tax_range", 3L, 0L),       // NULL operand → CHECK passes
      ("chk_o_status_domain", 2L, 1L),
      ("chk_o_totalprice_positive", 2L, 1L)))
  }

  test("q133: the ANALYZE ledger matches a direct per-column recount") {
    val out = graft.queries.Profiling.q133AnalyzeStats(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val o = Tables.orders(spark, sf).collect()
    val n = o.length.toLong
    assert(out.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_null") === 0L, s"${r.getString(0)}: fixture has no NULLs")
    }
    // primary key: NDV = row count, numeric min/max = key range
    assert(out("o_orderkey").getAs[Long]("ndv") === n)
    val keys = o.map(_.getAs[Long]("o_orderkey"))
    assert(out("o_orderkey").getAs[Double]("min_num") === keys.min.toDouble)
    assert(out("o_orderkey").getAs[Double]("max_num") === keys.max.toDouble)
    // measure column: exact NDV and range
    val prices = o.map(_.getAs[Double]("o_totalprice"))
    assert(out("o_totalprice").getAs[Long]("ndv") === prices.distinct.length.toLong)
    assert(out("o_totalprice").getAs[Double]("min_num") === prices.min)
    assert(out("o_totalprice").getAs[Double]("max_num") === prices.max)
    // categorical columns: NDV matches, numeric lane is honestly NULL
    for (c <- Seq("o_orderstatus", "o_orderpriority")) {
      assert(out(c).getAs[Long]("ndv") ===
        o.map(_.getAs[String](c)).distinct.length.toLong)
      assert(out(c).isNullAt(out(c).fieldIndex("min_num")))
      assert(out(c).isNullAt(out(c).fieldIndex("max_num")))
    }
  }

  test("q136: padding/truncation accounting is exact and both frontier curves are monotone") {
    val toks = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFns.words(col("text"))).cast("long").as("t"))
      .collect().map(_.getLong(0))
    val rows = Curation.q136PadSweep(spark, sf).collect().sortBy(_.getAs[Int]("max_len"))
    assert(rows.map(_.getAs[Int]("max_len")).toSeq === Curation.PadLens)
    rows.foreach { r =>
      val l = r.getAs[Int]("max_len").toLong
      assert(r.getAs[Long]("n_docs") === toks.length.toLong)
      val kept = toks.map(math.min(_, l)).sum
      assert(r.getAs[Long]("kept_tokens") === kept)
      assert(r.getAs[Long]("pad_tokens") === toks.length * l - kept)
      assert(r.getAs[Long]("truncated_tokens") === toks.sum - kept)
    }
    // rounding is monotone, so the rounded curves inherit monotonicity:
    // fill degrades and truncation recedes as L grows
    val fills = rows.map(_.getAs[Double]("fill_frac"))
    assert(fills.zip(fills.tail).forall { case (a, b) => a >= b },
      s"fill_frac must be non-increasing in max_len: ${fills.toSeq}")
    val truncs = rows.map(_.getAs[Double]("trunc_frac"))
    assert(truncs.zip(truncs.tail).forall { case (a, b) => a >= b },
      s"trunc_frac must be non-increasing in max_len: ${truncs.toSeq}")
    // the grid straddles the trade-off on the fixture (else the sweep is vacuous)
    assert(rows.head.getAs[Long]("truncated_tokens") > 0L)
    assert(rows.last.getAs[Long]("pad_tokens") > 0L)
  }

  test("q137: estimated cardinality equals the actual join and fan-out stats recount") {
    val r = graft.queries.Profiling.q137JoinCard(spark, sf).collect() match {
      case Array(row) => row
      case rows       => fail(s"expected exactly 1 row, got ${rows.length}")
    }
    val actual = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getAs[Long]("est_join_rows") === actual,
      "the histogram estimate must be EXACT for an equi-join")
    // fan-out diagnostics against an in-memory per-key recount
    val lc = Tables.lineitem(spark, sf).groupBy(col("l_orderkey")).count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val oc = Tables.orders(spark, sf).groupBy(col("o_orderkey")).count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val products = lc.flatMap { case (k, c) => oc.get(k).map(_ * c) }
    assert(r.getAs[Long]("max_key_fanout") === products.max)
    assert(r.getAs[Long]("n_hot_keys") ===
      lc.valuesIterator.count(_ >= graft.queries.Profiling.HotFanout).toLong)
    assert(r.getAs[Long]("n_keys_left") === oc.size.toLong)
    assert(r.getAs[Long]("n_keys_right") === lc.size.toLong)
    assert(r.getAs[Long]("n_keys_matched") === lc.keySet.count(oc.contains).toLong)
  }

  test("q199: PII audit equals a java.util.regex replay; planted classes hit, near-misses and residuals zero") {
    val out = Curation.q199PiiAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // plain-Scala replay: rebuild the audited text per doc, count with
    // java.util.regex (independent engine #3 next to Spark and DuckDB),
    // redact, and aggregate per source
    val email = java.util.regex.Pattern.compile(Curation.PiiEmailRe)
    val phone = java.util.regex.Pattern.compile(Curation.PiiPhoneRe)
    val idp = java.util.regex.Pattern.compile(Curation.PiiIdRe)
    def nMatches(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    def pad(v: Long, w: Int): String = s"%0${w}d".format(v)
    case class Acc(var docs: Long = 0, var eDocs: Long = 0, var pDocs: Long = 0,
                   var iDocs: Long = 0, var e: Long = 0, var p: Long = 0,
                   var i: Long = 0, var resid: Long = 0, var chars: Long = 0)
    val accs = collection.mutable.Map.empty[String, Acc]
    Tables.documents(spark, sf).select("doc_id", "source", "text").collect().foreach { r =>
      val (docId, src, text) = (r.getLong(0), r.getString(1), r.getString(2))
      val t = text + ((docId % 4) match {
        case 0 => s" contact u$docId@ex.com now"
        case 1 => s" call 555-${pad(docId % 10000, 4)}-0123 now"
        case 2 => s" ref 042-${pad(docId % 100, 2)}-${pad(docId % 10000, 4)} now"
        case _ => s" ping u$docId@ex and 555-12-34 now"
      })
      val (ne, np, ni) = (nMatches(email, t), nMatches(phone, t), nMatches(idp, t))
      // planted-class contract on THIS corpus: exactly one hit of the
      // planted class, zero of the others, zero for near-miss docs
      (docId % 4) match {
        case 0 => assert((ne, np, ni) === ((1L, 0L, 0L)), s"doc $docId")
        case 1 => assert((ne, np, ni) === ((0L, 1L, 0L)), s"doc $docId")
        case 2 => assert((ne, np, ni) === ((0L, 0L, 1L)), s"doc $docId")
        case _ => assert((ne, np, ni) === ((0L, 0L, 0L)), s"near-miss doc $docId matched")
      }
      val red = idp.matcher(phone.matcher(email.matcher(t).replaceAll("[EMAIL]"))
        .replaceAll("[PHONE]")).replaceAll("[ID]")
      val a = accs.getOrElseUpdate(src, Acc())
      a.docs += 1; a.e += ne; a.p += np; a.i += ni
      if (ne > 0) a.eDocs += 1
      if (np > 0) a.pDocs += 1
      if (ni > 0) a.iDocs += 1
      a.resid += nMatches(email, red) + nMatches(phone, red) + nMatches(idp, red)
      a.chars += red.length.toLong
    }
    assert(out.keySet === accs.keySet.toSet)
    accs.foreach { case (src, a) =>
      val r = out(src)
      assert(r.getAs[Long]("n_docs") === a.docs, s"$src n_docs")
      assert(r.getAs[Long]("email_docs") === a.eDocs, s"$src email_docs")
      assert(r.getAs[Long]("phone_docs") === a.pDocs, s"$src phone_docs")
      assert(r.getAs[Long]("id_docs") === a.iDocs, s"$src id_docs")
      assert(r.getAs[Long]("email_hits") === a.e, s"$src email_hits")
      assert(r.getAs[Long]("phone_hits") === a.p, s"$src phone_hits")
      assert(r.getAs[Long]("id_hits") === a.i, s"$src id_hits")
      assert(r.getAs[Long]("residual_hits") === 0L && a.resid === 0L, s"$src residuals")
      assert(r.getAs[Long]("redacted_chars") === a.chars, s"$src redacted_chars")
    }
  }
}
