package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.streaming.EventStreams

/** True-streaming semantics of the EventStreams plans: the same
  * DataFrame→DataFrame functions the batch queries (q16/q27/q28) register
  * are driven here from a MemoryStream, exercising watermark late-drop,
  * bounded-state dedup, custom per-key state, and AvailableNow drain
  * (the reference consumer's "process backlog then stop" semantics done
  * right — its own loop never terminates, etl_dags.py:46-49).
  */
/** Test event row — top-level so Spark can derive its product encoder. */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Spark 4 transformWithState processor: running max per user via
  * ValueState — the modern arbitrary-state API (successor to
  * flatMapGroupsWithState), with explicit typed state handles.
  */
class RunningMax extends StatefulProcessor[Long, Ev, (Long, Double)] {
  @transient private var maxState: ValueState[Double] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxState = getHandle.getValueState[Double]("max", Encoders.scalaDouble, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val prev = if (maxState.exists()) maxState.get() else Double.MinValue
    val mx = rows.foldLeft(prev)((m, e) => math.max(m, e.value))
    maxState.update(mx)
    Iterator((key, mx))
  }
}

class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with watermark drops late data in append mode") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingWithWatermark(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling_wm")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(ts(1), 1, "click", 1.0), Ev(ts(4), 1, "click", 2.0))
      q.processAllAvailable()
      // advance event time far enough that watermark (max-5m) passes 10:10
      in.addData(Ev(ts(31), 2, "view", 5.0))
      q.processAllAvailable()
      // this row is older than the watermark → must be dropped
      in.addData(Ev(ts(2), 1, "click", 100.0))
      q.processAllAvailable()
      in.addData(Ev(ts(55), 2, "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_wm").collect()
        .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      // the 10:00 window was finalized with ONLY the 2 on-time clicks
      assert(rows.contains((ts(0), "click", 2L, 3.0)), s"got $rows")
      assert(!rows.exists { case (_, _, _, sum) => sum == 103.0 },
        "late row leaked into a finalized window")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups an at-least-once stream") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(in.toDF(), "10 minutes",
        Seq("user_id", "ts"))
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append).start()
    try {
      val e = Ev(ts(1), 7, "click", 1.0)
      in.addData(e, e)          // duplicate delivery in one batch
      q.processAllAvailable()
      in.addData(e)             // replay in a later batch, still in watermark
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() === 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState maintains per-key running totals") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val in = MemoryStream[Ev]
    val counted = in.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          val batch = evs.toSeq
          val next = (n0 + batch.size, s0 + batch.map(_.value).sum)
          state.update(next)
          Iterator((user, next._1, next._2))
      }.toDF("user_id", "n", "total")
    val q = counted.writeStream.format("memory").queryName("fmgws")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Ev(ts(1), 1, "c", 1.0), Ev(ts(2), 1, "c", 2.0), Ev(ts(3), 2, "c", 5.0))
      q.processAllAvailable()
      in.addData(Ev(ts(4), 1, "c", 4.0))
      q.processAllAvailable()
      val last = spark.table("fmgws").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(last(1L) === ((3L, 7.0)))
      assert(last(2L) === ((1L, 5.0)))
    } finally q.stop()
  }

  test("AvailableNow drains the backlog and stops (reference E2 fixed)") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val in = MemoryStream[Ev]
    in.addData((1 to 50).map(i => Ev(ts(i % 60), i % 5, "click", i.toDouble)): _*)
    val q = in.toDF().groupBy(col("user_id")).count()
      .writeStream.format("memory").queryName("drain")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query should terminate after draining")
    assert(spark.table("drain").as[(Long, Long)].collect().map(_._2).sum === 50L)
  }

  test("transformWithState (Spark 4 API) keeps per-key running max in RocksDB state") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val oldProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val out = in.toDS().groupByKey(_.user_id)
      .transformWithState(new RunningMax, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "running_max")
    val q = out.writeStream.format("memory").queryName("tws")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(Ev(ts(1), 1, "c", 3.0), Ev(ts(2), 1, "c", 7.0), Ev(ts(3), 2, "c", 5.0))
      q.processAllAvailable()
      in.addData(Ev(ts(4), 1, "c", 4.0), Ev(ts(5), 2, "c", 9.0)) // 4.0 must NOT lower user 1's max
      q.processAllAvailable()
      val last = spark.table("tws").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last(1L) === 7.0)
      assert(last(2L) === 9.0)
    } finally {
      q.stop()
      oldProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream inner join with watermarked range condition") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    // attribute each purchase to a click by the same user within 10 min
    val c = clicks.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "20 minutes")
    val p = purchases.toDF().select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("amount"))
      .withWatermark("p_ts", "20 minutes")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") && col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Ev(ts(0), 1, "click", 0.0), Ev(ts(30), 2, "click", 0.0))
      purchases.addData(
        Ev(ts(5), 1, "purchase", 9.99),   // within 10 min of user 1's click → joins
        Ev(ts(45), 2, "purchase", 5.0),   // 15 min after user 2's click → no join
        Ev(ts(7), 3, "purchase", 1.0))    // no click at all → no join
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("c_user"), r.getAs[Double]("amount")))
      assert(rows.toSeq === Seq((1L, 9.99)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits null rows only after the watermark closes the match window") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "5 minutes")
    val p = purchases.toDF().select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("amount"))
      .withWatermark("p_ts", "5 minutes")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") && col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_left")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Ev(ts(0), 1, "click", 0.0), Ev(ts(1), 2, "click", 0.0))
      purchases.addData(Ev(ts(5), 1, "purchase", 9.99))
      q.processAllAvailable()
      // user 2's null-extended row must NOT appear yet: its match window
      // is still open (a purchase could still arrive)
      val early = spark.table("ssj_left").collect().map(_.getAs[Long]("c_user"))
      assert(!early.contains(2L),
        "left join emitted the unmatched row before the watermark closed it")
      // advance event time far past user 2's window + watermark delay
      clicks.addData(Ev(ts(40), 9, "click", 0.0))
      purchases.addData(Ev(ts(40), 8, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_left").collect()
        .map(r => (r.getAs[Long]("c_user"), Option(r.get(r.fieldIndex("amount")))))
      assert(rows.contains((1L, Some(9.99))), "matched row missing")
      assert(rows.contains((2L, None)),
        "null-extended row not emitted after watermark passed the window")
    } finally q.stop()
  }

  test("batch and streaming tumbling plans agree on the same data") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val data = (0 until 40).map(i => Ev(ts(i), i % 3, if (i % 2 == 0) "a" else "b", i.toDouble))
    // streaming pass
    val in = MemoryStream[Ev]
    in.addData(data: _*)
    val q = EventStreams.tumbling(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("uni")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("uni").collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    // batch pass over the identical rows
    val batch = EventStreams.tumbling(data.toDF(), "10 minutes").collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(streamed === batch)
  }

  test("hash-threshold sampling is stream-applicable and agrees with batch") {
    // deterministic sampling is a stateless map — the same filter runs
    // unchanged on an unbounded stream (curation-on-ingest), and because
    // keep/drop is a pure function of the key it selects the SAME rows
    // it would in batch, regardless of arrival order or micro-batching
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val docs = (0L until 300L).map(i => (i, s"lang${i % 3}"))
    def sampled(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("u", conv(substring(md5(
        concat(col("doc_id").cast("string"), lit(":spar"))), 1, 15), 16, 10)
        .cast("long").cast("double") / 1152921504606846976.0)
      .filter(col("u") < 0.4)
    val in = MemoryStream[(Long, String)]
    in.addData(docs: _*)
    val q = sampled(in.toDF().toDF("doc_id", "lang"))
      .writeStream.format("memory").queryName("samp")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("samp").select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = sampled(docs.toDF("doc_id", "lang"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("incremental ingest under foreachBatch: micro-batched verdicts equal the batch q108 run") {
    // The q108 probe-vs-index core is the per-increment operation; here
    // the delta arrives as a STREAM of doc ids in two micro-batches, each
    // probing the same base index under foreachBatch. Because the probe is
    // per-delta-doc independent (candidates, verify, and verdict never
    // look at other delta docs), the union of micro-batch verdicts must
    // equal the one-shot batch run — the exactly-once ingest contract.
    import graft.queries.Dedup
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val state = Dedup.minhashState(spark, sf)
    val bands = Dedup.bandRows(state).localCheckpoint(true)
    val isDelta = col("doc_id") % 10 === 3
    val baseBands = bands.filter(!isDelta).localCheckpoint(true)
    val deltaIds = Tables.documents(spark, sf).filter(isDelta)
      .select("doc_id").as[Long].collect().sorted
    val (firstBatch, secondBatch) = deltaIds.splitAt(deltaIds.length / 2)
    val acc = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Option[Double], String)]
    val in = MemoryStream[Long]
    val q = in.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
        val ids = batch.toDF("doc_id")
        val out = Dedup.probeVerdicts(state,
          baseBands,
          bands.join(ids, "doc_id"),
          Tables.documents(spark, sf).join(ids, "doc_id"))
        acc.synchronized {
          acc ++= out.collect().map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Long]("n_base_matches"),
            Option(r.getAs[java.lang.Double]("best_jaccard")).map(_.doubleValue),
            r.getAs[String]("verdict")))
        }
        ()
      }.start()
    in.addData(firstBatch.toSeq: _*)
    q.processAllAvailable()
    in.addData(secondBatch.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val batchRun = Dedup.q108IncrementalDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_base_matches"),
        Option(r.getAs[java.lang.Double]("best_jaccard")).map(_.doubleValue),
        r.getAs[String]("verdict")))
    assert(acc.size === batchRun.length)
    assert(acc.toSet === batchRun.toSet)
  }

  test("q135: gap histogram matches an in-memory recount and cum_share closes at 1") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bounds = Seq(60, 300, 900, 1800, 3600, 10800).map(_ * 1000000L)
    val counts = new Array[Long](7)
    evs.groupBy(_._1).values.foreach { g =>
      val ts = g.sortBy(e => (e._2, e._3)).map(_._2)
      ts.zip(ts.tail).foreach { case (a, b) =>
        val gap = b - a
        counts(bounds.indexWhere(gap < _) match { case -1 => 6; case i => i }) += 1
      }
    }
    val rows = graft.queries.Streaming.q135GapHistogram(spark, sf).collect()
    val total = counts.sum.toDouble
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === rows.map(_.getAs[Int]("bucket")).toSeq.sorted)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Long]("n_gaps") === counts(b), s"bucket $b count diverged")
      val cumExpect = counts.take(b + 1).sum / total
      assert(math.abs(r.getAs[Double]("cum_share") - cumExpect) < 1e-6)
    }
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === counts.sum)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-6,
      "the cumulative share must close at 1")
  }

  test("streaming CMS drain: per-batch sketches merged across a stream equal the batch sketch exactly") {
    // q169 proved merge-linearity batch-side (per-source sketches); this
    // drives the SAME counter builder from the streaming surface the
    // sketch is designed for: each micro-batch folds its own d*w counter
    // table into a running merged state by pure addition, and after the
    // drain the merged state equals the one-shot batch sketch of the
    // whole corpus EXACTLY -- counters are linear, so the micro-batch
    // decomposition (like q169's source decomposition) cannot change a
    // single counter.
    import graft.queries.CorpusStats
    implicit val sq = spark.sqlContext
    import sq.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length > 10, "fixture corpus must be non-trivial")
    val in = MemoryStream[(Long, String)]
    // merged state: (r, bucket) -> counter, folded by foreachBatch --
    // the d*w frame is <= CmsDepth*CmsWidth = 768 rows by construction,
    // so the per-batch collect is bounded no matter the corpus size
    val state = scala.collection.mutable.Map.empty[(Int, Long), Long]
    var batches = 0
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val toks = batch.select(explode(split(trim(col("text")), "\\s+")).as("term"))
        CorpusStats.cmsCountersFromTokens(toks).collect().foreach { r =>
          val k = (r.getAs[Int]("r"), r.getAs[Long]("bucket"))
          state(k) = state.getOrElse(k, 0L) + r.getAs[Long]("c")
        }
        batches += 1
      }
      .outputMode(OutputMode.Update).start()
    try {
      // three uneven ingest batches (split by doc_id mod 3)
      (0 until 3).foreach { g =>
        in.addData(docs.filter(_._1 % 3 == g).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")
    val batchSketch = CorpusStats.cmsCountersFromTokens(
        Tables.documents(spark, sf)
          .select(explode(split(trim(col("text")), "\\s+")).as("term")))
      .collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) -> r.getAs[Long]("c"))
      .toMap
    assert(state.toMap === batchSketch,
      "stream-merged CMS counters diverged from the batch sketch")
  }

  test("streaming banded near-dup: drained candidates equal the batch band join; q23 pairs covered") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    import graft.queries.Dedup
    import graft.streaming.NearDupStream
    // the per-row signature formulation must equal the batch aggregate
    // on the same corpus before any streaming claim means anything
    val rowForm = Dedup.rowBandRows(
        Tables.documents(spark, sf).select(col("doc_id"), col("text"),
          lit(Timestamp.valueOf("2024-01-01 10:00:00")).as("ts")))
      .select("doc_id", "band", "band_sig").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batchBands = Dedup.bandRows(Dedup.minhashState(spark, sf))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rowForm === batchBands, "per-row band rows != batch band rows")
    // drive the full corpus through the stream in two in-window batches
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = NearDupStream.candidates(in.toDF().toDF("doc_id", "text", "ts"),
        10L * 60 * 1000)
      .writeStream.format("memory").queryName("nd_stream")
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      in.addData(h1.map { case (id, t) => (id, t, ts(0)) }.toSeq)
      q.processAllAvailable()
      in.addData(h2.map { case (id, t) => (id, t, ts(5)) }.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("nd_stream").select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bb = Dedup.bandRows(Dedup.minhashState(spark, sf))
    val batchCand = bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === batchCand, "stream drain != batch candidate pair set")
    val q23Pairs = Dedup.q23MinHashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q23Pairs.subsetOf(got), "a verified near-dup pair escaped the stream")
  }

  test("streaming banded near-dup: bucket state expires with the watermark — a late twin is not paired") {
    implicit val sq = spark.sqlContext
    import sq.implicits._
    import graft.streaming.NearDupStream
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val filler = "completely unrelated filler content words marching ever onward tonight"
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = NearDupStream.candidates(in.toDF().toDF("doc_id", "text", "ts"),
        10L * 60 * 1000)
      .writeStream.format("memory").queryName("nd_late")
      .outputMode("append").start()
    try {
      in.addData((1000L, text, t("10:00")))
      q.processAllAvailable()
      in.addData((1001L, text, t("10:01")))           // in-window twin → pair
      q.processAllAvailable()
      in.addData((2000L, filler, t("11:30")))         // watermark → 11:20
      q.processAllAvailable()
      in.addData((1002L, text, t("11:31")))           // twin text, window long closed
      q.processAllAvailable()
      in.addData((1003L, text, t("11:32")))           // in-window with 1002 → pair
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("nd_late").select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1000L, 1001L), (1002L, 1003L)),
      s"within-watermark contract violated: $got")
  }
}
