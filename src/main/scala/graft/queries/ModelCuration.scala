package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns.{hash32, qualityScore, qualitySqlExpr, words}

/** Model-based curation — the two trained-model stages a production
  * pipeline runs after the heuristic filters (r17 verdict asks #2/#3):
  *
  *   - q201: a TRAINED quality classifier — fixed-round distributed
  *     logistic-regression training (hashed bag-of-words + engineered
  *     features, hard-sigmoid, integer-grid gradient quantization) whose
  *     every training round the DuckDB oracle replays arithmetic-for-
  *     arithmetic. The fastText-style recipe: cheap heuristic labels, a
  *     linear model over hashed features that generalizes them.
  *   - q202: DSIR-style importance resampling — hashed-n-gram importance
  *     weights (target-vs-raw log-likelihood ratio, add-one smoothed)
  *     and a Gumbel top-k race, the public Xie et al. 2023 recipe
  *     composed from shipped parts (q143's feature hashing, q84's LM
  *     scoring shape, q79's deterministic race).
  *
  * Exactness discipline (what makes the oracle replay possible):
  * q201 keeps EVERY training quantity on an integer grid or in exactly-
  * reproducible IEEE arithmetic — weights are integers in units of
  * 2^-20, margins are exact BIGINT dot products, the hard sigmoid
  * clamp(0.25·z + 0.5, 0, 1) uses only +,*,/ by powers of two (no libm
  * anywhere), per-row gradient contributions are floor-quantized back to
  * the 2^-20 grid BEFORE summing (so partial aggregation is order-free
  * integer addition — the q182 trick), and the learning-rate step is a
  * floor division. Two engines running this recipe agree bit-for-bit,
  * which is why the gate can hash-compare margins, not just verdicts.
  * q202 follows the q79/q84 precedent instead: ln is libm (last-ulp
  * cross-engine drift ~1e-15), reported columns are rounded to 4dp, and
  * the race-key boundary gap is continuous-hash-driven (measured 2.2e-3
  * at sf0.01 — eleven orders above the drift), so the selected set is
  * stable.
  */
object ModelCuration {

  // ---------------------------------------------------------------- q201

  /** Hashed bag-of-words bucket count for the classifier (the q143
    * hashing-trick space, sized so the fixture vocabulary genuinely
    * shares buckets). */
  val QfBuckets: Int = 64

  /** Feature indices of the engineered columns appended after the BoW
    * block: bias, capped-centered token count, capped-centered
    * punctuation chars, centered distinct-token count. Centering is
    * load-bearing: it puts the separating hyperplane near the origin, so
    * few fixed GD rounds reach it (uncentered counts stall at the
    * majority-class predictor — measured). */
  val QfBias: Int = QfBuckets
  val QfLen: Int = QfBuckets + 1
  val QfPunct: Int = QfBuckets + 2
  val QfDistinct: Int = QfBuckets + 3
  val QfDim: Int = QfBuckets + 4
  val QfLenCap: Int = 50
  val QfLenCenter: Int = 25
  val QfPunctCap: Int = 100
  val QfPunctCenter: Int = 8
  val QfDistinctCenter: Int = 15

  /** Fixed-point scale: weights live on the 2^-20 grid. */
  val QfScale: Long = 1L << 20

  /** Learning-rate shift: each round's step is
    * floor(Σ-gradient / (n · 2^QfEtaShift)) in grid units — lr = 2^-5 on
    * the mean quantized gradient. Chosen with the round count on the
    * real corpus: loss 0.25 → 0.028 monotone and accuracy ≥ 0.95 at
    * sf0.001/sf0.01/sf0.1 alike (measured; the spec pins the trajectory
    * shape, the oracle pins every number). */
  val QfEtaShift: Int = 5
  val QfRounds: Int = 10

  /** The (doc_id, b, x) feature frame + (doc_id, y) labels. One corpus
    * pass: tokenize, hash32 % B with counts (map-side combined), append
    * the four engineered rows per doc. Labels are the q18 composite
    * quality heuristic thresholded at 0.5 — the fastText-style recipe
    * trains a cheap linear model to GENERALIZE heuristic labels, so the
    * label source being a shipped, oracle-verified function is exactly
    * the production shape (weak supervision), not circularity: the model
    * sees hashed counts, never the heuristic's inputs.
    */
  private[graft] def qfFeatures(s: SparkSession, dir: String): DataFrame = {
    val base = resplit(documents(s, dir).select(col("doc_id"), col("text")))
      .withColumn("ws", words(col("text")))
    val bow = base
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), (hash32(col("w")) % QfBuckets).as("b"))
      .agg(count(lit(1)).as("x"))
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[^a-z0-9\\s]", ""))).cast("long")
    val eng = base.select(col("doc_id"),
        lit(QfBias.toLong).as("b_bias"), lit(1L).as("x_bias"),
        (least(size(col("ws")).cast("long"), lit(QfLenCap.toLong)) - QfLenCenter).as("x_len"),
        (least(punct, lit(QfPunctCap.toLong)) - QfPunctCenter).as("x_punct"),
        (size(array_distinct(col("ws"))).cast("long") - QfDistinctCenter).as("x_dist"))
      .select(col("doc_id"), explode(array(
        struct(lit(QfBias.toLong).as("b"), col("x_bias").as("x")),
        struct(lit(QfLen.toLong).as("b"), col("x_len").as("x")),
        struct(lit(QfPunct.toLong).as("b"), col("x_punct").as("x")),
        struct(lit(QfDistinct.toLong).as("b"), col("x_dist").as("x")))).as("f"))
      .select(col("doc_id"), col("f.b").as("b"), col("f.x").as("x"))
    bow.unionByName(eng).filter(col("x") =!= 0L)
  }

  private[graft] def qfLabels(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      when(qualityScore(col("text")) >= 0.5, 1L).otherwise(0L).as("y"))

  /** The hard sigmoid on the exact grid: clamp(0.25·(zs/2^20) + 0.5, 0, 1).
    * Powers of two only — every engine computes the identical double. */
  private def hardSigmoid(zs: Column): Column =
    least(greatest(lit(0.25) * (zs.cast("double") / lit(QfScale.toDouble)) + lit(0.5),
      lit(0.0)), lit(1.0))

  /** A trained model: the final weight vector (grid units), the
    * per-round (mean squared loss, accuracy) history, and the cached
    * feature/label frames so scoring reuses the one corpus pass. */
  private[graft] case class QfModel(weights: Array[Long],
      history: Seq[(Double, Double)], feats: DataFrame, labels: DataFrame)

  /** One full training run: T rounds of exact-arithmetic batch GD. The
    * weight vector lives on the driver (QfDim longs — the MLlib
    * treeAggregate shape: the MODEL is tiny, the DATA never leaves the
    * executors); each round runs one small job over the cached feature
    * frame — the b-keyed quantized-gradient aggregate (QfDim rows
    * collected). With `withHistory` a second scalar job per round records
    * the (loss, accuracy) trajectory; the OBSERVABILITY is optional, the
    * training arithmetic is identical either way (the spec turns it on to
    * pin monotone loss, the production path leaves it off — it halves the
    * per-round job count).
    *
    * Scale shape: the corpus-sized work (tokenize + bucket counts) runs
    * ONCE into the cached feature frame of ~(n·40) rows; each of the T
    * rounds shuffles only that frame (doc-keyed margin agg + b-keyed
    * gradient agg) and moves QfDim longs to the driver — at a 1000-
    * executor corpus the per-round network cost is the two small
    * shuffles, the classic distributed-GD profile.
    */
  private[graft] def qfTrain(s: SparkSession, dir: String,
      withHistory: Boolean = false): QfModel = {
    val feats = qfFeatures(s, dir).localCheckpoint(true)
    val labels = qfLabels(s, dir).localCheckpoint(true)
    val n = labels.count()
    val k = new Array[Long](QfDim)
    val history = Seq.newBuilder[(Double, Double)]
    for (_ <- 1 to QfRounds) {
      val resid = feats.join(broadcast(weightsDf(s, k)), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k") * col("x")).as("zs"))
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"),
          (hardSigmoid(col("zs")) - col("y").cast("double")).as("r"),
          col("zs"), col("y"))
      val grads = feats.join(resid.select(col("doc_id"), col("r")), Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(floor(col("r") * col("x") * lit(QfScale.toDouble))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      if (withHistory) {
        val metrics = resid.agg(
          sum(col("r") * col("r")).as("sse"),
          sum(when((col("zs") > 0L) === (col("y") === 1L), 1L).otherwise(0L)).as("ok"))
          .collect()(0)
        history += ((metrics.getDouble(0) / n, metrics.getLong(1).toDouble / n))
      }
      var b = 0
      while (b < QfDim) {
        val g = grads.getOrElse(b.toLong, 0L)
        k(b) -= math.floor(g.toDouble / (n.toDouble * (1L << QfEtaShift).toDouble)).toLong
        b += 1
      }
    }
    QfModel(k, history.result(), feats, labels)
  }

  private def weightsDf(s: SparkSession, k: Array[Long]): DataFrame = {
    import s.implicits._
    k.toSeq.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toDF("b", "k")
  }

  /** q201: TRAINED quality-filter classifier — train [[QfRounds]] exact
    * GD rounds, then score every document with the final weights. Output
    * is the filter artifact itself: the exact integer margin (in 2^-20
    * units), the keep/drop verdict, and its agreement with the heuristic
    * label — hash-exact end to end because nothing in training or
    * scoring ever leaves the integer grid / exact-IEEE path. Accuracy on
    * the corpus is ~0.95 against a 0.78 majority class (measured at
    * three scales; the spec pins monotone loss + ≥0.9 accuracy + a
    * plain-Scala replay of the full training loop).
    */
  def q201QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val m = qfTrain(s, dir)
    m.feats.join(broadcast(weightsDf(s, m.weights)), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * col("x")).as("margin"))
      .join(m.labels, Seq("doc_id"))
      .select(col("doc_id"), col("y").as("label"), col("margin"),
        (col("margin") > 0L).as("pred"),
        ((col("margin") > 0L) === (col("y") === 1L)).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** q201's oracle: the IDENTICAL training loop unrolled — [[QfRounds]]
    * rounds of (margins ⨝ weights, hard-sigmoid residuals, floor-
    * quantized gradient sums, floor-division weight step) as chained
    * CTEs, then the final-margin scoring pass. Every arithmetic step is
    * integer or exactly-reproducible IEEE (powers of two only), so the
    * compare is hash-exact on the margins themselves — the oracle
    * RETRAINS the model, it does not check a verdict. */
  val q201Sql: String = {
    val S = QfScale
    val eta = 1L << QfEtaShift
    def round(i: Int): String = {
      val prev = if (i == 1) "w0" else s"w${i - 1}"
      s"""m$i AS MATERIALIZED (
         |  SELECT f.doc_id, CAST(sum(w.k * f.x) AS BIGINT) AS zs
         |  FROM feat f JOIN $prev w USING (b) GROUP BY f.doc_id),
         |r$i AS MATERIALIZED (
         |  SELECT m.doc_id,
         |   least(greatest(0.25 * (CAST(zs AS DOUBLE) / $S.0) + 0.5, 0.0), 1.0) - y AS r
         |  FROM m$i m JOIN lab USING (doc_id)),
         |g$i AS MATERIALIZED (
         |  SELECT f.b, CAST(sum(CAST(floor(r * f.x * $S.0) AS BIGINT)) AS BIGINT) AS g
         |  FROM feat f JOIN r$i USING (doc_id) GROUP BY f.b),
         |w$i AS MATERIALIZED (
         |  SELECT w.b,
         |   w.k - CAST(floor(CAST(coalesce(g.g, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * $eta.0)) AS BIGINT) AS k
         |  FROM $prev w LEFT JOIN g$i g USING (b) CROSS JOIN nn)""".stripMargin
    }
    s"""WITH ww AS MATERIALIZED (
       |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |lab AS MATERIALIZED (
       |  SELECT doc_id,
       |   CASE WHEN ${qualitySqlExpr("w", "text")} >= 0.5 THEN 1 ELSE 0 END AS y
       |  FROM ww),
       |tok AS MATERIALIZED (SELECT doc_id, unnest(w) AS t FROM ww),
       |bow AS MATERIALIZED (
       |  SELECT doc_id,
       |   CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % $QfBuckets AS b,
       |   CAST(count(*) AS BIGINT) AS x
       |  FROM tok GROUP BY 1, 2),
       |eng AS MATERIALIZED (
       |  SELECT doc_id, CAST($QfBias AS BIGINT) AS b, CAST(1 AS BIGINT) AS x FROM ww
       |  UNION ALL SELECT doc_id, $QfLen,
       |    least(CAST(len(w) AS BIGINT), $QfLenCap) - $QfLenCenter FROM ww
       |  UNION ALL SELECT doc_id, $QfPunct,
       |    least(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9\\s]', '', 'g')) AS BIGINT), $QfPunctCap) - $QfPunctCenter FROM ww
       |  UNION ALL SELECT doc_id, $QfDistinct,
       |    CAST(len(list_distinct(w)) AS BIGINT) - $QfDistinctCenter FROM ww),
       |feat AS MATERIALIZED (
       |  SELECT doc_id, b, x FROM bow WHERE x <> 0
       |  UNION ALL SELECT doc_id, b, x FROM eng WHERE x <> 0),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |w0 AS MATERIALIZED (SELECT CAST(t.b AS BIGINT) AS b, CAST(0 AS BIGINT) AS k FROM range(0, $QfDim) t(b)),
       |${(1 to QfRounds).map(round).mkString(",\n")},
       |fm AS MATERIALIZED (
       |  SELECT f.doc_id, CAST(sum(w.k * f.x) AS BIGINT) AS margin
       |  FROM feat f JOIN w$QfRounds w USING (b) GROUP BY f.doc_id)
       |SELECT l.doc_id, CAST(l.y AS BIGINT) AS label, fm.margin,
       | fm.margin > 0 AS pred, (fm.margin > 0) = (l.y = 1) AS correct
       |FROM lab l JOIN fm USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q202

  /** Hashed-n-gram space for the importance model (q143's trick at the
    * DSIR paper's granularity) and the resample size. */
  val DsBuckets: Int = 256
  val DsK: Int = 100

  /** The DSIR target domain: English documents (the "high-quality
    * reference corpus" slot in the public recipe — any held-out target
    * distribution works; the fixture's lang column is its stand-in). */
  val DsTargetLang: String = "en"

  /** q202: DSIR-style importance RESAMPLING — select [[DsK]] documents
    * whose hashed-unigram distribution looks most like the target
    * domain, via the public two-step: (1) per-document importance weight
    * log w_d = Σ_b c_db · (ln p̂_target(b) − ln p̂_raw(b)) with add-one-
    * smoothed bucket models; (2) Gumbel top-k — key = log w_d + Gumbel
    * (deterministic uniform from the doc id), take the K largest — which
    * samples WITHOUT replacement with probability ∝ w_d (Efraimidis–
    * Spirakis in Gumbel form, q79's race with the weight moved into the
    * key).
    *
    * Scale shape: one corpus-sized explode + (doc, bucket) map-side-
    * combined count; the two bucket models are B-row aggregates OF that
    * frame and ride back as one broadcast; the race is a bounded top-k
    * (`TakeOrderedAndProject` — K·partitions rows cross the wire, never
    * a sort). No all-pairs, no iteration: the importance model is
    * closed-form counting, which is exactly why DSIR scales to
    * pretraining corpora in the paper.
    *
    * Cross-engine determinism: ln is libm (q79/q84 precedent) — reported
    * doubles are rounded to 4dp and the selection boundary gap measured
    * 2.2e-3 at sf0.01, eleven orders above last-ulp drift; exact key
    * ties are structurally absent from a continuous hash draw.
    */
  def q202ImportanceResample(s: SparkSession, dir: String): DataFrame = {
    val d = resplit(documents(s, dir).select(col("doc_id"), col("lang"), col("text")))
    // lang rides the (doc, bucket) aggregate key (doc_id determines it, so
    // the groups are unchanged) — the target model is then a FILTER of
    // this frame, never a join against a target-id set that at corpus
    // scale is half the ids and unbroadcastable
    val x = d.select(col("doc_id"), col("lang"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("lang"), (hash32(col("w")) % DsBuckets).as("b"))
      .agg(count(lit(1)).as("c"))
    val raw = x.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tgt = x.filter(col("lang") === DsTargetLang)
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("nr")).crossJoin(
      tgt.agg(sum(col("ct")).as("nt")))
    val model = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") / (col("nt") + lit(DsBuckets.toDouble)))
          - log((col("cr") + lit(1L)).cast("double") / (col("nr") + lit(DsBuckets.toDouble)))).as("lam"))
    val u = TrainingData.uhash(col("doc_id"), "q202")
    x.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast("double") * col("lam")).as("logw"))
      .join(d.select(col("doc_id"), col("lang"),
        size(words(col("text"))).cast("long").as("n_tokens")), Seq("doc_id"))
      .withColumn("gkey", col("logw") - log(-log(u)))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(DsK)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("logw"), 4).as("log_weight"), round(col("gkey"), 4).as("race_key"))
  }

  val q202Sql: String =
    s"""WITH ww AS (
       |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, lang, unnest(w) AS t FROM ww),
       |x AS (
       |  SELECT doc_id, lang,
       |   CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % $DsBuckets AS b,
       |   CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2, 3),
       |raw AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM x GROUP BY b),
       |tgt AS (
       |  SELECT b, CAST(sum(c) AS BIGINT) AS ct
       |  FROM x WHERE lang = '$DsTargetLang'
       |  GROUP BY b),
       |tots AS (
       |  SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
       |         (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS nt),
       |model AS (
       |  SELECT r.b,
       |   ln(CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) / (nt + $DsBuckets.0))
       |   - ln(CAST(r.cr + 1 AS DOUBLE) / (nr + $DsBuckets.0)) AS lam
       |  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tots),
       |lw AS (
       |  SELECT doc_id, sum(c * lam) AS logw
       |  FROM x JOIN model USING (b) GROUP BY doc_id),
       |scored AS (
       |  SELECT w.doc_id, w.lang, CAST(len(w.w) AS BIGINT) AS n_tokens, lw.logw,
       |   lw.logw - ln(-ln(${TrainingData.uhashSql("w.doc_id", "q202")})) AS gkey
       |  FROM ww w JOIN lw ON w.doc_id = lw.doc_id)
       |SELECT doc_id, lang, n_tokens,
       | ROUND(logw, 4) AS log_weight, ROUND(gkey, 4) AS race_key
       |FROM scored ORDER BY gkey DESC, doc_id LIMIT $DsK""".stripMargin
}
