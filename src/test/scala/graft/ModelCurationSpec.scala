package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.col

import graft.queries.{ModelCuration => MC}

/** Pins for the model-based curation operators (q201 trained quality
  * classifier, q202 DSIR importance resampling): the training trajectory
  * actually learns (monotone loss, accuracy well above the majority
  * class), the distributed exact-arithmetic loop equals a plain-Scala
  * replay bit-for-bit, and the resampling race is a deterministic
  * weighted top-k a plain-Scala replay reproduces document-for-document.
  */
class ModelCurationSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def uhash(key: String, salt: String): Double =
    java.lang.Long.parseLong(md5hex(s"$key:$salt").substring(0, 15), 16)
      .toDouble / (1L << 60).toDouble

  test("q201 training learns: per-round loss decreases monotonically, accuracy beats the majority class") {
    val m = MC.qfTrain(spark, sf, withHistory = true)
    val losses = m.history.map(_._1)
    assert(losses.size === MC.QfRounds)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not decrease: $losses")
    }
    val labels = MC.qfLabels(spark, sf).collect().map(_.getLong(1))
    val majority = math.max(labels.count(_ == 1L), labels.count(_ == 0L)).toDouble / labels.length
    val finalAcc = m.history.last._2
    assert(finalAcc >= 0.9, s"final accuracy $finalAcc below 0.9")
    assert(finalAcc > majority + 0.05,
      s"accuracy $finalAcc does not beat the majority class $majority")
  }

  test("q201 distributed training equals a plain-Scala replay of the exact-arithmetic loop, weight for weight") {
    val m = MC.qfTrain(spark, sf)
    val feats = m.feats.collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    val labels = m.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = labels.size
    val byDoc = feats.groupBy(_._1)
    val k = new Array[Long](MC.QfDim)
    for (_ <- 1 to MC.QfRounds) {
      val g = new Array[Long](MC.QfDim)
      byDoc.foreach { case (doc, fs) =>
        val zs = fs.map { case (_, b, x) => k(b) * x }.sum
        val p = math.min(math.max(0.25 * (zs.toDouble / MC.QfScale.toDouble) + 0.5, 0.0), 1.0)
        val r = p - labels(doc).toDouble
        fs.foreach { case (_, b, x) =>
          g(b) += math.floor(r * x.toDouble * MC.QfScale.toDouble).toLong
        }
      }
      var b = 0
      while (b < MC.QfDim) {
        k(b) -= math.floor(g(b).toDouble / (n.toDouble * (1L << MC.QfEtaShift).toDouble)).toLong
        b += 1
      }
    }
    assert(k.toSeq === m.weights.toSeq,
      "distributed GD diverged from the plain-Scala exact-arithmetic replay")
    // and the published margins are the replay's margins
    val margins = MC.q201QualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    byDoc.foreach { case (doc, fs) =>
      val zs = fs.map { case (_, b, x) => k(b) * x }.sum
      assert(margins(doc) === zs, s"margin mismatch for doc $doc")
    }
  }

  test("q202 resample equals a plain-Scala replay of the importance model and Gumbel race") {
    val got = MC.q202ImportanceResample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === MC.DsK)
    assert(got.map(_._1).distinct.length === MC.DsK, "duplicate docs selected")
    // plain-Scala replay from the raw documents
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val counts = docs.map { case (id, lang, text) =>
      val c = text.trim.split("\\s+").toSeq
        .groupBy(w => (hash32(w) % MC.DsBuckets).toInt)
        .view.mapValues(_.size.toLong).toMap
      (id, lang, c)
    }
    val raw = new Array[Long](MC.DsBuckets)
    val tgt = new Array[Long](MC.DsBuckets)
    counts.foreach { case (_, lang, c) =>
      c.foreach { case (b, v) =>
        raw(b) += v
        if (lang == MC.DsTargetLang) tgt(b) += v
      }
    }
    val nr = raw.sum.toDouble
    val nt = tgt.sum.toDouble
    val lam = Array.tabulate(MC.DsBuckets)(b =>
      math.log((tgt(b) + 1).toDouble / (nt + MC.DsBuckets)) -
        math.log((raw(b) + 1).toDouble / (nr + MC.DsBuckets)))
    val keyed = counts.map { case (id, _, c) =>
      val logw = c.map { case (b, v) => v.toDouble * lam(b) }.sum
      val u = uhash(id.toString, "q202")
      (logw - math.log(-math.log(u)), id)
    }
    val expect = keyed.sortBy { case (key, id) => (-key, id) }.take(MC.DsK).map(_._2).toSet
    assert(got.map(_._1).toSet === expect,
      "selected resample set diverged from the plain-Scala replay")
  }

  test("q207 mixture weights equal a plain-Scala replay of the exact-arithmetic MW loop") {
    val got = MC.q207DoremiMixture(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("loss"), r.getAs[Long]("weight_grid"))))
      .toMap
    // plain-Scala replay from the raw documents
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val srcs = docs.map(_._1).distinct.sorted
    val k = srcs.length
    val idx = srcs.zipWithIndex.toMap
    val c = Array.ofDim[Long](k, MC.DmBuckets)
    docs.foreach { case (src, text) =>
      text.trim.split("\\s+").foreach(w => c(idx(src))((hash32(w) % MC.DmBuckets).toInt) += 1)
    }
    val cs = c.map(_.sum)
    val p = Array.tabulate(k, MC.DmBuckets)((i, b) => c(i)(b) * MC.DmScale / cs(i))
    val eps = 1L << MC.DmEpsShift
    var alpha = Array.fill(k)(MC.DmWeight / k)
    var loss = new Array[Long](k)
    for (_ <- 1 to MC.DmRounds) {
      val m = Array.tabulate(MC.DmBuckets)(b =>
        srcs.indices.map(i => alpha(i) * p(i)(b)).sum / MC.DmWeight)
      loss = Array.tabulate(k)(i =>
        (0 until MC.DmBuckets).map { b => val d = p(i)(b) - m(b); d * d }.sum)
      val a = Array.tabulate(k)(i => alpha(i) * (MC.DmDamp + loss(i)) / MC.DmShift)
      val tot = a.sum
      alpha = Array.tabulate(k)(i =>
        a(i) * MC.DmWeight / tot * (eps - 1) / eps + (MC.DmWeight / k) / eps)
    }
    assert(got.keySet === srcs.toSet)
    srcs.indices.foreach { i =>
      assert(got(srcs(i)) === ((loss(i), alpha(i))),
        s"source ${srcs(i)} diverged from the replay")
    }
    // the optimization is non-degenerate: weights genuinely moved off
    // uniform, and the smoothing floor holds for every source
    val ws = srcs.indices.map(i => alpha(i))
    assert(ws.min < ws.max, "weights stayed uniform — the loop did nothing")
    assert(ws.min >= (MC.DmWeight / k) / eps,
      "a weight fell below the smoothing floor eps/K")
    // normalization conserves mass up to the K floor losses per round
    assert(math.abs(ws.sum - MC.DmWeight) <= 3L * k,
      s"weight mass drifted: ${ws.sum} vs ${MC.DmWeight}")
  }

  test("q208 calibration sweep equals a plain-Scala recount over q201's margins and the dup proxy") {
    import graft.queries.Dedup
    val margins = MC.q201QualityClassifier(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("label"), r.getAs[Long]("margin")))
    val dups = Dedup.componentLabels(spark, sf).collect()
      .map(_.getAs[Long]("doc")).toSet
    val nPos = margins.count(_._2 == 1L).toLong
    val nDup = margins.count(m => dups(m._1)).toLong
    val got = MC.q208CalibrationSweep(spark, sf).collect()
    assert(got.map(_.getAs[Long]("tau")).toSeq === MC.CalibTaus.sorted)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { row =>
      val tau = row.getAs[Long]("tau")
      val kept = margins.filter(_._3 >= tau)
      val tp = kept.count(_._2 == 1L).toLong
      val dupKept = kept.count(m => dups(m._1)).toLong
      assert(row.getAs[Long]("n_kept") === kept.length.toLong)
      assert(row.getAs[Long]("tp") === tp)
      assert(row.getAs[Long]("fp") === kept.length - tp)
      assert(row.getAs[Long]("fn") === nPos - tp)
      assert(row.getAs[Long]("n_dup_kept") === dupKept)
      def check(name: String, num: Long, den: Long): Unit =
        if (den > 0)
          assert(math.abs(row.getAs[Double](name) - r6(num.toDouble / den)) < 1e-9,
            s"$name diverged at tau $tau")
        else assert(row.isNullAt(row.fieldIndex(name)), s"$name not NULL at tau $tau")
      check("prec", tp, kept.length.toLong)
      check("rec", tp, nPos)
      check("dup_leak", dupKept, nDup)
      if (kept.length + nPos > 0)
        assert(math.abs(row.getAs[Double]("f1")
          - r6(2.0 * tp / (kept.length + nPos))) < 1e-9)
    }
    // the sweep is non-degenerate: the bars genuinely bind (kept counts
    // strictly drop somewhere across the grid) and stay monotone
    val keptSeq = got.map(_.getAs[Long]("n_kept")).toSeq
    assert(keptSeq === keptSeq.sorted.reverse, "n_kept not monotone in tau")
    assert(keptSeq.head > keptSeq.last,
      "every bar kept the same set — margin distribution never crosses the grid")
  }
}
