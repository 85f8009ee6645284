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
}
