package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

import graft.queries.{Clustering, Curation, Similarity, TrainingData}

/** Independent plain-Scala replays of the r15 operators (q173–q177):
  * full-contract recomputation (same sequential-fold float arithmetic,
  * same rounding discipline) compared row-exactly against the engine,
  * plus the structural invariants the oracle hash can't express
  * (eigen-residual bounds, genuine diversification, dominance
  * exhaustiveness).
  */
class ClusteringSpec extends SparkTestBase {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  /** (vec_id → doubles), the same widen as [[Similarity.vecs]]. */
  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  /** Sequential fold, the DotFold order. */
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))

  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  private def cos(a: Long, b: Long): Double =
    dot(vecs(a), vecs(b)) / (norm(vecs(a)) * norm(vecs(b)))

  /** Unrounded-threshold ε-pairs (i < j), the q40/q67 verify semantics. */
  private def pairsAtLeast(th: Double): Seq[(Long, Long)] = {
    val ids = vecs.keys.toSeq.sorted
    for {
      i <- ids; j <- ids if i < j && cos(i, j) >= th
    } yield (i, j)
  }

  test("q173 ≡ plain-Scala DBSCAN (roles, clusters, degrees) on the fixture") {
    val pairs = pairsAtLeast(Clustering.DbscanEps)
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val deg = vecs.keys.map(id => id -> nbrs.get(id).map(_.size).getOrElse(0)).toMap
    val minDeg = Clustering.DbscanMinPts - 1
    val core = vecs.keys.filter(deg(_) >= minDeg).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for ((a, b) <- pairs if core(a) && core(b)) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = core.map(c => c -> find(c)).toMap
    val expected = vecs.keys.toSeq.sorted.map { id =>
      val role =
        if (core(id)) "core"
        else if (nbrs.get(id).exists(_.exists(core))) "border"
        else "noise"
      val cluster = role match {
        case "core"   => comp(id)
        case "border" => nbrs(id).filter(core).map(comp).min
        case _        => -1L
      }
      (id, role, cluster, deg(id).toLong)
    }
    val got = Clustering.q173Dbscan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the fixture exercises all three roles and ≥ 2 clusters
    assert(Set("core", "border", "noise").subsetOf(expected.map(_._2).toSet))
    assert(expected.filter(_._2 == "core").map(_._3).distinct.size >= 2)
  }

  test("q178 ≡ q173 row-identical (fold ≡ batch), and the fold reads the stored pair table") {
    val batch = Clustering.q173Dbscan(spark, sf).collect().map(_.toSeq).toSeq
    val fold = Clustering.q178DbscanIncrement(spark, sf)
    assert(fold.collect().map(_.toSeq).toSeq === batch)
    // the incremental path's pair list comes from the DURABLE bucketed
    // table, not a re-scored base corpus (checkpoint-truncated subtrees
    // hide the labels table; the pair table feeds the final assembly
    // directly, so it must be visible in the prepared plan)
    val p = fold.queryExecution.executedPlan.toString
    assert(p.contains("graft_dbscan_pairs_b"),
      s"stored pair table scan missing from the fold plan:\n$p")
  }

  test("q182 ≡ q174 row-identical (fold ≡ batch), and the fold reads the stored partials") {
    val batch = Clustering.q174PcaPower(spark, sf).collect().map(_.toSeq).toSeq
    val fold = Clustering.q182PcaIncrement(spark, sf)
    assert(fold.collect().map(_.toSeq).toSeq === batch)
    // the base side of the merge is the DURABLE 4161-row bucketed table;
    // the only embeddings rows paying the O(d²) posexplode are the delta
    // batch (vec_id % 10 = 0) — the base corpus is never re-exploded.
    // Pinned on the MERGE frame: the registered output's lineage is a
    // LocalTableScan (the eigensolve is the d-bounded driver collect)
    val p = Clustering.mergedPcaPartials(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_pca_gram_b"),
      s"stored partials table scan missing from the fold plan:\n$p")
    assert(p.contains("% 10) = 0"),
      s"delta filter missing — the fold may be re-exploding the base corpus:\n$p")
  }

  test("q182 stored partials are exactly additive (integer merge law on the fixture)") {
    // the merge law the oracle hash proves end-to-end, replayed directly:
    // stored(base) + partials(delta) = partials(all), cell by cell
    import org.apache.spark.sql.Row
    def partsOf(filter: Long => Boolean): Map[(Int, Int), Long] = {
      val q = Clustering.PcaQuantScale
      val sel = vecs.filter { case (id, _) => filter(id) }
      val d = Similarity.AnnDims
      val gram = for (i <- 0 until d; j <- 0 until d) yield (i, j) ->
        sel.values.map(v => math.floor(v(i) * v(j) * q + 0.5).toLong).sum
      val sums = (0 until d).map(i => (i, -1) ->
        sel.values.map(v => math.floor(v(i) * q + 0.5).toLong).sum)
      (gram ++ sums :+ ((-1, -1) -> sel.size.toLong)).toMap
    }
    val stored = Clustering.storedPcaPartials(spark, sf).collect()
      .map { case Row(i: Int, j: Int, q: Long) => (i, j) -> q }.toMap
    assert(stored === partsOf(_ % 10 != 0))
    val all = partsOf(_ => true)
    val delta = partsOf(_ % 10 == 0)
    all.foreach { case (k, v) => assert(stored(k) + delta(k) === v) }
  }

  test("q184 ≡ plain-Scala grid replay (roles + components per (ε, minPts) cell)") {
    val expected = for {
      eps <- Clustering.SweepEps
      mp <- Clustering.SweepMinPts
    } yield {
      val pairs = pairsAtLeast(eps)
      val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
        .map { case (k, g) => k -> g.map(_._2).toSet }
      val deg = vecs.keys.map(id => id -> nbrs.get(id).map(_.size).getOrElse(0)).toMap
      val core = vecs.keys.filter(deg(_) >= mp - 1).toSet
      val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- pairs if core(a) && core(b)) {
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comp = core.map(c => c -> find(c)).toMap
      val borders = vecs.keys.filterNot(core)
        .filter(id => nbrs.get(id).exists(_.exists(core))).toSeq
      val battach = borders.map(id => id -> nbrs(id).filter(core).map(comp).min)
      val sizes = (core.toSeq.map(comp) ++ battach.map(_._2))
        .groupBy(identity).map(_._2.size)
      (eps, mp, core.size.toLong, borders.size.toLong,
        (vecs.size - core.size - borders.size).toLong,
        comp.values.toSet.size.toLong,
        (if (sizes.isEmpty) 0 else sizes.max).toLong)
    }
    val got = Clustering.q184DbscanSweep(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // the grid is informative on the fixture: at least one cell clusters
    // and at least one cell reports pure noise (the sweep's whole point
    // is seeing that boundary before a full-scale run)
    assert(expected.exists(_._6 > 0), "no cell clusters — grid uninformative")
    assert(expected.exists(_._3 == 0L), "no all-noise cell — grid uninformative")
  }

  test("q193 ≡ plain-Scala threshold-calibration replay; volume monotone, trade-off visible") {
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = pairsAtLeast(Clustering.DbscanEps)
      .map { case (a, b) => (cos(a, b), labels(a) == labels(b)) }
    val expected = Clustering.CalibThresholds.map { thr =>
      val sel = base.filter(_._1 >= thr)
      (thr, sel.size.toLong, sel.count(_._2).toLong, sel.count(!_._2).toLong)
    }
    val got = Clustering.q193ThresholdCalibration(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // pair volume is monotone non-increasing in the threshold, the
    // lowest bar yields pairs, and the fixture shows a real trade-off:
    // some threshold admits cross-label pairs (impure), some doesn't
    val vols = expected.map(_._2)
    assert(vols.zip(vols.tail).forall { case (a, b) => a >= b })
    assert(vols.head > 0, "no pairs at the widest radius")
    assert(expected.exists(_._4 > 0), "no impure threshold — calibration vacuous")
    assert(expected.exists(e => e._2 > 0 && e._4 == 0L) || expected.exists(_._2 == 0L),
      "no pure-or-empty threshold — nothing to choose between")
  }

  test("q179 ≡ plain-Scala centroid-silhouette replay over the q173 clustering") {
    val roles = Clustering.q173Dbscan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val members = roles.filter(_._2 != "noise")
    val byCluster = members.groupBy(_._3)
    def round6(x: Double) = BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
    val cents = byCluster.map { case (c, ms) =>
      val vs = ms.map(m => vecs(m._1))
      c -> Array.tabulate(vs.head.length)(i => round6(vs.map(_(i)).sum / vs.size))
    }
    def cosTo(v: Array[Double], c: Array[Double]) = dot(v, c) / (norm(v) * norm(c))
    val expected = byCluster.toSeq.sortBy(_._1).map { case (c, ms) =>
      val cosOwn = ms.map(m => cosTo(vecs(m._1), cents(c)))
      val sils = ms.map { m =>
        val others = cents.filter(_._1 != c).values
        if (others.isEmpty) Double.NaN
        else {
          val a = 1.0 - cosTo(vecs(m._1), cents(c))
          val b = 1.0 - others.map(o => cosTo(vecs(m._1), o)).max
          if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
        }
      }.filterNot(_.isNaN)
      (c, ms.size.toLong, ms.count(_._2 == "core").toLong,
        ms.count(_._2 == "border").toLong,
        round6(cosOwn.sum / cosOwn.size),
        if (sils.isEmpty) None else Some(round6(sils.sum / sils.size)))
    }
    val got = Clustering.q179ClusterQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) === ((e._1, e._2, e._3, e._4)))
      // averages re-sum in a different order than the engine's partials —
      // equal to well inside the 6dp rounding quantum
      assert(math.abs(g._5 - e._5) < 2e-6, s"cohesion ${g._5} vs ${e._5}")
      (g._6, e._6) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6, s"silhouette $a vs $b")
        case (a, b)             => assert(a === b)
      }
    }
  }

  test("q174: loadings are near-eigenvectors of the replayed centered Gramian") {
    val d = Similarity.AnnDims
    val out = Clustering.q174PcaPower(spark, sf).collect()
    assert(out.length === d)
    val pc1 = out.map(_.getDouble(2)); val pc2 = out.map(_.getDouble(3))
    val lam1 = out.head.getDouble(4); val lam2 = out.head.getDouble(5)
    val sh1 = out.head.getDouble(6); val sh2 = out.head.getDouble(7)
    // replayed centered Gramian (plain sums — within 1e-9 of the engine's
    // rounded ones, dwarfed by the tolerances below)
    val xs = vecs.values.toArray
    val n = xs.length.toDouble
    val mu = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    val gc = Array.tabulate(d, d)((i, j) =>
      xs.map(x => x(i) * x(j)).sum - n * mu(i) * mu(j))
    def mv(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    def l2(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    // unit loadings, positive eigenvalue estimates, shares consistent.
    // NOT asserted: λ̂1 ≥ λ̂2 — the contract is FIXED-round Rayleigh
    // estimates, and on a near-flat spectrum the deflated iterate's
    // quotient can exceed the first's (both undershoot their true λ;
    // ordering of the estimates is not a theorem)
    assert(math.abs(l2(pc1) - 1.0) < 0.01 && math.abs(l2(pc2) - 1.0) < 0.01)
    assert(lam1 > 0.0 && lam2 > 0.0)
    assert(sh1 > 0.0 && sh2 > 0.0 && sh1 + sh2 < 1.0)
    val trace = (0 until d).map(i => gc(i)(i)).sum
    assert(math.abs(sh1 - lam1 / trace) < 1e-3)
    // eigen-residual of the FIXED-round power iterate: ‖Gc·v − λv‖ ≤ 10% λ
    // (the corpus spectrum is near-flat, so the iterate is a Rayleigh
    // pair, not a converged eigenpair — the contract is determinism)
    val r1 = mv(gc, pc1).zip(pc1).map { case (w, v) => w - lam1 * v }
    assert(l2(r1) / lam1 < 0.1, s"PC1 residual ${l2(r1) / lam1}")
    val g2 = Array.tabulate(d, d)((i, j) => gc(i)(j) - lam1 * pc1(i) * pc1(j))
    val r2 = mv(g2, pc2).zip(pc2).map { case (w, v) => w - lam2 * v }
    assert(l2(r2) / lam2 < 0.1, s"PC2 residual ${l2(r2) / lam2}")
    assert(math.abs(dot(pc1, pc2)) < 0.1)
    // means match the replay
    out.foreach(r => assert(math.abs(r.getDouble(1) - mu(r.getLong(0).toInt - 1)) < 1e-5))
  }

  test("q180 ≡ plain-Scala projection/grid replay; grid covers multiple cells") {
    val st = Clustering.pcaStats(spark, sf)
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val proj = vecs.toSeq.map { case (id, v) =>
      val cv = v.indices.map(i => v(i) - st.mu(i)).toArray
      (labels(id), dot(cv, st.v1), dot(cv, st.v2))
    }
    val (mn1, mx1) = (proj.map(_._2).min, proj.map(_._2).max)
    val (mn2, mx2) = (proj.map(_._3).min, proj.map(_._3).max)
    def cell(v: Double, mn: Double, mx: Double): Long =
      if (mx == mn) 0L
      else math.min(Clustering.PcaGrid - 1L,
        math.floor((v - mn) * Clustering.PcaGrid / (mx - mn)).toLong)
    val expected = proj.map { case (l, p1, p2) =>
      (cell(p1, mn1, mx1), cell(p2, mn2, mx2), l)
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((b1, b2), g) => (b1, b2, g.size.toLong, g.map(_._3).distinct.size.toLong) }
      .sortBy(t => (t._1, t._2))
    val got = Clustering.q180PcaMap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.size > 1 && got.map(_._3).sum === vecs.size.toLong)
  }

  test("q181 ≡ independent BFS over the validated near-dup graph") {
    import graft.queries.Dedup
    val pairs = Dedup.componentLabels(spark, sf) // force the memo chain
    val edgeList = graft.queries.Dedup.q22Cached(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val adj = (edgeList ++ edgeList.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSeq }
    // uncapped BFS from each canonical, then apply the round cap
    val hops = scala.collection.mutable.Map[Long, Long]()
    labels.filter { case (d, c) => d == c }.keys.foreach { seed =>
      var frontier = Set(seed); hops(seed) = 0L; var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(f => adj.getOrElse(f, Seq.empty[Long]))
          .filterNot(x => hops.contains(x))
        frontier.foreach(hops(_) = d)
      }
    }
    val expected = labels.keys.toSeq.sorted.map { doc =>
      val h = hops(doc)
      (doc, labels(doc), if (h <= Dedup.DupDepthRounds) h else -1L)
    }
    val got = Dedup.q181DupDepth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q181 BFS core: depths beyond the round cap report -1 on a synthetic chain") {
    import spark.implicits._
    import graft.queries.Dedup
    val n = 12L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = (1L to n).map(i => (i, 1L)).toDF("doc", "comp")
    val got = Dedup.chainDepths(pairs, labels).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    (1L to n).foreach { d =>
      val depth = d - 1
      assert(got(d) === (if (depth <= Dedup.DupDepthRounds) depth else -1L),
        s"doc $d")
    }
    assert(got.values.toSet.contains(-1L))
  }

  test("q181 BFS core: early exit at the fixed point returns the full-round result") {
    import spark.implicits._
    import graft.queries.Dedup
    // converges at round 3 (max depth 3) — the r19-opt early exit fires
    // well before the 8-round cap; depths must equal the uncapped BFS,
    // including the isolated second component's depth-1 leaf.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)).toDF("doc", "comp")
    val got = Dedup.chainDepths(pairs, labels).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 0L, 11L -> 1L))
  }

  test("q175 ≡ plain-Scala greedy MMR, and the picks genuinely diversify") {
    val qids = vecs.keys.toSeq.sorted.take(Similarity.PqQueries)
    val ids = vecs.keys.toSeq.sorted
    val expected = qids.flatMap { q =>
      val rel = ids.filter(_ != q).map(c => c -> round6(cos(q, c))).toMap
      val cand = rel.toSeq.sortBy { case (id, r) => (-r, id) }
        .take(Similarity.MmrCand).map(_._1)
      val sim = (for (a <- cand; b <- cand if a != b)
        yield (a, b) -> round6(cos(a, b))).toMap
      var selected = Vector(cand.minBy(c => (-rel(c), c)))
      // ×10 exact-decimal output score (rank 1: 10·rel)
      var scores = Vector(BigDecimal(rel(selected.head)) * 10)
      for (_ <- 2 to Similarity.MmrK) {
        val remaining = cand.filterNot(selected.contains)
        val best = remaining.minBy { c =>
          val ms = selected.map(s => sim((c, s))).max
          (-(Similarity.MmrLambda * rel(c) - Similarity.MmrComplement * ms), c)
        }
        val ms = selected.map(s => sim((best, s))).max
        selected :+= best
        scores :+= BigDecimal(rel(best)) * 7 - BigDecimal(ms) * 3
      }
      selected.zipWithIndex.map { case (id, i) =>
        (q, (i + 1).toLong, id, rel(id), scores(i).toDouble)
      }
    }
    val got = Similarity.q175MmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq
    assert(got === expected)
    // diversification is real: some query's MMR set ≠ its pure-relevance top-k
    val pureTop = qids.map { q =>
      val rel = ids.filter(_ != q).map(c => c -> round6(cos(q, c))).toMap
      q -> rel.toSeq.sortBy { case (id, r) => (-r, id) }
        .take(Similarity.MmrK).map(_._1).toSet
    }.toMap
    val mmrSets = expected.groupBy(_._1).map { case (q, g) => q -> g.map(_._3).toSet }
    assert(qids.exists(q => mmrSets(q) != pureTop(q)),
      "MMR never deviated from pure relevance — λ trade-off inert on the fixture")
  }

  test("q176 ≡ brute-force skyline; every excluded doc has a dominator") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").distinct.length.toLong))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._3 >= b._3 && a._2 <= b._2 && (a._3 > b._3 || a._2 < b._2)
    val frontier = docs.filter(d => !docs.exists(o => dominates(o, d)))
      .sortBy(d => (d._2, d._1)).map(d => (d._1, d._2, d._3)).toSeq
    val got = Curation.q176ParetoFrontier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === frontier)
    val kept = frontier.map(_._1).toSet
    docs.filterNot(d => kept(d._1)).foreach { d =>
      assert(docs.exists(o => dominates(o, d)), s"doc ${d._1} excluded but undominated")
    }
  }

  test("q177 ≡ hash-policy replay; negatives are never ε-neighbors of the anchor") {
    val th = Similarity.NearDupThreshold
    val pos = pairsAtLeast(th)
    val nbrs = (pos ++ pos.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).toSet }
    val n = vecs.size.toLong
    def h60(sngl: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(sngl.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = pos.flatMap { case (a, p) =>
      (1 to TrainingData.NegAttempts).map { t =>
        (a, p, t.toLong, h60(s"$a:$p:$t") % n)
      }.filter { case (_, _, _, c) =>
        vecs.contains(c) && c != a && c != p && !nbrs(a).contains(c)
      }.take(TrainingData.NegPerPair).zipWithIndex
        .map { case ((_, _, t, c), i) => (a, p, c, t, (i + 1).toLong) }
    }
    val got = TrainingData.q177ContrastiveNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
    got.foreach { case (a, _, neg, _, _) =>
      assert(!nbrs.getOrElse(a, Set.empty).contains(neg) && neg != a)
    }
    assert(got.nonEmpty)
  }
}
