package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Embedding-space structure discovery: density clustering (DBSCAN) over
  * the ε-similarity graph and tall-skinny PCA via a one-pass distributed
  * Gramian — the two corpus-cartography operators a training-data
  * pipeline runs between dedup (q45/q117) and index construction
  * (q39/q101/q163): "what dense regions exist" and "which directions
  * carry the variance".
  *
  * Both are Spark-first reconstructions of published algorithms (Ester et
  * al. 1996 DBSCAN; the Gramian/eigensolve split is exactly Spark's own
  * `RowMatrix.computePrincipalComponents` contract), not ports of any
  * reference code — the reference (dperco/ETL_APACHE_KAFKA_PYTHON_DOKER_AWS,
  * `dags/etl_dags.py`) has no clustering surface at all; these extend the
  * §2.4 LLM-pipeline families per the north star.
  */
object Clustering {

  // ---------------------------------------------------------------- q173

  /** ε for the density neighborhood, as a cosine floor: u ∈ N(v) iff
    * cos(u, v) ≥ 0.40. Wider than q67's calibrated 0.45 dedup bar — the
    * clustering radius wants *related* regions, not just near-copies —
    * and chosen so the fixture corpus exhibits all three DBSCAN roles
    * (16 cores / 60 borders at sf0.01; 482 cores at sf0.1).
    */
  val DbscanEps: Double = 0.40

  /** Classic DBSCAN minPts over |N_ε(p)| with p ∈ N_ε(p) (Ester et al.
    * 1996 §4.1 counts the point itself): core iff ≥ [[DbscanMinPts]] − 1
    * *neighbors*.
    */
  val DbscanMinPts: Int = 3

  /** The brute/banded crossover for the ε-graph at [[DbscanEps]] — the
    * SAME measured mode policy as q67 ([[Similarity.ndCrossoverAt]]):
    * below it the blocked exact pair scan is cheaper than any banded
    * geometry the pruning bar admits; above it the occupancy ladder's
    * rung prunes ≥ 85% of the pair space and the banded core takes over.
    */
  val DbscanCrossover: Long = Similarity.ndCrossoverAt(DbscanEps)

  /** The ε-neighbor pair relation (mode-aware, exactly q67's policy at
    * [[DbscanEps]]): an undirected (keep_id < drop_id) near-pair list.
    * DBSCAN's semantics are relation-agnostic — every step downstream of
    * this frame is role algebra over an edge list.
    */
  private def dbscanPairs(s: SparkSession, dir: String): DataFrame = {
    val n = embeddings(s, dir).count()
    if (n <= DbscanCrossover)
      Similarity.bruteNearDupBlocked(Similarity.vecs(s, dir), n, DbscanEps)
    else {
      val rung = Similarity.ndPlanesFor(n)
      Similarity.nearDupBandedFrame(Similarity.vecs(s, dir), rung,
        Similarity.ndBandsForAt(rung, DbscanEps), DbscanEps)
    }
  }

  /** q173: DBSCAN density clustering over the embedding ε-graph — every
    * vector classified `core` (≥ [[DbscanMinPts]]−1 neighbors), `border`
    * (non-core adjacent to a core) or `noise`, with core components
    * collapsed to a canonical cluster id (min member id, q45's
    * convention) and borders attached to the min-id adjacent core
    * cluster (a deterministic tiebreak where the textbook's
    * "first-discovered" assignment is scan-order-dependent).
    *
    * Plan shape: pair generation is the mode-aware ε-graph core (blocked
    * exact equi-join below the measured crossover, banded LSH above —
    * never a full-corpus broadcast); degrees are one edge-keyed
    * aggregate; the component collapse is [[Dedup.minLabelPropagation]]
    * (hash-min + pointer doubling, O(log diameter) rounds) over the
    * CORE-CORE subgraph only — at scale the core subgraph is the dense
    * fraction of an already-pruned pair list, not the corpus. Border
    * attachment is one more edge-keyed aggregate. Nothing in the role
    * algebra exceeds O(E) per step.
    *
    * Oracle: the identical ε-graph (mode-aware SQL via
    * [[Similarity.ndPairsSqlCtes]]) with the propagation UNROLLED — 18
    * rounds of hash-min + pointer-doubling CTEs (label horizon 2^18,
    * ≥ any recorded component diameter; post-fixpoint rounds are
    * identities, so extra rounds can't diverge).
    */
  def q173Dbscan(s: SparkSession, dir: String): DataFrame = {
    val minDeg = DbscanMinPts - 1
    // consumed by degree count, core-pair filter, and border attachment
    val pairs = dbscanPairs(s, dir).select(col("keep_id"), col("drop_id"))
      .localCheckpoint(true)
    val edges = pairs
      .union(pairs.select(col("drop_id").as("keep_id"), col("keep_id").as("drop_id")))
      .toDF("a", "b")
      .localCheckpoint(true)
    val deg = edges.groupBy(col("a").as("id")).agg(count(lit(1)).as("degree"))
    val dg = embeddings(s, dir).select(col("vec_id").as("id"))
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"))
      .localCheckpoint(true)
    val core = dg.filter(col("degree") >= minDeg).select(col("id"))
      .localCheckpoint(true)
    // component collapse over the core-core subgraph only
    val corePairs = pairs
      .join(core.withColumnRenamed("id", "keep_id"), Seq("keep_id"), "left_semi")
      .join(core.withColumnRenamed("id", "drop_id"), Seq("drop_id"), "left_semi")
      .select(col("keep_id").as("doc_a"), col("drop_id").as("doc_b"))
    val propagated = Dedup.minLabelPropagation(corePairs)
    // isolated cores (dense but no core neighbor) form singleton clusters
    val labels = propagated
      .union(core
        .join(propagated.select(col("doc").as("id")), Seq("id"), "left_anti")
        .select(col("id").as("doc"), col("id").as("comp")))
      .localCheckpoint(true)
    // border = non-core adjacent to ≥1 core; cluster = min adjacent core's comp
    val borderAttach = edges
      .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(core.withColumnRenamed("id", "b"), Seq("b"), "left_anti")
      .join(labels.withColumnRenamed("doc", "a"), Seq("a"))
      .groupBy(col("b").as("id")).agg(min(col("comp")).as("bcluster"))
    dg.join(labels.select(col("doc").as("id"), col("comp")), Seq("id"), "left")
      .join(borderAttach, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        when(col("degree") >= minDeg, lit("core"))
          .when(col("bcluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(when(col("degree") >= minDeg, col("comp"))
          .otherwise(col("bcluster")), lit(-1L)).as("cluster"),
        col("degree"))
      .orderBy(col("vec_id"))
  }

  /** Unrolled hash-min + pointer-doubling rounds over the core-core edge
    * CTE `ce`, seeded from `l0`. Each round: (a) comp ← min(comp, min
    * over in-neighbors' comp); (b) comp ← comp's own comp (every label is
    * a core id, so the doubling self-join is total).
    */
  private def dbscanRoundsCtes(rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "l0" else s"l${r - 1}"
      // MATERIALIZED: each round reads its predecessor twice (hash-min +
      // the doubling self-join) — inlined, the reference tree would grow
      // 2^rounds scans of the base relation (the q155 oracle's spill
      // lesson, r14)
      s"""l${r}a AS MATERIALIZED (
         |  SELECT d.doc, least(d.comp, COALESCE(m.mn, d.comp)) AS comp
         |  FROM $prev d LEFT JOIN (
         |    SELECT ce.b AS doc, min(l.comp) AS mn
         |    FROM ce JOIN $prev l ON l.doc = ce.a GROUP BY ce.b) m
         |   ON d.doc = m.doc),
         |l$r AS MATERIALIZED (
         |  SELECT d.doc, p.comp FROM l${r}a d JOIN l${r}a p ON d.comp = p.doc)""".stripMargin
    }.mkString(",\n")

  private val DbscanOracleRounds: Int = 18

  val q173Sql: String = {
    val minDeg = DbscanMinPts - 1
    val last = s"l$DbscanOracleRounds"
    s"""WITH ${Similarity.ndPairsSqlCtes(DbscanEps, DbscanCrossover)},
       |pairs AS MATERIALIZED (
       |  SELECT keep_id, drop_id FROM brute
       |  UNION ALL SELECT keep_id, drop_id FROM banded),
       |edges AS MATERIALIZED (
       |  SELECT keep_id AS a, drop_id AS b FROM pairs
       |  UNION ALL SELECT drop_id, keep_id FROM pairs),
       |deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY a),
       |dg AS MATERIALIZED (
       |  SELECT e0.vec_id AS id, COALESCE(deg.degree, 0) AS degree
       |  FROM embeddings e0 LEFT JOIN deg ON e0.vec_id = deg.id),
       |core AS MATERIALIZED (SELECT id FROM dg WHERE degree >= $minDeg),
       |ce AS MATERIALIZED (
       |  SELECT e.a, e.b FROM edges e
       |  JOIN core ca ON e.a = ca.id JOIN core cb ON e.b = cb.id),
       |l0 AS (SELECT id AS doc, id AS comp FROM core),
       |${dbscanRoundsCtes(DbscanOracleRounds)},
       |lab AS (SELECT doc, comp FROM $last),
       |batt AS (
       |  SELECT e.b AS id, min(l.comp) AS bcluster
       |  FROM edges e
       |  JOIN core ca ON e.a = ca.id
       |  LEFT JOIN core cb ON e.b = cb.id
       |  JOIN lab l ON l.doc = e.a
       |  WHERE cb.id IS NULL
       |  GROUP BY e.b)
       |SELECT dg.id AS vec_id,
       | CASE WHEN dg.degree >= $minDeg THEN 'core'
       |      WHEN batt.bcluster IS NOT NULL THEN 'border'
       |      ELSE 'noise' END AS role,
       | COALESCE(CASE WHEN dg.degree >= $minDeg THEN lab.comp
       |               ELSE batt.bcluster END, CAST(-1 AS BIGINT)) AS cluster,
       | dg.degree
       |FROM dg
       |LEFT JOIN lab ON dg.id = lab.doc
       |LEFT JOIN batt ON dg.id = batt.id
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q174

  /** Fixed power-iteration round count — both engines run exactly this
    * many rounds from the same start vector, so the (vector, eigenvalue)
    * pair is a deterministic function of the Gramian, converged or not.
    */
  val PowerIters: Int = 15

  /** q174: principal components of the embedding corpus via the
    * distributed-Gramian + local-eigensolve split — the tall-skinny PCA
    * pattern Spark itself ships (`RowMatrix.computePrincipalComponents`
    * collects the d×d Gramian to the driver and eigensolves locally;
    * public Spark source, mllib/linalg/distributed/RowMatrix.scala): for
    * d = 64, the distributed pass reduces n×d data to d² + d statistics
    * (map-side-combined sums — the exchange carries ≤ d²·partitions
    * rows), and everything after is O(d²) arithmetic on 4 KB of state —
    * the one place where driver-side math is the *correct* scale design,
    * not a shortcut. Centering is the rank-one update
    * Gc = G − s·sᵀ/n applied to the collected matrix, so no second
    * corpus pass materializes centered vectors.
    *
    * Eigensolve: [[PowerIters]] rounds of power iteration from the exact
    * start vector (1/8, …, 1/8), then one deflation
    * (G₂ = Gc − λ₁v₁v₁ᵀ) and a second run for PC2. Every float op is a
    * fixed-order sequential fold or map, so the DuckDB oracle replays
    * the identical IEEE arithmetic via `list_reduce`/`list_transform`
    * over the identically-rounded Gramian (the q25 DotFold ≡ list_reduce
    * parity, applied to a matrix).
    *
    * Output: one row per dimension — mean, PC1/PC2 loadings, and the
    * (repeated) eigenvalues + explained-variance shares against the
    * centered trace.
    */
  def q174PcaPower(s: SparkSession, dir: String): DataFrame = {
    val d = Similarity.AnnDims
    val e = Similarity.vecs(s, dir).select(col("vec_id"), col("v"))
    // ONE distributed pass each: d² second moments and d sums. The double
    // posexplode is O(n·d²) rows through codegen — the same multiply-add
    // count any Gramian pays — and the (i, j)-keyed aggregate partials
    // map-side, so the shuffle carries ≤ d² rows per partition.
    val g = e.select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("xi") * col("xj")), 6).as("g"))
    val sm = e.select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy(col("i")).agg(round(sum(col("xi")), 6).as("s"))
    val n = e.count()
    // d² = 4096 doubles of state: the RowMatrix contract — collect is
    // bounded by the DIMENSION, never the corpus
    val gArr = Array.ofDim[Double](d, d)
    g.collect().foreach(r => gArr(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val sArr = new Array[Double](d)
    sm.collect().foreach(r => sArr(r.getInt(0)) = r.getDouble(1))
    val nn = n.toDouble
    val gc = Array.tabulate(d, d)((i, j) => gArr(i)(j) - sArr(i) * sArr(j) / nn)
    def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i =>
        (0 until d).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
    def powerIterate(m: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.fill(d)(0.125)
      for (_ <- 1 to PowerIters) {
        val w = matvec(m, v)
        val nrm = math.sqrt((0 until d).foldLeft(0.0)((acc, i) => acc + w(i) * w(i)))
        v = v.indices.map(i => w(i) / nrm).toArray
      }
      val w = matvec(m, v)
      val lam = (0 until d).foldLeft(0.0)((acc, i) => acc + v(i) * w(i))
      (v, lam)
    }
    val (v1, lam1) = powerIterate(gc)
    val g2 = Array.tabulate(d, d)((i, j) => gc(i)(j) - lam1 * v1(i) * v1(j))
    val (v2, lam2) = powerIterate(g2)
    val trace = (0 until d).foldLeft(0.0)((acc, i) => acc + gc(i)(i))
    import s.implicits._
    (0 until d).map(i =>
        (i + 1L, sArr(i) / nn, v1(i), v2(i), lam1, lam2, lam1 / trace, lam2 / trace))
      .toDF("dim", "mu_r", "pc1_r", "pc2_r", "l1", "l2", "s1", "s2")
      .select(col("dim"),
        round(col("mu_r"), 6).as("mu"),
        round(col("pc1_r"), 6).as("pc1"),
        round(col("pc2_r"), 6).as("pc2"),
        round(col("l1"), 6).as("lam1"),
        round(col("l2"), 6).as("lam2"),
        round(col("s1"), 6).as("var_share1"),
        round(col("s2"), 6).as("var_share2"))
      .orderBy(col("dim"))
  }

  /** One power-iteration round: w = M·v (per-row sequential fold), then
    * v = w / ‖w‖ — the exact op order of the Scala loop. `mat` must
    * expose column `m` (list of row-lists), `l0`/the previous round
    * column `v`.
    */
  private def powerIterCtes(prefix: String, mat: String, rounds: Int): String = {
    val dd = Similarity.AnnDims
    (1 to rounds).map { t =>
      val prev = if (t == 1) s"${prefix}0" else s"$prefix${t - 1}"
      s"""$prefix${t}w AS (
         |  SELECT list_transform(range(1, ${dd + 1}), i ->
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list_transform(range(1, ${dd + 1}), j -> m[i][j] * v[j])),
         |      (x, y) -> x + y)) AS w
         |  FROM $prev, $mat),
         |$prefix$t AS (
         |  SELECT list_transform(w, x -> x / sqrt(list_reduce(
         |    list_prepend(CAST(0 AS DOUBLE), list_transform(w, y -> y * y)),
         |    (a, b) -> a + b))) AS v
         |  FROM $prefix${t}w)""".stripMargin
    }.mkString(",\n")
  }

  val q174Sql: String = {
    val dd = Similarity.AnnDims
    val rng = s"range(1, ${dd + 1})"
    def foldSql(terms: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $terms), (x, y) -> x + y)"
    def matvecSql: String =
      s"list_transform($rng, i -> ${foldSql(s"list_transform($rng, j -> m[i][j] * v[j])")})"
    s"""WITH e AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |xp AS (
       |  SELECT ti.i AS i, tj.j AS j, v[ti.i] * v[tj.j] AS p
       |  FROM e, unnest($rng) AS ti(i), unnest($rng) AS tj(j)),
       |g AS (SELECT i, j, ROUND(SUM(p), 6) AS g FROM xp GROUP BY i, j),
       |sm AS (
       |  SELECT t.i AS i, ROUND(SUM(v[t.i]), 6) AS s
       |  FROM e, unnest($rng) AS t(i) GROUP BY t.i),
       |gc AS (
       |  SELECT g.i, g.j, g.g - sa.s * sb.s / n AS g
       |  FROM g JOIN sm sa ON g.i = sa.i JOIN sm sb ON g.j = sb.i, cnt),
       |gr AS (SELECT i, list(g ORDER BY j) AS r FROM gc GROUP BY i),
       |gm AS (SELECT list(r ORDER BY i) AS m FROM gr),
       |p10 AS (SELECT list_transform($rng, i -> CAST(0.125 AS DOUBLE)) AS v),
       |${powerIterCtes("p1", "gm", PowerIters)},
       |fin1 AS (SELECT v, $matvecSql AS w FROM p1$PowerIters, gm),
       |ev1 AS (
       |  SELECT v AS v1,
       |   ${foldSql(s"list_transform($rng, i -> v[i] * w[i])")} AS lam1
       |  FROM fin1),
       |gm2 AS (
       |  SELECT list_transform($rng, i -> list_transform($rng, j ->
       |    m[i][j] - lam1 * v1[i] * v1[j])) AS m
       |  FROM gm, ev1),
       |p20 AS (SELECT list_transform($rng, i -> CAST(0.125 AS DOUBLE)) AS v),
       |${powerIterCtes("p2", "gm2", PowerIters)},
       |fin2 AS (SELECT v, $matvecSql AS w FROM p2$PowerIters, gm2),
       |ev2 AS (
       |  SELECT v AS v2,
       |   ${foldSql(s"list_transform($rng, i -> v[i] * w[i])")} AS lam2
       |  FROM fin2),
       |tr AS (
       |  SELECT ${foldSql(s"list_transform($rng, i -> m[i][i])")} AS trace
       |  FROM gm)
       |SELECT CAST(sm.i AS BIGINT) AS dim,
       | ROUND(sm.s / cnt.n, 6) AS mu,
       | ROUND(e1.v1[sm.i], 6) AS pc1,
       | ROUND(e2.v2[sm.i], 6) AS pc2,
       | ROUND(e1.lam1, 6) AS lam1,
       | ROUND(e2.lam2, 6) AS lam2,
       | ROUND(e1.lam1 / tr.trace, 6) AS var_share1,
       | ROUND(e2.lam2 / tr.trace, 6) AS var_share2
       |FROM sm, cnt, ev1 e1, ev2 e2, tr
       |ORDER BY dim""".stripMargin
  }
}
