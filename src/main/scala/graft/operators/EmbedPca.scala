package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embeddings table: an exact-decimal covariance
  * aggregation (oracle-gated) feeding a driver-side Jacobi eigensolver on
  * the bounded dim×dim matrix, then a map-side projection of every vector
  * onto the top components — the standard embedding-compaction step a
  * training pipeline runs before ANN indexing or drift monitoring (the
  * reference stores raw OpenAI vectors and never analyzes them;
  * `embed/embed.go:62-138`).
  *
  * Scale shape, in order:
  *  - Covariance NEVER shuffles vectors: each row map-side-explodes to
  *    its dim(dim+1)/2 upper-triangle pair products, which the hash
  *    aggregate combines to dim² running sums per task BEFORE the
  *    exchange — the exchange carries dim² rows per task, independent of
  *    corpus size (the q_bpe_pairs/shingle discipline). At dim 64 that is
  *    2080 pairs per row in-task; at dim 1536 the same plan holds with a
  *    ~1.2M-entry per-task hash map — documented headroom, and the
  *    mapPartitions outer-product accumulator is the drop-in if a real
  *    deployment outgrows it.
  *  - The eigensolve is DRIVER-SIDE on the collected dim×dim frame (32 KB
  *    at dim 64) — bounded planner metadata, the PQ-codebook/IVF-probe
  *    discipline, NOT a distributed matrix factorization: cyclic Jacobi
  *    on a symmetric matrix, deterministic to the bit for a fixed input.
  *  - Projection is one whole-stage-codegen map over the scan (k dot
  *    products per row against broadcast literal components); no shuffle
  *    at all until the final presentation ORDER BY.
  *
  * Oracle discipline: per-pair sums Σxi and Σ(xi·xj) are two-level
  * fixed-point — `floor(term·1e12)` longs per [[CovBuckets]] bucket,
  * decimal(38,0) over the bounded partials — exact integers and
  * order-free, so Spark's partitioned aggregation and DuckDB's
  * sequential one produce identical values while the corpus-sized pass
  * stays a codegen'd long sum (see [[covariance]] for why not
  * per-row DECIMAL(38,18): 6× slower); the covariance combine then runs
  * in double from those identical inputs on both engines (the q_anomaly
  * moment discipline).
  * The eigensolve itself has no DuckDB twin → q_embed_pca is rows-only,
  * gated by EmbedPcaSpec's algebraic invariants instead (orthonormality,
  * trace preservation, per-component projection variance = eigenvalue).
  */
object EmbedPca {

  /** Components kept by [[pcaProject]] — fixed so runs are comparable. */
  val PcaComponents = 4

  /** Buckets for the two-level fixed-point sums in [[covariance]]: level 1
    * long-sums `floor(term·1e12)` per (key, vec_id mod K) — order-free
    * exact integers — and level 2 combines the ≤K bounded partials as
    * decimal(38,0). K=64 keeps the long partials overflow-safe to ~10⁹
    * vectors (|term·1e12| ≤ ~10¹² for unit-scale embeddings, ~10⁷ terms
    * per bucket partial before 2⁶³), while the decimal path — the slow
    * per-row path this design exists to avoid — touches only dim²·K rows
    * regardless of corpus size. */
  val CovBuckets = 64

  /** Q-embed-covariance: the population covariance matrix of the
    * embedding dimensions, upper triangle (i ≤ j), exact fixed-point sums.
    * cov(i,j) = Σ(xi·xj)/n − (Σxi/n)·(Σxj/n).
    *
    * Exactness without per-row decimals: each product quantizes to
    * `floor((xi·xj)·1e12)` — float×float is exact in double, the ·1e12
    * and floor are the same IEEE ops in Spark and DuckDB, and integer
    * sums are order-free — so the partitioned aggregation hash-matches
    * the oracle bit-for-bit while the corpus-sized pass stays a codegen'd
    * long sum (6× faster than the decimal(38,18) per-row casts this
    * replaces: 0.9 s vs 5.2 s at sf0.1). Quantization error ≤1e-12 per
    * averaged term, invisible at the declared round-6 output and
    * identical on both engines either way. */
  /** One per-dimension sum frame (idx, sx, n) via the bucketed
    * fixed-point discipline — THE quantization kernel, defined once and
    * shared by [[covariance]] and [[crossCov]] so a change to the scale
    * or combine can never desynchronize their oracles. */
  private def bucketedDimSums(src: DataFrame, arrCol: String, idx: String,
                              sx: String): DataFrame = src
    .select(col("vec_id"), posexplode(col(arrCol)).as(Seq(idx, "x")))
    .groupBy(col(idx), pmod(col("vec_id"), lit(CovBuckets)).as("bk"))
    .agg(sum(floor(col("x").cast("double") * lit(1e12))).as("psx"),
      count(lit(1)).as("pn"))
    .groupBy(col(idx))
    .agg((sum(col("psx").cast("decimal(38,0)")).cast("double") / lit(1e12))
      .as(sx), sum(col("pn")).as("n"))

  def covariance(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val K = CovBuckets
    // Σxi per dimension (64 rows) — broadcasts to both sides of the pair
    val sums = bucketedDimSums(emb, "embedding", "i", "sx")
    // upper-triangle pair products, map-side exploded then hash-combined
    val pairSums = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")),
        col("embedding"))
      .select(col("vec_id"), col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("embedding")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"), pmod(col("vec_id"), lit(K)).as("b"))
      .agg(sum(floor((col("xi") * col("xj").cast("double")) * lit(1e12)))
        .as("psxy"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("psxy").cast("decimal(38,0)")).cast("double").as("sxy_s"))
    pairSums
      .join(broadcast(sums.select(col("i"), col("sx"), col("n"))), Seq("i"))
      .join(broadcast(sums.select(col("i").as("j"), col("sx").as("sy"))), Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        // + 0.0 canonicalizes a rounded-to-zero NEGATIVE covariance:
        // IEEE -0.0 + 0.0 = +0.0, and the driver compares float reprs,
        // where '-0.0' != '0.0' even though the values are ==
        (round(col("sxy_s") / lit(1e12) / col("n") -
          (col("sx") / col("n")) * (col("sy") / col("n")), 6) + lit(0.0))
          .as("cov"))
      .orderBy(col("i"), col("j"))
  }

  val covarianceSql: String =
    s"""WITH ex AS (
      |  SELECT vec_id, u.i - 1 AS i, CAST(u.x AS DOUBLE) AS x
      |  FROM (SELECT vec_id,
      |          UNNEST(list_transform(embedding, (x,i) -> {'i': i, 'x': x})) AS u
      |        FROM embeddings)),
      |sums1 AS (
      |  SELECT i, vec_id % $CovBuckets AS b,
      |         SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS psx,
      |         COUNT(*) AS pn
      |  FROM ex GROUP BY i, b),
      |sums AS (
      |  SELECT i, CAST(SUM(CAST(psx AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sx,
      |         SUM(pn) AS n
      |  FROM sums1 GROUP BY i),
      |pairs1 AS (
      |  SELECT a.i AS i, b.i AS j, a.vec_id % $CovBuckets AS bk,
      |    SUM(CAST(FLOOR((a.x * b.x) * 1e12) AS BIGINT)) AS psxy
      |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
      |  GROUP BY a.i, b.i, bk),
      |pairs AS (
      |  SELECT i, j, CAST(SUM(CAST(psxy AS DECIMAL(38,0))) AS DOUBLE) AS sxy_s
      |  FROM pairs1 GROUP BY i, j)
      |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
      |  ROUND(p.sxy_s / 1e12 / si.n - (si.sx / si.n) * (sj.sx / si.n), 6) + 0.0 AS cov
      |FROM pairs p JOIN sums si ON p.i = si.i JOIN sums sj ON p.j = sj.i
      |ORDER BY i, j""".stripMargin

  /** Eigen-decomposition of the covariance matrix: (eigenvalue,
    * eigenvector) pairs sorted by eigenvalue descending, sign-normalized
    * (the eigenvector's largest-|component| entry is positive, lowest
    * index on ties) so the decomposition — and everything projected
    * through it — is fully deterministic. Driver-side on the collected
    * dim×dim frame (bounded metadata).
    *
    * The trained model PERSISTS under the per-dataset index cache (the
    * PQ-codebook discipline: ~dim×(dim+1) exact-round-trip doubles,
    * written atomically), so q_embed_pca and q_pca_recall pay the
    * corpus-sized covariance pass ONCE and every later run loads the
    * model — the offline-train / online-project split a deployment
    * actually runs. Training is deterministic, so disk == memory
    * (spec-pinned in EmbedPcaSpec). */
  def components(spark: SparkSession, dir: String): Array[(Double, Array[Double])] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val f = Paths.get(graft.sources.IndexCatalog.cacheBase(dir), "pca-model-v1.txt")
    if (Files.exists(f)) {
      Files.readString(f).split("\n").map { line =>
        val parts = line.split(",")
        (parts.head.toDouble, parts.tail.map(_.toDouble))
      }
    } else {
      val model = trainComponents(spark, dir)
      Files.createDirectories(f.getParent)
      // UNIQUE tmp name (never a fixed sibling): two concurrent processes
      // (bench + verify on the same sfDir) may both train; each must write
      // its own file or an interleaved write gets atomically promoted as a
      // torn model. Training is deterministic, so whichever rename lands
      // last installs identical bytes.
      val tmp = Files.createTempFile(f.getParent, "pca-model-v1", ".tmp")
      Files.writeString(tmp, model.map { case (ev, vec) =>
        (ev +: vec.toSeq).mkString(",")
      }.mkString("\n"))
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      model
    }
  }

  /** The training pass proper — one corpus-sized covariance aggregation
    * plus the driver-side Jacobi solve. */
  private[operators] def trainComponents(
      spark: SparkSession, dir: String): Array[(Double, Array[Double])] = {
    val tri = covariance(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val dim = tri.iterator.map(_._2).max + 1
    val m = Array.ofDim[Double](dim, dim)
    tri.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    val (values, vectors) = jacobiEigen(m)
    val order = values.indices.sortBy(k => (-values(k), k))
    order.map { k =>
      val v = vectors.map(_(k))
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      (values(k), if (v(pivot) < 0) v.map(-_) else v)
    }.toArray
  }

  /** Classic cyclic Jacobi for a symmetric matrix (Golub & Van Loan
    * §8.5): sweep all upper-triangle pivots, rotate each away until the
    * off-diagonal norm is negligible. O(dim³) per sweep, ~8 sweeps at
    * dim 64 — microseconds of driver time, bit-deterministic (fixed
    * pivot order, no randomness). Returns (eigenvalues, column-major
    * eigenvector matrix V with M = V·diag(λ)·Vᵀ). */
  private[operators] def jacobiEigen(m0: Array[Array[Double]])
  : (Array[Double], Array[Array[Double]]) = {
    val dim = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64 && offDiagNorm(a) > 1e-12) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          if (math.abs(a(p)(q)) > 1e-30) {
            // 2×2 symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < dim) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Q-embed-pca: every vector's coordinates in the top-[[PcaComponents]]
    * principal directions — (vec_id, pc, proj) scalar rows, rows-only by
    * design (no SQL eigensolver); EmbedPcaSpec gates the algebra. The
    * components ride into the plan as literal arrays (driver metadata,
    * like the PQ ADC table) and each projection is one native codegen'd
    * `dot_product` over the scan. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dotProduct
    val comps = components(spark, dir).take(PcaComponents)
    val projections = comps.zipWithIndex.map { case ((_, vec), k) =>
      struct(lit(k + 1).cast("long").as("pc"),
        round(dotProduct(col("embedding"), lit(vec)), 6).as("proj"))
    }
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), explode(array(projections.toIndexedSeq: _*)).as("p"))
      .select(col("vec_id"), col("p.pc").as("pc"), col("p.proj").as("proj"))
      .orderBy(col("vec_id"), col("pc"))
  }

  /** Components the PCA-shortlist search projects onto (more than the
    * presentation query's [[PcaComponents]] — recall needs headroom).
    *
    * Sizing note: the synthetic embeddings are near-ISOTROPIC (the top 32
    * of 64 eigenvalues carry only ~65% of variance — a flat spectrum), the
    * known worst case for PCA pruning; real text-embedding spectra decay
    * fast and prune far harder at the same recall. The constants here are
    * sized for that worst case: half the dimensions, a 10%-of-corpus
    * shortlist — and the spec gates the achieved recall, so a regression
    * in the projection math (not the data's intrinsic rank) fails. */
  val SearchComponents = 32

  /** Candidates the PCA coarse pass keeps for exact reranking. */
  val PcaShortlist = 200

  /** Q-pca-recall: recall@5 of PCA-shortlisted search against exact
    * brute-force — the dimensionality-reduction counterpart of
    * q_recall_eval's LSH audit, and the third ANN family (IVF partitions
    * the corpus, LSH buckets it, PCA COMPRESSES it: rank candidates on a
    * [[SearchComponents]]-dim projection, then exact-rerank only the
    * [[PcaShortlist]] survivors).
    *
    * At 100 TB the projection is a stored compact column (16 doubles vs
    * the full vector — the scan for the coarse pass reads 4× fewer vector
    * bytes at dim 64, 96× at dim 1536), the coarse top-N is a
    * TakeOrdered (no shuffle before the global limit), and the exact
    * rerank touches [[PcaShortlist]]/N of the corpus. Rows-only by
    * design (the eigensolve has no SQL twin); EmbedPcaSpec gates recall
    * against the in-plan exact ranking. */
  def pcaRecall(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    val comps = components(spark, dir).take(SearchComponents)
    import graft.functions.VectorFunctions.dotProduct
    val emb = Tables.embeddings(spark, dir)
    val pvec = array(comps.toIndexedSeq.map(c =>
      dotProduct(col("embedding"), lit(c._2))): _*)
    val projected = emb
      .select(col("vec_id"), col("embedding"), pvec.as("pvec"))
    val q = projected.filter(col("vec_id") === 0)
      .select(col("pvec").as("q_pvec"), col("embedding").as("q_embedding"))
    val shortlist = projected.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("pcos", cosineSim(col("pvec"), col("q_pvec")))
      .orderBy(col("pcos").desc, col("vec_id"))
      .limit(PcaShortlist)
    val approxTop = shortlist
      .withColumn("cos", round(cosineSim(col("embedding"), col("q_embedding")), 6))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"))
    val exact = KnnSearch.topK(KnnSearch.withNorm(emb),
      emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
      5).select(col("vec_id"))
    approxTop.join(exact, Seq("vec_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(5L).as("k"), lit(PcaShortlist.toLong).as("shortlist"),
        col("n_hits"),
        round(col("n_hits").cast("double") / 5.0, 6).as("recall"))
  }

  /** The planted "new model" drift for q_embed_align: dimension j of the
    * target space is `sign(j) · a[perm(j)]` — a signed coordinate
    * permutation (an exactly orthogonal map, so the planted drift is a
    * genuine rotation/reflection). perm is a fixed bijection mod the
    * dimension (gcd(7, 64) = 1). */
  private[operators] def alignPerm(j: Int): Int = (7 * j + 3) % 64
  private[operators] def alignSign(j: Int): Double = if (j % 2 == 0) 1.0 else -1.0

  /** Q-embed-align: EMBEDDING-SPACE ALIGNMENT for model migration — when
    * a corpus is re-embedded by a new model whose space differs from the
    * stored one by an orthogonal drift, solve for the mapping from ONE
    * corpus pass and re-base queries/vectors map-side instead of
    * rebuilding every index. Here the drift is the planted signed
    * permutation ([[alignPerm]]/[[alignSign]]); the solver computes the
    * CROSS-covariance matrix between target and source dimensions (the
    * q_embed_covariance fixed-point discipline — quantized long sums,
    * order-free, one scan) and recovers, per target dimension, the
    * source dimension with the largest |covariance| and its sign. The
    * declared result is the recovered (b_dim → a_dim, sign) mapping —
    * green means the oracle's relational replay lands on the identical
    * argmax, and AlignSpec pins recovered == planted and that applying
    * the mapping reproduces the source space exactly.
    *
    * Scope note: a GENERAL rotation needs the SVD of this same
    * cross-covariance (orthogonal Procrustes), solved driver-side on the
    * dim×dim frame exactly as [[jacobiEigen]] solves the PCA model — the
    * corpus-sized pass is identical, only the dim×dim driver step
    * changes. The signed-permutation subfamily recovers exactly and is
    * fully oracle-replayable, which is why it is the declared form.
    *
    * Scale: one map-side 64×64 pair-product aggregation over the corpus
    * (the covariance shape, full matrix instead of upper triangle);
    * everything after is dim²-sized metadata. Re-basing at query time is
    * a map-side projection — no index rebuild. */
  /** The SHARED corpus pass of both alignment solvers: the full
    * cross-covariance frame (j = target dim, i = source dim, cov) between
    * the stored embeddings and a derived target-space array column —
    * the q_embed_covariance fixed-point discipline (quantized long sums
    * per [[CovBuckets]] bucket, order-free, one scan). */
  private def crossCov(spark: SparkSession, dir: String,
                       bArr: org.apache.spark.sql.Column): DataFrame = {
    val K = CovBuckets
    val emb = Tables.embeddings(spark, dir)
    val withB = emb.select(col("vec_id"), col("embedding"), bArr.as("b"))
    val aSums = bucketedDimSums(withB, "embedding", "i", "sxa")
    val bSums = bucketedDimSums(withB, "b", "j", "sxb").drop("n")
    val pairSums = withB
      .select(col("vec_id"), posexplode(col("b")).as(Seq("j", "bj")), col("embedding"))
      .select(col("vec_id"), col("j"), col("bj").cast("double").as("bj"),
        posexplode(col("embedding")).as(Seq("i", "ai")))
      .groupBy(col("j"), col("i"), pmod(col("vec_id"), lit(K)).as("bk"))
      .agg(sum(floor((col("bj") * col("ai").cast("double")) * lit(1e12))).as("psxy"))
      .groupBy(col("j"), col("i"))
      .agg(sum(col("psxy").cast("decimal(38,0)")).cast("double").as("sxy_s"))
    pairSums
      .join(broadcast(aSums), Seq("i"))
      .join(broadcast(bSums), Seq("j"))
      .select(col("j"), col("i"),
        (round(col("sxy_s") / lit(1e12) / col("n") -
          (col("sxb") / col("n")) * (col("sxa") / col("n")), 6) + lit(0.0))
          .as("cov"))
  }

  def embedAlign(spark: SparkSession, dir: String): DataFrame = {
    val bArr = array((0 until 64).map(j =>
      lit(alignSign(j)) * col("embedding").getItem(alignPerm(j)).cast("double")): _*)
    val cov = crossCov(spark, dir, bArr)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("j")).orderBy(abs(col("cov")).desc, col("i"))
    cov.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("j").cast("long").as("b_dim"), col("i").cast("long").as("a_dim"),
        when(col("cov") >= 0, 1).otherwise(-1).as("sign"),
        abs(col("cov")).as("strength"))
      .orderBy(col("b_dim"))
  }

  /** The planted GENERAL-rotation drift for q_embed_procrustes: paired
    * Givens rotations — dims (2k, 2k+1) rotated by θ_k = (k+1)·π/40, a
    * dense-in-each-block orthogonal map no permutation matching can
    * recover (each target dim mixes two source dims). */
  private[operators] def procrustesAngle(k: Int): Double = (k + 1) * math.Pi / 40
  private[operators] def plantedRotation: Array[Array[Double]] = {
    val r = Array.tabulate(64, 64)((_, _) => 0.0)
    for (k <- 0 until 32) {
      val (c, s) = (math.cos(procrustesAngle(k)), math.sin(procrustesAngle(k)))
      r(2 * k)(2 * k) = c; r(2 * k)(2 * k + 1) = s
      r(2 * k + 1)(2 * k) = -s; r(2 * k + 1)(2 * k + 1) = c
    }
    r
  }

  /** Q-embed-procrustes: GENERAL orthogonal Procrustes alignment — the
    * rotation form [[embedAlign]]'s scope note names, now solved: the
    * planted drift is a composition of Givens rotations (every target
    * dimension MIXES two source dimensions, so the signed-permutation
    * argmax cannot express the answer), and the solver is the textbook
    * orthogonal Procrustes: R = U·Vᵀ from the SVD of the cross-covariance
    * M — computed on the driver from the SAME one-scan corpus pass
    * ([[crossCov]]), with the SVD via [[jacobiEigen]] of MᵀM (σ = √λ,
    * U = M·V·Σ⁻¹ — the PCA-model driver-solve discipline on a dim×dim
    * matrix). Because the source covariance is SPD, the polar factor of
    * M = C·R₀ is exactly R₀ — the solve provably recovers the planted
    * rotation up to FP.
    *
    * Declared rows-only (no SQL SVD exists to replay — the q_embed_pca
    * precedent); AlignSpec gates orthogonality, the residual, and
    * recovery of the planted blocks. Output: the non-negligible entries
    * of the recovered R, rounded — the 2×2 block structure is visible in
    * the declared rows. */
  def embedProcrustes(spark: SparkSession, dir: String): DataFrame = {
    val r0 = plantedRotation
    val bArr = array((0 until 64).map { j =>
      // b[j] = Σ_i a[i]·R₀[i][j] — two nonzero terms per column
      val terms = (0 until 64).filter(i => r0(i)(j) != 0.0)
        .map(i => lit(r0(i)(j)) * col("embedding").getItem(i).cast("double"))
      terms.reduce(_ + _)
    }: _*)
    val m = Array.ofDim[Double](64, 64)
    crossCov(spark, dir, bArr).collect().foreach { r =>
      m(r.getInt(1))(r.getInt(0)) = r.getDouble(2) // (j, i, cov) → M[i][j]
    }
    // SVD via the symmetric eigensolve: MᵀM = V Σ² Vᵀ, U = M V Σ⁻¹
    val mtm = Array.tabulate(64, 64)((p, q) =>
      (0 until 64).map(k => m(k)(p) * m(k)(q)).sum)
    val (lams, v) = jacobiEigen(mtm)
    val sigma = lams.map(l => math.sqrt(math.max(l, 0.0)))
    // U = M·V·Σ⁻¹ materialized ONCE (O(dim³)); folding it into the
    // R-entry loop would recompute each column per (i, j) — O(dim⁴),
    // which matters at real embedding dims (1536³ ≈ 3.6e9 vs ⁴ ≈ 5.6e12)
    val u = Array.tabulate(64, 64) { (i, k) =>
      if (sigma(k) <= 1e-12) 0.0
      else (0 until 64).map(t => m(i)(t) * v(t)(k)).sum / sigma(k)
    }
    val rot = Array.tabulate(64, 64) { (i, j) =>
      (0 until 64).map(k => u(i)(k) * v(j)(k)).sum
    }
    import spark.implicits._
    val rows = for {
      i <- 0 until 64; j <- 0 until 64
      r = math.rint(rot(i)(j) * 1e6) / 1e6 if math.abs(r) >= 0.001
    } yield (i.toLong, j.toLong, r)
    rows.toDF("i", "j", "r").orderBy(col("i"), col("j"))
  }

  val embedAlignSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, u.i - 1 AS i, CAST(u.x AS DOUBLE) AS x
       |  FROM (SELECT vec_id,
       |          UNNEST(list_transform(embedding, (x,i) -> {'i': i, 'x': x})) AS u
       |        FROM embeddings)),
       |exb AS (
       |  SELECT vec_id, r.j AS j,
       |    CAST(CASE WHEN r.j % 2 = 0 THEN 1.0 ELSE -1.0 END AS DOUBLE) *
       |      CAST(embedding[((7 * r.j + 3) % 64) + 1] AS DOUBLE) AS y
       |  FROM embeddings, unnest(range(0, 64)) r(j)),
       |asums1 AS (
       |  SELECT i, vec_id % $CovBuckets AS bk,
       |         SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS psx, COUNT(*) AS pn
       |  FROM ex GROUP BY i, bk),
       |asums AS (
       |  SELECT i, CAST(SUM(CAST(psx AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sxa,
       |         SUM(pn) AS n
       |  FROM asums1 GROUP BY i),
       |bsums1 AS (
       |  SELECT j, vec_id % $CovBuckets AS bk,
       |         SUM(CAST(FLOOR(y * 1e12) AS BIGINT)) AS psx
       |  FROM exb GROUP BY j, bk),
       |bsums AS (
       |  SELECT j, CAST(SUM(CAST(psx AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sxb
       |  FROM bsums1 GROUP BY j),
       |pairs1 AS (
       |  SELECT b.j AS j, a.i AS i, a.vec_id % $CovBuckets AS bk,
       |    SUM(CAST(FLOOR((b.y * a.x) * 1e12) AS BIGINT)) AS psxy
       |  FROM exb b JOIN ex a ON a.vec_id = b.vec_id
       |  GROUP BY b.j, a.i, bk),
       |pairs AS (
       |  SELECT j, i, CAST(SUM(CAST(psxy AS DECIMAL(38,0))) AS DOUBLE) AS sxy_s
       |  FROM pairs1 GROUP BY j, i),
       |cov AS (
       |  SELECT p.j, p.i,
       |    ROUND(p.sxy_s / 1e12 / a.n - (b.sxb / a.n) * (a.sxa / a.n), 6) + 0.0 AS cov
       |  FROM pairs p JOIN asums a ON p.i = a.i JOIN bsums b ON p.j = b.j),
       |ranked AS (
       |  SELECT j, i, cov, ROW_NUMBER() OVER (PARTITION BY j
       |                                       ORDER BY ABS(cov) DESC, i) AS rn
       |  FROM cov)
       |SELECT CAST(j AS BIGINT) AS b_dim, CAST(i AS BIGINT) AS a_dim,
       |  CASE WHEN cov >= 0 THEN 1 ELSE -1 END AS sign,
       |  ABS(cov) AS strength
       |FROM ranked WHERE rn = 1 ORDER BY b_dim""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_covariance" -> (covariance _),
    "q_embed_align" -> (embedAlign _),
    "q_embed_procrustes" -> (embedProcrustes _),
    "q_embed_pca" -> (pcaProject _),
    "q_pca_recall" -> (pcaRecall _))

  def oracles: Map[String, String] = Map(
    "q_embed_covariance" -> covarianceSql,
    "q_embed_align" -> embedAlignSql)
}
