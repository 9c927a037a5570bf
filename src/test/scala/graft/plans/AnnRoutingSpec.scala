package graft.plans

import graft.SparkSpecBase
import graft.operators.VectorOps
import graft.sources.IndexCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the optimizer-level ANN routing (AnnRouting): the rule must
  * fire on a registered naive top-K similarity sort (and surface as
  * PartitionFilters on the scan), must NOT fire on unregistered scans or
  * non-matching sorts, and the routed result must equal the programmatic
  * IVF API's output exactly. */
class AnnRoutingSpec extends SparkSpecBase with Matchers {

  private val base = IndexCatalog.cacheBase(sfDir)
  private val name = "emb-ivf-bucketed"

  private def queryVec: Seq[Float] =
    graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  /** The naive top-K cosine plan over the index table, built with the
    * DataFrame API (same logical shape as q_knn_auto's SQL). */
  private def naiveTopK(descending: Boolean): DataFrame = {
    import graft.functions.VectorFunctions._
    val idx = IndexCatalog.load(spark, base, name)
    val q = typedlit[Seq[Float]](queryVec)
    val score = round(cosineSim(col("embedding"), q), 6).as("score")
    val scored = idx.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        col("bucket").cast("long").as("cent_id"), score)
    scored.orderBy(if (descending) col("score").desc else col("score").asc,
      col("vec_id")).limit(10)
  }

  private def hasBucketInFilter(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case Filter(cond, _) => cond.exists {
        case In(a: AttributeReference, _) => a.name == "bucket"
        case _ => false
      }
      case _ => false
    }

  /** Ensure the shared persisted index + sidecar exist, register its
    * route for the body, and ALWAYS unregister after — each test owns its
    * route window explicitly now that registration is session-scoped and
    * the declared queries drop theirs in their epilogue. */
  private def withSharedRoute[T](body: => T): T = {
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    try body
    finally AnnRouting.unregister(spark, base, name)
  }

  test("deleted-and-recreated index regains its residual sidecar (the schema memo never masks a rebuild)") {
    VectorOps.annIvfPersisted(spark, sfDir).collect() // build + memoize
    // an external delete + recreate at the SAME path later in the JVM:
    // the fresh index must get a fresh c_maxresid sidecar — a stale
    // "checked" memo here would leave it sidecar-less and every *_auto
    // query would silently decline to brute (ADVICE r11, medium)
    graft.sources.Maintenance.deleteRecursively(
      java.nio.file.Paths.get(base, name))
    assert(!IndexCatalog.exists(base, name))
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    assert(IndexCatalog.hasCentroids(base, name),
      "rebuilt index lost its centroid sidecar")
    spark.read.parquet(java.nio.file.Paths.get(base, name, "centroids")
      .toString).columns should contain("c_maxresid")
  }

  test("nested withRoute windows compose: the inner epilogue never strips the outer registration") {
    VectorOps.annIvfPersisted(spark, sfDir).collect() // build index + sidecar
    AnnRouting.register(spark, base, name, nprobe = 4)
    try {
      // a declared-style window over the SAME path inside the outer one:
      // its epilogue must only release ITS registration (refcounted), not
      // degrade the outer window's still-live route to brute
      val inner = AnnRouting.withRoute(spark, base, name, nprobe = 4)(
        VectorOps.knnAutoFrame(spark, sfDir))
      inner.count() shouldBe 10
      assert(hasBucketInFilter(naiveTopK(descending = true)),
        "inner epilogue unregistered the outer window's route")
    } finally AnnRouting.unregister(spark, base, name)
    // balanced exits: after the outer epilogue the route is gone
    assert(!hasBucketInFilter(naiveTopK(descending = true)),
      "route survived balanced register/unregister pairs")
  }

  test("route stack: after an inner window with a different nprobe exits, the outer body plans with ITS config") {
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 2)
    try {
      // inner window opts into a DEEPER probe; its epilogue must restore
      // the outer window's nprobe=2, not leave 8 behind
      AnnRouting.withRoute(spark, base, name, nprobe = 8)(
        VectorOps.knnAutoFrame(spark, sfDir)).count() shouldBe 10
      probeListSize(naiveTopK(descending = true)) shouldBe Some(2)
    } finally AnnRouting.unregister(spark, base, name)
  }

  /** Size of the routed plan's `bucket IN (...)` list — the observable
    * form of the active route's nprobe. */
  private def probeListSize(df: DataFrame): Option[Int] =
    df.queryExecution.optimizedPlan.collect {
      case Filter(cond, _) => cond.collect {
        case In(a: AttributeReference, vs) if a.name == "bucket" => vs.size
      }
    }.flatten.headOption

  test("installed but unregistered: the rule does not fire") {
    // build the persisted index + sidecar without registering a route
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.unregister(spark, base, name)
    AnnRouting.install(spark)
    val df = naiveTopK(descending = true)
    assert(!hasBucketInFilter(df),
      "rule fired on an unregistered index scan")
    df.count() shouldBe 10
  }

  test("q_knn_auto: naive SQL routes to probed buckets == programmatic IVF") {
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    val expected = VectorOps.annIvf(spark, sfDir).collect().map(norm)
    withSharedRoute {
      val auto = VectorOps.knnAutoFrame(spark, sfDir)
      assert(hasBucketInFilter(auto), "rule did not fire on a registered scan")
      val plan = auto.queryExecution.executedPlan.toString
      plan should include("PartitionFilters")
      // the partition filter must carry the bucket probe set
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).mkString(" | ")
      pf.toLowerCase should include("bucket")
      // label is a partition column on the persisted side (read back as
      // int) and a plain long on the programmatic side — compare as longs
      auto.collect().map(norm) should contain theSameElementsInOrderAs expected
    }
    // the DECLARED query (withRoute: materialize, then unregister in the
    // epilogue) returns the identical rows
    VectorOps.knnAuto(spark, sfDir).collect().map(norm) should
      contain theSameElementsInOrderAs expected
  }

  test("epilogue scope: after a declared routed query, a plain exact top-K stays brute") {
    VectorOps.knnAuto(spark, sfDir).collect() // registers, routes, unregisters
    val df = naiveTopK(descending = true)
    assert(!hasBucketInFilter(df),
      "route survived the declared query's epilogue — an unrelated exact " +
        "ORDER BY cosine DESC LIMIT k would silently return probed results")
    df.count() shouldBe 10
  }

  test("session scope: a route registered in one session never routes another") {
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    try {
      val fresh = spark.newSession()
      AnnRouting.install(fresh) // rule present, but no route in THIS session
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(fresh, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      val df = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(cosineSim(col("embedding"), q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(df),
        "another session's registration leaked into a fresh session's exact plan")
      df.count() shouldBe 10
    } finally AnnRouting.unregister(spark, base, name)
  }

  test("NaN query vector: routing declines (brute plan), literal builder rejects with a clear message") {
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val nanVec = queryVec.updated(0, Float.NaN)
      val q = typedlit[Seq[Float]](nanVec)
      val df = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(cosineSim(col("embedding"), q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(df),
        "rule fired on a NaN query vector — NaN centroid scores make the " +
          "probe choice meaningless")
      df.count() shouldBe 10 // the brute plan still answers
    }
    val ex = intercept[IllegalArgumentException] {
      VectorOps.floatArraySqlLiteral(Seq(1.0f, Float.NaN))
    }
    ex.getMessage should include("non-finite")
  }

  test("ascending (euclidean-style) sort over a registered index: no rewrite") {
    withSharedRoute {
      val df = naiveTopK(descending = false)
      assert(!hasBucketInFilter(df),
        "rule fired on an ascending sort (would corrupt a distance ranking)")
  }
  }

  test("farthest-first (1 - cosine DESC) over a registered index: no rewrite") {
    withSharedRoute {
      // contains the vec_dot kernel under a DESC sort, but through a
      // NON-monotone wrapper — routing to the NEAREST buckets would return
      // "farthest within the nearest buckets", near-zero recall, silently
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      val dist = (lit(1.0) - cosineSim(col("embedding"), q)).as("dist")
      val df = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), dist)
        .orderBy(col("dist").desc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(df),
        "rule fired on a distance (anti-similarity) ranking")
      // and negation too
      val neg = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (-round(cosineSim(col("embedding"), q), 6)).as("nscore"))
        .orderBy(col("nscore").desc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(neg), "rule fired on a negated score")
  }
  }

  test("non-monotone wrappers the guard must decline: negative divisor, constant CASE arm, string cast") {
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      def topBy(score: org.apache.spark.sql.Column) =
        idx.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), score.as("s"))
          .orderBy(col("s").desc, col("vec_id")).limit(10)

      // kernel / negative literal: DESC on it is farthest-first
      assert(!hasBucketInFilter(topBy(
        dotProduct(col("embedding"), q) / lit(-1.0))),
        "rule fired on a negative-divisor ranking")
      // general CASE with a non-zero constant arm: the constant re-ranks
      // rows independently of the kernel (label-3 rows beat every cosine)
      assert(!hasBucketInFilter(topBy(
        when(col("label") === 3, lit(2.0))
          .otherwise(cosineSim(col("embedding"), q)))),
        "rule fired on a constant-dominated CASE ranking")
      // string cast: lexicographic order is not numeric order
      assert(!hasBucketInFilter(topBy(
        round(cosineSim(col("embedding"), q), 6).cast("string"))),
        "rule fired on a string-cast ranking")
  }
  }

  test("descending sort without a query-vector kernel: no rewrite") {
    withSharedRoute {
      val idx = IndexCatalog.load(spark, base, name)
      val df = idx.orderBy(col("vec_id").desc).limit(10)
      assert(!hasBucketInFilter(df), "rule fired without a vec_dot sort key")
  }
  }

  test("q_lsh_auto: the LSH route needs no sidecar and equals the multi-probe API") {
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    val expected = graft.operators.RandomHyperplaneLsh
      .annLshMultiProbe(spark, sfDir).collect().map(norm)
    // lazy routed frame: plan evidence (the declared query checkpoints)
    val frames = graft.operators.RandomHyperplaneLsh.planFrames
    val auto = frames("q_lsh_auto")(spark, sfDir)
    try {
      assert(hasBucketInFilter(auto), "LSH route did not fire")
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(auto.queryExecution.executedPlan.toString)
        .map(_.group(1)).mkString(" | ")
      pf.toLowerCase should include("bucket")
      auto.collect().map(norm) should contain theSameElementsInOrderAs expected
    } finally graft.operators.RandomHyperplaneLsh.dropPlanRoutes(spark, sfDir)
    // and the declared query's materialized rows match too
    graft.operators.RandomHyperplaneLsh.lshAuto(spark, sfDir)
      .collect().map(norm) should contain theSameElementsInOrderAs expected
  }

  test("missing centroid sidecar: routing declines, the query still answers brute") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    import graft.operators.KnnSearch
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val tmpBase = graft.Scratch.dir("annrt") // self-deleting scratch root
    val tiny = "tiny-ivf"
    val data = Seq(
        (1L, 0L, vec(1, 0, 0, 0), 0L), (2L, 0L, vec(0.9, 0.1, 0, 0), 0L),
        (3L, 1L, vec(0, 1, 0, 0), 1L), (4L, 1L, vec(0.1, 0.9, 0, 0), 1L))
      .toDF("vec_id", "label", "embedding", "bucket")
    IndexCatalog.createIfAbsent(spark, tmpBase,
      IndexCatalog.IndexDescriptor(tiny, 4, "cosine"), data, Seq("bucket"))
    // registered as IVF but the centroids sidecar was never written: the
    // rule's probe read throws at plan time, which must DECLINE the
    // rewrite (brute plan is still correct), never fail the query
    AnnRouting.register(spark, tmpBase, tiny, nprobe = 1)
    val idx = IndexCatalog.load(spark, tmpBase, tiny)
    val df = idx
      .withColumn("score",
        round(cosineSim(col("embedding"), typedlit[Seq[Float]](vec(1, 0, 0, 0).toSeq)), 6))
      .orderBy(col("score").desc, col("vec_id")).limit(2)
    assert(!hasBucketInFilter(df), "declined route must not inject a filter")
    df.select("vec_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    AnnRouting.unregister(spark, tmpBase, tiny)
  }

  test("q_l2_auto: ascending vec_l2dist routes with L2 probe geometry") {
    import graft.functions.VectorFunctions._
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    val auto = try {
      val frame = VectorOps.l2AutoFrame(spark, sfDir)
      assert(hasBucketInFilter(frame), "euclidean route did not fire")
      frame.collect()
    } finally AnnRouting.unregister(spark, base, name)
    // programmatic twin: probe the 4 centroids nearest BY L2, then exact
    // L2 ranking within the probed buckets of the persisted layout
    val q = typedlit[Seq[Float]](queryVec)
    val probeIds = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      .withColumn("d", l2Dist(col("ce"), q))
      .orderBy(col("d").asc, col("cent_id")).limit(4)
      .collect().map(_.getLong(0)).toSeq
    val expected = IndexCatalog.loadBuckets(spark, base, name, probeIds)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        col("bucket").cast("long").as("cent_id"),
        round(l2Dist(col("embedding"), q), 6).as("score"))
      .orderBy(col("score").asc, col("vec_id")).limit(10)
    // the twin carries its OWN bucket predicate (loadBuckets), so the
    // alreadyRouted guard must leave it unrouted — double routing would
    // intersect probe sets
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    auto.map(norm) should contain theSameElementsInOrderAs
      expected.collect().map(norm)
    // the declared query matches too
    VectorOps.l2Auto(spark, sfDir).collect().map(norm) should
      contain theSameElementsInOrderAs auto.map(norm)
  }

  test("farthest-first euclidean forms decline: l2 DESC and -l2 ASC") {
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      val farthest = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(l2Dist(col("embedding"), q), 6).as("d"))
        .orderBy(col("d").desc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(farthest),
        "rule fired on a DESC distance sort (farthest-first)")
      val negAsc = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), (-l2Dist(col("embedding"), q)).as("nd"))
        .orderBy(col("nd").asc, col("vec_id")).limit(10)
      assert(!hasBucketInFilter(negAsc),
        "rule fired on an ASC negated distance (farthest-first)")
  }
  }

  test("1 - l2 DESC (one antitone wrapper) routes nearest-first") {
    val asc = VectorOps.l2Auto(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      val df = idx.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), (lit(1.0) - l2Dist(col("embedding"), q)).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10)
      assert(hasBucketInFilter(df),
        "similarity-shaped euclidean form (1 - l2 DESC) did not route")
      // same ids as the direct ASC routed form
      df.select("vec_id").collect().map(_.getLong(0)).toSeq shouldBe asc
    }
  }

  test("q_knn_auto_filtered: one plan carries the user partition filter AND the probe set") {
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    val df = try {
      val frame = VectorOps.knnAutoFilteredFrame(spark, sfDir)
      assert(hasBucketInFilter(frame), "routed+filtered composition did not route")
      val plan = frame.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).mkString(" | ")
      pf.toLowerCase should include("bucket")
      pf.toLowerCase should include("label")
      plan should include("PushedFilters")
      frame
    } finally AnnRouting.unregister(spark, base, name)
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    val expected = VectorOps.annFiltered(spark, sfDir).collect().map(norm)
    df.collect().map(norm) should contain theSameElementsInOrderAs expected
  }

  test("bucket predicate hidden behind a re-aliasing Project still blocks routing") {
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      // the user chose their own buckets, then re-aliased the column: the
      // alreadyRouted guard must chase the alias and DECLINE, not inject a
      // second probe set that intersects the user's choice
      val df = idx.select(col("vec_id"), col("embedding"),
          col("bucket").as("b"))
        .filter(col("b").cast("long").isin(0L, 1L))
        .select(col("vec_id"),
          round(cosineSim(col("embedding"), q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
      // the user's own pushed-down `bucket IN (0,1)` is one In-filter; a
      // double-route would inject a SECOND one carrying the probe set
      val bucketInSets = df.queryExecution.optimizedPlan.collect {
        case Filter(cond, _) => cond.collect {
          case In(a: AttributeReference, vs) if a.name == "bucket" =>
            vs.map(_.toString).toSet
        }
      }.flatten
      bucketInSets should have size 1
      bucketInSets.head shouldBe Set("0", "1")
  }
  }

  test("q_ann_batch_auto: the window-rank batch shape routes per query") {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    val df = try {
      val f = VectorOps.annBatchAutoFrame(spark, sfDir)
      f.queryExecution.executedPlan // force planning inside the route window
      f
    } finally AnnRouting.unregister(spark, base, name)
    // partition pruning: the probe UNION reaches the scan
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).mkString(" | ")
    pf.toLowerCase should include("bucket")
    // semantics: a per-(q_id, bucket) predicate exists — each query ranks
    // only its OWN probe buckets, not the union
    val hasPerQuery = df.queryExecution.optimizedPlan.exists {
      case Filter(cond, _) =>
        cond.exists {
          case In(a: AttributeReference, _) => a.name == "bucket"
          case _ => false
        } && cond.exists {
          case EqualTo(a: AttributeReference, _) => a.name == "q_id"
          case EqualTo(_, a: AttributeReference) => a.name == "q_id"
          case _ => false
        }
      case _ => false
    }
    assert(hasPerQuery, "no per-(q_id, bucket) semantic predicate in the routed plan")
    // pinned: routed batch == programmatic batched IVF search
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getAs[Number](4).longValue, r.getDouble(5))
    val expected = VectorOps.annBatch(spark, sfDir).collect().map(norm)
    df.collect().map(norm) should contain theSameElementsInOrderAs expected
    // the declared (materialized + epilogue-unregistered) query matches too
    VectorOps.annBatchAuto(spark, sfDir).collect().map(norm) should
      contain theSameElementsInOrderAs expected
  }

  test("batched routing declines above BatchRouteCap") {
    graft.operators.VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    graft.plans.GraftExtensions.register(spark)
    graft.sources.IndexCatalog.load(spark, base, name)
      .createOrReplaceTempView("emb_indexed_cap")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val vecs = emb.filter(col("vec_id") < (AnnRouting.BatchRouteCap + 1))
      .select(col("vec_id"), col("embedding")).collect()
    vecs.length should be > AnnRouting.BatchRouteCap
    val rows = vecs.map { r =>
      val lit = r.getSeq[Float](1).mkString(", ")
      s"(${r.getLong(0)}L, CAST(array($lit) AS ARRAY<FLOAT>))"
    }.mkString(", ")
    val df = spark.sql(
      s"""WITH q AS (SELECT * FROM VALUES $rows AS t(q_id, qe)),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |    ROUND(vec_dot(e.embedding, q.qe), 6) AS score
         |  FROM emb_indexed_cap e CROSS JOIN q
         |  WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |                               ORDER BY score DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT q_id, rank, vec_id, score FROM ranked
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)
    assert(!hasBucketInFilter(df),
      s"batched rewrite fired above the ${AnnRouting.BatchRouteCap}-query cap")
    AnnRouting.unregister(spark, base, name)
  }

  test("routing is deterministic across repeated optimization") {
    val a = VectorOps.knnAuto(spark, sfDir).collect().map(_.toSeq)
    val b = VectorOps.knnAuto(spark, sfDir).collect().map(_.toSeq)
    a should contain theSameElementsInOrderAs b
  }

  /** The naive RADIUS plan (no limit) with a configurable bound sense. */
  private def naiveRadius(lowerBound: Boolean): DataFrame = {
    import graft.functions.VectorFunctions._
    val idx = IndexCatalog.load(spark, base, name)
    val q = typedlit[Seq[Float]](queryVec)
    val score = round(cosineSim(col("embedding"), q), 6).as("score")
    val scored = idx.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), score)
    scored
      .filter(if (lowerBound) col("score") >= 0.2 else col("score") <= 0.2)
      .orderBy(col("score").desc, col("vec_id"))
  }

  test("q_radius_auto: a similarity lower bound routes; the routed rows are within the probed buckets") {
    VectorOps.annIvfPersisted(spark, sfDir).collect() // ensure index
    AnnRouting.register(spark, base, name, nprobe = 4)
    val df = naiveRadius(lowerBound = true)
    assert(hasBucketInFilter(df), "radius arm did not fire on a lower bound")
    // every routed-result row exists in the exact radius result (the
    // routing only PRUNES — it can never invent rows or change scores)
    val routed = df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    AnnRouting.unregister(spark, base, name)
    val exact = naiveRadius(lowerBound = true).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSet
    routed.subsetOf(exact) shouldBe true
    routed should not be empty
  }

  test("radius routing declines an UPPER bound (far-from-query) and kernel-free filters") {
    withSharedRoute {
      // score <= τ means "far from the query" — probing the nearest
      // buckets would be exactly wrong
      assert(!hasBucketInFilter(naiveRadius(lowerBound = false)),
        "radius arm fired on an upper (far-from-query) bound")
      // a plain metadata filter carries no query vector — nothing to probe
      val idx = IndexCatalog.load(spark, base, name)
      assert(!hasBucketInFilter(idx.filter(col("label") >= 3)),
        "radius arm fired on a kernel-free filter")
    }
  }

  /** A 2-bucket index where cosine probes and MIPS probes provably
    * differ: the query (1,0,0,0) is ANGULARLY nearest centroid 0 (its
    * bucket holds only a small-norm vector, dot 0.9) while bucket 1's
    * member has a large norm (dot 5.0) behind an angularly-distant
    * centroid — the vector a raw-dot ranking exists to find and cosine
    * probing at nprobe=1 cannot reach. Returns (base, name). */
  private def mipsFixture(withResid: Boolean): (String, String) = {
    import spark.implicits._
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val tmpBase = graft.Scratch.dir(if (withResid) "mipsrt" else "mipsrt0")
    val tiny = "tiny-mips"
    val data = Seq(
        (1L, 0L, vec(0.9, 0, 0, 0), 0L),
        (2L, 1L, vec(5.0, 6.0, 0, 0), 1L))
      .toDF("vec_id", "label", "embedding", "bucket")
    IndexCatalog.createIfAbsent(spark, tmpBase,
      IndexCatalog.IndexDescriptor(tiny, 4, "dotproduct"), data, Seq("bucket"))
    val centCols = Seq(
      (0L, vec(1.0, 0, 0, 0), 0.1),
      (1L, vec(0.6, 0.8, 0, 0), 6.81))
    val cent =
      if (withResid) centCols.toDF("cent_id", "c_embedding", "c_maxresid")
      else centCols.map { case (i, e, _) => (i, e) }.toDF("cent_id", "c_embedding")
    IndexCatalog.writeCentroids(spark, tmpBase, tiny, cent)
    (tmpBase, tiny)
  }

  test("q_dot_auto: bare vec_dot DESC routes by the norm-aware MIPS bound, not cosine geometry") {
    import graft.functions.VectorFunctions._
    val (tmpBase, tiny) = mipsFixture(withResid = true)
    AnnRouting.register(spark, tmpBase, tiny, nprobe = 1)
    try {
      val idx = IndexCatalog.load(spark, tmpBase, tiny)
      val q = typedlit[Seq[Float]](Seq(1.0f, 0f, 0f, 0f))
      // MIPS: bound(b0) = 1 + 0.1 = 1.1 < bound(b1) = 0.6 + 6.81 = 7.41
      // → probe bucket 1 → the high-norm vector wins, as exact MIPS does
      val dotTop = idx
        .select(col("vec_id"), dotProduct(col("embedding"), q).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(hasBucketInFilter(dotTop), "MIPS route did not fire")
      dotTop.select("vec_id").head().getLong(0) shouldBe 2L
      // cosine over the SAME index probes by angle → bucket 0's member
      val cosTop = idx
        .select(col("vec_id"), cosineSim(col("embedding"), q).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(hasBucketInFilter(cosTop), "cosine route did not fire")
      cosTop.select("vec_id").head().getLong(0) shouldBe 1L
      // WHOSE norm divides decides the metric: dividing by the QUERY
      // vector's norm is one constant for the whole ranking — the order
      // is still raw dot, and it must probe by the MIPS bound (cosine
      // probes would return the wrong vector here, exactly as bare dot
      // would)
      val dotOverQNorm = idx
        .select(col("vec_id"),
          (dotProduct(col("embedding"), q) / l2Norm(q)).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(hasBucketInFilter(dotOverQNorm),
        "query-norm-scaled dot did not route")
      dotOverQNorm.select("vec_id").head().getLong(0) shouldBe 2L
      // dividing by the ROW vector's norm re-weights every row — an
      // angular ranking, probed by cosine geometry
      val dotOverRowNorm = idx
        .select(col("vec_id"),
          (dotProduct(col("embedding"), q) / l2Norm(col("embedding"))).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(hasBucketInFilter(dotOverRowNorm),
        "row-norm-scaled dot did not route")
      dotOverRowNorm.select("vec_id").head().getLong(0) shouldBe 1L
    } finally AnnRouting.unregister(spark, tmpBase, tiny)
  }

  test("dot routing declines on a residual-less sidecar; cosine still routes") {
    import graft.functions.VectorFunctions._
    val (tmpBase, tiny) = mipsFixture(withResid = false)
    AnnRouting.register(spark, tmpBase, tiny, nprobe = 1)
    try {
      val idx = IndexCatalog.load(spark, tmpBase, tiny)
      val q = typedlit[Seq[Float]](Seq(1.0f, 0f, 0f, 0f))
      val dotTop = idx
        .select(col("vec_id"), dotProduct(col("embedding"), q).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(!hasBucketInFilter(dotTop),
        "MIPS route fired without residual bounds — cosine-geometry " +
          "probes would silently lose high-norm vectors")
      // the exact brute plan still answers, and correctly
      dotTop.select("vec_id").head().getLong(0) shouldBe 2L
      val cosTop = idx
        .select(col("vec_id"), cosineSim(col("embedding"), q).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(1)
      assert(hasBucketInFilter(cosTop),
        "cosine routing should not need residuals")
    } finally AnnRouting.unregister(spark, tmpBase, tiny)
  }

  test("q_dot_auto over the shared index: routed frame == declared query == MIPS replay") {
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    val routed = try {
      val f = VectorOps.dotAutoFrame(spark, sfDir)
      assert(hasBucketInFilter(f), "dot route did not fire on the shared index")
      f.collect().map(norm)
    } finally AnnRouting.unregister(spark, base, name)
    // semantics: exactly the top-10 by raw dot of the probed buckets —
    // recompute from the plan-injected probe set
    VectorOps.dotAuto(spark, sfDir).collect().map(norm) should
      contain theSameElementsInOrderAs routed
  }

  test("q_radius_dot: MIPS range filter routes by the residual bound; negatives decline") {
    import graft.functions.VectorFunctions._
    def norm(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3))
    VectorOps.annIvfPersisted(spark, sfDir).collect()
    AnnRouting.register(spark, base, name, nprobe = 4)
    val routed = try {
      val f = VectorOps.radiusDotFrame(spark, sfDir)
      assert(hasBucketInFilter(f), "MIPS radius route did not fire")
      f.collect().map(norm)
    } finally AnnRouting.unregister(spark, base, name)
    // the declared query (withRoute materialization) lands on the same rows
    VectorOps.radiusDot(spark, sfDir).collect().map(norm) should
      contain theSameElementsInOrderAs routed
    // inner-product UPPER bound ("far from the query"): the bound-ranked
    // nearest buckets are exactly the wrong ones — must decline
    withSharedRoute {
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      val far = idx.filter(
        graft.functions.VectorFunctions.dotProduct(col("embedding"), q) <=
          lit(VectorOps.DotRadiusTau))
      assert(!hasBucketInFilter(far), "routed an inner-product UPPER bound")
    }
    // residual-less sidecar: dot radius declines, the brute plan answers
    val (tmpBase, tiny) = mipsFixture(withResid = false)
    AnnRouting.register(spark, tmpBase, tiny, nprobe = 1)
    try {
      val idx = IndexCatalog.load(spark, tmpBase, tiny)
      val q = typedlit[Seq[Float]](Seq(1.0f, 0f, 0f, 0f))
      val range = idx.filter(dotProduct(col("embedding"), q) >= lit(2.0))
      assert(!hasBucketInFilter(range),
        "MIPS radius fired without residual bounds")
      range.select("vec_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    } finally AnnRouting.unregister(spark, tmpBase, tiny)
    // angular (LSH-kind) route: random-hyperplane buckets partition by
    // ANGLE, which says nothing about raw inner products — must decline
    graft.operators.RandomHyperplaneLsh.planFrames("q_lsh_auto")(spark, sfDir)
    try {
      val lshIdx = IndexCatalog.load(spark,
        IndexCatalog.cacheBase(sfDir), "emb-lsh-bucketed")
      val q = typedlit[Seq[Float]](queryVec)
      val range = lshIdx.filter(
        dotProduct(col("embedding"), q) >= lit(VectorOps.DotRadiusTau))
      assert(!hasBucketInFilter(range),
        "dot radius routed over an angular LSH index")
    } finally graft.operators.RandomHyperplaneLsh.dropPlanRoutes(spark, sfDir)
  }

  test("bucket filter re-exposed through an EXPRESSION alias (cast) still blocks routing") {
    withSharedRoute {
      import graft.functions.VectorFunctions._
      val idx = IndexCatalog.load(spark, base, name)
      val q = typedlit[Seq[Float]](queryVec)
      // the alias child is CAST(bucket), not a bare rename — the taint
      // chase must follow any expression READING bucket, or the rule
      // would inject probes on top of the user's own bucket choice
      val df = idx.select(col("vec_id"), col("embedding"),
          col("bucket").cast("long").as("b"))
        .filter(col("b").isin(0L, 1L))
        .select(col("vec_id"),
          round(cosineSim(col("embedding"), q), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
      val bucketInSets = df.queryExecution.optimizedPlan.collect {
        case Filter(cond, _) => cond.collect {
          case In(a: AttributeReference, vs) if a.name == "bucket" =>
            vs.map(_.toString).toSet
        }
      }.flatten
      // at most the user's own pushed-down filter — never a second probe set
      bucketInSets.size should be <= 1
      bucketInSets.foreach(_ shouldBe Set("0", "1"))
      df.count() shouldBe 10
    }
  }
}
