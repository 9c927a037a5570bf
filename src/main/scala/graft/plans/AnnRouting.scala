package graft.plans

import java.nio.file.Paths

import scala.collection.concurrent.TrieMap

import graft.functions.{DotProduct, L2Distance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, AttributeReference, Descending, Expression, ExprId, In, IntegerLiteral, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Optimizer-level ANN routing (SURVEY.md §4.2's one deferred row): a
  * `Rule[LogicalPlan]` that rewrites a plain top-K similarity sort —
  * `ORDER BY <cosine/dot score> DESC LIMIT k` — over a REGISTERED persisted
  * IVF index into the probed-bucket scan, so a pure-SQL user gets the same
  * partition-pruned access path as the programmatic
  * [[graft.operators.IvfIndex.search]] API without asking for it.
  *
  * This is the engine-side counterpart of what the reference outsources to
  * Pinecone's query planner (`main.go:89-139` sends a topK request; the
  * service decides how to search its index). Registering an index here is
  * the explicit opt-in to approximate semantics — exactly as setting a
  * probe count is in published IVF systems: the rewrite returns the exact
  * top-K *of the probed buckets* (nprobe of the centroid partitions), not
  * of the full corpus, with recall tunable via the registered nprobe.
  *
  * Mechanics of one rewrite:
  *  1. match `GlobalLimit(k, LocalLimit(k, Sort(key DESC, ...)))`;
  *  2. resolve `key` through Project aliases below the sort, and require it
  *     to contain a scoring kernel over a foldable query literal: DESC
  *     sorts must reach `vec_dot(<vector column>, <query>)` — the shared
  *     kernel of the cosine and dotproduct rankings — through
  *     monotone-INCREASING wrappers (or an antitone wrapper around the
  *     euclidean kernel, e.g. `1 - vec_l2dist(...)`); ASC sorts must reach
  *     `vec_l2dist(<vector column>, <query>)` — the euclidean DISTANCE
  *     ranks nearest-first ascending (`upsert/upsert.go:27` documents
  *     euclidean as a first-class index metric). The foldable side IS the
  *     query vector;
  *  3. the scan below must be a `LogicalRelation` whose root path is a
  *     registered index's `data/` directory (nothing fires on unregistered
  *     tables — negative-tested);
  *  4. score the index's persisted centroid sidecar against the query
  *     vector ON THE DRIVER (the centroid table is nprobe-discipline
  *     metadata: 16 rows here, a cached codebook in any real IVF serving
  *     tier) with bit-identical arithmetic to [[graft.operators.IvfIndex
  *     .probes]] — sequential double dot/norm accumulation, NaN-greatest
  *     descending order, centroid id tiebreak;
  *  5. inject `Filter(bucket IN (<probe ids>), relation)` directly above
  *     the relation. `bucket` is a partition column of the persisted
  *     layout, so the filter surfaces as `PartitionFilters` on the Parquet
  *     scan — the plan reads nprobe of the bucket directories and the
  *     Sort+Limit on top becomes TakeOrderedAndProject over the pruned
  *     scan.
  *
  * The rule runs in the session's user-provided-optimizer batch (a
  * fixpoint), so it must be idempotent: a relation already guarded by a
  * bucket filter is left alone (also the conservative answer when the USER
  * wrote their own bucket predicate — routing on top would silently
  * intersect probe sets).
  */
object AnnRouting {

  /** A registered route: the persisted index rooted at `base`/`name` whose
    * `data/` scan may be rewritten, probing `nprobe` buckets per query.
    * `vecCol` names the indexed vector column inside the scan. `kind`
    * selects the probe model:
    *  - `"ivf"`: score the persisted centroid sidecar, take the nprobe
    *    nearest centroid ids;
    *  - `"lsh"`: the query's own random-hyperplane bucket plus its
    *    hamming-1 neighbors (own bucket first, then plane order), capped
    *    at nprobe — nprobe=1 is single-probe, 1+Planes is the full
    *    multi-probe set. No sidecar needed: the planes are deterministic
    *    constants shared with [[graft.operators.RandomHyperplaneLsh]]. */
  case class Route(base: String, name: String, nprobe: Int, vecCol: String,
                   kind: String)

  /** Registered routes, PER SESSION, keyed by the canonical `data/`
    * directory path. Registration is the opt-in to approximate semantics,
    * and an opt-in must not outlive the scope that gave it: a JVM-global
    * registry (the pre-round-11 design) meant that after any routed query
    * ran, an unrelated exact `ORDER BY cosine DESC LIMIT k` over the same
    * index path — in ANY session in the JVM — silently returned probed
    * results the user never asked for. Scoping by session (weak keys: a
    * dropped session's routes die with it) plus [[withRoute]]'s epilogue
    * unregistration makes the approximate window exactly as wide as the
    * query that declared it.
    *
    * Registrations are REFERENCE-COUNTED per (session, path): two
    * overlapping [[withRoute]] windows over the same index (nested
    * helpers, or concurrent declared queries sharing a session) each
    * increment on entry and decrement on exit, so the first epilogue to
    * run can never strip the route out from under the other window's
    * still-planning body. Route VALUES form a STACK per (session, path):
    * the innermost open window's config is active, and when it exits the
    * enclosing window's remaining body plans with the config IT
    * registered — not whatever the inner window happened to set (a
    * last-registration-wins registry leaked the inner nprobe outward).
    * What the stack deliberately does NOT fix: an unrelated exact top-K
    * planned by another thread INSIDE someone's window is still probed —
    * approximate opt-in is session-scoped, and untangling that needs
    * per-plan tokens, not a registry. */
  private final case class RouteReg(stack: List[Route]) {
    def route: Route = stack.head
  }

  private val routes =
    new java.util.WeakHashMap[SparkSession, TrieMap[String, RouteReg]]()

  private def sessionRoutes(spark: SparkSession): TrieMap[String, RouteReg] =
    routes.synchronized {
      val existing = routes.get(spark)
      if (existing != null) existing
      else {
        val m = TrieMap.empty[String, RouteReg]
        routes.put(spark, m)
        m
      }
    }

  /** One centroid of a persisted sidecar. `maxResid` is the bucket's
    * max member-to-centroid L2 distance (written by residual-aware
    * builds; None on older sidecars) — the quantity MIPS probing needs:
    * for any member v of bucket b, `dot(q, v) = dot(q, c_b) + dot(q,
    * v − c_b) ≤ dot(q, c_b) + ‖q‖·maxResid_b` (Cauchy–Schwarz), so the
    * bound ranks buckets by the best inner product they could possibly
    * contain. Cosine-scored probes would miss exactly the high-norm
    * vectors a dot ranking exists to find. */
  private[plans] case class Centroid(id: Long, vec: Array[Double],
                                     norm: Double, maxResid: Option[Double])

  /** Driver-side caches: per-index centroid codebooks (id, vector, norm,
    * residual bound) and per-(index, metric, query-vector) FULL bucket
    * rankings (deliberately nprobe-free keys — the ranking is sliced to
    * the active route's nprobe at use, so overlapping windows with
    * different depths never serve each other's probe sets) — the fixpoint
    * optimizer batch may visit a plan several times, and repeated queries
    * against the same index should not re-read the sidecar. */
  private val centroidCache = TrieMap.empty[String, Array[Centroid]]
  private val probeCache = TrieMap.empty[(String, String, Seq[Double]), Seq[Long]]

  /** Bound on probeCache: a serving session sees a distinct query vector
    * per user query, and exact-vector repeats are what the cache exists
    * for (the optimizer's own fixpoint passes, retried plans) — those
    * repeat within moments, so a wholesale clear at the cap loses
    * nothing that matters while making unbounded driver growth
    * impossible. */
  private val ProbeCacheMax = 4096

  /** Bound on the BATCHED rewrite's query-table size: M queries inject an
    * M-term OR predicate and M driver-side probe computations at PLAN
    * time — fine for a serving batch (tens of queries), wrong for a
    * million-row query table (that is the knnJoinLarge shape, not a
    * literal VALUES list, and it never reaches this rule anyway because a
    * corpus-sized query side is not a LocalRelation). Above the cap the
    * rewrite declines and the exact plan stands. */
  val BatchRouteCap = 64

  private def canonical(p: String): String =
    new java.io.File(p).getCanonicalPath

  def dataPath(base: String, name: String): String =
    canonical(Paths.get(base, name, "data").toString)

  /** Register an index for routing IN THIS SESSION and install the
    * rewrite rule on it (idempotent on both counts). Scope discipline
    * (see [[routes]]): only this session's plans over this index's data
    * path route into probed semantics, and only until [[unregister]] —
    * declared queries use [[withRoute]] so the registration never
    * outlives the query that made it. */
  def register(spark: SparkSession, base: String, name: String, nprobe: Int,
               vecCol: String = "embedding", kind: String = "ivf"): Unit = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    require(kind == "ivf" || kind == "lsh", s"unknown route kind '$kind'")
    val route = Route(base, name, nprobe, vecCol, kind)
    sessionRoutes(spark).updateWith(dataPath(base, name)) {
      case Some(reg) => Some(RouteReg(route :: reg.stack))
      case None => Some(RouteReg(route :: Nil))
    }
    // the sidecar may have been rewritten since a previous registration
    invalidate(base, name)
    install(spark)
  }

  /** Run `body` with the route registered, FORCE the routed plan by
    * eagerly materializing the result, and unregister in the epilogue —
    * the declared-query discipline: the approximate-semantics window is
    * exactly the body, so a later plain exact scan over the same index
    * path (same session or any other) plans brute-force. The eager
    * materialization is load-bearing, not a convenience: `body`'s frame
    * is lazy, and a lazily-routed plan re-optimized after the epilogue
    * (e.g. by a DataFrameWriter building its own QueryExecution) would
    * silently lose the route and return brute results against a probed
    * oracle.
    *
    * Materialization is a driver-side collect into a LocalRelation, not
    * an eager `localCheckpoint`: every routed query is top-K or a
    * bounded radius set — a handful of rows by construction — and the
    * checkpoint path paid a full eager RDD materialization (~0.2–0.3 s
    * of block-manager machinery per declared q_*_auto row) to pin what a
    * collect pins in milliseconds. Callers routing an UNBOUNDED frame
    * through here would be mis-using the declared-query discipline (and
    * the knnJoinLarge shape never reaches this rule anyway). */
  def withRoute(spark: SparkSession, base: String, name: String, nprobe: Int,
                vecCol: String = "embedding", kind: String = "ivf")
               (body: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    register(spark, base, name, nprobe, vecCol, kind)
    try {
      val df = body
      // executes the routed plan while the route is live; the returned
      // LocalRelation can be re-planned freely after the epilogue
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    } finally unregister(spark, base, name)
  }

  /** Drop the driver-side centroid/probe caches for one index — REQUIRED
    * after any rewrite of the persisted sidecar (the rebuild path,
    * [[graft.sources.Maintenance.rebuildIvf]]): a route planned against
    * stale cached centroids would probe buckets that no longer match the
    * on-disk layout. Registration calls this too. */
  def invalidate(base: String, name: String): Unit = {
    val p = dataPath(base, name)
    centroidCache.remove(p)
    probeCache.filterInPlace { case ((path, _, _), _) => path != p }
  }

  /** Drop one registration from one session (the [[withRoute]] epilogue;
    * also the sane response to dropping the index). Pops the innermost
    * route — an enclosing window's remaining body sees the config it
    * registered again — and the route leaves the registry when the LAST
    * overlapping window exits. Unbalanced extra calls are no-ops. */
  def unregister(spark: SparkSession, base: String, name: String): Unit = {
    routes.synchronized {
      val m = routes.get(spark)
      if (m != null) m.updateWith(dataPath(base, name)) {
        case Some(reg) if reg.stack.size > 1 => Some(RouteReg(reg.stack.tail))
        case _ => None
      }
    }
    ()
  }

  /** Install the rule into a LIVE session via experimental
    * extraOptimizations — sessions built with
    * `spark.sql.extensions=graft.plans.GraftExtensions` get it at build
    * time instead (see [[GraftExtensions]]). */
  def install(spark: SparkSession): Unit = synchronized {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[AnnRewriteRule]))
      spark.experimental.extraOptimizations = existing :+ new AnnRewriteRule(spark)
  }

  private[plans] def routeFor(spark: SparkSession, path: String): Option[Route] =
    routes.synchronized { Option(routes.get(spark)) }
      .flatMap(_.get(path)).map(_.route)

  private[plans] def hasRoutes(spark: SparkSession): Boolean =
    routes.synchronized {
      val m = routes.get(spark)
      m != null && m.nonEmpty
    }

  /** The registered root path of a file-source relation, if any — checked
    * against THIS session's routes only. */
  private[plans] def registeredPath(spark: SparkSession,
                                    rel: HadoopFsRelation): Option[String] = {
    val roots = rel.location.rootPaths
    if (roots.size != 1) return None // an index data dir is one root
    val p = canonical(roots.head.toUri.getPath)
    if (routeFor(spark, p).isDefined) Some(p) else None
  }

  /** Centroid codebook from the index's persisted sidecar (written at
    * build by [[graft.sources.IndexCatalog.writeCentroids]]), cached per
    * JVM. Columns: cent_id, c_embedding; the norm is recomputed here with
    * the engine's arithmetic. */
  private[plans] def centroids(spark: SparkSession, route: Route)
      : Array[Centroid] =
    centroidCache.getOrElseUpdate(dataPath(route.base, route.name), {
      val path = Paths.get(route.base, route.name, "centroids").toString
      val raw = spark.read.parquet(path)
      val hasResid = raw.columns.contains("c_maxresid")
      val cols =
        if (hasResid) Seq("cent_id", "c_embedding", "c_maxresid")
        else Seq("cent_id", "c_embedding")
      raw.select(cols.head, cols.tail: _*).collect().map { row =>
        val id = row.getLong(0)
        val vec = row.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray
        val resid =
          if (hasResid && !row.isNullAt(2)) Some(row.getDouble(2)) else None
        Centroid(id, vec, math.sqrt(vec.map(x => x * x).sum), resid)
      }.sortBy(_.id)
    })

  /** Probe selection per route kind and METRIC, computed on the driver
    * and cached.
    *
    * IVF cosine: the exact [[graft.operators.IvfIndex.probes]] semantics —
    * cosine via sequential double accumulation, zero-norm guard to 0,
    * DESC with NaN greatest (Spark's sort order for doubles), cent_id
    * ascending tiebreak.
    *
    * IVF euclidean: nearest centroids by L2 DISTANCE ascending (sequential
    * double accumulation of squared diffs, same as [[graft.functions
    * .L2Distance]]), NaN greatest = last, cent_id ascending tiebreak — the
    * probe model for an `ORDER BY l2 ASC LIMIT k` route.
    *
    * LSH (cosine only — the random-hyperplane family approximates ANGULAR
    * similarity; an euclidean route over it is declined upstream): the
    * [[graft.operators.RandomHyperplaneLsh]] multi-probe set — the query's
    * own bucket (sign of the projection onto each deterministic ±1 plane)
    * followed by its hamming-1 neighbors in plane order, capped at nprobe.
    * The projection replays `bucketOf`'s arithmetic exactly (sequential
    * double accumulation over the same plane constants). */
  private[plans] def probeBuckets(spark: SparkSession, route: Route,
                                  query: Array[Double],
                                  metric: String = "cosine"): Seq[Long] = {
    // bound check-then-clear under a lock: concurrent planners racing the
    // wholesale clear only ever cost a re-plan, but the lock makes the
    // bound exact instead of approximately enforced
    if (probeCache.size >= ProbeCacheMax)
      synchronized { if (probeCache.size >= ProbeCacheMax) probeCache.clear() }
    // the cache stores the FULL bucket ranking (nprobe-independent — ∝
    // #centroids, metadata) and slices per route: two windows over the
    // same index with different nprobe must not serve each other's probe
    // sets (the route-stack restore guarantee extends to the cache)
    probeCache.getOrElseUpdate(
      (dataPath(route.base, route.name), metric, query.toIndexedSeq), {
        if (route.kind == "lsh") lshProbes(route, query)
        else ivfProbes(spark, route, query, metric)
      }).take(route.nprobe)
  }

  private def ivfProbes(spark: SparkSession, route: Route,
                        query: Array[Double], metric: String): Seq[Long] = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val cents = centroids(spark, route)
    // MIPS probing NEEDS the residual bound (see [[Centroid.maxResid]]):
    // on a sidecar written before residuals existed, decline-by-default —
    // an empty probe set falls the caller back to the exact brute plan,
    // never to cosine-geometry probes that lose high-norm vectors.
    if (metric == "dot" && cents.exists(_.maxResid.isEmpty)) return Seq.empty
    val scored = cents.map { c =>
      val vec = c.vec
      require(vec.length == query.length,
        s"ann routing: query dim ${query.length} != centroid dim ${vec.length}")
      metric match {
        case "euclidean" =>
          var ss = 0.0
          var i = 0
          while (i < vec.length) {
            val d = vec(i) - query(i); ss += d * d; i += 1
          }
          (c.id, math.sqrt(ss))
        case "dot" =>
          // upper bound on the inner product any member can achieve:
          // dot(q, c) + ‖q‖·maxResid (Cauchy–Schwarz on the residual)
          var dot = 0.0
          var i = 0
          while (i < vec.length) { dot += vec(i) * query(i); i += 1 }
          (c.id, dot + qNorm * c.maxResid.get)
        case _ =>
          var dot = 0.0
          var i = 0
          while (i < vec.length) { dot += vec(i) * query(i); i += 1 }
          val denom = c.norm * qNorm
          (c.id, if (denom == 0.0) 0.0 else dot / denom)
      }
    }
    val best: ((Long, Double), (Long, Double)) => Boolean =
      if (metric == "euclidean") { case ((idA, sA), (idB, sB)) =>
        // ascending distance: NaN (total-order largest) sorts last
        val c = java.lang.Double.compare(sA, sB)
        if (c != 0) c < 0 else idA < idB
      } else { case ((idA, sA), (idB, sB)) =>
        // Spark Descending: NaN sorts greatest, then cent_id asc tiebreak
        val c = java.lang.Double.compare(sB, sA) // total order, NaN largest
        if (c != 0) c < 0 else idA < idB
      }
    scored.sortWith(best).map(_._1).toSeq // full ranking; caller slices
  }

  private def lshProbes(route: Route, query: Array[Double]): Seq[Long] = {
    import graft.operators.RandomHyperplaneLsh.{planeSigns, Planes}
    val own = (0 until Planes).map { p =>
      val signs = planeSigns(p, query.length)
      var s = 0.0
      var d = 0
      while (d < query.length) { s += query(d) * signs(d); d += 1 }
      if (s > 0) 1L << p else 0L
    }.sum
    own +: (0 until Planes).map(p => own ^ (1L << p)) // full ring; caller slices
  }
}

/** The rewrite rule itself — see [[AnnRouting]] for the full contract.
  * Two shapes are matched: the single-query `GlobalLimit(Sort)` top-K
  * (cosine/dot DESC or euclidean ASC over a foldable query literal), and
  * the BATCHED window-rank form (`Filter(rank <= k, Window(row_number
  * PARTITION BY q_id ORDER BY score DESC)))` over a literal M-row query
  * table — the q_ann_batch shape, which never passes through a global
  * Sort+Limit and so never matched the first pattern. */
class AnnRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import AnnRouting._

  /** The session whose ROUTES govern this plan. Rules are constructed
    * per-session, but rule INSTANCES travel: cloneSession (which
    * Structured Streaming performs for every stream) copies
    * experimental.extraOptimizations, so a clone plans through a rule
    * whose captured `spark` is the parent. Route lookup therefore
    * resolves the ACTIVE session at apply time (QueryExecution phases run
    * under withActive) — a clone's registration routes the clone, and a
    * parent's registration never leaks into the clone's plans. The
    * captured session remains the fallback (and stays correct for
    * driver-side sidecar reads, which are session-independent). */
  private def planSession: SparkSession =
    SparkSession.getActiveSession.getOrElse(spark)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // the rule is installed on every extensions-built session; with no
    // route registered IN THE PLANNING SESSION there is nothing to do —
    // skip the tree walk (and registeredPath's canonicalization
    // syscalls) entirely
    if (!AnnRouting.hasRoutes(planSession)) return plan
    applyBatchRouting(applyRadiusRouting(applyRouting(plan)))
  }

  /** RADIUS (similarity-range) routing: a Filter whose condition carries
    * a similarity LOWER bound against a registered index — `cosine ≥ τ`
    * through the monotone wrappers, `vec_dot ≥ τ` (bare inner product —
    * probes ranked by the MIPS residual bound, q_radius_dot; declines on
    * residual-less sidecars and on angular LSH-kind routes), or
    * `l2dist ≤ τ` (all meaning "near the query") — routes to the probed
    * buckets exactly like a top-K sort does. The same opt-in
    * approximation contract: registering the index declares that range
    * queries may miss matches in unprobed buckets (the IVF recall
    * trade), in exchange for reading nprobe/k of the data. UPPER bounds
    * (`cosine ≤ τ`, `vec_dot ≤ τ`, `l2dist ≥ τ` — "far from the query")
    * must DECLINE: the nearest buckets are exactly the wrong ones.
    * Idempotent across optimizer passes via the user-bucket-filter
    * guard (the injected probe filter reads as one on the next visit). */
  /** Pure in-memory pre-screen: the bare `Filter(_, _)` pattern matches
    * the most common operator in every plan, and routeRadius's first
    * steps (subtree collect + path canonicalization syscalls) are too
    * expensive to run per Filter per fixpoint pass. A filter can only be
    * a similarity-radius gate if its condition CONTAINS a scoring
    * kernel, so non-vector plans skip in one expression walk. (By the
    * time extraOptimizations run, predicate pushdown has substituted
    * Project aliases into the condition — the probed SQL/DataFrame forms
    * carry the kernel inline; a condition still hiding it behind an
    * unpushable alias is skipped, a conservative decline.) */
  private def condHasKernel(cond: Expression): Boolean =
    cond.exists(e => e.isInstanceOf[DotProduct] || e.isInstanceOf[L2Distance])

  private def applyRadiusRouting(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) if condHasKernel(cond) =>
      val routed =
        try routeRadius(f, cond, child)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"ann radius routing declined (falling back to the unrouted plan): $e")
            None
        }
      routed match {
        case Some(r) => f.copy(child = r)
        case None => f
      }
  }

  private def routeRadius(whole: Filter, cond: Expression,
                          child: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
    val (relation, path) = registeredScan(child).getOrElse(return None)
    val r = routeFor(planSession, path).getOrElse(return None)
    val bucketAttr = relation.output.find(_.name == "bucket").getOrElse(return None)
    // the whole filter (cond included) — a user bucket predicate, or this
    // rule's own injected probe filter on a previous pass, declines
    if (hasUserBucketFilter(whole, relation, bucketAttr)) return None
    val resolve = aliasResolver(child)
    val vecAttrOk = (a: Expression) => a match {
      case ar: AttributeReference => ar.name == r.vecCol && relation.outputSet.contains(ar)
      case _ => false
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, rr) => conjuncts(l) ++ conjuncts(rr)
      case x => Seq(x)
    }
    // carries its own metric: "cosine" for the normalized form, "dot"
    // for a bare inner-product bound (dot >= τ routes by the MIPS bound)
    def simLowerBound(k: Expression): Option[(Expression, String)] =
      monotoneDotKernel(vecAttrOk, _.foldable)(resolve(k, 4))
    def l2UpperBound(k: Expression): Option[Expression] =
      monotoneL2Kernel(vecAttrOk)(resolve(k, 4))
    // The optimizer pushes the comparison INSIDE the zero-norm CASE guard
    // (`CASE WHEN norm=0 THEN 0.0 ELSE cos END >= τ` becomes `CASE WHEN
    // norm=0 THEN false ELSE cos >= τ END`) — unwrap exactly that form: a
    // single kernel-free branch whose value is the literal FALSE (the
    // guarded row is excluded either way for a positive τ; a TRUE branch
    // would admit rows independently of the kernel and must decline).
    import org.apache.spark.sql.catalyst.expressions.CaseWhen
    def unwrapGuard(e: Expression): Expression = e match {
      case CaseWhen(Seq((c, Literal(false, org.apache.spark.sql.types.BooleanType))), Some(els))
          if !c.exists(x => x.isInstanceOf[DotProduct] || x.isInstanceOf[L2Distance]) =>
        els
      case other => other
    }
    // first conjunct that is a near-the-query bound; the opposite-sense
    // forms fall through to None (decline)
    val hit: Option[(Expression, String)] = conjuncts(cond).iterator.map(unwrapGuard).map {
      case GreaterThanOrEqual(l, t) if isNumericLiteral(t) => simLowerBound(l)
      case GreaterThan(l, t) if isNumericLiteral(t) => simLowerBound(l)
      case LessThanOrEqual(t, rr) if isNumericLiteral(t) => simLowerBound(rr)
      case LessThan(t, rr) if isNumericLiteral(t) => simLowerBound(rr)
      case LessThanOrEqual(l, t) if isNumericLiteral(t) =>
        l2UpperBound(l).map((_, "euclidean"))
      case LessThan(l, t) if isNumericLiteral(t) =>
        l2UpperBound(l).map((_, "euclidean"))
      case GreaterThanOrEqual(t, rr) if isNumericLiteral(t) =>
        l2UpperBound(rr).map((_, "euclidean"))
      case GreaterThan(t, rr) if isNumericLiteral(t) =>
        l2UpperBound(rr).map((_, "euclidean"))
      case _ => None
    }.collectFirst { case Some(x) => x }
    val (queryLit, metric) = hit.getOrElse(return None)
    // only the angular metric matches the LSH family's bucket geometry
    if (metric != "cosine" && r.kind != "ivf") return None
    val query = evalVector(queryLit).getOrElse(return None)
    val probes = probeBuckets(spark, r, query, metric)
    if (probes.isEmpty) return None
    val lits = probes.map(b => bucketLiteral(b, bucketAttr.dataType))
    logInfo(s"ann routing: rewriting radius filter over ${r.name} to " +
      s"probed buckets [${probes.mkString(", ")}]")
    Some(child.transformUp {
      case lr: LogicalRelation if lr eq relation => Filter(In(bucketAttr, lits), lr)
    })
  }

  /** The top-K shape, with an optional column-pruning Project between the
    * limit and the sort: `SELECT vec_id FROM (... ORDER BY score DESC
    * LIMIT k)` optimizes to `GlobalLimit(LocalLimit(Project(Sort)))`, and
    * without this arm the outer projection would silently turn the routed
    * query back into a full scan. */
  private def applyRouting(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case limit @ GlobalLimit(IntegerLiteral(k), ll: LocalLimit) if k > 0 &&
        (ll.child.isInstanceOf[Sort] ||
          (ll.child.isInstanceOf[Project] &&
            ll.child.asInstanceOf[Project].child.isInstanceOf[Sort])) =>
      val (proj, sort) = ll.child match {
        case s: Sort => (None, s)
        case p @ Project(_, s: Sort) => (Some(p), s)
        case other => throw new MatchError(other) // unreachable by the guard
      }
      if (!sort.global) limit
      else {
        // Any failure inside routing (unreadable sidecar, malformed query
        // literal, dimension mismatch) must DECLINE the rewrite — the
        // naive plan is always still correct — never fail the user's
        // query at plan time.
        val routed =
          try route(sort.order, sort.child)
          catch {
            case scala.util.control.NonFatal(e) =>
              logWarning(s"ann routing declined (falling back to the unrouted plan): $e")
              None
          }
        routed match {
          case Some(r) =>
            val newSort = sort.copy(child = r)
            val newInner = proj.map(p => p.copy(child = newSort)).getOrElse(newSort)
            limit.copy(child = ll.copy(child = newInner))
          case None => limit
        }
      }
  }

  /** Attempt the rewrite; None leaves the plan untouched. */
  private def route(orders: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
                    child: LogicalPlan): Option[LogicalPlan] = {
    val head = orders.headOption.getOrElse(return None)

    val (relation, path) = registeredScan(child).getOrElse(return None)
    val r = routeFor(planSession, path).getOrElse(return None)
    val bucketAttr = relation.output.find(_.name == "bucket").getOrElse(return None)
    if (hasUserBucketFilter(child, relation, bucketAttr)) return None

    // resolve the sort key through Project aliases, then find the scoring
    // kernel vec_dot(<indexed vector column>, <foldable query vector>)
    val resolve = aliasResolver(child)
    val key = resolve(head.child, 4)
    val vecAttrOk = (a: Expression) => a match {
      case ar: AttributeReference => ar.name == r.vecCol && relation.outputSet.contains(ar)
      case _ => false
    }
    // The kernel must be reachable through MONOTONE-increasing wrappers
    // only — a DESC sort on ANY expression containing vec_dot is not
    // enough: `ORDER BY 1 - cosine DESC` (farthest-first),
    // `ORDER BY -score DESC`, or `ORDER BY score / -1.0 DESC` contains
    // the kernel but ranks the OPPOSITE way, and routing it to the
    // nearest buckets would silently return near-zero-recall garbage.
    // Accepted wrappers, each with its monotonicity condition enforced,
    // not assumed:
    //  - alias; cast to a NUMERIC type (a string cast sorts
    //    lexicographically — '-0.2' > '-0.1' — and must decline); round;
    //  - the zero-norm CASE guard and ONLY it: a single branch whose
    //    value is the literal 0 and whose predicate is kernel-free (a
    //    general CASE with a constant arm, e.g. WHEN label=3 THEN 2.0,
    //    re-ranks rows independently of the kernel and must decline);
    //  - division with the kernel in the NUMERATOR and a denominator
    //    PROVABLY non-negative: a product of vec_l2norm terms and/or
    //    positive numeric literals. A negative or sign-unknown
    //    denominator flips the order.
    //
    // The EUCLIDEAN metric ranks nearest-first ASCENDING on the
    // vec_l2dist kernel, so direction selects the kernel family:
    //  - ASC sorts must reach vec_l2dist through the same
    //    monotone-increasing wrappers (ASC on cosine would be
    //    farthest-first — decline);
    //  - DESC sorts may ALSO reach vec_l2dist through one antitone
    //    wrapper — `<numeric literal> - l2` or `-l2` — which flips a
    //    descending sort back to nearest-first (the `ORDER BY 1 -
    //    distance DESC` form a similarity-shaped API emits). A second
    //    negation is declined (conservative: decline-by-default).
    import org.apache.spark.sql.catalyst.expressions.{RoundBase, Subtract, UnaryMinus}
    import org.apache.spark.sql.types.NumericType
    // (query, metric): "cosine" for the normalized form, "dot" for a
    // bare inner-product DESC sort (the MIPS ranking)
    def monotoneKernel(e: Expression): Option[(Expression, String)] =
      monotoneDotKernel(vecAttrOk, _.foldable)(e)
    def monotoneL2(e: Expression): Option[Expression] =
      monotoneL2Kernel(vecAttrOk)(e)
    // exactly ONE antitone wrapper (lit - l2, or -l2) around the monotone
    // l2 form — DESC on it is nearest-first
    def antitoneL2(e: Expression): Option[Expression] = e match {
      case al: Alias => antitoneL2(al.child)
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType.isInstanceOf[NumericType] => antitoneL2(c.child)
      case rn: RoundBase => antitoneL2(rn.children.head)
      case UnaryMinus(inner, _) => monotoneL2(inner)
      case Subtract(l, inner, _) if isNumericLiteral(l) => monotoneL2(inner)
      case _ => None
    }
    val (queryLit, metric) = head.direction match {
      case Descending =>
        monotoneKernel(key)
          .orElse(antitoneL2(key).map((_, "euclidean")))
          .getOrElse(return None)
      case Ascending =>
        monotoneL2(key).map((_, "euclidean")).getOrElse(return None)
    }
    // the random-hyperplane LSH family buckets by ANGLE: routing a
    // euclidean or raw-dot ranking through it would probe buckets chosen
    // under the wrong geometry — decline, the brute plan stays correct
    if (metric != "cosine" && r.kind != "ivf") return None

    val query = evalVector(queryLit).getOrElse(return None)
    val probes = probeBuckets(spark, r, query, metric)
    if (probes.isEmpty) return None
    val lits = probes.map(b => bucketLiteral(b, bucketAttr.dataType))
    logInfo(s"ann routing: rewriting top-K sort over ${r.name} to " +
      s"probed buckets [${probes.mkString(", ")}]")
    Some(child.transformUp {
      case lr: LogicalRelation if lr eq relation => Filter(In(bucketAttr, lits), lr)
    })
  }

  // ---- shared plan-inspection helpers (single-query + batched shapes) --

  /** The one registered index scan below `child` (exactly one — ambiguity
    * = no-op). */
  private def registeredScan(child: LogicalPlan)
      : Option[(LogicalRelation, String)] = {
    val candidates = child.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        registeredPath(planSession, lr.relation.asInstanceOf[HadoopFsRelation]).map(p => (lr, p))
    }.flatten
    candidates match {
      case Seq(one) => Some(one)
      case _ => None
    }
  }

  /** A user bucket predicate anywhere between the matched operator and the
    * relation means the buckets were already chosen — routing on top would
    * silently INTERSECT probe sets and shrink recall below what the user
    * asked for. `bucket` may be re-exposed under new ExprIds by aliasing
    * Projects (`SELECT bucket AS b …`), so the guard chases aliases of the
    * relation's bucket attribute transitively before checking the Filter
    * conditions. Also what makes the rewrites idempotent under the
    * fixpoint batch: an injected probe filter is itself a bucket
    * predicate. */
  private def hasUserBucketFilter(child: LogicalPlan,
                                  relation: LogicalRelation,
                                  bucketAttr: AttributeReference): Boolean = {
    val bucketIds: Set[ExprId] = {
      var ids = Set(bucketAttr.exprId)
      var changed = true
      while (changed) {
        changed = false
        child.foreach {
          case p: Project => p.projectList.foreach {
            // any alias whose defining expression READS a bucket-derived
            // attribute taints the new name — not just the bare-rename
            // `bucket AS b` but `CAST(bucket AS INT) AS b`, `bucket + 0
            // AS b`, …: a later filter on such a column is still the user
            // choosing buckets, and routing on top of it would intersect
            // probe sets. Conservative by construction (a taint can only
            // DECLINE a rewrite; the exact plan stands).
            case a: Alias
                if !ids.contains(a.exprId) &&
                  a.child.references.exists(r => ids.contains(r.exprId)) =>
              ids += a.exprId; changed = true
            case _ => ()
          }
          case _ => ()
        }
      }
      ids
    }
    child.exists {
      case Filter(cond, grandchild) =>
        grandchild.exists(_ eq relation) &&
          cond.references.exists(ref => bucketIds.contains(ref.exprId))
      case _ => false
    }
  }

  /** Bounded-depth resolution of attributes through the Project aliases
    * below `child` (the sort key / window order key is usually an alias of
    * an alias of the kernel expression). */
  private def aliasResolver(child: LogicalPlan): (Expression, Int) => Expression = {
    val aliases: Map[ExprId, Expression] = child.collect {
      case p: Project => p.projectList.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap
    def resolve(e: Expression, depth: Int): Expression =
      if (depth <= 0) e
      else e.transformUp {
        case ar: AttributeReference if aliases.contains(ar.exprId) =>
          resolve(aliases(ar.exprId), depth - 1)
      }
    resolve
  }

  private def numericValue(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private def provablyNonNegative(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.Multiply
    import org.apache.spark.sql.types.NumericType
    e match {
      case _: graft.functions.L2Norm => true
      case Multiply(a, b, _) => provablyNonNegative(a) && provablyNonNegative(b)
      case l: Literal if l.dataType.isInstanceOf[NumericType] =>
        Option(l.eval()).flatMap(numericValue).exists(_ >= 0.0)
      case _ => false
    }
  }

  private def isLiteralZero(e: Expression): Boolean =
    e.foldable && Option(e.eval()).flatMap(numericValue).contains(0.0)

  private def isNumericLiteral(e: Expression): Boolean = {
    import org.apache.spark.sql.types.NumericType
    e.foldable && e.dataType.isInstanceOf[NumericType] &&
      Option(e.eval()).flatMap(numericValue).isDefined
  }

  /** The monotone-increasing wrapper matcher around the vec_dot kernel
    * (see the guard discipline comment in [[route]]). `vecOk` accepts the
    * indexed vector column; `queryOk` decides what may stand as the query
    * side — a foldable literal in the single-query shape, the query
    * table's column attribute in the batched shape. Returns the query-side
    * expression. */
  /** vec_l2dist reached through MONOTONE-increasing wrappers only (no
    * CASE guard: the distance kernel has no zero-norm branch to guard) —
    * the euclidean twin of [[monotoneDotKernel]], shared by the top-K and
    * radius arms. */
  private def monotoneL2Kernel(vecOk: Expression => Boolean)
                              (e: Expression): Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, RoundBase}
    import org.apache.spark.sql.types.NumericType
    def go(e: Expression): Option[Expression] = e match {
      case L2Distance(a, q) if vecOk(a) && q.foldable => Some(q)
      case L2Distance(q, a) if vecOk(a) && q.foldable => Some(q)
      case al: Alias => go(al.child)
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType.isInstanceOf[NumericType] => go(c.child)
      case rn: RoundBase => go(rn.children.head)
      case Divide(num, den, _) if provablyNonNegative(den) => go(num)
      case _ => None
    }
    go(e)
  }

  /** Returns (query side, metric): `"cosine"` when the unwrap path passed
    * through a division by the DATA vector column's norm (the
    * row-dependent normalization — probe by centroid cosine), `"dot"`
    * when the kernel is reached bare or through norm-free / query-side
    * positive scaling (the raw inner-product ranking of
    * `upsert/upsert.go:27`'s dotproduct metric — probe by the norm-aware
    * MIPS bound). The distinction keys on WHOSE norm divides: the QUERY
    * vector's norm is one constant for the whole ranking —
    * `dot / vec_l2norm(query)` is order-identical to bare dot and must
    * probe by the MIPS bound, where cosine-geometry probes would lose
    * exactly the high-norm vectors it ranks first; the row vector's norm
    * re-weights every row and makes the ranking angular. */
  private def monotoneDotKernel(vecOk: Expression => Boolean,
                                queryOk: Expression => Boolean)
                               (e: Expression): Option[(Expression, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Divide, RoundBase}
    import org.apache.spark.sql.types.NumericType
    def rowNormDivisor(den: Expression): Boolean = den.exists {
      case n: graft.functions.L2Norm => vecOk(n.child)
      case _ => false
    }
    def go(e: Expression, normalized: Boolean): Option[(Expression, String)] = e match {
      case DotProduct(a, q) if vecOk(a) && queryOk(q) =>
        Some((q, if (normalized) "cosine" else "dot"))
      case DotProduct(q, a) if vecOk(a) && queryOk(q) =>
        Some((q, if (normalized) "cosine" else "dot"))
      case al: Alias => go(al.child, normalized)
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType.isInstanceOf[NumericType] => go(c.child, normalized)
      case rn: RoundBase => go(rn.children.head, normalized)
      case CaseWhen(Seq((cond, value)), Some(els))
          if isLiteralZero(value) && !cond.exists(_.isInstanceOf[DotProduct]) =>
        go(els, normalized)
      case Divide(num, den, _) if provablyNonNegative(den) =>
        go(num, normalized || rowNormDivisor(den))
      case _ => None
    }
    go(e, normalized = false)
  }

  // ---- the batched window-rank shape ----------------------------------

  /** Match `Filter(rank <= k, Window(row_number() PARTITION BY q_id
    * ORDER BY score DESC))` — the q_ann_batch plan shape. */
  private def applyBatchRouting(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, w: org.apache.spark.sql.catalyst.plans.logical.Window) =>
      val routed =
        try routeBatch(cond, w)
        catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"ann batch routing declined (falling back to the unrouted plan): $e")
            None
        }
      routed match {
        case Some(newW) => f.copy(child = newW)
        case None => f
      }
  }

  /** Attempt the batched rewrite; None leaves the plan untouched.
    *
    * Semantics (pinned to q_ann_batch by the shared oracle): each query
    * ranks ONLY candidates from its own nprobe probe buckets, so the
    * injected predicate is per-(q_id, bucket) — `(q_id = id1 AND bucket
    * IN probes1) OR …` — placed directly above the index×queries join
    * (the lowest node where both attributes are in scope). A plain
    * `bucket IN (∪ probes)` on the relation ALONE would be wrong: query A
    * would rank candidates from query B's buckets that A's probe set
    * never admitted. The union filter IS also injected on the relation,
    * but only as the partition-pruning guard (the scan lists |∪ probes|
    * directories); the per-query predicate above the join enforces the
    * semantics. */
  private def routeBatch(cond: Expression,
                         w: org.apache.spark.sql.catalyst.plans.logical.Window)
      : Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, GreaterThanOrEqual, LessThan, LessThanOrEqual, Or, RowNumber, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation}
    import org.apache.spark.sql.types.{DoubleType, IntegerType => IntT, LongType => LongT}

    // 1. the filter is a rank bound `rank <= k` on w's row_number output
    val (rankAttr, k) = cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n)) => (a, n)
      case LessThan(a: AttributeReference, IntegerLiteral(n)) => (a, n - 1)
      case GreaterThanOrEqual(IntegerLiteral(n), a: AttributeReference) => (a, n)
      case _ => return None
    }
    if (k <= 0) return None
    val rankIsRowNumber = w.windowExpressions.exists {
      case a: Alias if a.exprId == rankAttr.exprId => a.child match {
        case WindowExpression(_: RowNumber, _) => true
        case _ => false
      }
      case _ => false
    }
    if (!rankIsRowNumber) return None

    // 2. single-attribute partition key; best-first DESC head order
    val partAttr = w.partitionSpec match {
      case Seq(a: AttributeReference) => a
      case _ => return None
    }
    val orderHead = w.orderSpec.headOption.getOrElse(return None)
    if (orderHead.direction != Descending) return None

    val child = w.child
    val (relation, path) = registeredScan(child).getOrElse(return None)
    val r = routeFor(planSession, path).getOrElse(return None)
    val bucketAttr = relation.output.find(_.name == "bucket").getOrElse(return None)
    if (hasUserBucketFilter(child, relation, bucketAttr)) return None

    // 3. the query block must be ONE literal table (LocalRelation — what
    // an inline VALUES list resolves to), bounded by BatchRouteCap
    val local = child.collect { case l: LocalRelation => l } match {
      case Seq(one) => one
      case _ => return None
    }
    if (local.data.isEmpty || local.data.size > BatchRouteCap) return None

    // 4. the window order key reaches the vec_dot kernel whose query side
    // is a COLUMN of the literal query table
    val resolve = aliasResolver(child)
    val key = resolve(orderHead.child, 4)
    val vecAttrOk = (a: Expression) => a match {
      case ar: AttributeReference => ar.name == r.vecCol && relation.outputSet.contains(ar)
      case _ => false
    }
    val inLocal = (e: Expression) => e match {
      case ar: AttributeReference => local.outputSet.contains(ar)
      case _ => false
    }
    val (qAttr, batchMetric) = monotoneDotKernel(vecAttrOk, inLocal)(key) match {
      case Some((ar: AttributeReference, m)) => (ar, m)
      case _ => return None
    }
    // bare-dot batched rankings probe by the MIPS bound, never by
    // cosine geometry (the single-query discipline, batch form); LSH
    // buckets only match the angular metric
    if (batchMetric != "cosine" && r.kind != "ivf") return None

    // 5. the partition key resolves to an INTEGRAL column of the same
    // literal table (its values become EqualTo literals; integral internal
    // and external representations coincide, so no conversion hazard)
    val partSrc = resolve(partAttr, 4) match {
      case ar: AttributeReference if local.outputSet.contains(ar) => ar
      case _ => return None
    }
    val qIdx = local.output.indexWhere(_.exprId == partSrc.exprId)
    val vIdx = local.output.indexWhere(_.exprId == qAttr.exprId)
    if (qIdx < 0 || vIdx < 0) return None
    val idType = local.output(qIdx).dataType
    if (idType != IntT && idType != LongT) return None

    // 6. per-query probes computed on the driver (M × the single-query
    // cost, cached as usual); any unreadable row declines
    val queries: Seq[(Any, Array[Double])] = local.data.map { row =>
      if (row.isNullAt(qIdx) || row.isNullAt(vIdx)) return None
      val vec = qAttr.dataType match {
        case ArrayType(FloatType, _) => row.getArray(vIdx).toFloatArray().map(_.toDouble)
        case ArrayType(DoubleType, _) => row.getArray(vIdx).toDoubleArray()
        case _ => return None
      }
      (row.get(qIdx, idType), vec)
    }
    val perQuery = queries.map { case (id, vec) =>
      (id, probeBuckets(spark, r, vec, batchMetric))
    }
    if (perQuery.exists(_._2.isEmpty)) return None
    val union = perQuery.flatMap(_._2).distinct
    def lits(bs: Seq[Long]) = bs.map(b => bucketLiteral(b, bucketAttr.dataType))

    // 7. inject: per-(q_id, bucket) semantics above the join; bucket-union
    // partition pruning on the relation
    val semanticPred = perQuery.map { case (id, bs) =>
      And(EqualTo(partSrc, Literal.create(id, idType)), In(bucketAttr, lits(bs)))
    }.reduce[Expression](Or(_, _))
    var injected = false
    val withSemantics = child.transformUp {
      case j: Join
          if !injected && j.outputSet.contains(bucketAttr) &&
            j.outputSet.contains(partSrc) =>
        injected = true
        Filter(semanticPred, j)
    }
    if (!injected) return None
    val pruned = withSemantics.transformUp {
      case lr: LogicalRelation if lr eq relation =>
        Filter(In(bucketAttr, lits(union)), lr)
    }
    logInfo(s"ann routing: batched rewrite over ${r.name} — " +
      s"${perQuery.size} queries, probe union [${union.mkString(", ")}]")
    Some(w.withNewChildren(Seq(pruned)))
  }

  /** Evaluate a foldable array expression to doubles (the query vector).
    * A NON-FINITE component declines (None → the brute plan stands): under
    * NaN every centroid score is NaN and the NaN-greatest tiebreak would
    * "select" an arbitrary probe set — routing would silently hand back
    * the contents of meaningless buckets, where the brute plan at least
    * applies Spark's documented NaN ordering to the full corpus. */
  private def evalVector(e: Expression): Option[Array[Double]] = e.dataType match {
    case ArrayType(et, _) if et == FloatType || et == org.apache.spark.sql.types.DoubleType =>
      Option(e.eval()).map { v =>
        val a = v.asInstanceOf[ArrayData]
        if (et == FloatType) a.toFloatArray().map(_.toDouble) else a.toDoubleArray()
      }.filter(_.forall(java.lang.Double.isFinite))
    case _ => None
  }

  /** A literal of the PARTITION column's own type — a casted attribute
    * would not prune (the loadBuckets rule). Partition-value inference
    * reads small integer buckets back as int. */
  private def bucketLiteral(b: Long, dt: DataType): Literal = dt match {
    case IntegerType => Literal(b.toInt)
    case LongType => Literal(b)
    case other => Literal.create(b, other)
  }
}
