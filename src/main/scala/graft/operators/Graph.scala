package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components for duplicate-cluster resolution.
  *
  * Near-dup detection ([[Dedup.nearDuplicates]]) emits an EDGE LIST of
  * verified pairs, but "keep one doc per duplicate group" needs the
  * transitive closure: if A~B and B~C, then {A,B,C} is ONE group even
  * when A~C was never emitted (chain duplicates are common — v1~v2~v3
  * of the same page). Resolving that closure is a connected-components
  * problem on a graph with billions of edges at 100 TB, so the driver
  * must never see the graph: this is the alternating large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14), where every round is a pair of
  * groupBy shuffles on node ids and the edge set monotonically
  * contracts toward a star forest in O(log n) rounds.
  *
  * Scale notes:
  *  - each round's state is ONE (src, dst) edge table; superseded
  *    localCheckpoint blocks are reclaimed by Spark's ContextCleaner
  *    once the driver drops the reference (deferred, GC-paced). With
  *    a RELIABLE checkpoint dir the files are only auto-deleted when
  *    the session was LAUNCHED with
  *    spark.cleaner.referenceTracking.cleanCheckpoints=true (default
  *    false, and read at SparkContext construction — a library
  *    cannot flip it later); otherwise one directory per round
  *    accumulates until the dir is cleaned externally, which a
  *    multi-hour production run must budget for;
  *  - the convergence check is an exact set comparison (two left-anti
  *    counts) on the cached tables — no driver-side data movement;
  *  - hot nodes (a component min with millions of members) appear only
  *    as the VALUE side of the final star edges, never as a groupBy
  *    key with unbounded fan-in: large-star groups by each node's own
  *    id, and a node's degree in the contracted graph shrinks every
  *    round (the paper's load-balance argument).
  */
object Graph {

  /** Lineage-truncation point for the iterative algorithms. With no
    * checkpoint dir: `localCheckpoint` (executor-local blocks, fast —
    * the right default for a healthy cluster; lost with a lost
    * executor, in which case the job recomputes from scratch). With a
    * dir: RELIABLE `checkpoint()` — eager write to the fault-tolerant
    * store (HDFS/S3 on a real cluster), which survives executor loss
    * and bounds executor storage — the production setting for huge
    * graphs where a multi-hour CC/PageRank job must not restart on
    * one lost node. The dir is installed via
    * `sparkContext.setCheckpointDir` once per session. NOTE: the
    * checkpoint FILES themselves accumulate one dir per round unless
    * the session was launched with
    * spark.cleaner.referenceTracking.cleanCheckpoints=true (see the
    * class doc) — plan dir cleanup accordingly.
    */
  private def truncate(df: DataFrame,
                       checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  /** Connected components of an undirected graph given as an edge list
    * with BIGINT-comparable columns `a`, `b` (self-loops ignored).
    * Returns (node, component) for every node that appears in an edge;
    * `component` is the minimum node id of the component. Callers with
    * isolated nodes left-join and coalesce to the node's own id.
    *
    * @param maxIter safety bound; the algorithm provably converges in
    *   O(log n) rounds, so 25 covers any graph that fits in storage.
    *   Throws if the bound is hit (a correctness guard, not a budget).
    * @param checkpointDir when set, per-round state is RELIABLY
    *   checkpointed there (see [[truncate]]) instead of
    *   executor-locally.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    // Each round substitutes `cur` into largeStar/smallStar several
    // times, so the LOGICAL plan would grow ~9x per round — after a
    // handful of rounds planning itself stack-overflows. The truncate
    // point cuts lineage to the materialized partitions (the standard
    // iterative-algorithm pattern). Superseded LOCAL checkpoints are
    // dropped by reference (ContextCleaner); RELIABLE checkpoint
    // files persist unless the session was launched with
    // spark.cleaner.referenceTracking.cleanCheckpoints=true — see
    // the class doc's scale notes.
    var cur = truncate(edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct(), checkpointDir)
    var curCount = cur.count()
    var converged = curCount == 0
    var it = 0
    while (!converged && it < maxIter) {
      val next = truncate(smallStar(largeStar(cur)), checkpointDir)
      val nextCount = next.count()
      // Exact set equality on two distinct sets: same count and no
      // element of next outside cur.
      converged = nextCount == curCount &&
        next.join(cur, Seq("a", "b"), "left_anti").isEmpty
      cur = next
      curCount = nextCount
      it += 1
    }
    if (!converged && it >= maxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // Converged state is a star forest: every edge is (member, root).
    // Roots appear only on the b side — add their self-assignments.
    cur.select(col("a").as("node"), col("b").as("component"))
      .union(cur.select(col("b").as("node"), col("b").as("component")))
      .distinct()
  }

  /** Large-star: every node links its LARGER neighbors to the minimum
    * of its neighborhood (including itself). Keeps component minima
    * reachable while cutting long chains in half each round. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a"), col("b"))
      .union(e.select(col("b").as("a"), col("a").as("b")))
    val m = sym.groupBy("a")
      .agg(min(col("b")).as("__mn"))
      .select(col("a"), least(col("__mn"), col("a")).as("__m"))
    sym.join(m, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("__m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star: every node links its SMALLER-or-equal neighbors (and
    * itself) to the minimum among them — flattens local trees into
    * stars. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
        greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val m = oriented.groupBy("u").agg(min(col("v")).as("__m"))
    val pointed = oriented.join(m, "u")
      .select(col("v").as("a"), col("__m").as("b"))
    val self = m.select(col("u").as("a"), col("__m").as("b"))
    pointed.union(self)
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Distributed PageRank in exact-integer fixed-point — link analysis
    * for source/domain authority scoring over a directed edge list
    * (src, dst). Pregel-shape per iteration: ranks join edges on src
    * (one keyed shuffle), shares aggregate on dst (second keyed
    * shuffle), nothing ever visits the driver; `localCheckpoint` per
    * round truncates the iterative plan exactly as in
    * [[connectedComponents]]. Edges and degrees are computed once and
    * cached.
    *
    * Determinism: the textbook float recursion would inherit shuffle
    * summation order — instead ranks live on an integer lattice
    * (`scale` = one unit of rank mass) and every step is exact:
    * share = r DIV deg (exact long division), incoming = BIGINT sum
    * (exact in any engine regardless of order), next
    * r = 15·scale/100 + (85·incoming) DIV 100. Bit-identical results
    * on every engine and every cluster size — the property float
    * PageRank fundamentally lacks. Damping is the standard 0.85 as
    * the exact rational 85/100; dangling-node mass is dropped (not
    * redistributed), the common large-graph simplification.
    *
    * Overflow bound: 85 · (total rank mass) must stay below 2^63 —
    * total mass ≤ n_nodes · scale, so scale=1e6 is safe to ~1e11
    * nodes. A mirroring engine whose BIGINT sum widens (DuckDB →
    * HUGEINT) must cast back before the multiply.
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000L,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && scale >= 100)
    val p = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // Edge cache pre-partitioned on src (round 11): every iteration
    // joins e⋈shares on src, and a cache partitioned on (src, dst) —
    // distinct's layout — would re-Exchange the EDGE table per
    // iteration. Partitioned on src, only the (node-scale) shares
    // side moves; the edge side reads cached blocks in place. One
    // extra exchange at build, iters exchanges of the edge table
    // saved — the dominant byte-mover at 100 TB.
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().repartition(p, col("src")).cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // Rank state carries the node's out-degree (null = dangling) so
    // the per-iteration share step is a narrow projection — the
    // former ranks⋈degrees join re-shuffled the whole rank table
    // once per iteration for a value that never changes (round 11).
    val nodes = truncate(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(deg.select(col("src").as("node"), col("__deg")),
        Seq("node"), "left"), checkpointDir)
    val base = lit(15L * scale / 100L)
    var r = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      // inner join semantics of the former ranks⋈degrees: nodes with
      // no out-edges contribute no share rows
      val shares = r.filter(col("__deg").isNotNull)
        .select(col("node").as("src"), expr("r DIV __deg").as("__share"))
      val inc = e.join(shares, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__share")).as("__in"))
      // Measured (sf0.1, local[32]): materializing each round beats
      // pipelining several rounds into one deep job (5.4 s vs 8.5 s
      // warm) — each round's exchange then feeds AQE a concrete
      // size, and the deep chained-join alternative re-plans the
      // whole prefix per action.
      r = truncate(nodes.join(inc, Seq("node"), "left")
        .select(col("node"), col("__deg"),
          (base + expr("85 * coalesce(__in, 0L) DIV 100")).as("r")),
        checkpointDir)
    }
    e.unpersist()
    r.select(col("node"), col("r"))
  }

  /** Personalized PageRank on the same exact-integer lattice as
    * [[pageRank]] — teleport mass flows ONLY to the seed set, so the
    * fixed point measures proximity to the seeds (the "related
    * items / similar users" primitive behind graph-based recommen-
    * dation and expansion queries). Identical Pregel-shape shuffles,
    * identical determinism argument: share = r DIV deg, incoming is
    * an exact BIGINT sum, base mass 15·scale/100 lands on seeds
    * only. Bit-identical across engines and partitionings.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int, scale: Long = 1000000L,
                           checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && scale >= 100)
    val p = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // same round-11 shape as [[pageRank]]: edge cache pre-partitioned
    // on src; degree carried in the rank state
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().repartition(p, col("src")).cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val sd = seeds.select(col("seed").cast("long").as("node"))
      .distinct().withColumn("__isSeed", lit(1L))
    val nodes = truncate(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(sd, Seq("node"), "left")
        .join(deg.select(col("src").as("node"), col("__deg")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__isSeed"), lit(0L)).as("is_seed"), col("__deg")),
      checkpointDir)
    val base = when(col("is_seed") === 1L, lit(15L * scale / 100L))
      .otherwise(lit(0L))
    var r = nodes.withColumn("r",
      when(col("is_seed") === 1L, lit(scale)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val shares = r.filter(col("__deg").isNotNull)
        .select(col("node").as("src"), expr("r DIV __deg").as("__share"))
      val inc = e.join(shares, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__share")).as("__in"))
      r = truncate(nodes.join(inc, Seq("node"), "left")
        .select(col("node"), col("is_seed"), col("__deg"),
          (base + expr("85 * coalesce(__in, 0L) DIV 100")).as("r")),
        checkpointDir)
    }
    e.unpersist()
    r.select(col("node"), col("is_seed"), col("r"))
  }

  /** Exact triangle enumeration of an undirected graph — the classic
    * degree-ordered (rank-ordered) algorithm: orient every edge from
    * the lower-(degree, id) endpoint to the higher, generate wedges
    * only from each node's OUT-edges, and close each wedge against the
    * oriented edge set. Each triangle {x,y,z} (ranks x<y<z) is emitted
    * exactly once, from apex x.
    *
    * Scale: orientation bounds every node's out-degree by O(√m)
    * (a node of degree d > √2m has all its out-neighbors of degree
    * ≥ d, and there are < √2m such nodes), so wedge generation is
    * O(m^1.5) total work — the well-known bound that makes exact
    * triangle counting feasible on skewed graphs where the naive
    * three-way join explodes on hub nodes. Three keyed shuffles
    * (degree agg, wedge self-join on src, closing semi-join); nothing
    * visits the driver. Input columns `a`, `b`; self-loops dropped.
    * Returns one row (n1, n2, n3) per triangle, endpoints sorted by id.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("a"), col("b")).cast("long").as("a"),
        greatest(col("a"), col("b")).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("n")).agg(count(lit(1)).as("d"))
    // Oriented edges carry both endpoint degrees so the wedge join can
    // rank-order its two legs without re-joining degrees.
    val oriented = sym
      .join(deg.select(col("n").as("a"), col("d").as("ds")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("dd")), "b")
      .filter(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"), col("dd"))
      .cache()
    val left = oriented.select(col("src"), col("dst").as("w_b"), col("dd").as("db"))
    val right = oriented.select(col("src"), col("dst").as("w_c"), col("dd").as("dc"))
    val wedges = left.join(right, "src")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("w_b") < col("w_c")))
      .select(col("src").as("apex"), col("w_b"), col("w_c"))
    val tris = wedges.join(
      oriented.select(col("src").as("w_b"), col("dst").as("w_c")),
      Seq("w_b", "w_c"), "left_semi")
    val res = tris.select(
      least(col("apex"), col("w_b"), col("w_c")).as("n1"),
      (col("apex") + col("w_b") + col("w_c")
        - least(col("apex"), col("w_b"), col("w_c"))
        - greatest(col("apex"), col("w_b"), col("w_c"))).as("n2"),
      greatest(col("apex"), col("w_b"), col("w_c")).as("n3"))
    res
  }

  /** Duplicate-cluster resolution over a document table: near-dup
    * pairs → connected components → one row per doc with its cluster
    * representative (component-minimum id) and cluster size. Docs with
    * no near-dup are their own singleton cluster. The downstream
    * "drop all but the representative" filter is then
    * `doc_id = cluster_rep` — transitive-closure-correct, unlike
    * dropping the larger side of each raw pair.
    *
    * Inherits [[Dedup.nearDuplicates]]'s per-doc candidate cap
    * (`maxCandPerDoc`, default [[Dedup.MaxCandPerDoc]]): a missed
    * pair can split a true cluster in two — pass `Int.MaxValue` for
    * uncapped recall on corpora small enough to afford it. */
  def dupClusters(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double,
                  bandRows: Int = Dedup.DefaultBandRows,
                  checkpointDir: Option[String] = None,
                  maxCandPerDoc: Int = Dedup.MaxCandPerDoc): DataFrame = {
    val pairs = Dedup
      .nearDuplicates(df, idCol, textCol, threshold, bandRows,
        maxCandPerDoc)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = connectedComponents(pairs, checkpointDir = checkpointDir)
    val labeled = df.select(col(idCol).cast("long").as("node"))
      .join(comp, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("component"), col("node")).as("cluster_rep"))
    // Cluster size by one count-agg on the rep (tiny: ids only).
    val sizes = labeled.groupBy("cluster_rep")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_rep")
      .select(col(idCol), col("cluster_rep"), col("cluster_size"))
  }
}
