package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Connected components (large-star/small-star) vs a brute-force
  * union-find oracle, plus dup-cluster resolution semantics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find for the expected labeling. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to its minimum") {
    val got = run(Seq((4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate minima") {
    val got = run(Seq((1L, 2L), (5L, 6L), (6L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = run(Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(got == Map(2L -> 2L, 3L -> 2L))
  }

  test("empty edge set yields empty labeling") {
    assert(run(Seq.empty).isEmpty)
  }

  test("matches union-find on a pseudo-random graph") {
    // Deterministic LCG so the test is reproducible.
    var s = 12345L
    def next(n: Int): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s % n }
    val edges = (1 to 300).map(_ => (next(120), next(120))).filter(e => e._1 != e._2)
    assert(run(edges) == unionFind(edges))
  }

  test("reliable checkpointing: d_components shape with a checkpoint dir") {
    // The production fault-tolerance path: with a checkpoint dir the
    // per-round state goes through eager reliable checkpoint() (files
    // on the fault-tolerant store) instead of executor-local blocks.
    // Same labeling as the default path, and the dir must actually
    // receive checkpoint data.
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ck").toString
    val docs = graft.queries.Q.documents(spark, "/root/testdata/sf0.001")
    val expected = Graph.dupClusters(docs, "doc_id", "text",
        threshold = 0.6, bandRows = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Graph.dupClusters(docs, "doc_id", "text",
        threshold = 0.6, bandRows = 6, checkpointDir = Some(ckDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "reliable-checkpoint run must match default")
    val written = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(written > 0, "checkpoint dir must contain checkpoint files")
  }

  test("long path (worst case for naive propagation) converges") {
    val n = 513L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("scale smoke: dupClusters at 16x with planted duplicate structure") {
    import org.apache.spark.sql.functions._
    // 16 identical copies of each base doc (disjoint id ranges): every
    // base text must resolve to ONE cluster of exactly 16 with the
    // minimum id as representative.
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 30)
      .dropDuplicates("text")
      .limit(40).cache()
    val nBase = base.count()
    val big = (0 until 16).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
    val clusters = graft.operators.Graph
      .dupClusters(big, "doc_id", "text", threshold = 0.9, bandRows = 6)
    val sizes = clusters.groupBy("cluster_rep")
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.size == nBase, s"expected $nBase clusters, got ${sizes.size}")
    assert(sizes.values.forall(_ == 16L), "every cluster must have all 16 copies")
    assert(sizes.keys.forall(_ < 1000000L), "rep must be the copy-0 (minimum) id")
    base.unpersist()
  }

  test("pageRank: exact fixed-point iteration, hand-computed, partition-free") {
    import org.apache.spark.sql.functions._
    // Path 1-2-3 symmetric. Iter 1 from uniform r=1e6: node 2 has
    // deg 2 (share 500000 each way), nodes 1,3 have deg 1 (share 1e6
    // to node 2). r1(1)=r1(3)=150000+85*500000/100=575000;
    // r1(2)=150000+85*2000000/100=1850000. Five iterations must be
    // bit-identical regardless of input partitioning.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val one = graft.operators.Graph.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    val five = graft.operators.Graph.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fiveShuffled = graft.operators.Graph
      .pageRank(edges.repartition(7, col("dst")), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(five == fiveShuffled, "integer lattice must kill partition-order drift")
    // symmetric path: ends stay equal, center dominates, mass bounded
    assert(five(1L) == five(3L) && five(2L) > five(1L))
    assert(five.values.forall(v => v >= 150000L && v <= 3000000L))
  }

  test("dupClusters: transitive chain resolved, singletons kept") {
    // 1~2 and 2~3 are near-dups but 1~3 may not pair directly; all
    // three must share one cluster_rep = 1. Doc 4 is a singleton.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "a the quick brown fox jumps over the lazy dog again and again!"),
      (4L, "completely different content about spark engines at scale")
    ).toDF("doc_id", "text")
    val got = Graph.dupClusters(docs, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 1L)))
  }

  test("triangles: K4 plus a pendant edge, each triangle once") {
    // Complete graph on {1,2,3,4} has C(4,3)=4 triangles; the pendant
    // 4-5 edge adds none. Input is deliberately unnormalized (both
    // orientations, a duplicate, a self-loop).
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 4L), (4L, 5L), (5L, 5L)
    ).toDF("a", "b")
    val got = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: triangle-free bipartite graph yields zero") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("a", "b")
    assert(Graph.triangles(edges).isEmpty)
  }

  test("scale smoke: triangles at 16x planted K4 blocks + a hub") {
    // 64 disjoint K4 blocks (4 triangles each) plus one hub node wired
    // to every block's node 0 — the hub has degree 64 but closes no
    // triangle, exercising the degree-ordering's hub handling: wedges
    // through the hub must be generated from the LOW-degree endpoints,
    // not fan out of the hub.
    val copies = 64
    val k4 = for {
      c <- 0 until copies; i <- 0 until 4; j <- (i + 1) until 4
    } yield (c * 10L + i, c * 10L + j)
    val hub = (0 until copies).map(c => (999999L, c * 10L))
    val t = Graph.triangles((k4 ++ hub).toDF("a", "b"))
    assert(t.count() == 4L * copies)
  }
}
