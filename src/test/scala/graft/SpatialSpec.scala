package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial
import graft.operators.Spatial.PlayerFrame

/** The typed pairwise kernel vs its relational twin — full column
  * parity on randomized frames, plus edge cases (single player, no
  * opponents, exact ties). */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def randomFrames(seed: Int, nGames: Int = 3, nPlayers: Int = 8) = {
    val rng = new scala.util.Random(seed)
    for {
      g <- 1 to nGames; p <- 0 until 2; f <- 1 to 2; n <- 0 until nPlayers
    } yield PlayerFrame(g.toLong, p, f, n,
      rng.nextDouble() * 120, rng.nextDouble() * 53.3,
      rng.nextDouble() * 10, rng.nextDouble() * 360,
      if (n % 2 == 0) "Offense" else "Defense")
  }

  test("kernel == relational on randomized frames (all columns)") {
    val ds = spark.createDataset(randomFrames(7))
    val typed = Spatial.pairwiseStats(ds).toDF()
    val rel = Spatial.pairwiseStatsRelational(ds.toDF())
    val keys = Seq("game_id", "play_id", "frame_id", "nfl_id")
    val numCols = typed.columns.filterNot(keys.contains)
      .filterNot(_ == "nearest_opp_id")
    assert(typed.count() == rel.count())
    val j = typed.as("t").join(rel.as("r"), keys)
    assert(j.count() == typed.count())
    for (c <- numCols) {
      val bad = j.filter(
        !(col(s"t.$c").isNull && col(s"r.$c").isNull) &&
          abs(col(s"t.$c") - col(s"r.$c")) > 1e-9).count()
      assert(bad == 0, s"column $c differs")
    }
    val badId = j.filter(
      !(col("t.nearest_opp_id").isNull && col("r.nearest_opp_id").isNull) &&
        col("t.nearest_opp_id") =!= col("r.nearest_opp_id")).count()
    assert(badId == 0)
  }

  test("single-player frame: kernel and relational both emit n_others=0 row") {
    val ds = spark.createDataset(Seq(
      PlayerFrame(1L, 1, 1, 42, 10.0, 10.0, 1.0, 0.0, "Offense")))
    val typed = Spatial.pairwiseStats(ds).toDF().collect()
    val rel = Spatial.pairwiseStatsRelational(ds.toDF()).collect()
    assert(typed.length == 1 && rel.length == 1)
    assert(typed(0).getAs[Int]("n_others") == 0)
    assert(rel(0).getAs[Int]("n_others") == 0)
    assert(typed(0).isNullAt(typed(0).fieldIndex("mean_dist_all")))
    assert(rel(0).isNullAt(rel(0).fieldIndex("mean_dist_all")))
  }

  test("all-teammate frame: opponent stats null, team stats present") {
    val ds = spark.createDataset(Seq(
      PlayerFrame(1L, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "Offense"),
      PlayerFrame(1L, 1, 1, 2, 3.0, 4.0, 1.0, 0.0, "Offense")))
    val r = Spatial.pairwiseStats(ds).filter(_.nfl_id == 1).head()
    assert(r.mean_dist_opp.isEmpty && r.nearest_opp_id.isEmpty)
    assert(r.mean_dist_team.contains(5.0))
    assert(r.n_others == 1)
  }

  test("nearest-opponent tie breaks on lower nfl_id") {
    val ds = spark.createDataset(Seq(
      PlayerFrame(1L, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "Offense"),
      PlayerFrame(1L, 1, 1, 9, 5.0, 0.0, 1.0, 0.0, "Defense"),
      PlayerFrame(1L, 1, 1, 3, -5.0, 0.0, 1.0, 0.0, "Defense")))
    val r = Spatial.pairwiseStats(ds).filter(_.nfl_id == 1).head()
    assert(r.nearest_opp_id.contains(3))
  }

  test("gnnLite: neighbor weights sum to 1 and top-3 pivot is ordered") {
    val ds = spark.createDataset(randomFrames(11, nGames = 2)).toDF()
      .filter(col("frame_id") === 1)
    val g = Spatial.gnnLiteFeatures(ds)
    val bad = g.filter(col("gnn_d1") > col("gnn_d2") ||
      col("gnn_d2") > col("gnn_d3")).count()
    assert(bad == 0)
    // weighted speed must lie within [min, max] neighbor speed range 0..10
    assert(g.filter(col("gnn_w_speed") < 0 || col("gnn_w_speed") > 10).count() == 0)
  }
}
