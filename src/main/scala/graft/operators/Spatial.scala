package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-frame spatial interaction operators (SURVEY.md §2.5 and the
  * GNN-lite branch §3 E1.3).
  *
  * The reference builds, per (game_id, play_id, frame_id) of ~22
  * players, dense n x n distance / angle / relative-speed matrices with
  * offense/defense/opponent masks, then per-player masked mean/min/max
  * and nearest-opponent stats (`add.txt:3-138`, `nn/nn-mps.py:315-461`).
  *
  * Two implementations, both distributed:
  *  - [[pairwiseStats]]: typed `groupByKey.flatMapGroups` kernel —
  *    preserves the per-frame-matrix semantics, n^2 <= 484 ops per
  *    group, no pair-row shuffle blow-up. Preferred at scale: the only
  *    shuffle is the groupByKey on (g,p,f), and group state is bounded
  *    by the 22-player roster.
  *  - [[pairwiseStatsRelational]]: self-join + filtered aggregations —
  *    pure built-ins; shuffles ~22x the data but stays entirely inside
  *    whole-stage codegen. Used as the oracle cross-check in tests.
  */
object Spatial {

  case class PlayerFrame(
      game_id: Long, play_id: Int, frame_id: Int, nfl_id: Int,
      x: Double, y: Double, s: Double, dir: Double, player_side: String)

  case class PairStats(
      game_id: Long, play_id: Int, frame_id: Int, nfl_id: Int,
      mean_dist_all: Option[Double], min_dist_all: Option[Double],
      max_dist_all: Option[Double],
      mean_dist_opp: Option[Double], min_dist_opp: Option[Double],
      mean_dist_team: Option[Double], min_dist_team: Option[Double],
      nearest_opp_id: Option[Int], nearest_opp_dist: Option[Double],
      nearest_opp_angle: Option[Double], nearest_opp_rel_speed: Option[Double],
      circ_mean_angle_all: Option[Double], n_others: Int)

  /** Typed per-frame kernel. Circular mean = atan2(mean sin, mean cos)
    * (`nn/nn-mps.py:395-413`); angle i->j = atan2(-dy, -dx) =
    * atan2(y_i - y_j, x_i - x_j) per `add.txt:36`; rel speed is the
    * velocity-difference MAGNITUDE sqrt(dvx^2 + dvy^2) per
    * `add.txt:37-39`; all-null guards reproduce the reference's
    * all-NaN rows (zero-count masks → NaN, `add.txt:63-97`).
    * Nearest-opponent ties break on the lower nfl_id (deterministic
    * under shuffle; the reference's nanargmin takes the first index in
    * array order, which is not stable across partitioning —
    * documented semantic choice).
    */
  def pairwiseStats(ds: Dataset[PlayerFrame]): Dataset[PairStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(p => (p.game_id, p.play_id, p.frame_id))
      .flatMapGroups { (key: (Long, Int, Int), it: Iterator[PlayerFrame]) =>
        val (g, pl, f) = key
        val players = it.toArray
        players.iterator.map { ego =>
          var sumD, sumSin, sumCos = 0.0
          var minAll, maxAll = Double.NaN
          var sumOpp, minOpp = Double.NaN
          var sumTeam, minTeam = Double.NaN
          var nOpp, nTeam, nAll = 0
          var nearId = -1
          var nearD, nearAng, nearRel = Double.NaN
          players.foreach { o =>
            if (o.nfl_id != ego.nfl_id) {
              val dx = o.x - ego.x; val dy = o.y - ego.y
              val d = math.sqrt(dx * dx + dy * dy)
              // ego-o subtraction rather than negating dy/dx: -(0.0)
              // is -0.0 and flips atan2's branch to -pi for co-linear
              // players; the subtraction form gives +0.0 -> +pi,
              // engine-portably.
              val ang = math.atan2(ego.y - o.y, ego.x - o.x)
              nAll += 1; sumD += d
              sumSin += math.sin(ang); sumCos += math.cos(ang)
              if (minAll.isNaN || d < minAll) minAll = d
              if (maxAll.isNaN || d > maxAll) maxAll = d
              val opp = o.player_side != ego.player_side
              if (opp) {
                nOpp += 1
                sumOpp = if (sumOpp.isNaN) d else sumOpp + d
                if (minOpp.isNaN || d < minOpp) minOpp = d
                if (nearId < 0 || d < nearD ||
                    (d == nearD && o.nfl_id < nearId)) {
                  nearId = o.nfl_id; nearD = d; nearAng = ang
                  nearRel = relSpeed(ego, o)
                }
              } else {
                nTeam += 1
                sumTeam = if (sumTeam.isNaN) d else sumTeam + d
                if (minTeam.isNaN || d < minTeam) minTeam = d
              }
            }
          }
          def opt(v: Double): Option[Double] = if (v.isNaN) None else Some(v)
          PairStats(g, pl, f, ego.nfl_id,
            mean_dist_all = if (nAll > 0) Some(sumD / nAll) else None,
            min_dist_all = opt(minAll), max_dist_all = opt(maxAll),
            mean_dist_opp = if (nOpp > 0) Some(sumOpp / nOpp) else None,
            min_dist_opp = opt(minOpp),
            mean_dist_team = if (nTeam > 0) Some(sumTeam / nTeam) else None,
            min_dist_team = opt(minTeam),
            nearest_opp_id = if (nearId >= 0) Some(nearId) else None,
            nearest_opp_dist = opt(nearD),
            nearest_opp_angle = opt(nearAng),
            nearest_opp_rel_speed = opt(nearRel),
            circ_mean_angle_all =
              if (nAll > 0) Some(math.atan2(sumSin / nAll, sumCos / nAll)) else None,
            n_others = nAll)
        }
      }
  }

  /** Relative speed = magnitude of the velocity difference
    * sqrt(dvx^2 + dvy^2) (reference `add.txt:37-39`). dir convention:
    * 0 deg = +y (`main_cuda.py:157-167`). */
  private def relSpeed(a: PlayerFrame, b: PlayerFrame): Double = {
    val dvx = a.s * math.sin(math.toRadians(a.dir)) -
      b.s * math.sin(math.toRadians(b.dir))
    val dvy = a.s * math.cos(math.toRadians(a.dir)) -
      b.s * math.cos(math.toRadians(b.dir))
    math.sqrt(dvx * dvx + dvy * dvy)
  }

  /** Relational equivalent of [[pairwiseStats]] — full column parity:
    * self-join within (g,p,f) + self-pair filter + filtered aggs,
    * circular mean via atan2(avg sin, avg cos), nearest-opponent via
    * row_number over (d, nb_id), and a final left join back to the
    * distinct entity keys so zero-peer entities emit an all-null row
    * with n_others=0, exactly like the typed kernel. Used to
    * cross-check the kernel (and as its DuckDB oracle SQL mirror).
    */
  def pairwiseStatsRelational(df: DataFrame): DataFrame = {
    val keys = Seq("game_id", "play_id", "frame_id")
    val ego = keys :+ "nfl_id"
    val nb = df.select(
      keys.map(col) :+ col("nfl_id").as("nb_id") :+ col("x").as("nb_x") :+
        col("y").as("nb_y") :+ col("s").as("nb_s") :+
        col("dir").as("nb_dir") :+ col("player_side").as("nb_side"): _*)
    val pairs = df.join(nb, keys)
      .filter(col("nb_id") =!= col("nfl_id"))
      .withColumn("dx", col("nb_x") - col("x"))
      .withColumn("dy", col("nb_y") - col("y"))
      .withColumn("d", sqrt(col("dx") * col("dx") + col("dy") * col("dy")))
      .withColumn("ang", atan2(col("y") - col("nb_y"), col("x") - col("nb_x")))
      .withColumn("is_opp", col("nb_side") =!= col("player_side"))
      .withColumn("rel_speed", {
        val dvx = col("s") * sin(radians(col("dir"))) -
          col("nb_s") * sin(radians(col("nb_dir")))
        val dvy = col("s") * cos(radians(col("dir"))) -
          col("nb_s") * cos(radians(col("nb_dir")))
        sqrt(dvx * dvx + dvy * dvy)
      })
    val aggs = pairs.groupBy(ego.map(col): _*)
      .agg(
        avg("d").as("mean_dist_all"),
        min("d").as("min_dist_all"),
        max("d").as("max_dist_all"),
        avg(when(col("is_opp"), col("d"))).as("mean_dist_opp"),
        min(when(col("is_opp"), col("d"))).as("min_dist_opp"),
        avg(when(!col("is_opp"), col("d"))).as("mean_dist_team"),
        min(when(!col("is_opp"), col("d"))).as("min_dist_team"),
        atan2(avg(sin(col("ang"))), avg(cos(col("ang"))))
          .as("circ_mean_angle_all"),
        count(lit(1)).cast("int").as("n_others"))
    val wOpp = Window.partitionBy(ego.map(col): _*)
      .orderBy(col("d"), col("nb_id"))
    val nearest = pairs.filter(col("is_opp"))
      .withColumn("__rn", row_number().over(wOpp))
      .filter(col("__rn") === 1)
      .select(ego.map(col) :+ col("nb_id").as("nearest_opp_id") :+
        col("d").as("nearest_opp_dist") :+ col("ang").as("nearest_opp_angle") :+
        col("rel_speed").as("nearest_opp_rel_speed"): _*)
    df.select(ego.map(col): _*).distinct()
      .join(aggs, ego, "left")
      .join(nearest, ego, "left")
      .withColumn("n_others", coalesce(col("n_others"), lit(0)))
  }

  /** GNN-lite neighbor branch (E1.3, `main_cuda.py:296-398`): from the
    * last observed frame per entity, enumerate same-frame neighbors,
    * keep K nearest within radius R, softmax-weight by distance
    * (temperature tau), aggregate weighted features, pivot top-3
    * distances wide.
    */
  def gnnLiteFeatures(lastFrames: DataFrame, k: Int = 6, radius: Double = 30.0,
                      tau: Double = 10.0): DataFrame = {
    val keys = Seq("game_id", "play_id", "frame_id")
    val nb = lastFrames.select(
      keys.map(col) :+ col("nfl_id").as("nb_id") :+ col("x").as("nb_x") :+
        col("y").as("nb_y") :+ col("s").as("nb_s") :+
        col("player_side").as("nb_side"): _*)
    val pairs = lastFrames.join(nb, keys)
      .filter(col("nb_id") =!= col("nfl_id"))
      .withColumn("d", sqrt(pow(col("nb_x") - col("x"), 2) +
        pow(col("nb_y") - col("y"), 2)))
      .filter(col("d") <= radius && !isnan(col("d")))
    val w = Window.partitionBy((keys :+ "nfl_id").map(col): _*)
      .orderBy(col("d"), col("nb_id"))  // rank method="first": deterministic tiebreak
    val ranked = pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .withColumn("w_raw", exp(-col("d") / lit(tau)))
    val wsum = Window.partitionBy((keys :+ "nfl_id").map(col): _*)
    val weighted = ranked
      .withColumn("wgt", col("w_raw") / sum(col("w_raw")).over(wsum))
    // ONE aggregation pass: the top-3 rank->column pivot rides the same
    // groupBy as the weighted stats via conditional aggregates (rnk is
    // unique per group, so max(when(rnk=k)) == first at rank k). The
    // pivot-then-rejoin form would compute the whole self-join lineage
    // twice. (The standalone pivot operator O3 is exercised by
    // o3_pivot.)
    weighted.groupBy((keys :+ "nfl_id").map(col): _*)
      .agg(
        sum(col("wgt") * col("nb_s")).as("gnn_w_speed"),
        avg(col("d")).as("gnn_mean_dist"),
        min(col("d")).as("gnn_min_dist"),
        count(lit(1)).cast("int").as("gnn_n_neighbors"),
        sum(when(col("nb_side") =!= col("player_side"), 1).otherwise(0))
          .as("gnn_n_opp"),
        max(when(col("rnk") === 1, col("d"))).as("gnn_d1"),
        max(when(col("rnk") === 2, col("d"))).as("gnn_d2"),
        max(when(col("rnk") === 3, col("d"))).as("gnn_d3"))
  }

  /** Range (band) join, net-new: pairs of rows whose numeric values lie
    * within `radius` of each other, `|left.lCol − right.rCol| <= radius`,
    * optionally within equi-key groups.
    *
    * Bucket blocking instead of a theta-join: both sides bucket by
    * floor(v/radius); each right row replicates to its bucket ± 1, the
    * join is a plain equi-join on (keys, bucket) and the exact band
    * predicate filters the candidates. Any in-band pair's buckets
    * differ by at most 1, so coverage is exact; cost is 3× the right
    * side instead of the quadratic per-key cross product a theta-join
    * plans — the difference between feasible and not at 100 TB.
    *
    * Bucketing on integer-valued columns (e.g. cents, nanos) makes
    * coverage float-proof; double columns are fine while |v/radius|
    * stays inside 2^53.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               lCol: String, rCol: String, radius: Double): DataFrame = {
    require(radius > 0)
    val lb = left.withColumn("__b",
      floor(col(lCol).cast("double") / radius).cast("long"))
    val rBucket = floor(col(rCol).cast("double") / radius).cast("long")
    val rb = right.withColumn("__b",
      explode(array(rBucket - 1, rBucket, rBucket + 1)))
    lb.join(rb, (keys :+ "__b").toSeq, "inner")
      .filter(abs(col(lCol) - col(rCol)) <= radius)
      .drop("__b")
  }
}
