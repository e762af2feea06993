package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.functions.Scalars
import graft.operators.{Dedup, Temporal}

/** ScalaCheck properties over the Spark operators (batched: each trial
  * evaluates a whole generated column through one Spark job). */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val finite = Gen.chooseNum(-720.0, 720.0)
  // angleWrap's domain is single-turn deltas (difference of two angles
  // in [0,360)), exactly the reference's input range — it wraps once.
  private val delta = Gen.chooseNum(-359.999, 359.999)

  property("angleWrap lands in (-180, 180] and preserves angle mod 360") =
    forAll(Gen.listOfN(40, delta)) { xs =>
      xs.isEmpty || {
        val out = xs.toDF("c").select(Scalars.angleWrap(col("c")).as("w"),
          col("c")).collect()
        out.forall { r =>
          val (w, c) = (r.getDouble(0), r.getDouble(1))
          w > -180.0 - 1e-9 && w <= 180.0 + 1e-9 &&
            math.abs(math.IEEEremainder(w - c, 360.0)) < 1e-6
        }
      }
    }

  property("clip is idempotent and bounded") =
    forAll(Gen.listOfN(30, finite)) { xs =>
      xs.isEmpty || {
        val out = xs.toDF("c").select(
          Scalars.clip(col("c"), lit(-50.0), lit(75.0)).as("one"),
          Scalars.clip(Scalars.clip(col("c"), lit(-50.0), lit(75.0)),
            lit(-50.0), lit(75.0)).as("two")).collect()
        out.forall(r => r.getDouble(0) >= -50.0 && r.getDouble(0) <= 75.0 &&
          r.getDouble(0) == r.getDouble(1))
      }
    }

  private val word = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.choose('a', 'z')).map(_.mkString))
  private val text = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  property("ngram jaccard in [0,1], 1 on self, symmetric") =
    forAll(Gen.listOfN(8, Gen.zip(text, text))) { pairs =>
      pairs.isEmpty || {
        val out = pairs.toDF("a", "b").select(
          Dedup.ngramJaccard(col("a"), col("b")).as("ab"),
          Dedup.ngramJaccard(col("b"), col("a")).as("ba"),
          Dedup.ngramJaccard(col("a"), col("a")).as("aa"),
          length(regexp_replace(lower(col("a")), "[^a-z ]", "")).as("la")).collect()
        out.forall { r =>
          val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
          ab >= 0.0 && ab <= 1.0 && math.abs(ab - ba) < 1e-12 &&
            (aa == 1.0 || r.getInt(3) < 3) // self-sim 1 unless no grams exist
        }
      }
    }

  property("emaScan output equals the sequential fold, any group sizes") =
    forAll(Gen.listOfN(3, Gen.chooseNum(1, 15)),
      Gen.chooseNum(0.05, 0.95)) { (sizes, alpha) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(t => (s"g$g", t, (g * 31 + t * 7 % 13) * 1.0))
      }
      rows.isEmpty || {
        val got = Temporal.emaScan(rows.toDF("k", "t", "v"),
          Seq("k"), Seq("t"), "v", alpha, "ema")
          .orderBy("k", "t").select("k", "ema").collect()
          .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toList)
        val expect = rows.groupBy(_._1).view.mapValues { rs =>
          rs.sortBy(_._2).map(_._3)
            .scanLeft(Option.empty[Double]) {
              case (None, x) => Some(x)
              case (Some(e), x) => Some(alpha * x + (1 - alpha) * e)
            }.flatten.toList
        }
        expect.forall { case (k, exp) =>
          got(k).zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-9 }
        }
      }
    }
}
