package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** M8: a REAL (trained) frozen sequence model behind the external-
  * scorer seam — one tanh hidden layer over the flattened
  * right-aligned sequence tensor, two linear heads (Δx, Δy residual
  * vs the physics baseline — the reference's residual-learning shape,
  * `main_cuda.py:1383-1406`, applied to the NN path
  * `nn/nn-mps.py:640-652`).
  *
  * Division of labor mirrors the reference exactly: the NN TRAINS
  * outside the data engine (torch there; pure-Scala full-batch
  * gradient descent here — deterministic, dependency-free) and is
  * applied FROZEN inside it, map-side via mapPartitions, weights
  * broadcast with the closure, no shuffle. Training data is bounded
  * (one row per entity at the gate's capped scale) before the
  * driver-side fit — the same documented model-fit boundary as the
  * MLlib fits, not a hidden collect on row-level data.
  */
object MlpSeq {

  /** Frozen MLP: flat(in) -> tanh(hidden) -> (x, y). Weight layouts
    * are row-major `w1[h*nIn + i]`; the flattened input uses the
    * LinearSeqModel convention `(seqPos + offset) * nF + f` with
    * right-aligned zero-padded short sequences. */
  case class MlpSeqModel(window: Int, features: Seq[String],
                         hidden: Int,
                         inMean: Array[Double], inStd: Array[Double],
                         w1: Array[Double], b1: Array[Double],
                         w2x: Array[Double], w2y: Array[Double],
                         bx: Double, by: Double) extends Serializable {
    def nIn: Int = window * features.length

    /** Input standardization is PART of the frozen model (the
      * reference fits a StandardScaler per fold at the NN boundary,
      * `nn/nn-mps.py:908-912`): unnormalized inputs (dir_change
      * spans ±180, dist_center 0..60) saturate the tanh layer and
      * kill the fit. μ/σ come from the training set and travel with
      * the weights — no train/serve skew. */
    def predict(flat: Array[Double]): (Double, Double) = {
      var px = bx; var py = by
      var h = 0
      while (h < hidden) {
        var z = b1(h)
        var i = 0
        val off = h * nIn
        while (i < nIn) {
          z += w1(off + i) * ((flat(i) - inMean(i)) / inStd(i)); i += 1
        }
        val a = math.tanh(z)
        px += w2x(h) * a; py += w2y(h) * a
        h += 1
      }
      (px, py)
    }
  }

  /** Flatten one sequence row into the fixed right-aligned layout
    * (shared by scorer and trainer so train/serve skew is impossible). */
  private[ml] def flatten(seq: Seq[Row], window: Int, nF: Int): Array[Double] = {
    val flat = new Array[Double](window * nF)
    val offset = window - seq.length
    var p = 0
    while (p < seq.length) {
      val step = seq(p)
      var f = 0
      while (f < nF) {
        val wi = (p + offset) * nF + f
        if (wi >= 0)
          flat(wi) = if (step.isNullAt(f)) 0.0 else step.getDouble(f)
        f += 1
      }
      p += 1
    }
    flat
  }

  /** Apply the frozen model over the tensor column — the same
    * mapPartitions seam as [[SequenceScorer.score]]; appends nn_x,
    * nn_y. */
  def score(seqs: DataFrame, seqCol: String, m: MlpSeqModel): DataFrame = {
    val outSchema = StructType(seqs.schema.fields ++ Seq(
      StructField("nn_x", DoubleType), StructField("nn_y", DoubleType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val seqIdx = seqs.schema.fieldIndex(seqCol)
    val nF = m.features.length
    seqs.mapPartitions { it =>
      it.map { r =>
        val (px, py) = m.predict(flatten(r.getSeq[Row](seqIdx), m.window, nF))
        Row.fromSeq(r.toSeq ++ Seq(px, py))
      }
    }(enc)
  }

  /** Deterministic full-batch gradient-descent fit (L2 loss on both
    * heads, tanh hidden, momentum). Everything is fixed-order driver
    * arithmetic from a seeded LCG init, so identical inputs give
    * bitwise-identical weights on every run and partitioning —
    * training rows MUST be passed in a deterministic order.
    */
  def train(rows: Array[(Array[Double], Double, Double)],
            window: Int, features: Seq[String], hidden: Int,
            epochs: Int, lr: Double, seed: Long = 42L): MlpSeqModel = {
    require(rows.nonEmpty, "empty training set")
    val nIn = window * features.length
    // Fit the input scaler on the training set (σ=1 for constant
    // inputs), then train on the NORMALIZED copies.
    val inMean = new Array[Double](nIn)
    val inStd = new Array[Double](nIn)
    rows.foreach { case (f, _, _) =>
      var i = 0; while (i < nIn) { inMean(i) += f(i); i += 1 }
    }
    var i0 = 0
    while (i0 < nIn) { inMean(i0) /= rows.length; i0 += 1 }
    rows.foreach { case (f, _, _) =>
      var i = 0
      while (i < nIn) {
        val d = f(i) - inMean(i); inStd(i) += d * d; i += 1
      }
    }
    i0 = 0
    while (i0 < nIn) {
      inStd(i0) = math.sqrt(inStd(i0) / rows.length)
      if (inStd(i0) == 0.0) inStd(i0) = 1.0
      i0 += 1
    }
    val norm = rows.map { case (f, tx, ty) =>
      (Array.tabulate(nIn)(i => (f(i) - inMean(i)) / inStd(i)), tx, ty)
    }
    var s = seed
    def rnd(): Double = { // LCG on the 48-bit lattice, U(-0.5, 0.5)
      s = (s * 25214903917L + 11L) & ((1L << 48) - 1)
      (s >>> 16).toDouble / (1L << 32).toDouble - 0.5
    }
    val scale1 = math.sqrt(2.0 / nIn)
    val w1 = Array.fill(hidden * nIn)(rnd() * scale1)
    val b1 = new Array[Double](hidden)
    val scale2 = math.sqrt(2.0 / hidden)
    val w2x = Array.fill(hidden)(rnd() * scale2)
    val w2y = Array.fill(hidden)(rnd() * scale2)
    var bx = 0.0; var by = 0.0
    val mom = 0.9
    val vw1 = new Array[Double](hidden * nIn); val vb1 = new Array[Double](hidden)
    val vw2x = new Array[Double](hidden); val vw2y = new Array[Double](hidden)
    var vbx = 0.0; var vby = 0.0
    val n = rows.length
    val z = new Array[Double](hidden); val a = new Array[Double](hidden)
    val gw1 = new Array[Double](hidden * nIn); val gb1 = new Array[Double](hidden)
    val gw2x = new Array[Double](hidden); val gw2y = new Array[Double](hidden)

    for (_ <- 1 to epochs) {
      java.util.Arrays.fill(gw1, 0.0); java.util.Arrays.fill(gb1, 0.0)
      java.util.Arrays.fill(gw2x, 0.0); java.util.Arrays.fill(gw2y, 0.0)
      var gbx = 0.0; var gby = 0.0
      var r = 0
      while (r < n) {
        val (f, tx, ty) = norm(r)
        var h = 0
        var px = bx; var py = by
        while (h < hidden) {
          var zz = b1(h); var i = 0; val off = h * nIn
          while (i < nIn) { zz += w1(off + i) * f(i); i += 1 }
          z(h) = zz; a(h) = math.tanh(zz)
          px += w2x(h) * a(h); py += w2y(h) * a(h)
          h += 1
        }
        val ex = px - tx; val ey = py - ty
        gbx += ex; gby += ey
        h = 0
        while (h < hidden) {
          gw2x(h) += ex * a(h); gw2y(h) += ey * a(h)
          val dh = (ex * w2x(h) + ey * w2y(h)) * (1.0 - a(h) * a(h))
          gb1(h) += dh
          var i = 0; val off = h * nIn
          while (i < nIn) { gw1(off + i) += dh * f(i); i += 1 }
          h += 1
        }
        r += 1
      }
      val k = lr / n
      var j = 0
      while (j < hidden * nIn) {
        vw1(j) = mom * vw1(j) - k * gw1(j); w1(j) += vw1(j); j += 1
      }
      j = 0
      while (j < hidden) {
        vb1(j) = mom * vb1(j) - k * gb1(j); b1(j) += vb1(j)
        vw2x(j) = mom * vw2x(j) - k * gw2x(j); w2x(j) += vw2x(j)
        vw2y(j) = mom * vw2y(j) - k * gw2y(j); w2y(j) += vw2y(j)
        j += 1
      }
      vbx = mom * vbx - k * gbx; bx += vbx
      vby = mom * vby - k * gby; by += vby
    }
    MlpSeqModel(window, features, hidden, inMean, inStd,
      w1, b1, w2x, w2y, bx, by)
  }

  /** Collect the bounded (entity-level) training set in a
    * deterministic order and flatten — the offline-training boundary. */
  def collectTraining(joined: DataFrame, seqCol: String,
                      targetX: String, targetY: String,
                      window: Int, nF: Int): Array[(Array[Double], Double, Double)] = {
    val seqIdx = joined.schema.fieldIndex(seqCol)
    val txIdx = joined.schema.fieldIndex(targetX)
    val tyIdx = joined.schema.fieldIndex(targetY)
    joined.orderBy("game_id", "play_id", "nfl_id").collect().map { r =>
      (flatten(r.getSeq[Row](seqIdx), window, nF),
        r.getDouble(txIdx), r.getDouble(tyIdx))
    }
  }
}
