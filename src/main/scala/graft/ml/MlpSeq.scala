package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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
  private[graft] def flatten(seq: Seq[Row], window: Int, nF: Int): Array[Double] = {
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

  /** Fixed-point accumulation lattices. Every per-row contribution
    * (gradient component, scaler sum/square) rounds to a lattice tick
    * BEFORE summation, and the sums are LONGs — associative and
    * commutative — so ANY accumulation order (sequential driver loop,
    * per-partition then merge, any partitioning) produces bitwise-
    * identical totals. This is what makes the distributed trainer
    * equal the driver trainer bit for bit.
    *
    * Headroom: |contribution| · scale · rows must stay below 2^63.
    * GradScale 2^26 supports |contrib| ≤ ~1e3 over ~1e8 rows (the
    * contributions are O(1): inputs are standardized and errors are
    * yard-scale residuals). The VARIANCE lattice cannot be fixed —
    * per-feature squared deviations span ~1e-6 (near-constant
    * features, which a coarse lattice would zero out, silently
    * un-normalizing that feature) to ~3e4 (±180° angles) — so its
    * scale is chosen PER FEATURE from an exact max-|deviation| pass:
    * the largest power of two keeping dmax² · scale · n < 2^62.
    * max() is associative and exact, so the chosen scale (and hence
    * every bit downstream) is still partitioning-independent. */
  private val GradScale = (1L << 26).toDouble
  private val MeanScale = (1L << 26).toDouble

  private def varScaleFor(dmax: Double, n: Long): Double = {
    val cap = math.pow(2.0, 62) / math.max(n.toDouble, 1.0)
    val d2 = math.max(dmax * dmax, java.lang.Double.MIN_NORMAL)
    // floor to a power of two: exact, and multiplication by it is a
    // pure exponent shift (no mantissa rounding in d*d*scale inputs)
    val e = math.min(512, math.getExponent(cap / d2))
    math.pow(2.0, e)
  }

  /** Gradient buffer layout: w1 | b1 | w2x | w2y | bx | by. */
  private def gradLen(hidden: Int, nIn: Int): Int =
    hidden * nIn + 3 * hidden + 2

  /** Forward + backward for ONE normalized row, adding lattice-rounded
    * contributions into `g` (shared verbatim by the driver and the
    * distributed trainer so they cannot diverge). `a` is a reusable
    * hidden-activation scratch buffer. */
  private def accumRow(f: Array[Double], tx: Double, ty: Double,
      hidden: Int, nIn: Int, w1: Array[Double], b1: Array[Double],
      w2x: Array[Double], w2y: Array[Double], bx: Double, by: Double,
      a: Array[Double], g: Array[Long]): Unit = {
    var h = 0
    var px = bx; var py = by
    while (h < hidden) {
      var zz = b1(h); var i = 0; val off = h * nIn
      while (i < nIn) { zz += w1(off + i) * f(i); i += 1 }
      a(h) = math.tanh(zz)
      px += w2x(h) * a(h); py += w2y(h) * a(h)
      h += 1
    }
    val ex = px - tx; val ey = py - ty
    val nW1 = hidden * nIn
    g(nW1 + 3 * hidden) += math.rint(ex * GradScale).toLong
    g(nW1 + 3 * hidden + 1) += math.rint(ey * GradScale).toLong
    h = 0
    while (h < hidden) {
      g(nW1 + hidden + h) += math.rint(ex * a(h) * GradScale).toLong
      g(nW1 + 2 * hidden + h) += math.rint(ey * a(h) * GradScale).toLong
      val dh = (ex * w2x(h) + ey * w2y(h)) * (1.0 - a(h) * a(h))
      g(nW1 + h) += math.rint(dh * GradScale).toLong
      var i = 0; val off = h * nIn
      while (i < nIn) {
        g(off + i) += math.rint(dh * f(i) * GradScale).toLong; i += 1
      }
      h += 1
    }
  }

  /** Mutable training state: weights + momentum velocities, with the
    * shared seeded-LCG init and the shared momentum update. */
  private final class State(val hidden: Int, val nIn: Int, seed: Long) {
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
    val vw1 = new Array[Double](hidden * nIn)
    val vb1 = new Array[Double](hidden)
    val vw2x = new Array[Double](hidden); val vw2y = new Array[Double](hidden)
    var vbx = 0.0; var vby = 0.0
    private val mom = 0.9

    def applyUpdate(g: Array[Long], n: Long, lr: Double): Unit = {
      val k = lr / n / GradScale
      val nW1 = hidden * nIn
      var j = 0
      while (j < nW1) {
        vw1(j) = mom * vw1(j) - k * g(j); w1(j) += vw1(j); j += 1
      }
      j = 0
      while (j < hidden) {
        vb1(j) = mom * vb1(j) - k * g(nW1 + j); b1(j) += vb1(j)
        vw2x(j) = mom * vw2x(j) - k * g(nW1 + hidden + j)
        w2x(j) += vw2x(j)
        vw2y(j) = mom * vw2y(j) - k * g(nW1 + 2 * hidden + j)
        w2y(j) += vw2y(j)
        j += 1
      }
      vbx = mom * vbx - k * g(nW1 + 3 * hidden); bx += vbx
      vby = mom * vby - k * g(nW1 + 3 * hidden + 1); by += vby
    }

    def model(window: Int, features: Seq[String], inMean: Array[Double],
        inStd: Array[Double]): MlpSeqModel =
      MlpSeqModel(window, features, hidden, inMean, inStd,
        w1, b1, w2x, w2y, bx, by)
  }

  private def stdFromVar(varL: Long, n: Long, vScale: Double): Double = {
    val v = math.sqrt(varL / vScale / n)
    if (v == 0.0) 1.0 else v
  }

  /** Deterministic full-batch gradient-descent fit (L2 loss on both
    * heads, tanh hidden, momentum) over an in-memory array — the
    * reference twin of [[trainDistributed]]. Gradients accumulate on
    * the fixed-point lattice, so this and the distributed trainer
    * produce BITWISE-identical models from the same rows in any
    * order (the spec asserts it). */
  def train(rows: Array[(Array[Double], Double, Double)],
            window: Int, features: Seq[String], hidden: Int,
            epochs: Int, lr: Double, seed: Long = 42L): MlpSeqModel = {
    require(rows.nonEmpty, "empty training set")
    val nIn = window * features.length
    val n = rows.length.toLong
    // scaler on the lattice (exact longs — same bits as distributed)
    val sumL = new Array[Long](nIn)
    rows.foreach { case (f, _, _) =>
      var i = 0
      while (i < nIn) {
        sumL(i) += math.rint(f(i) * MeanScale).toLong; i += 1
      }
    }
    val inMean = Array.tabulate(nIn)(i => sumL(i) / MeanScale / n)
    val dmax = new Array[Double](nIn)
    rows.foreach { case (f, _, _) =>
      var i = 0
      while (i < nIn) {
        val d = math.abs(f(i) - inMean(i))
        if (d > dmax(i)) dmax(i) = d
        i += 1
      }
    }
    val vScale = Array.tabulate(nIn)(i => varScaleFor(dmax(i), n))
    val varL = new Array[Long](nIn)
    rows.foreach { case (f, _, _) =>
      var i = 0
      while (i < nIn) {
        val d = f(i) - inMean(i)
        varL(i) += math.rint(d * d * vScale(i)).toLong; i += 1
      }
    }
    val inStd = Array.tabulate(nIn)(i => stdFromVar(varL(i), n, vScale(i)))
    val norm = rows.map { case (f, tx, ty) =>
      (Array.tabulate(nIn)(i => (f(i) - inMean(i)) / inStd(i)), tx, ty)
    }
    val st = new State(hidden, nIn, seed)
    val a = new Array[Double](hidden)
    for (_ <- 1 to epochs) {
      val g = new Array[Long](gradLen(hidden, nIn))
      norm.foreach { case (f, tx, ty) =>
        accumRow(f, tx, ty, hidden, nIn, st.w1, st.b1, st.w2x, st.w2y,
          st.bx, st.by, a, g)
      }
      st.applyUpdate(g, n, lr)
    }
    st.model(window, features, inMean, inStd)
  }

  /** Distributed trainer: the per-epoch full-batch gradient is an
    * exact fixed-point sum over a cached Dataset — per-partition
    * Array[Long] accumulators merged on the driver (p × ~2k longs of
    * METADATA per epoch, never row-level data; the old collectTraining
    * pulled the whole training frame to the driver). Long sums are
    * order-independent, so the model is bitwise-equal to [[train]] on
    * the same rows and bit-stable across reruns and repartitionings.
    *
    * Small-input fast path: below [[LocalEpochThreshold]] rows the
    * epoch loop runs over a bounded driver-side copy of the
    * NORMALIZED rows instead of scheduling `epochs` Spark jobs —
    * per-epoch job overhead (~0.1 s) otherwise dwarfs the ~ms of
    * gradient math and multiplies by the epoch count (measured 15x
    * on the sf0.1 gate). The lattice makes this a pure SCHEDULING
    * choice: both paths produce identical bits (the parity spec
    * proves it), and the collect is bounded by the constant
    * threshold, not the data — above it, training (and the scaler
    * statistics passes) stays fully distributed, where real data
    * volume amortizes the per-epoch job.
    */
  val LocalEpochThreshold = 1L << 17
  def trainDistributed(joined: DataFrame, seqCol: String,
      targetX: String, targetY: String, window: Int,
      features: Seq[String], hidden: Int, epochs: Int, lr: Double,
      seed: Long = 42L,
      localThreshold: Long = LocalEpochThreshold): MlpSeqModel = {
    val sp = joined.sparkSession
    import sp.implicits._
    val nF = features.length
    val nIn = window * nF
    val seqIdx = joined.schema.fieldIndex(seqCol)
    val txIdx = joined.schema.fieldIndex(targetX)
    val tyIdx = joined.schema.fieldIndex(targetY)
    // the gradient jobs are tiny per-epoch passes — a handful of fat
    // partitions beats hundreds of empty tasks; 8 still exercises the
    // merge path and scales by data volume upstream
    val flat = joined.mapPartitions { it =>
      it.map { r =>
        (flatten(r.getSeq[Row](seqIdx), window, nF),
          r.getDouble(txIdx), r.getDouble(tyIdx))
      }
    }.coalesce(8).persist(StorageLevel.MEMORY_AND_DISK)
    val n = flat.count()
    require(n > 0, "empty training set")
    if (n <= localThreshold) {
      // bounded driver copy routed through the in-memory twin — the
      // parity spec proves train() == the distributed path bit for
      // bit on the same rows, so this is a pure scheduling choice
      // that skips ~epochs tiny Spark jobs (see doc comment)
      val rows = flat.collect()
      flat.unpersist()
      return train(rows, window, features, hidden, epochs, lr, seed)
    }

    def latticeSums(f: (Array[Double], Array[Long]) => Unit): Array[Long] = {
      val parts = flat.mapPartitions { it =>
        val acc = new Array[Long](nIn)
        it.foreach { case (row, _, _) => f(row, acc) }
        Iterator.single(acc)
      }.collect()
      val out = new Array[Long](nIn)
      parts.foreach { p =>
        var i = 0; while (i < nIn) { out(i) += p(i); i += 1 }
      }
      out
    }
    val sumL = latticeSums { (row, acc) =>
      var i = 0
      while (i < nIn) {
        acc(i) += math.rint(row(i) * MeanScale).toLong; i += 1
      }
    }
    val inMean = Array.tabulate(nIn)(i => sumL(i) / MeanScale / n)
    val meanB = inMean
    // exact per-feature max |deviation| (max is associative) picks the
    // per-feature variance lattice, identically to the driver twin
    val dmaxParts = flat.mapPartitions { it =>
      val acc = new Array[Double](nIn)
      it.foreach { case (row, _, _) =>
        var i = 0
        while (i < nIn) {
          val d = math.abs(row(i) - meanB(i))
          if (d > acc(i)) acc(i) = d
          i += 1
        }
      }
      Iterator.single(acc)
    }.collect()
    val dmax = new Array[Double](nIn)
    dmaxParts.foreach { p =>
      var i = 0
      while (i < nIn) { if (p(i) > dmax(i)) dmax(i) = p(i); i += 1 }
    }
    val vScale = Array.tabulate(nIn)(i => varScaleFor(dmax(i), n))
    val varL = latticeSums { (row, acc) =>
      var i = 0
      while (i < nIn) {
        val d = row(i) - meanB(i)
        acc(i) += math.rint(d * d * vScale(i)).toLong; i += 1
      }
    }
    val inStd = Array.tabulate(nIn)(i => stdFromVar(varL(i), n, vScale(i)))
    val stdB = inStd
    val norm = flat.mapPartitions { it =>
      it.map { case (f, tx, ty) =>
        (Array.tabulate(nIn)(i => (f(i) - meanB(i)) / stdB(i)), tx, ty)
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    norm.count()
    flat.unpersist()

    val st = new State(hidden, nIn, seed)
    val gLen = gradLen(hidden, nIn)
    for (_ <- 1 to epochs) {
      // snapshot the weights into the task closure (local-mode tasks
      // must not observe the driver's in-place updates)
      val (cw1, cb1, cw2x, cw2y, cbx, cby) =
        (st.w1.clone(), st.b1.clone(), st.w2x.clone(), st.w2y.clone(),
          st.bx, st.by)
      val parts = norm.mapPartitions { it =>
        val g = new Array[Long](gLen)
        val a = new Array[Double](hidden)
        it.foreach { case (f, tx, ty) =>
          accumRow(f, tx, ty, hidden, nIn, cw1, cb1, cw2x, cw2y,
            cbx, cby, a, g)
        }
        Iterator.single(g)
      }.collect()
      val g = new Array[Long](gLen)
      parts.foreach { p =>
        var j = 0; while (j < gLen) { g(j) += p(j); j += 1 }
      }
      st.applyUpdate(g, n, lr)
    }
    norm.unpersist()
    st.model(window, features, inMean, inStd)
  }
}
