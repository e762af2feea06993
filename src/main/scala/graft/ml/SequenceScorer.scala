package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** M8 boundary: apply a FROZEN external sequence model to the tensor
  * column built by SequenceFeaturePipeline — the reference trains
  * GRU/LSTM externally (`nn/nn-mps.py`); Spark's job is building the
  * tensors and applying the frozen scorer distributed, map-side, via
  * mapPartitions (no shuffle; the model weights broadcast with the
  * closure).
  *
  * The scorer here is a linear read-out over the flattened sequence —
  * a stand-in with the exact plumbing (batched partition iteration,
  * fixed feature order, per-row float math) a real ONNX/TF scorer
  * would use in this slot.
  */
object SequenceScorer {

  /** weights layout: [seqPos x featureIdx] flattened row-major, plus
    * bias at the end. Sequences shorter than `window` use only their
    * trailing positions (same as a masked NN input). */
  case class LinearSeqModel(window: Int, features: Seq[String],
                            weightsX: Array[Double], weightsY: Array[Double],
                            biasX: Double = 0.0, biasY: Double = 0.0)
      extends Serializable

  def score(seqs: DataFrame, seqCol: String, m: LinearSeqModel): DataFrame = {
    val outSchema = StructType(seqs.schema.fields ++ Seq(
      StructField("nn_x", DoubleType), StructField("nn_y", DoubleType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val seqIdx = seqs.schema.fieldIndex(seqCol)
    val nF = m.features.length
    seqs.mapPartitions { it =>
      it.map { r =>
        val seq = r.getSeq[Row](seqIdx)
        var sx = m.biasX; var sy = m.biasY
        val offset = m.window - seq.length  // right-align short sequences
        var p = 0
        while (p < seq.length) {
          val step = seq(p)
          var f = 0
          while (f < nF) {
            val v = if (step.isNullAt(f)) 0.0 else step.getDouble(f)
            val wi = (p + offset) * nF + f
            if (wi >= 0) { sx += m.weightsX(wi) * v; sy += m.weightsY(wi) * v }
            f += 1
          }
          p += 1
        }
        Row.fromSeq(r.toSeq ++ Seq(sx, sy))
      }
    }(enc)
  }
}
