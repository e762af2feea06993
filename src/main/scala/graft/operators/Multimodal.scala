package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, and a distributed decode/feature
  * stage.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in
  * this environment): [[StubDecoder]] derives deterministic fake
  * dimensions from the payload hash. The Spark-side plumbing — schema,
  * partition-parallel batch decode via mapPartitions, metadata
  * projection — is real and is what matters at 100 TB: payload bytes
  * are never shuffled (decode runs map-side on the scan partitioning)
  * and metadata-only queries prune the binary column at the parquet
  * reader.
  */
object Multimodal {

  /** Media metadata produced by the decode stage. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("sha", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  trait MediaDecoder extends Serializable {
    /** Decode payload → (width, height, n_frames). */
    def decode(payload: Array[Byte]): (Int, Int, Int)
  }

  /** STUB decoder — deterministic fake standing in for a real codec
    * (e.g. JPEG/PNG header parse, ffprobe). Derives dimensions from a
    * polynomial hash of the payload so tests are reproducible. Replace
    * with a real codec in production; the surrounding plumbing is
    * unchanged. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      (64 + (h % 1920L).toInt, 64 + ((h / 7L) % 1080L).toInt,
        1 + (h % 240L).toInt)
    }
  }

  /** Frame sampling over decoded media metadata: up to `maxFrames`
    * evenly-strided frame indices from [1, nFrames] — the "which
    * frames feed the feature extractor" stage of a video pipeline.
    * Pure column math over the metadata (the payload column is never
    * touched, so metadata-only sampling reads zero media bytes). */
  def sampleFrameIndices(nFrames: org.apache.spark.sql.Column,
                         maxFrames: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // Guards: n <= 0 (corrupt/empty media) must yield an empty list —
    // sequence(1, 0) would count DOWN and the % 0 would abort an
    // ANSI-mode session.
    val step = greatest(ceil(nFrames.cast("double") / maxFrames).cast("long"),
      lit(1L))
    when(nFrames.cast("long") <= 0,
      array().cast("array<bigint>"))
      .otherwise(filter(sequence(lit(1L), nFrames.cast("long")),
        i => (i - 1) % step === 0))
  }

  /** Resize planning over decoded dimensions: aspect-preserving fit
    * into a target box (the standard vision-preprocess step). Pure
    * metadata math — the actual pixel resample belongs to the decode
    * stage's codec (stubbed here); the engine's job is computing the
    * target geometry for every asset without touching payload bytes. */
  def fitDimensions(width: org.apache.spark.sql.Column,
                    height: org.apache.spark.sql.Column,
                    box: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    val scale = least(lit(box.toDouble) / width, lit(box.toDouble) / height)
    val capped = least(scale, lit(1.0)) // never upscale
    (floor(width * capped).cast("long"), floor(height * capped).cast("long"))
  }

  /** Distributed decode: per-partition batch over the binary column.
    * Runs map-side (no shuffle of payload bytes); output appends the
    * metadata struct fields. */
  def decodeFeatures(df: DataFrame, payloadCol: String,
                     decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ mediaMetaSchema.fields)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        if (r.isNullAt(idx)) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        else {
          val bytes = r.getAs[Array[Byte]](idx)
          val (w, h, f) = decoder.decode(bytes)
          md.reset()
          val sha = md.digest(bytes).map("%02x".format(_)).mkString
          Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, sha, w, h, f))
        }
      }
    }(enc)
  }
}
