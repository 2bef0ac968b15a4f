package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The vectorized-decoder seam: a real codec (libjpeg/ffmpeg behind a
  * Pandas UDF or a JNI batch call) drops in by implementing `decodeBatch`
  * — the Spark-side plumbing ([[Multimodal.decodeFeaturesWith]]) never
  * changes. The batch-iterator signature is the `mapInPandas` shape: one
  * call per batch so a native decoder amortizes its dispatch/model-load
  * cost across rows instead of paying it per row.
  */
trait MediaCodec extends Serializable {

  /** Feature width of every decoded vector (fixed per codec). */
  def featureDim: Int

  /** Decode a batch of payloads to `featureDim`-wide feature vectors,
    * preserving order and count. A null payload must yield a vector (the
    * stub yields zeros) — nulls must not change the row count.
    */
  def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Array[Double]]
}

/** The deterministic test codec: a 16-bin byte histogram (L1-normalized)
  * standing in for decoded image features — byte-for-byte the same output
  * as the scalar `decodeFeaturesUdf` stub.
  */
class ByteHistogramCodec extends MediaCodec {
  override val featureDim: Int = 16
  override def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Array[Double]] =
    payloads.map { payload =>
      val hist = new Array[Double](16)
      if (payload != null && payload.nonEmpty) {
        var i = 0
        while (i < payload.length) {
          hist((payload(i) & 0xFF) >>> 4) += 1.0
          i += 1
        }
        var j = 0
        while (j < 16) { hist(j) /= payload.length; j += 1 }
      }
      hist
    }
}

/** Multimodal-column plumbing: media as opaque `binary` payloads plus a
  * typed metadata struct, processed by batch-shaped per-row kernels.
  *
  * REAL decoders ship behind the [[MediaCodec]] seam with zero external
  * dependencies: [[WavPcmStatsCodec]] (WAV PCM via `javax.sound.sampled`)
  * and [[ImageRgbStatsCodec]] (BMP/PNG/any ImageIO container via
  * `javax.imageio`), gated end to end by `p_media_decode` against an
  * arithmetic DuckDB oracle (see [[MediaSynth]]). The scalar UDFs below
  * remain clearly-marked deterministic STUBS used as cheap test codecs;
  * a production CNN/ffmpeg feature extractor drops in the same way the
  * real codecs do — `decodeFeaturesWith` never changes.
  */
object Multimodal {

  /** Attach a payload column: the UTF-8 bytes of the text stand in for
    * media bytes, with the metadata a real media pipeline would carry.
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn(
        "media_meta",
        struct(
          lit("fake/raw").as("format"),
          octet_length(col("payload")).as("n_bytes"),
          lit(1).as("channels")))

  /** STUB decoder: a deterministic 16-bin byte histogram (L1-normalized)
    * in place of decoded image features. Real impl: codec -> CNN features.
    */
  val decodeFeaturesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      val hist = new Array[Double](16)
      if (payload != null && payload.nonEmpty) {
        var i = 0
        while (i < payload.length) {
          hist((payload(i) & 0xFF) >>> 4) += 1.0
          i += 1
        }
        var j = 0
        while (j < 16) { hist(j) /= payload.length; j += 1 }
      }
      hist
    }

  def decodeFeatures(payload: Column): Column = decodeFeaturesUdf(payload)

  /** Batch decode through the [[MediaCodec]] seam: appends `outCol`
    * (array&lt;double&gt;, width `codec.featureDim`) to the schema, feeding
    * the codec `batchSize`-row slices per call via `mapPartitions` — the
    * same batch shape `mapInPandas` would give a Pandas-UDF decoder, with
    * no driver involvement and partition-level parallelism preserved.
    * Swapping the stub for a real decoder changes ONLY the codec argument;
    * schema, nullability, and row count are codec-independent.
    */
  def decodeFeaturesWith(
      df: DataFrame,
      codec: MediaCodec,
      payloadCol: String = "payload",
      outCol: String = "media_features",
      batchSize: Int = 1024): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType), nullable = false)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = codec.decodeBatch(batch.iterator.map(_.getAs[Array[Byte]](idx)))
        batch.iterator.zip(feats).map { case (r, f) => Row.fromSeq(r.toSeq :+ f.toSeq) }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB resize: keep every `stride`-th byte — shape-preserving stand-in
    * for a real resample kernel.
    */
  val resizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte], stride: Int) =>
      if (payload == null) null
      else {
        val out = new Array[Byte]((payload.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = payload(i * stride); i += 1 }
        out
      }
    }

  /** Frame sampling: split the payload into fixed-size frames and explode
    * one row per sampled frame (every `stride`-th) — the video-frame
    * extraction shape; the explode keeps partition-parallelism.
    */
  val frameSliceUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte], frameSize: Int, stride: Int) =>
      if (payload == null) Seq.empty[(Int, Array[Byte])]
      else {
        val frames = payload.grouped(frameSize).toArray
        frames.indices.collect {
          case i if i % stride == 0 => (i, frames(i))
        }.toSeq
      }
    }

  def sampleFrames(
      df: DataFrame,
      payloadCol: String,
      frameSize: Int,
      stride: Int): DataFrame =
    df.withColumn(
        "__frame",
        explode(frameSliceUdf(col(payloadCol), lit(frameSize), lit(stride))))
      .withColumn("frame_index", col("__frame._1"))
      .withColumn("frame_bytes", col("__frame._2"))
      .drop("__frame")
}
