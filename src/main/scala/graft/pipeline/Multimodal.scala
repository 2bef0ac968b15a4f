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

  /** 64-bit perceptual average hash (aHash) of an image payload — the
    * classic near-dup signature for image corpora (a re-encode, format
    * change, or mild noise leaves the hash within a few bits; LAION-scale
    * pipelines dedup on exactly this family). Pipeline per image, all
    * INTEGER arithmetic so the hash is bit-portable and SQL-derivable:
    *  1. decode (ImageIO, any container — BMP/PNG/...);
    *  2. integer luma `g = 299·r + 587·g + 114·b` (×1000 fixed-point,
    *     never divided);
    *  3. 8×8 block-mean grid: cell (cx, cy) covers
    *     `x ∈ [⌊cx·w/8⌋, ⌊(cx+1)·w/8⌋)` (the area-average downsample);
    *  4. bit p = cy·8+cx set iff `cellSum · N > totalSum · cellCount`
    *     (cell mean strictly above global mean — ties are 0; the
    *     comparison is cross-multiplied, no division anywhere);
    *  5. packed as two non-negative 32-bit halves `(hash_hi, hash_lo)` —
    *     a single BIGINT would need bit 63 and change sign.
    *
    * Returns null for null/undecodable/sub-8×8 payloads — NOT a zero
    * hash: a sentinel hash would collide every malformed image into one
    * giant "duplicate" cluster. Per-row procedural decode (the UDF is
    * justified); map-side, zero shuffle.
    */
  val aHash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val img =
          try {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            javax.imageio.ImageIO.read(iis) // closes the stream itself
          } catch { case _: Exception => null }
        if (img == null || img.getWidth < 8 || img.getHeight < 8) null
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gray = new Array[Long](w * h)
          var total = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val g = 299L * ((rgb >>> 16) & 0xFF) +
                587L * ((rgb >>> 8) & 0xFF) + 114L * (rgb & 0xFF)
              gray(y * w + x) = g
              total += g
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var hi = 0L
          var lo = 0L
          var cy = 0
          while (cy < 8) {
            val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
            var cx = 0
            while (cx < 8) {
              val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
              var s = 0L
              var yy = y0
              while (yy < y1) {
                var xx = x0
                while (xx < x1) { s += gray(yy * w + xx); xx += 1 }
                yy += 1
              }
              val cnt = (x1 - x0).toLong * (y1 - y0)
              if (s * n > total * cnt) {
                val p = cy * 8 + cx
                if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
              }
              cx += 1
            }
            cy += 1
          }
          (hi, lo)
        }
      }
    }

  /** Image hash columns `(hash_hi, hash_lo)` for a payload column; rows
    * with null/undecodable payloads keep a null struct.
    */
  def withAHash(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("__h", aHash64(col(payloadCol)))
      .withColumn("hash_hi", col("__h._1"))
      .withColumn("hash_lo", col("__h._2"))
      .drop("__h")

  /** Near-duplicate image pairs by aHash Hamming distance ≤ `maxHamming`
    * (`id_a < id_b`, with the distance). Banding, not all-pairs: the 64
    * bits split into 4 × 16-bit bands, and Hamming ≤ 3 pigeonholes at
    * least one band equal — candidate pairs come from an equi-join on
    * `(band_idx, band_value)` (ONE shuffle on 4 rows/image), then the
    * exact `bit_count(xor)` check verifies. `maxHamming` must be ≤ 3
    * for the 4-band pigeonhole to be exhaustive (fail-loud otherwise).
    * Null-hash rows (undecodable images) never pair.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      hiCol: String = "hash_hi",
      loCol: String = "hash_lo"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for the 4x16-bit pigeonhole, got $maxHamming")
    val base = hashes.select(col(idCol), col(hiCol), col(loCol))
      .filter(col(hiCol).isNotNull && col(loCol).isNotNull)
    val banded = base.select(
      col(idCol), col(hiCol), col(loCol),
      explode(array((0 until 4).map { b =>
        val src = if (b < 2) col(loCol) else col(hiCol)
        struct(lit(b).as("band"),
          (shiftright(src, (b % 2) * 16) % 65536).cast("long").as("bv"))
      }: _*)).as("bb"))
      .select(col(idCol), col(hiCol), col(loCol),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col(idCol).as("id_a"), col(hiCol).as("hi_a"),
      col(loCol).as("lo_a"), col("band"), col("bv"))
    val b = banded.select(col(idCol).as("id_b"), col(hiCol).as("hi_b"),
      col(loCol).as("lo_b"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
