package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample plumbing a training-data
  * pipeline needs.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake features from the
  * raw bytes. Everything around the stub — the schema, the binary-column
  * handling, the per-partition batch iteration, the frame-sampling
  * expression — is real Spark plumbing, tested, and is exactly where a
  * JNI/py codec would slot in.
  *
  * Scale notes: payloads stay distributed end-to-end (no collect); the
  * per-partition path processes rows streaming off the iterator (constant
  * memory); frame sampling is a pure codegen'd expression over binary.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Build a media table from the documents fixture: payload = UTF-8 bytes
    * of the text (deterministic fake media), kind cycles image/audio/video. */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(octet_length(col("text")).as("n_bytes"),
        substring(col("text"), 1, 4).as("format")).as("meta"))

  /** STUB decode/feature-extract over a binary payload column, run as a
    * typed per-partition pass (the mapInPandas/mapInArrow analogue on the
    * JVM). A real pipeline decodes `payload` with a codec here; the stub
    * emits deterministic byte-level features so the batch shape, schema
    * and partitioning are exercised for real. */
  def decodeStub(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = true),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("byte_mean", DoubleType, nullable = false),
      StructField("head_hex", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = if (r.isNullAt(2)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](2)
          // --- codec would go here; deterministic fake features instead ---
          var sum = 0L; var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          val head = bytes.take(8).map(b => f"${b & 0xFF}%02x").mkString
          Row(id, kind, bytes.length, mean, head)
        }
      }(enc)
  }

  /** STUB resize over a binary payload: keep every `factor`-th byte —
    * deterministic fake downsampling standing in for an image resize (the
    * real codec slots into the same per-partition pass as [[decodeStub]]).
    * Output schema keeps the payload binary with updated metadata. */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.isNullAt(2)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](2)
          // --- resize codec would go here; byte subsampling instead ---
          val resized = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < resized.length) { resized(i) = bytes(i * factor); i += 1 }
          Row(r.getLong(0), r.getString(1), resized, resized.length)
        }
      }(enc)
  }

  /** STUB feature extractor: a `dim`-dimensional deterministic embedding
    * derived from the payload's md5 — standing in for a real image/audio
    * encoder (the codec libs aren't in this container). The plumbing is
    * the real contract: binary in, fixed-width `array<float>` out, pure
    * per-row codegen-friendly expressions, no UDF, no shuffle; the output
    * feeds the ANN/near-dup ops directly (Similarity.lshTopK etc.). Each
    * component is (md5(payload || i)[0:8] as int) % 1000 / 999 in [0,1]. */
  def featurizeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    require(dim >= 1, "dim must be positive")
    media.withColumn("embedding", array((0 until dim).map(i =>
      embedComponent(col("payload"), i).cast("float")): _*))
  }

  /** One stub-embedding component as a DOUBLE column — the single
    * definition shared by [[featurizeStub]] (float-cast for the ANN ops)
    * and the oracle-checked q_multimodal_embed query (double, bit-parity
    * with the DuckDB formula). Changing the stub here changes both. */
  def embedComponent(payload: org.apache.spark.sql.Column, i: Int):
      org.apache.spark.sql.Column =
    (conv(substring(md5(concat(payload, lit(i.toString).cast("binary"))),
      1, 8), 16, 10).cast("long") % 1000L) / lit(999.0)

  /** Frame sampling over a binary "video": every `stride` bytes emit a
    * `frameSize`-byte slice — pure codegen'd expression, no UDF. A row
    * with payload shorter than one frame yields an empty array. */
  def frameSample(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val n = octet_length(col("payload"))
    // floor division: Spark's `/` on ints yields double, so cast back
    val nFrames = when(n >= frameSize,
      floor((n - frameSize) / lit(stride)).cast("int") + 1).otherwise(0)
    media.select(col("media_id"), col("kind"), nFrames.as("n_frames"),
      when(nFrames > 0, transform(sequence(lit(0), nFrames - 1),
        i => substring(col("payload"), (i * stride + 1).cast("int"), lit(frameSize))))
        .otherwise(array().cast(ArrayType(BinaryType))).as("frames"))
  }
}
