package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (north star): image/audio/video as opaque
  * `binary` payloads with typed metadata, processed by batched
  * per-partition kernels.
  *
  * The decode step itself is STUBBED — no image/audio libraries ship
  * in this container — with a deterministic fake "decoder" that
  * derives features from the payload bytes. Everything Spark-side is
  * real: the schema, the partition-local batching (one kernel call
  * per batch, the JVM analog of `mapInPandas` batch shape), and the
  * feature-column contract.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = true),   // opaque encoded bytes
    StructField("meta", StructType(Seq(                    // typed metadata
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Build a media table from documents: payload = utf-8 bytes of the
    * text (stand-in for encoded media), metadata derived from sizes. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 300 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decoder: a real implementation would decode the payload
    * (JPEG/WAV/MP4) and emit a feature vector; this deterministic fake
    * hashes byte windows so the plumbing (batching, schema, feature
    * dimension) is fully exercised. Marked clearly as a stand-in. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real decoder goes here (libjpeg/ffmpeg etc. not in container)
    val out = new Array[Float](dim)
    if (payload == null) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: one partition-local pass, kernel
    * invoked per row batch (mapPartitions = JVM `mapInPandas`). The
    * output keeps (media_id, kind) + fixed-dim features. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.grouped(64).flatMap { batch =>           // batch shape like Arrow batches
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0 else payload.length,
            stubDecodeFeatures(payload, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Integer variant of the stub decoder: per-residue-class byte sums
    * (exact longs, order-free) — the quantized-feature form whose
    * result is reproducible in plain SQL, which is what lets the m2
    * declared query carry a DuckDB oracle. Same `???`-marked stand-in
    * status as [[stubDecodeFeatures]]: a real decoder replaces this. */
  def stubDecodeSums(payload: Array[Byte], dim: Int): Array[Long] = {
    // ??? <- real decoder goes here (libjpeg/ffmpeg etc. not in container)
    val out = new Array[Long](dim)
    if (payload == null) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff).toLong
      i += 1
    }
    out
  }

  /** Batched integer-feature extraction — same partition-local batch
    * shape as [[extractFeatures]], exact long sums per residue. */
  def extractSums(media: DataFrame, dim: Int = 8): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(LongType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0 else payload.length,
            stubDecodeSums(payload, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling for video-kind rows: explode n_frames into a
    * bounded sample of frame indices (decode stub per frame). */
  def sampleFrames(media: DataFrame, every: Int = 30): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(every))))
      .select("media_id", "frame_idx")
}
