package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * processed in batches.
  *
  * The Spark-side machinery — schema, partition-level batching (the JVM
  * equivalent of `mapInPandas` batch shape), fixed-dim feature output,
  * deterministic frame sampling — is real and tested. The codec itself is a
  * STUB: this container ships no image/audio libraries, so `decodeStub`
  * derives deterministic fake pixels from the payload bytes. Swapping in a
  * real decoder changes only that one function.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** STUB decode: deterministic fake "pixels" from payload bytes. A real
    * implementation would call an image codec here. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** Wrap a text corpus as a media table (payload = UTF-8 bytes, synthetic
    * metadata) — the stand-in for reading real image/video files. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        ((col("n_chars") * 7) % 480 + 1).cast("int").as("height"),
        (col("n_chars") % 16 + 1).cast("int").as("n_frames")).as("meta"))

  /** Fixed-dim feature extraction over batches: one mapPartitions pass,
    * each task processing its rows in bounded batches (batch shape =
    * `batchSize` payloads decoded together, like a Pandas-UDF arrow batch).
    * Output: 16-bin byte histogram, L1-normalized — deterministic, codegen-
    * friendly schema array<double>. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(mediaSchema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped: decode the whole batch before emitting (a real
        // decoder would amortize codec setup across the batch)
        val decoded = batch.map { r =>
          (r, decodeStub(r.getAs[Array[Byte]]("payload")))
        }
        decoded.iterator.map { case (r, bytes) =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          var b = 0
          while (b < 16) { hist(b) /= n; b += 1 }
          Row(r.getAs[Long]("media_id"), r.getAs[Row]("meta"), hist)
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling for "video" payloads: split the payload
    * into meta.n_frames equal chunks, keep every `stride`-th chunk. Pure
    * relational plumbing (posexplode over computed offsets) — the shape a
    * real frame extractor would fill in. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media
      .select(col("media_id"), col("payload"), col("meta"),
        posexplode(sequence(lit(0), col("meta.n_frames") - 1))
          .as(Seq("frame_idx", "frame_no")))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"),
        substring_index(col("meta.format"), "/", 1).as("container"),
        expr("""substring(payload,
                frame_idx * CAST(octet_length(payload) / meta.n_frames AS INT) + 1,
                CAST(octet_length(payload) / meta.n_frames AS INT))""").as("frame_bytes"))

  /** "Resize": recompute typed metadata (the real op would transform pixels;
    * the metadata contract is what downstream pipelines consume). */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxW) / col("meta.width").cast("double"),
      lit(maxH) / col("meta.height").cast("double"))
    media.select(col("media_id"), col("payload"),
      struct(
        col("meta.format").as("format"),
        ceil(col("meta.width") * scale).cast("int").as("width"),
        ceil(col("meta.height") * scale).cast("int").as("height"),
        col("meta.n_frames").as("n_frames")).as("meta"),
      round(scale, 6).as("scale"))
  }
}
