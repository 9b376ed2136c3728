package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque BINARY column with typed metadata — the same shape as the
  * reference's TypeBytes typed blobs (reference:
  * src/ahghee.grpc/types.proto:17-20, `typeiri` + raw bytes).
  *
  *   media STRUCT<media_type: STRING, bytes: BINARY,
  *                meta: STRUCT<origin: STRING, n_bytes: LONG>>
  *
  * Decode / feature-extraction runs batched per partition via
  * mapPartitions (the Scala analog of mapInPandas): rows stream through
  * an iterator, the codec is initialized once per partition (not per
  * row), output is a fixed feature schema. The actual pixel/sample
  * decode is STUBBED — this container ships no image/audio libs — with
  * a deterministic fake derived from the bytes, clearly marked below;
  * the Spark-side plumbing (schema, partitioning, batch shape) is real.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feat0", IntegerType, nullable = false)))

  /** Wrap documents' text as fake image bytes under the media struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "documents").select(
      col("doc_id"),
      struct(
        lit("image/fake").as("media_type"),
        encode(col("text"), "UTF-8").as("bytes"),
        struct(col("source").as("origin"),
               length(col("text")).cast("long").as("n_bytes")).as("meta")
      ).as("media"))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fhash", IntegerType, nullable = false)))

  /** Frame sampling + resize, the generator-shaped multimodal op: each
    * media row fans out to every `every`-th frame, scaled to w×h. Same
    * batched plumbing as decodeFeatures — a real build initializes a
    * demuxer + scaler once per partition and streams frames through the
    * iterator (bounded memory, no per-row codec setup). STUB: frame
    * count derives from payload size (1 frame per 50 bytes), the
    * "decoded" frame hash from the byte at the frame's offset — pure
    * functions of the payload, so the fan-out stays oracle-checkable. */
  def sampleFrames(media: DataFrame, every: Int, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media.bytes")).rdd
      .mapPartitions { rows =>
        // (real impl: val demux = VideoDemuxer.open(); val scaler = ...)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val total = math.max(bytes.length / 50, 1)
          (0 until total by every).iterator.map { f =>
            // --- STUB decode+resize: deterministic fake ---
            val fhash = if (bytes.isEmpty) 0 else bytes(f % bytes.length).toInt
            Row(id, f, w, h, fhash)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Batched "decode": one codec init per partition, iterator in /
    * iterator out. STUB — a real build links an image codec here; the
    * fake is a pure function of the bytes so it stays oracle-checkable. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("media.bytes")).rdd
      .mapPartitions { rows =>
        // (real impl: val codec = ImageCodec.open() — once per partition)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // --- STUB decode: deterministic fake from the payload ---
          val width = 32 + (bytes.length % 64)
          val height = 32 + ((bytes.length / 7) % 64)
          val feat0 = if (bytes.nonEmpty) bytes(0).toInt else 0
          Row(id, width, height, feat0)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
