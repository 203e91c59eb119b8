package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extract kernels run as typed `mapPartitions`
  * batch functions over the binary payloads (the Scala analogue of
  * Pandas-UDF-over-mapInPandas).
  *
  * The real decode step is STUBBED — no image/audio codecs ship in
  * this environment — with a deterministic fake (byte statistics of
  * the payload), so the Spark-side schema, partitioning, kernel
  * signature and batch shape are all real and testable; swapping in
  * a true JPEG/WAV decoder only changes `decodeBytes`.
  */
object Multimodal {

  /** Media row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Deterministic synthetic media: 16-byte payload derived from the
    * document text (unhex of md5) standing in for an encoded image.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      unhex(md5(col(textCol))).as("media"),
      struct(lit("fake/rgb8").as("format"), lit(4).as("width"), lit(4).as("height")).as("meta"))

  final case class MediaFeature(
      doc_id: Long, n_bytes: Int, byte_sum: Long, byte_max: Int, mean_byte: Double)

  /** STUB decode kernel: a real implementation would parse the codec
    * here (javax.imageio / ffmpeg bindings); the deterministic fake
    * extracts byte statistics so results are verifiable end-to-end.
    */
  def decodeBytes(docId: Long, payload: Array[Byte]): MediaFeature = {
    var sum = 0L
    var max = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      if (b > max) max = b
      i += 1
    }
    MediaFeature(docId, payload.length, sum, max, sum.toDouble / payload.length)
  }

  /** Batch feature extraction: one JVM kernel invocation per
    * partition iterator — the batch shape a Pandas UDF would see.
    * No shuffle: features are computed where the payload rows live.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeBytes(id, payload) })
  }

  /** "Resize"/re-chunk stub: demonstrates payload-transforming kernels
    * (sample every `stride`-th byte — the frame-sampling analogue).
    */
  def frameSample(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray)
      })
      .toDF("doc_id", "sampled")
  }
}
