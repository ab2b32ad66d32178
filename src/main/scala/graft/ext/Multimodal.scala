package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batched per-partition feature extraction.
  *
  * The actual codec step (JPEG decode, resample, frame sample) is STUBBED —
  * media libraries are not in this environment — behind
  * `decodeStub`, a deterministic fake that derives "features" from the
  * bytes. Everything Spark-cares-about is real: the schema contract, the
  * mapPartitions batching (one buffer reuse per partition, the Scala
  * analogue of `mapInPandas` batch shape), partition sizing, and the
  * metadata columns computed as native expressions.
  *
  * Scale posture: binary payloads stay in executor space end-to-end
  * (no collect); partition size is controlled upstream by
  * `spark.sql.files.maxPartitionBytes`, and the per-partition iterator
  * keeps memory at one record batch.
  */
object Multimodal {

  /** Canonical media record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),    // image | audio | video
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),        // metadata, nullable pre-decode
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Cheap native metadata: byte length, digest, magic-byte sniff —
    * pure Column expressions, no decode needed. */
  def withByteMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("digest", md5(col(binCol)))
      .withColumn("magic_hex", hex(substring(col(binCol), 1, 4)))

  final case class MediaFeatures(media_id: Long, n_bytes: Int,
      byte_entropy: Double, feature: Array[Float])

  /** DECODE STUB — deterministic fake standing in for a real codec.
    * Derives an 8-dim "feature vector" from a byte histogram. A real
    * deployment swaps only this function (same signature: bytes → floats);
    * the surrounding batching/schema/partitioning is production-shaped. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  private def entropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Int](256)
    bytes.foreach(b => counts(b & 0xff) += 1)
    val n = bytes.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
  }

  /** Batched per-partition feature extraction (the `mapInPandas` shape in
    * Scala: one iterator pass per partition, no per-row task overhead). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String):
      Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        MediaFeatures(id, b.length, entropy(b), decodeStub(b))
      })
  }

  /** RESIZE STUB — deterministic fake for an image/audio resample:
    * stride-subsample the payload down to ~targetBytes. A real deployment
    * swaps this function for a codec call; the per-partition batching in
    * [[resized]] is the production contract. */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
    }

  /** Batched resize over a binary column (same mapPartitions shape as
    * [[extractFeatures]]: payloads never leave executor space). */
  def resized(df: DataFrame, idCol: String, binCol: String,
      targetBytes: Int): Dataset[(Long, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, resizeStub(if (bytes == null) Array.empty[Byte] else bytes,
          targetBytes))
      })
  }

  /** Evenly sample up to `k` distinct fixed-size frames (chunks) from a
    * payload column — the video frame-sampling shape. Works on BinaryType
    * (frames of `frameSize` bytes) and StringType (frames of `frameSize`
    * chars): Spark's `length`/`substring` handle both. One row per
    * sampled frame: all original columns + (frame_idx, frame).
    *
    * Pure Column expressions (sequence → transform → explode → substring),
    * so the whole thing stays distributed and codegen-adjacent — no UDF,
    * no driver round-trip, no payload copy beyond the sampled frames. */
  def frameSample(df: DataFrame, payloadCol: String,
      frameSize: Int, k: Int): DataFrame =
    df.withColumn("__nf", expr(
        s"greatest((length($payloadCol) + ${frameSize - 1}) div $frameSize," +
          " CAST(1 AS BIGINT))"))
      .withColumn("frame_idx", explode(array_distinct(
        expr(s"transform(sequence(0, ${k - 1}), j -> (j * __nf) div $k)"))))
      .withColumn("frame", expr(
        s"substring($payloadCol, CAST(frame_idx * $frameSize + 1 AS INT), $frameSize)"))
      .drop("__nf")

  /** Deterministic synthetic media table for tests/demos: bytes derived
    * from the id so every engine can reproduce them. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val bytes = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j * 7) % 251).toByte)
      (i.toLong, "image", bytes, "image/fake")
    }.toDF("media_id", "media_type", "content", "mime")
  }
}
