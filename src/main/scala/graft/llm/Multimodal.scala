package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, partition-parallel batch
  * iteration, deterministic output contract — while the actual codec
  * work is STUBBED (this container has no image/audio libraries): the
  * "decoder" derives metadata from the payload bytes deterministically.
  * Swapping [[stubDecode]] for a real JNI/library call changes nothing
  * about the plan shape.
  */
object Multimodal {

  /** Canonical media-record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Decoded-feature schema emitted by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg:
    * dimensions derived from payload length/first bytes. Replace with a
    * real codec without touching the surrounding plan.
    */
  def stubDecode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    val h0 = if (n > 0) java.lang.Byte.toUnsignedInt(payload(0)) else 0
    mediaType match {
      case "image" => (64 + (n % 512), 64 + (h0 * 4), 1)
      case "video" => (320, 240, 1 + n % 256)
      case "audio" => (1, 1, 1 + n % 4096) // frames ≙ samples
      case _       => (0, 0, 0)
    }
  }

  /** Batch feature extraction over media records: per-partition iterator
    * (the `mapPartitions` seam where a real decoder would amortize
    * per-batch setup), no shuffle, output schema fixed.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = stubDecode(r.getString(1), payload)
        val n = if (payload == null) 0L else payload.length.toLong
        Row(r.getLong(0), r.getString(1), n, w, h, f)
      }
    }(enc)
  }

  /** Frame-sampling plan over decoded video/audio features: up to
    * `maxFrames` evenly-strided frame indices per media item (stride
    * `⌈n_frames/maxFrames⌉`, so short clips keep every frame and long
    * ones thin out uniformly — the standard decode-budget shape). Pure
    * explode on metadata, no payload touched: the plan rows tell a
    * downstream decoder WHICH frames to extract, so at corpus scale the
    * expensive decode only runs on the sampled set.
    */
  def frameSamplePlan(features: DataFrame, maxFrames: Int = 8): DataFrame = {
    require(maxFrames > 0, s"maxFrames=$maxFrames")
    features
      .where(col("n_frames") > 1) // stills/empty media need no plan
      .withColumn("__stride",
        ceil(col("n_frames").cast("double") / maxFrames).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, col("__stride"))))
      .select(col("media_id"), col("media_type"), col("n_frames"),
        col("frame_idx"))
  }

  /** Aspect-fit resize plan: target dimensions fitting each image inside
    * `maxW`×`maxH` while preserving aspect ratio (never upscaling).
    * Deliberately INTEGER arithmetic — `w*maxH <= h*maxW` picks the
    * binding axis and the other side scales by integral `div` — so the
    * plan is bit-identical on any engine (a float scale factor rounds
    * differently across platforms). Like [[frameSamplePlan]], this is
    * metadata-only: the rows tell the decode stage what to produce.
    */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, s"maxW=$maxW maxH=$maxH")
    val needs = col("width") > maxW || col("height") > maxH
    val heightBinds = col("width") * maxH <= col("height") * maxW
    features
      .where(col("media_type") === "image" && col("width") > 0 && col("height") > 0)
      .withColumn("out_h",
        when(!needs, col("height"))
          .when(heightBinds, lit(maxH))
          .otherwise(greatest(lit(1), expr(s"(height * $maxW) div width").cast("int"))))
      .withColumn("out_w",
        when(!needs, col("width"))
          .when(heightBinds, greatest(lit(1), expr(s"(width * $maxH) div height").cast("int")))
          .otherwise(lit(maxW)))
      .select(col("media_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
  }

  /** Overlapping analysis windows over audio sample streams (the STFT /
    * feature-frame shape: window `winSamples` wide every `hopSamples`).
    * Map-only explode like [[frameSamplePlan]] — plans flow downstream,
    * payload slicing happens at the codec seam. The final window is
    * truncated (`n_in_window < winSamples`), not padded; padding policy
    * belongs to the consumer.
    */
  def audioWindowPlan(features: DataFrame, winSamples: Int,
                      hopSamples: Int): DataFrame = {
    require(winSamples > 0, s"winSamples=$winSamples")
    require(hopSamples > 0, s"hopSamples=$hopSamples")
    features
      .where(col("media_type") === "audio" && col("n_frames") > 0)
      .select(col("media_id"), col("n_frames").as("n_samples"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(hopSamples)))
          .as("start_sample"))
      .select(col("media_id"),
        (col("start_sample") / hopSamples).cast("int").as("win_idx"),
        col("start_sample"),
        least(lit(winSamples), col("n_samples") - col("start_sample"))
          .cast("int").as("n_in_window"),
        col("n_samples"))
  }

  /** Build a media frame from the documents table (text bytes standing in
    * for undecoded payloads — the plumbing fixture used by tests/bench).
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("video"), lit("audio")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))
}
