package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata.
  *
  * Feature extraction parses REAL container headers byte-by-byte
  * ([[MediaHeaders]] — PNG IHDR, JPEG SOF scan, GIF block walk, WAV
  * RIFF chunks) through the codegen'd
  * [[graft.functions.MediaHeaderSniff]] expression — no codec library
  * is needed for the metadata surface, no `mapPartitions` seam breaks
  * whole-stage codegen, and unrecognized/truncated payloads yield
  * nulls, never fabricated dimensions. A FULL pixel/sample decoder
  * (the part that does need libjpeg etc.) would slot in the same way:
  * another expression (or `mapInPandas` stage for library-backed
  * codecs) over the same `payload` column, changing nothing upstream.
  */
object Multimodal {

  /** Canonical media-record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Decoded-feature schema emitted by [[decodeFeatures]]. `format` and
    * the dimension columns are null when the payload doesn't parse;
    * `channels`/`sample_rate` are audio-only, `width`/`height`
    * image-only, `n_frames` covers both (sample frames for audio).
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  /** Batch feature extraction over media records: one codegen'd
    * projection — [[graft.functions.MediaHeaderSniff]] parses the real
    * container bytes inline (Catalyst CSE evaluates the sniff once per
    * row even though every field reads the same struct), map-only, no
    * shuffle, output schema = [[featureSchema]].
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val m = graft.functions.MediaHeaderSniff.sniff(col("payload"))
    media.select(
      col("media_id"), col("media_type"),
      coalesce(octet_length(col("payload")), lit(0)).cast("long").as("n_bytes"),
      m.getField("format").as("format"),
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("n_frames").as("n_frames"),
      m.getField("channels").as("channels"),
      m.getField("sample_rate").as("sample_rate"))
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
      .where(col("n_frames") > 1) // stills/empty/unparsed media need no plan
      .withColumn("__stride",
        ceil(col("n_frames").cast("double") / maxFrames).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, col("__stride"))))
      .select(col("media_id"), col("media_type"), col("n_frames"),
        col("frame_idx"))
  }

  /** Aspect-fit resize plan: target dimensions fitting each parsed image
    * inside `maxW`×`maxH` while preserving aspect ratio (never
    * upscaling). Deliberately INTEGER arithmetic — `w*maxH <= h*maxW`
    * picks the binding axis and the other side scales by integral `div`
    * — so the plan is bit-identical on any engine (a float scale factor
    * rounds differently across platforms). Like [[frameSamplePlan]],
    * this is metadata-only: the rows tell the decode stage what to
    * produce. Filters on the PARSED format, not the claimed media_type:
    * only payloads that actually carried image headers get a plan.
    */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, s"maxW=$maxW maxH=$maxH")
    val needs = col("width") > maxW || col("height") > maxH
    val heightBinds = col("width") * maxH <= col("height") * maxW
    features
      .where(col("format").isin("png", "jpeg", "gif") &&
        col("width") > 0 && col("height") > 0)
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
    * belongs to the consumer. Keys off the PARSED `wav` format whose
    * `n_frames` is the fmt/data-derived sample-frame count.
    */
  def audioWindowPlan(features: DataFrame, winSamples: Int,
                      hopSamples: Int): DataFrame = {
    require(winSamples > 0, s"winSamples=$winSamples")
    require(hopSamples > 0, s"hopSamples=$hopSamples")
    features
      .where(col("format") === "wav" && col("n_frames") > 0)
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

  /** Build a media frame from the documents table: REAL container bytes
    * ([[MediaFixtures]]) whose dimensions follow closed-form formulas of
    * `(doc_id, octet_length(text))` — so an oracle can compute the
    * expected parse output without parsing, and a hash match certifies
    * the whole build→parse round trip. Payload construction is map-only.
    *
    * Formulas (mirrored in the DuckDB oracles; n = octet_length(text)):
    *  - doc_id%4==0 → PNG   w=1+doc_id%512, h=1+n%512, idat=8+n%32
    *  - doc_id%4==1 → JPEG  w=16+doc_id%1000, h=16+n%1000
    *  - doc_id%4==2 → GIF   w=1+doc_id%256, h=1+n%256, frames=1+doc_id%12
    *  - doc_id%4==3 → WAV   ch=1+doc_id%2, rate∈{8000,16000,44100} by
    *                        doc_id%3, samples=64+n%4096
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id").cast("long").as("media_id"),
        coalesce(octet_length(col("text")), lit(0)).cast("long").as("n"))
      .select(col("media_id"),
        when(col("media_id") % 4 < 2, lit("image"))
          .when(col("media_id") % 4 === 2, lit("video"))
          .otherwise(lit("audio")).as("media_type"),
        graft.functions.MediaFixturePayload
          .payload(col("media_id"), col("n")).as("payload"))
}
