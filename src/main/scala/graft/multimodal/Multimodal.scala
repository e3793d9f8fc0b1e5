package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `BinaryType` payloads plus
  * typed metadata — exactly the reference's `Frame` data model
  * (`/root/reference/uav/custom_types.py:22-44`: raw pixel buffer +
  * frame_number/shape/fps metadata), generalized to any modality.
  *
  * The decode step is where a codec (OpenCV/ffmpeg in the reference,
  * `/root/reference/uav/frame_reader.py:143`) would run. Two real
  * in-JVM codecs exist: [[ImageCodec]] (JPEG/PNG/BMP via ImageIO) and
  * [[AviCodec]] (MJPEG/AVI containers — RIFF chunk walk + ImageIO).
  * [[StubCodec.decode]] remains the clearly-marked deterministic
  * stand-in for formats the JDK cannot decode (MP4/H.264 etc.);
  * everything around it — the binary schema, the typed `Dataset`
  * boundary, per-partition batch processing, the frame-sampling explode
  * — is the real Spark plumbing a production codec UDF drops into.
  */
object Multimodal {

  /** An ingested media object: opaque bytes + modality tag. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded container metadata (what `cv2.CAP_PROP_*` probing yields in
    * the reference, `frame_reader.py:129-131`). */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** One sampled frame reference within a media object. */
  final case class FrameSample(doc_id: Long, frame_idx: Long, width: Long, height: Long, n_bytes: Long)

  /** Stand-in for the real codec. Deterministic pure function of the
    * payload so the pipeline is oracle-checkable; a production build
    * replaces this body with the actual decoder call. */
  object StubCodec {
    def decode(r: MediaRecord): MediaMeta = {
      // ??? real codec goes here (cv2.imdecode / avcodec); stubbed:
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, n, n % 640 + 1, n * 7 % 480 + 1, n % 16 + 1)
    }
  }

  /** documents → opaque binary payloads (UTF-8 bytes stand in for an
    * encoded image/audio buffer). */
  def ingest(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("image").as("media_type"))
      .as[MediaRecord]
  }

  /** Decode runs per-partition (one codec context per partition, batch
    * shape preserved), then every-2nd-frame sampling explodes each media
    * object into its kept frames — the keyframe-interval semantic of
    * `main.py:116` applied inside a container. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[FrameSample] = {
    import spark.implicits._
    media
      .mapPartitions(_.map(StubCodec.decode))
      .flatMap(m => (0L until m.n_frames by 2L).map(i =>
        FrameSample(m.doc_id, i, m.width, m.height, m.n_bytes)))
  }

  /** Feature extraction: opaque payload → dense feature vector (here a
    * 16-bin normalized byte histogram standing in for a vision
    * embedding). Output plugs straight into the similarity surface
    * ([[graft.similarity.Ann]] takes (vec_id, embedding) columns), so
    * media near-dup search composes from existing operators. */
  final case class MediaFeatures(vec_id: Long, embedding: Array[Float])

  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.map { r =>
      // ??? real feature extractor (CNN/CLIP encoder) goes here; stubbed:
      if (r.payload.isEmpty) {
        // never emit a zero vector: its norm is 0 and cosine against it
        // is NaN, which Spark orders above every double — one empty media
        // object would win every kNN argmax. Uniform is the safe unknown.
        MediaFeatures(r.doc_id, Array.fill(16)(1f / 16))
      } else {
        val hist = new Array[Float](16)
        r.payload.foreach(b => hist((b & 0xFF) % 16) += 1f)
        MediaFeatures(r.doc_id, hist.map(_ / r.payload.length))
      }
    }
  }

  /** U1 `extract_frames` (`/root/reference/uav/video_splitter.py:6-25`):
    * unnest a media object into per-frame files named `frame_%05d` —
    * here a partitioned parquet write keyed by the formatted frame name,
    * one directory per frame exactly like the reference's one file per
    * frame. */
  def extractFrames(spark: SparkSession, media: Dataset[MediaRecord], outDir: String): Unit = {
    sampleFrames(spark, media)
      .withColumn("frame_file", format_string("frame_%05d", col("frame_idx")))
      .write.mode("overwrite")
      .partitionBy("frame_file")
      .parquet(outDir)
  }
}
