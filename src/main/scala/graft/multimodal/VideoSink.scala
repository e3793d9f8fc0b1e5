package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K1 `FrameSaver`'s VIDEO-FILE face
  * (`/root/reference/uav/frame_processing.py:130-196`): the reference
  * muxes frames into an actual container via `cv2.VideoWriter`; this
  * writes a playable AVI fully in-JVM through [[AviCodec.Muxer]], with
  * the reference's exact binding semantics:
  *
  *  - '''first-frame bind''' (`:147-153`): (width, height, fps) lock to
  *    the first frame in frame order; `fps` null-or-nonpositive falls
  *    back to [[VideoSink.DefaultFps]] = the reference's
  *    `DEFAULT_FPS = 25.0`;
  *  - '''drop-on-mismatch''' (`:171-178`): a frame whose dims differ
  *    from the bound size is SKIPPED and counted, never written;
  *  - '''release semantics''': the container finalizes on close — a
  *    partial write is not a valid RIFF file, matching
  *    `VideoWriter.release()`.
  *
  * Codec choice: `"raw"` muxes BI_RGB frames — lossless, the payload
  * bytes survive a write→read round-trip exactly (the sink ↔ source
  * pair is its own oracle); `"mjpg"` JPEG-encodes each frame (ImageIO,
  * the reverse of the decode path) — smaller, lossy like the
  * reference's mp4v.
  *
  * Scale shape: ONE container is a sequential artifact (frame order is
  * the format), so the single-file writer drains the sorted relation
  * through `toLocalIterator` into the INCREMENTAL muxer —
  * partition-at-a-time fetch, constant mux memory, never the whole
  * video resident — exactly as bounded as the reference's own
  * single-threaded writer loop. For parallel output use
  * [[saveAviPartitioned]]: one container PER RANGE-PARTITION written
  * executor-side (the part-file convention applied to video); every
  * part is a self-describing AVI and ordered concatenation of the
  * parts' frames reproduces the full stream (spec'd).
  */
object VideoSink {

  /** The reference's `FrameSaver.DEFAULT_FPS` (`frame_processing.py:132`). */
  val DefaultFps = 25

  final case class SaveStats(written: Long, dropped: Long,
                             width: Int, height: Int, fps: Int)

  /** JPEG-encode one interleaved-BGR buffer (inverse of
    * [[ImageCodec.decode]]'s layout: TYPE_3BYTE_BGR's raster IS BGR). */
  def encodeJpeg(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h * 3, s"need $w x $h x 3 BGR bytes, got ${pixels.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Writes `df` — columns `(frame_number, payload BGR bytes, w, h[,
    * fps])` — as one AVI at `path`, in `frame_number` order, with the
    * reference's first-frame bind and drop-on-mismatch. Returns the
    * write report (the reference logs these; a relation is better). */
  def saveAvi(df: DataFrame, path: String, codec: String = "raw"): SaveStats = {
    require(codec == "raw" || codec == "mjpg", s"codec must be raw|mjpg, got $codec")
    val raw = codec == "raw"
    val hasFps = df.columns.contains("fps")
    val ordered = df
      .select(col("frame_number"), col("payload"), col("w"), col("h"),
        (if (hasFps) col("fps").cast("double") else lit(null).cast("double")).as("fps"))
      .orderBy("frame_number")

    val it = ordered.toLocalIterator()
    var muxer: AviCodec.Muxer = null
    var bw = 0
    var bh = 0
    var bfps = DefaultFps
    var written = 0L
    var dropped = 0L
    while (it.hasNext) {
      val r = it.next()
      val (w, h) = (r.getInt(2), r.getInt(3))
      if (muxer == null) {
        // first-frame bind; DEFAULT_FPS when the source offers none
        val fpsRaw = if (r.isNullAt(4)) 0.0 else r.getDouble(4)
        bw = w; bh = h
        bfps = if (fpsRaw > 0) math.max(1, math.round(fpsRaw).toInt) else DefaultFps
        muxer = new AviCodec.Muxer(path, bw, bh, bfps, raw)
      }
      if (w != bw || h != bh) dropped += 1 // frame_processing.py:171-178
      else {
        val bgr = r.getAs[Array[Byte]](1)
        muxer.addFrame(if (raw) bgr else encodeJpeg(bgr, bw, bh))
        written += 1
      }
    }
    if (muxer != null) muxer.close()
    SaveStats(written, dropped, bw, bh, bfps)
  }

  /** The MP4 face of the same sink (the reference's PRIMARY output
    * container — `cv2.VideoWriter` with `mp4v`,
    * `frame_processing.py:154-160`): identical first-frame-bind and
    * drop-on-mismatch semantics through [[Mp4Codec.Muxer]]. Every frame
    * JPEG-encodes (Photo-JPEG-in-MP4 — ISO-BMFF has no standard
    * uncompressed-BGR sample entry, so the MP4 face is lossy like the
    * reference's mp4v; the lossless round-trip lives on the AVI face).
    * Read back through the same `graft-frames` connector. */
  def saveMp4(df: DataFrame, path: String): SaveStats = {
    val hasFps = df.columns.contains("fps")
    val ordered = df
      .select(col("frame_number"), col("payload"), col("w"), col("h"),
        (if (hasFps) col("fps").cast("double") else lit(null).cast("double")).as("fps"))
      .orderBy("frame_number")
    val it = ordered.toLocalIterator()
    var muxer: Mp4Codec.Muxer = null
    var bw = 0
    var bh = 0
    var bfps = DefaultFps
    var written = 0L
    var dropped = 0L
    while (it.hasNext) {
      val r = it.next()
      val (w, h) = (r.getInt(2), r.getInt(3))
      if (muxer == null) {
        val fpsRaw = if (r.isNullAt(4)) 0.0 else r.getDouble(4)
        bw = w; bh = h
        bfps = if (fpsRaw > 0) math.max(1, math.round(fpsRaw).toInt) else DefaultFps
        muxer = new Mp4Codec.Muxer(path, bw, bh, bfps)
      }
      if (w != bw || h != bh) dropped += 1 // frame_processing.py:171-178
      else {
        muxer.addFrame(encodeJpeg(r.getAs[Array[Byte]](1), bw, bh))
        written += 1
      }
    }
    if (muxer != null) muxer.close()
    SaveStats(written, dropped, bw, bh, bfps)
  }

  /** Partition-parallel variant: `df` is range-partitioned on
    * `frame_number` (contiguous frame runs per part, global order =
    * part order) and each partition muxes its own `part-NNNNN.avi`
    * executor-side through the incremental muxer — no driver funnel.
    * Mismatched frames drop against the PART's first frame. Returns
    * frames written (accumulator-counted). */
  def saveAviPartitioned(df: DataFrame, dir: String, codec: String = "raw",
                         numParts: Int = 0): Long = {
    require(codec == "raw" || codec == "mjpg", s"codec must be raw|mjpg, got $codec")
    val raw = codec == "raw"
    new java.io.File(dir).mkdirs()
    val selected = df.select(col("frame_number"), col("payload"), col("w"), col("h"))
    // explicit width pins the part count (AQE coalescing may merge
    // small ranges under the default); 0 = let the planner size it
    val prepared = (if (numParts > 0)
        selected.repartitionByRange(numParts, col("frame_number"))
      else selected.repartitionByRange(col("frame_number")))
      .sortWithinPartitions("frame_number")
    val written = prepared.sparkSession.sparkContext.longAccumulator("avi_frames_written")
    prepared.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      var muxer: AviCodec.Muxer = null
      var bw = 0
      var bh = 0
      var partPath: String = null
      rows.foreach { r =>
        val (w, h) = (r.getInt(2), r.getInt(3))
        if (muxer == null) {
          bw = w; bh = h
          val partId = org.apache.spark.TaskContext.getPartitionId()
          partPath = f"$dir/part-$partId%05d.avi"
          muxer = new AviCodec.Muxer(partPath, bw, bh, DefaultFps, raw)
        }
        if (w == bw && h == bh) {
          val bgr = r.getAs[Array[Byte]](1)
          muxer.addFrame(if (raw) bgr else encodeJpeg(bgr, bw, bh))
          written.add(1L)
        }
      }
      if (muxer != null) muxer.close()
    }
    written.value
  }
}
