package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RowIds

/** Source layer: the reference's reader family recast on Spark's
  * `DataFrameReader` registry.
  *
  * - S1 `ImageReader` (`/root/reference/uav/frame_reader.py:55-113`):
  *   directory scan ordered by the number embedded in the filename,
  *   non-numeric names last — [[imageDir]] over the `binaryFile` format.
  * - S3 `StreamReader` (`frame_reader.py:158-199`): unbounded scan —
  *   [[stream]] via `readStream` (upgraded from the reference's
  *   at-most-once to replayable at-least-once by checkpointing).
  * - S4 `SourceReader` (`frame_reader.py:202-248`): URI-scheme dispatch —
  *   [[open]].
  *
  * S2 `VideoReader` lives in the `graft-frames` `DataSourceV2` connector
  * ([[graft.sources.v2.FrameSource]]): MJPEG/AVI containers decode for
  * real, fully in-JVM ([[graft.multimodal.AviCodec]] RIFF walk →
  * ImageIO), with container-probed metadata, pushdown, pruning, and
  * partition-parallel positioned reads; MP4/H.264 remains out of scope
  * (the JDK has no H.264 codec). Every downstream operator only sees
  * the (payload, frame_number, metadata) schema, so the source swap is
  * invisible to queries.
  */
object Sources {

  /** Supported image suffixes (`frame_reader.py:63`), matched
    * case-insensitively on the file name's extension. */
  val ImageExtensions: Seq[String] = Seq("png", "jpg", "jpeg", "tiff", "bmp")

  /** Ordered binary-directory scan: each file one record, `frame_number`
    * assigned by numeric-filename order (first digit run in the file
    * STEM — suffix stripped, exactly `re.search(r'\d+', x.stem)`; names
    * without digits sort last — `frame_reader.py:62-66`). Only the
    * reference's supported image extensions are scanned (case-insensitive;
    * pass `extensions = Nil` to accept every file).
    *
    * Faithful S1 failure semantic (`frame_reader.py:106-109`): the first
    * UNREADABLE file *ends* the scan — it and everything after it never
    * emit; earlier frames do. `unreadable` is the decode-failure
    * predicate over the (path, length, content) columns; the default
    * (null/zero-length payload) is the deterministic stand-in for a
    * failed image decode (no codec libs in scope — a real decoder would
    * pass e.g. a magic-byte check here, as SourcesSpec does). The cut
    * point is computed relationally — a one-row min-failed-id aggregate
    * broadcast against the scan — so the prefix filter is a map-side
    * test, not a driver collect.
    *
    * `derived` columns (e.g. a real decode:
    * `"decoded" -> ImageCodec.decodeUdf(col("content"))`) are
    * materialized INTO the persisted scan, so an expensive per-file
    * computation runs once and is shared by the unreadable-cut aggregate
    * and every downstream consumer — the predicate can reference them
    * (`col("decoded").isNull` = the reference's `imread → None` stop).
    */
  def imageDir(spark: SparkSession, dir: String, glob: String = "*",
               unreadable: org.apache.spark.sql.Column =
                 col("length") === 0L || col("content").isNull,
               extensions: Seq[String] = ImageExtensions,
               derived: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame = {
    // binaryFile's path column is a URI — percent-escapes would inject
    // digits the reference's Path.stem never sees ("frame 1.png" →
    // ".../frame%201.png" → digit run "201"), so decode the basename
    // before any name-derived logic.
    val fname = expr("url_decode(reverse(split(path, '/'))[0])")
    // `[^/]` before the dot: a bare dot-file named ".png" has an EMPTY
    // pathlib suffix in the reference and must not count as an image.
    val ext = lower(regexp_extract(fname, "[^/]\\.([^./]+)$", 1))
    val extFilter =
      if (extensions.isEmpty) lit(true) else ext.isin(extensions: _*)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(extFilter)
      // digits from the STEM: strip the extension first, then take the
      // first digit run (so a digit in the suffix can never leak in).
      // `(.)` before the dot = pathlib stem semantics: a dotfile like
      // ".2png" has an EMPTY suffix, so nothing would be stripped from
      // it. (Hadoop's input format never lists dot/underscore-prefixed
      // files at all, so that branch is defensive — SourcesSpec notes
      // the divergence from iterdir().)
      .withColumn("num_key",
        expr("try_cast(regexp_extract(regexp_replace(url_decode(reverse(split(path, '/'))[0]), '(.)\\\\.[^.]*$', '$1'), '([0-9]+)', 1) AS BIGINT)"))
    val enriched = derived.foldLeft(files) { case (df, (name, c)) =>
      df.withColumn(name, c)
    }
    // nulls-last expressed as a MaxValue sentinel: RowIds keys must be
    // plain columns (it applies the sort direction itself).
    val framed = RowIds.withDenseId(
      enriched, Seq(coalesce(col("num_key"), lit(Long.MaxValue)), col("path")), "frame_number")
      .select((Seq("frame_number", "path", "length", "content") ++
        derived.map(_._1)).map(col): _*)
    // one I/O pass, not two: RowIds persists its sorted intermediate
    // (content column included), so this aggregate and the main scan
    // below both read the cache — files are decoded from disk once.
    val cut = framed
      .filter(unreadable)
      .agg(min(col("frame_number")).as("__cut"))
    framed.crossJoin(broadcast(cut))
      .filter(col("frame_number") < coalesce(col("__cut"), lit(Long.MaxValue)))
      .drop("__cut")
  }

  /** Unbounded scan over a growing directory (the RTSP analog: records
    * appear over time; Structured Streaming replays from checkpoints
    * where the reference just dropped the stream on first failure). */
  def stream(spark: SparkSession, dir: String,
             schema: org.apache.spark.sql.types.StructType, glob: String = "*"): DataFrame =
    spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(dir)

  /** S4 dispatch (`frame_reader.py:208-221`): `rtsp://` → the network
    * RTP client (the reference's `rtsp` arm, `frame_reader.py:214`),
    * `stream://` prefix → unbounded file scan, directory → binary image
    * scan, container file (.avi/.mp4/.m4v/.mov) → real container decode
    * through the `graft-frames` connector (the reference's file →
    * `VideoReader` arm), other file → batch columnar read. */
  def open(spark: SparkSession, uri: String): DataFrame = {
    if (uri.startsWith("rtsp://")) {
      spark.readStream.format("graft-rtsp").option("url", uri).load()
    } else if (uri.startsWith("stream://")) {
      val dir = uri.stripPrefix("stream://")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.readStream.format("parquet")
        .schema(spark.read.parquet(dir).schema).load(dir)
    } else {
      val f = new java.io.File(uri)
      if (f.isDirectory) imageDir(spark, uri)
      else if (graft.multimodal.Containers.isContainer(uri))
        spark.read.format("graft-frames").option("path", uri).load()
      else {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(uri)
      }
    }
  }
}
