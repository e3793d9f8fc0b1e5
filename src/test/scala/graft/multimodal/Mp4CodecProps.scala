package graft.multimodal

import java.nio.file.Files

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck properties for the pure-JVM ISO-BMFF codec, mirroring
  * [[AviCodecProps]]: ∀ (dims, frame count, fps, sample bytes) the
  * container round-trips — the stbl tables report exactly what was
  * muxed, every sample's byte range resolves to the written payload,
  * the incremental Muxer matches the batch writer byte-for-byte, and
  * stream-copy splits partition the sample sequence exactly with the
  * codec fourcc preserved. No Spark session — hundreds of containers
  * are cheap. */
object Mp4CodecProps extends Properties("Mp4Codec") {

  private val tmpRoot = {
    val d = Files.createTempDirectory("graft_mp4_props")
    graft.TempDirs.cleanupOnExit(d)
    d
  }
  private var n = 0
  private def freshPath(): String = synchronized {
    n += 1; tmpRoot.resolve(s"p$n.mp4").toString
  }

  /** Arbitrary variable-size sample payloads (NOT valid JPEG — the
    * container layer is byte-agnostic; decode properties live with
    * ImageCodec). */
  private def samples(count: Int, seed: Int): Seq[Array[Byte]] =
    (0 until count).map(k =>
      Array.tabulate[Byte](16 + (k * 29 + seed) % 211)(i => ((i * 13 + k * 97 + seed) & 0xff).toByte))

  private val dims = for {
    w <- Gen.choose(1, 64)
    h <- Gen.choose(1, 64)
  } yield (w, h)

  property("container round-trip: probe + stbl index recover every written sample") =
    forAllNoShrink(dims, Gen.choose(1, 12), Gen.choose(1, 60), Gen.choose(0, 255)) {
      case ((w, h), frames, fps, seed) =>
        val bufs = samples(frames, seed)
        val path = freshPath()
        Mp4Codec.writeMjpeg(path, bufs, w, h, fps)
        val meta = Mp4Codec.probe(path)
        val idx = Mp4Codec.frameIndex(path)
        val raf = new java.io.RandomAccessFile(path, "r")
        try {
          meta.width == w && meta.height == h && meta.fps == fps.toDouble &&
            meta.nFrames == frames.toLong && meta.handler == "jpeg" &&
            idx.length == frames &&
            bufs.indices.forall { k =>
              val c = idx(k)
              val b = new Array[Byte](c.size)
              raf.seek(c.offset); raf.readFully(b)
              b.sameElements(bufs(k))
            }
        } finally raf.close()
    }

  property("incremental Muxer emits byte-identical containers to the batch writer") =
    forAllNoShrink(dims, Gen.choose(1, 8), Gen.choose(1, 30), Gen.choose(0, 255)) {
      case ((w, h), frames, fps, seed) =>
        val bufs = samples(frames, seed)
        val a = freshPath()
        Mp4Codec.writeMjpeg(a, bufs, w, h, fps)
        val b = freshPath()
        val m = new Mp4Codec.Muxer(b, w, h, fps)
        bufs.foreach(m.addFrame)
        m.close()
        java.util.Arrays.equals(
          Files.readAllBytes(java.nio.file.Paths.get(a)),
          Files.readAllBytes(java.nio.file.Paths.get(b)))
    }

  property("stream-copy segments partition the sample sequence exactly, fourcc preserved") =
    forAllNoShrink(Gen.choose(2, 10), Gen.choose(1, 9), Gen.oneOf("jpeg", "avc1")) {
      (frames, cutAt0, fourcc) =>
        val cutAt = math.min(cutAt0, frames - 1)
        val bufs = samples(frames, 7)
        val src = freshPath()
        Mp4Codec.writeMjpeg(src, bufs, 8, 6, 10, codecFourcc = fourcc)
        val lo = freshPath()
        val hi = freshPath()
        Mp4Codec.copySegment(src, lo, 0, cutAt)
        Mp4Codec.copySegment(src, hi, cutAt, frames)
        def readAll(p: String): Seq[Array[Byte]] = {
          val idx = Mp4Codec.frameIndex(p)
          val raf = new java.io.RandomAccessFile(p, "r")
          try idx.toSeq.map { c =>
            val b = new Array[Byte](c.size)
            raf.seek(c.offset); raf.readFully(b); b
          } finally raf.close()
        }
        val rejoined = readAll(lo) ++ readAll(hi)
        rejoined.length == frames &&
          rejoined.zip(bufs).forall { case (a, b) => a.sameElements(b) } &&
          // a stream copy must never transcode: the source's codec
          // fourcc (incl. the metadata-only avc1) survives both halves
          Mp4Codec.probe(lo).handler == fourcc &&
          Mp4Codec.probe(hi).handler == fourcc
    }
}
