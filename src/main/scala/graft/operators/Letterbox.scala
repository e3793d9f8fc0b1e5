package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aspect-preserving letterbox geometry, as pure Catalyst expressions.
  *
  * Reference semantics (`/root/reference/uav/frame_processing.py:29-39`):
  * `scale = min(target/w, target/h)`; new dims truncate (`int(dim*scale)`);
  * the image is centered with the spare pad pixel going bottom/right
  * (`top = (target-h)//2`, `bottom = target-h-top`, same for left/right).
  *
  * Keeping the geometry in native expressions (not a UDF) means it stays
  * inside whole-stage codegen and is oracle-checkable; only the pixel
  * rewrite itself would be opaque per-row compute (out of analytic scope —
  * see SURVEY.md §2.5).
  */
object Letterbox {
  final case class Geometry(
      scale: Column,
      newW: Column, newH: Column,
      padTop: Column, padBottom: Column,
      padLeft: Column, padRight: Column)

  /** All derived geometry columns for letterboxing (w,h) into a
    * `target`×`target` square. `w`/`h` must be positive integers.
    * `floor` = truncation for the non-negative quantities involved,
    * matching Python `int()` / `//`. New dims are clamped to >= 1 — for
    * aspect ratios beyond target:1 (e.g. 1919×1, target 640) truncation
    * alone yields a zero dimension, which would erase the image; the
    * clamp keeps these columns in exact agreement with
    * [[LetterboxKernel]], which applies the same `max(1, ...)`.
    */
  def geometry(w: Column, h: Column, target: Int): Geometry = {
    val t = lit(target)
    val scale = least(lit(target.toDouble) / w, lit(target.toDouble) / h)
    val newW = greatest(lit(1L), floor(w * scale).cast("long"))
    val newH = greatest(lit(1L), floor(h * scale).cast("long"))
    val padTop = floor((t - newH) / lit(2)).cast("long")
    val padBottom = t - newH - padTop
    val padLeft = floor((t - newW) / lit(2)).cast("long")
    val padRight = t - newW - padLeft
    Geometry(scale, newW, newH, padTop, padBottom, padLeft, padRight)
  }
}
