package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the lakehouse layout
  * lever for MULTI-column selective scans, complementing the
  * single-column levers already in the registry (hive partitioning =
  * q82, bucketing = q73, range sort = the parquet min/max story).
  *
  * A table range-sorted by one column prunes on that column only; a
  * table sorted by the interleaved bits of two columns keeps BOTH
  * columns' value ranges narrow within every file, so a 2-D box
  * predicate prunes files/row-groups on either dimension. This is the
  * layout Delta/Iceberg expose as `OPTIMIZE ... ZORDER BY`; here it is
  * built from first principles:
  *
  *  - [[zval]] — the bit interleave as a closed-form Catalyst column
  *    (shift/and/add over longs, codegen'd, mirrored 1:1 by [[zvalSql]]
  *    for the DuckDB oracle);
  *  - [[zRanges]] — driver-side quadtree decomposition of a query box
  *    into a bounded set of contiguous z-value intervals (the
  *    litmax/bigmin idea expressed as recursive quadrant pruning). The
  *    intervals land in the scan as `zval BETWEEN lo AND hi` predicates
  *    → parquet footer stats skip every file/row-group whose z range
  *    misses all intervals. Over-approximation is safe and expected:
  *    the exact box predicate runs behind the interval screen, the same
  *    contract as every bloom/LSH pre-filter in this repo.
  *
  * Scale: the decomposition is O(perimeter) of the box in grid cells —
  * independent of table size — and is coalesced to [[MaxRanges]]
  * intervals (over-covering, never dropping) so the pushed predicate
  * stays small no matter how jagged the box's z coverage is.
  */
object ZOrder {

  /** Bits per dimension: 10 → a 1024×1024 grid, 20-bit z values. */
  val Bits = 10

  /** Grid size along one dimension. */
  val Grid: Long = 1L << Bits

  /** Hard cap on pushed z intervals ([[zRanges]] coalesces down to it). */
  val MaxRanges = 24

  /** Morton interleave of two [0, 2^Bits) grid coordinates: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Disjoint bit positions,
    * so `+` is `|` — a flat sum of 2·Bits shift/and terms, all inside
    * whole-stage codegen. */
  def zval(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The identical interleave as DuckDB SQL over expressions `x`, `y`
    * (pure integer shifts — bit-identical to [[zval]] by construction). */
  def zvalSql(x: String, y: String): String =
    // every term fully parenthesized: `<<` binds LOOSER than `+` in
    // DuckDB, so an unparenthesized chain a << 0 + b would shift by the
    // whole right-hand sum
    (0 until Bits).flatMap { i =>
      Seq(s"(((($x) >> $i) & 1) << ${2 * i})",
        s"(((($y) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Driver-side Morton encode/decode — the spec cross-check and the
    * arithmetic [[zRanges]] recurses with. */
  def encode(x: Long, y: Long): Long =
    (0 until Bits).foldLeft(0L) { (z, i) =>
      z + (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }

  def decode(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < Bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** Decompose the box `[xlo..xhi] × [ylo..yhi]` (inclusive grid
    * coordinates) into contiguous z-value intervals.
    *
    * Quadtree recursion: a quadrant fully inside the box contributes its
    * whole z range (every aligned quadrant is z-contiguous — the
    * defining property of the Morton curve); a disjoint quadrant
    * contributes nothing; a straddling quadrant splits in four. The raw
    * interval list is exact; adjacent intervals merge, and if more than
    * `maxRanges` remain the smallest gaps coalesce first — widening
    * coverage (false positives for the exact filter), never narrowing
    * it. Deterministic throughout.
    */
  def zRanges(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
              maxRanges: Int = MaxRanges): Seq[(Long, Long)] = {
    require(0 <= xlo && xlo <= xhi && xhi < Grid, s"x box [$xlo,$xhi] outside grid")
    require(0 <= ylo && ylo <= yhi && yhi < Grid, s"y box [$ylo,$yhi] outside grid")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    def rec(qx: Long, qy: Long, size: Long): Unit = {
      val qx2 = qx + size - 1; val qy2 = qy + size - 1
      if (qx2 < xlo || qx > xhi || qy2 < ylo || qy > yhi) return // disjoint
      if (qx >= xlo && qx2 <= xhi && qy >= ylo && qy2 <= yhi) {  // contained
        val zbase = encode(qx, qy) // aligned quadrant: minimal z corner
        out += ((zbase, zbase + size * size - 1))
        return
      }
      if (size == 1) { val z = encode(qx, qy); out += ((z, z)); return }
      val h = size / 2
      // z order of the quadrants: (qx,qy), (qx+h,qy), (qy+h half), ...
      rec(qx, qy, h); rec(qx + h, qy, h); rec(qx, qy + h, h); rec(qx + h, qy + h, h)
    }
    rec(0L, 0L, Grid)

    // quadrants are visited in ascending z, so the list is sorted; merge
    // touching intervals, then coalesce smallest gaps down to the cap
    val merged = out.foldLeft(List.empty[(Long, Long)]) {
      case ((plo, phi) :: tail, (lo, hi)) if lo <= phi + 1 => (plo, math.max(phi, hi)) :: tail
      case (acc, r) => r :: acc
    }.reverse.toVector

    var rs = merged
    while (rs.size > maxRanges) {
      // index of the smallest inter-interval gap (first on ties)
      val gi = (1 until rs.size).minBy(i => rs(i)._1 - rs(i - 1)._2)
      rs = (rs.take(gi - 1) :+ ((rs(gi - 1)._1, rs(gi)._2))) ++ rs.drop(gi + 1)
    }
    rs
  }

  /** OR-of-BETWEEN predicate for the pushed interval screen. */
  def rangesPredicate(z: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => z.between(lo, hi) }.reduce(_ || _)
}
