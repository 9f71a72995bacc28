package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) interleaving for multi-dimensional clustering —
  * the key trick behind OPTIMIZE ZORDER BY: sort by the interleaved
  * code and a file's min/max z-bounds become a 2-D locality box, so a
  * single-key manifest ([[graft.sources.ManifestLog]] tracks one
  * BIGINT) skips files for BOTH dimensions at once.
  *
  * Pruning rests on monotonicity: bit-spreading is an order-embedding
  * (the highest differing bit stays highest), so z is monotone in each
  * coordinate and every point of a box probe [loA..hiA] x [loB..hiB]
  * lands inside the z-interval [z(loA,loB), z(hiA,hiB)] — a
  * conservative cover (it admits z-runs outside the box; the residual
  * row filter keeps correctness, the cover keeps the scan small).
  * Exact covers (BIGMIN/LITMAX splitting) shrink the admitted runs
  * further; the conservative interval is what the spec pins because it
  * needs no range decomposition.
  */
object Zorder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions) into one BIGINT z-value. Callers mask/scale their
    * coordinates into [0, 2^bits) first; 16+16 -> 32-bit codes leave
    * plenty of BIGINT headroom.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
}
