package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Banded (Sakoe–Chiba) dynamic-time-warping distance between two
 * equal-length integer vectors, as ONE Catalyst fold expression — no
 * UDF, no driver DP, no per-pair shuffle.
 *
 * The DP table is linearized in row-major order over the BAND only:
 * each row i contributes exactly 2r+1 padded cells j ∈ [i-r, i+r]
 * (out-of-range / out-of-band cells carry the `big` sentinel), so the
 * fold walks len·(2r+1) cells carrying a sliding buffer of the last
 * 2r+1 values. With the fixed per-row width, cell (i,j)'s three DP
 * neighbors sit at fixed buffer offsets: (i-1,j-1) at buf[1],
 * (i-1,j) at buf[2], (i,j-1) at buf[2r+1] — the latter two guarded at
 * the row seams (first/last padded cell of a row), where the linear
 * buffer would otherwise wrap into the neighboring row.
 *
 * Cost is O(len·r) per pair with O(r) state inside a single
 * expression, so a million pairs DTW in parallel with zero shuffle
 * beyond the pair join that feeds them; arithmetic is exact 64-bit
 * integer (feed fixed-point ppm values), so results hash-match any
 * engine implementing the same recurrence.
 */
object Dtw {

  /** DTW(va, vb) with |i-j| ≤ radius; both arrays must have `len`
   *  elements. `big` is the in-band infinity: any real warping path
   *  costs far less, and `big + len·maxCost` must not overflow Long
   *  (the default leaves 9 decimal digits of per-cell headroom).
   */
  def banded(
      va: Column,
      vb: Column,
      len: Int,
      radius: Int,
      big: Long = 4000000000000000L): Column = {
    require(radius >= 0 && len > 0, "dtw: need len > 0, radius >= 0")
    val b = 2 * radius + 1
    // virtual row 0: D[0][0] = 0 under cell (1,1)'s diagonal, else ∞
    val init = array((1 to b).map(kk =>
      if (kk == radius + 1) lit(0L) else lit(big)): _*)
    val folded = aggregate(
      sequence(lit(1), lit(len * b)),
      init,
      (buf, c) => {
        val c1 = c - lit(1)
        val jIdx = pmod(c1, lit(b)) + lit(1)
        val i = ((c1 - pmod(c1, lit(b))) / lit(b)).cast("int") + lit(1)
        val j = i + jIdx - lit(radius + 1)
        // row-seam guards: at jIdx = b the linear "up" slot holds this
        // row's first cell; at jIdx = 1 the "left" slot holds the
        // previous row's last cell — both must read as ∞ instead
        val diag = element_at(buf, 1)
        val up = when(jIdx === lit(b), lit(big)).otherwise(element_at(buf, 2))
        val left = when(jIdx === lit(1), lit(big)).otherwise(element_at(buf, b))
        val cell = when(j < lit(1) || j > lit(len), lit(big))
          .otherwise(
            least(diag, up, left) + abs(element_at(va, i) - element_at(vb, j)))
        concat(slice(buf, 2, b - 1), array(cell))
      })
    // D[len][len] lands radius cells before the end of the final row
    element_at(folded, radius + 1)
  }
}
