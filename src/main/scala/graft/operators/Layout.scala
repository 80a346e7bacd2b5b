package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — Morton 1966, the multi-dimensional
  * clustering key behind Delta `OPTIMIZE ZORDER BY`, Hudi and Iceberg
  * table layout: interleaving the bits of two dimension keys makes rows
  * that are close in BOTH dimensions land in the same file, so min/max
  * file skipping prunes 2-D range predicates instead of only the single
  * sort-prefix dimension.
  *
  * Why it matters at 100 TB: the layout — not the engine — decides how
  * many files a `user BETWEEN … AND ts-band` predicate opens. A
  * single-key sort answers its own dimension with perfect pruning and
  * reads EVERY file for any other dimension; the z-layout bounds both
  * (a w×h cell rectangle touches the tiles it overlaps, ~O(area) tiles,
  * never the full file list). [[graft.queries.CoverageQueries]]'s
  * q174 measures exactly that trade on the events table.
  *
  * Determinism: pure int64 bit arithmetic (shift/mask/add) — codegen'd,
  * no shuffle, reproducible in any engine, so the layout assignment
  * itself sits under the cross-engine oracle gate.
  */
object Layout {

  /** The Morton code of `(x, y)`: the low `bits` bits of each coordinate
    * interleaved, x in the odd bit positions, y in the even — a 2·bits-bit
    * int64. Coordinates must already be in [0, 2^bits).
    */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"morton bits must be in [1,16], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** The z-tile (file id under a z-clustered layout) of `(x, y)`: the top
    * `tileBits` bits of the Morton code — each tile is an axis-aligned
    * 2^(bits−⌈tileBits/2⌉) × 2^(bits−⌊tileBits/2⌋) square of cells, the
    * unit a z-ordered writer fills one file with.
    */
  def zTile(x: Column, y: Column, bits: Int, tileBits: Int): Column = {
    require(tileBits >= 1 && tileBits <= 2 * bits, s"bad tileBits $tileBits")
    shiftright(morton(x, y, bits), 2 * bits - tileBits)
  }

  /** The equivalent SQL expression for [[morton]] over column names
    * `x`/`y` — the oracle replays the identical bit arithmetic.
    */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($y // ${1L << i}) % 2) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")
}
