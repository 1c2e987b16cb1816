package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys.
  *
  * `zorder16` interleaves the low 16 bits of two non-negative dimension
  * columns into a 32-bit Morton (Z-order) key: sorting files by the key
  * gives every file a tight min/max range on BOTH dimensions at once, so
  * parquet row-group statistics can prune scans filtered on either
  * dimension (or a 2-D box) — the multi-column clustering trick
  * single-column sort layouts (io05) cannot provide. Delta/Iceberg
  * OPTIMIZE ZORDER BY is the same idea; here it is a plain column
  * expression, entirely inside whole-stage codegen (32 constant
  * shift/mask terms, no UDF).
  *
  * Dimensions wider than 16 bits must be range-bucketed into 16 bits
  * first (at 100 TB: `width_bucket`-style quantile binning per
  * dimension); the fixture key spaces fit directly.
  */
object Layout {

  /** 32-bit Morton interleave of the low 16 bits of x (even positions)
    * and y (odd positions). Inputs must be non-negative integral
    * columns. */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      val xb = shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
}
