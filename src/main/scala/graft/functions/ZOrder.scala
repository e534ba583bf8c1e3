package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) interleaving for multi-column data skipping.
  *
  * Sorting a write by ONE column makes its per-file min/max ranges
  * narrow (parquet row-group skipping works) but leaves every other
  * column full-range in every file. Interleaving the bits of two
  * normalized columns and range-writing by the interleaved value
  * gives BOTH columns locality — each file covers a small rectangle
  * of the (a, b) space, so predicates on either column prune files.
  * This is the layout trick behind Delta's OPTIMIZE ZORDER BY,
  * expressed with plain built-in expressions (shifts + masks) that
  * stay inside whole-stage codegen.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. `bits` ≤ 31 keeps the result in a positive LONG.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast(LongType)
    val bl = b.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Scale a numeric column with known [min, max] onto [0, 2^bits):
    * the normalization step before [[interleave]]. Callers supply the
    * bounds (at scale they come from table stats — computing them
    * inline would add a pass).
    */
  def normalize(c: Column, minV: Double, maxV: Double,
                bits: Int = 16): Column = {
    require(maxV > minV, s"need maxV > minV, got [$minV, $maxV]")
    val span = (1L << bits) - 1
    least(greatest(
      ((c.cast("double") - minV) / (maxV - minV) * span), lit(0.0)),
      lit(span.toDouble)).cast(LongType)
  }
}
